"""Mesh + sharding utilities for multi-chip / multi-host execution."""

from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "replicated",
    "data_sharding",
    "shard_batch",
    "initialize_distributed",
]
