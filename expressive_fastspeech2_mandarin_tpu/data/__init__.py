"""Data pipeline: metadata parsing + bucketed static-shape batching."""

from .dataset import BucketedDataset, pick_bucket
from .metadata import PreprocessedCorpus, Utterance, read_metadata

__all__ = [
    "BucketedDataset",
    "pick_bucket",
    "PreprocessedCorpus",
    "Utterance",
    "read_metadata",
]
