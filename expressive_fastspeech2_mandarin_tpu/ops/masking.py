"""Mask utilities.

The framework uses the reference's mask convention throughout: ``True`` marks
*padding* positions (reference: utils/tools.py:152-160).  All shapes are
static; lengths are traced values.
"""

from __future__ import annotations

import jax.numpy as jnp


def mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths → (B, max_len) bool mask, True at padded positions."""
    ids = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return ids >= lengths[:, None]


def apply_padding_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded positions; ``mask`` is (B, T), ``x`` is (B, T, ...)."""
    return jnp.where(mask[(...,) + (None,) * (x.ndim - mask.ndim)], 0.0, x)
