"""Vectorized length regulation — the central TPU redesign.

The reference expands each phoneme vector by its duration with a Python
per-utterance loop of ``tensor.expand`` + ``cat`` + host-synced ``.item()``
(reference: model/modules.py:161-194). On TPU that pattern is unusable: it
forces host synchronization and dynamic shapes.

Here the same mapping is computed as pure data movement with static shapes:

    ends    = cumsum(durations)                  # (B, S)
    index_t = searchsorted(ends, t, 'right')     # frame t → phoneme index
    out     = x[b, index_t]                      # one batched gather

Frames beyond the utterance's total duration gather phoneme index S-1 and are
zeroed by the mel mask, reproducing the reference's zero padding exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_to_phoneme_index(durations: jnp.ndarray, max_mel_len: int) -> jnp.ndarray:
    """(B, S) int durations → (B, T) index of the phoneme owning each frame."""
    ends = jnp.cumsum(durations, axis=-1)  # (B, S)
    frames = jnp.arange(max_mel_len, dtype=ends.dtype)  # (T,)
    # index[t] = number of ends <= t  == searchsorted(ends, t, side='right')
    idx = jax.vmap(
        lambda e: jnp.searchsorted(e, frames, side="right")
    )(ends)
    return jnp.minimum(idx, durations.shape[-1] - 1)


def length_regulate(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_mel_len: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand (B, S, D) phoneme states to (B, T, D) frame states.

    Returns ``(frames, mel_lens)`` where ``mel_lens[b] = sum(durations[b])``
    clamped to ``max_mel_len``. Positions past ``mel_lens`` are zeroed.
    """
    durations = durations.astype(jnp.int32)
    idx = frame_to_phoneme_index(durations, max_mel_len)  # (B, T)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    mel_lens = jnp.minimum(jnp.sum(durations, axis=-1), max_mel_len)
    valid = jnp.arange(max_mel_len)[None, :] < mel_lens[:, None]
    return jnp.where(valid[..., None], out, 0.0), mel_lens
