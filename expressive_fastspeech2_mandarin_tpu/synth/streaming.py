"""Streaming (chunked) vocoder inference.

A capability beyond the reference (which always vocodes whole utterances,
utils/model.py:74-92): mel is processed in fixed chunks with a
receptive-field halo, yielding waveform incrementally with first-audio
latency of one chunk instead of the whole utterance.

Exactness: HiFi-GAN is a finite-receptive-field convnet. For a chunk of
frames [a, b) we run the generator on the clipped window
[max(a-h, 0), min(b+h, T)) and keep the central slice; with ``h`` at least
the generator's receptive radius in mel frames the result is bit-identical
to the monolithic run (window edges that coincide with the true sequence
ends also match, because each conv zero-pads exactly as the monolithic run
does there).

The receptive radius for the V1 topology: conv_pre (±3 frames) +
per-stage [1 pre-upsample step + 60-sample MRF chain at stage rate] +
conv_post, ≈ 13.3 frames; ``halo_frames=16`` by default.
"""

from __future__ import annotations

from typing import Iterator

import jax.numpy as jnp

from ..config import VocoderConfig
from ..models.hifigan import apply_generator


def generator_receptive_radius_frames(cfg: VocoderConfig) -> int:
    """Upper bound of the generator's one-sided receptive field in mel
    frames (used as the default streaming halo)."""
    radius = 3.0  # conv_pre k=7
    rate = 1.0
    for u, k, in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
        radius += 1.0 / rate  # polyphase upsample reads x[t-1..t+1]
        rate *= u
        chain = 0
        for kr, dil in zip(cfg.resblock_kernel_sizes,
                           cfg.resblock_dilation_sizes):
            c = sum((kr - 1) // 2 * d + (kr - 1) // 2 for d in dil)
            chain = max(chain, c)
        radius += chain / rate
    radius += 3.0 / (rate * 1.0)  # conv_post at audio rate / hop… negligible
    import math

    return int(math.ceil(radius)) + 1


def vocode_streaming(
    params,
    mel: jnp.ndarray,
    cfg: VocoderConfig,
    *,
    chunk_frames: int = 100,
    halo_frames: int | None = None,
) -> Iterator[jnp.ndarray]:
    """Yield waveform chunks for ``mel`` (B, T, n_mels).

    Each yielded array is (B, chunk_frames*hop_upsample) except possibly the
    last. Concatenating all chunks equals ``apply_generator(params, mel)``
    exactly (same dtype/precision path).
    """
    if halo_frames is None:
        halo_frames = generator_receptive_radius_frames(cfg)
    t = mel.shape[1]
    up = 1
    for u in cfg.upsample_rates:
        up *= u
    for a in range(0, t, chunk_frames):
        b = min(a + chunk_frames, t)
        w0 = max(a - halo_frames, 0)
        w1 = min(b + halo_frames, t)
        wav = apply_generator(params, mel[:, w0:w1, :], cfg)
        yield wav[:, (a - w0) * up: (b - w0) * up]
