"""Fused Pallas MRF resblock kernel vs the plain-conv reference path
(interpret mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from expressive_fastspeech2_mandarin_tpu.config import Config
from expressive_fastspeech2_mandarin_tpu.models.hifigan import (
    apply_generator,
    apply_resblock,
    init_generator,
    init_resblock,
    pack_generator_params,
)
from expressive_fastspeech2_mandarin_tpu.ops.pallas.mrf_resblock import (
    pack_resblock,
    resblock_fused,
)


@pytest.mark.parametrize(
    "C,lam,k,T",
    [(32, 4, 11, 2048), (32, 4, 3, 2048), (64, 2, 7, 1024),
     (128, 1, 11, 1024), (128, 1, 3, 700)])
def test_resblock_fused_matches_reference(C, lam, k, T):
    dil = (1, 3, 5)
    rng = np.random.default_rng(0)
    rb = init_resblock(jax.random.PRNGKey(1), C, k, dil)
    x = jnp.asarray(rng.normal(size=(2, T, C)).astype(np.float32))
    ref = apply_resblock(rb, x, k, dil)
    taps, biases, meta = pack_resblock(rb, k, dil, lam, dtype=jnp.float32)
    xp = x.reshape(2, T // lam, lam * C) if lam > 1 else x
    out = resblock_fused(xp, taps, biases, meta, tile=128, interpret=True)
    out = out.reshape(2, T, C) if lam > 1 else out
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_generator_fused_matches_plain():
    """Full generator with fused packing (auto interpret on CPU) must match
    the plain path within float round-off."""
    cfg = Config().model.vocoder
    base = init_generator(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(1, 64, 80)).astype(np.float32))
    plain = apply_generator(base, mel, cfg, fast=False)
    fused = pack_generator_params(base, cfg, fused=True,
                                  fused_dtype=jnp.float32)
    out = apply_generator(fused, mel, cfg, fast=True)
    assert out.shape == plain.shape
    assert float(jnp.max(jnp.abs(out - plain))) < 5e-4
