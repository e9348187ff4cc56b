"""Polyphase-packed vocoder fast path: exact parity with the plain path."""

import numpy as np

import jax
import jax.numpy as jnp

from expressive_fastspeech2_mandarin_tpu.config import VocoderConfig
from expressive_fastspeech2_mandarin_tpu.models import init_generator
from expressive_fastspeech2_mandarin_tpu.models.hifigan import (
    _pack_conv_weight,
    apply_generator,
    pack_generator_params,
)


def test_pack_conv_weight_matches_plain_conv():
    rng = np.random.default_rng(0)
    C, lam, k, d = 32, 4, 11, 5
    T = 64
    x = rng.normal(size=(1, T, C)).astype(np.float32)
    w = rng.normal(size=(k, C, C)).astype(np.float32) * 0.1

    from expressive_fastspeech2_mandarin_tpu.ops import conv1d

    ref = conv1d(jnp.asarray(x), jnp.asarray(w), None,
                 padding=(k * d - d) // 2, dilation=d)

    pk, pl_, pr = _pack_conv_weight(w, d, lam)
    xp = jnp.asarray(x).reshape(1, T // lam, lam * C)
    out = jax.lax.conv_general_dilated(
        xp, jnp.asarray(pk), (1,), [(pl_, pr)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    np.testing.assert_allclose(np.asarray(out).reshape(1, T, C),
                               np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_packed_generator_parity():
    cfg = VocoderConfig()
    voc = init_generator(jax.random.PRNGKey(1), cfg)
    vocp = pack_generator_params(voc, cfg)
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 24, 80)).astype(np.float32))
    o1 = apply_generator(voc, mel, cfg, fast=False)
    o2 = apply_generator(vocp, mel, cfg, fast=True)
    assert o1.shape == o2.shape == (2, 24 * 256)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-4, atol=1e-5)


def test_unpacked_params_fall_back_to_plain_path():
    cfg = VocoderConfig()
    voc = init_generator(jax.random.PRNGKey(1), cfg)
    mel = jnp.zeros((1, 8, 80), jnp.float32)
    out = apply_generator(voc, mel, cfg, fast=True)  # no packed kernels
    assert out.shape == (1, 8 * 256)


def test_polyphase_transposed_conv_matches_conv_transpose():
    """k=2u transposed conv == one k=3 conv emitting u packed phases +
    sample-major reshape (models/hifigan.py:_pack_transposed_conv)."""
    import jax
    import jax.numpy as jnp

    from expressive_fastspeech2_mandarin_tpu.models.hifigan import (
        _pack_transposed_conv,
        _upsample_poly,
    )
    from expressive_fastspeech2_mandarin_tpu.ops import conv_transpose1d

    rng = np.random.default_rng(3)
    for (u, k, cin, cout, t) in [(8, 16, 16, 8, 40), (2, 4, 12, 6, 33)]:
        kern = rng.normal(size=(k, cin, cout)).astype(np.float32)
        bias = rng.normal(size=(cout,)).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(2, t, cin)).astype(np.float32))
        ref = conv_transpose1d(x, jnp.asarray(kern), jnp.asarray(bias),
                               stride=u, padding=(k - u) // 2)
        up = {"kernel_poly": jnp.asarray(_pack_transposed_conv(kern, u)),
              "bias": jnp.asarray(bias)}
        out = _upsample_poly(x, up, u)
        assert out.shape == ref.shape
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5
