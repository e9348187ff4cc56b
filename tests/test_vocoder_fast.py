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


def test_traced_packer_matches_numpy_packer():
    """pack_generator_params_traced (used INSIDE the jitted vocoder train
    step, vocoder_train.packed_generator) must produce bit-identical
    layouts to the load-time numpy packer."""
    from expressive_fastspeech2_mandarin_tpu.models.hifigan import (
        pack_generator_params_traced,
    )

    cfg = VocoderConfig()
    voc = init_generator(jax.random.PRNGKey(4), cfg)
    ref = pack_generator_params(voc, cfg)
    traced = jax.jit(lambda p: pack_generator_params_traced(p, cfg))(voc)

    def cmp(a, b, path=""):
        if isinstance(a, dict):
            for k in b:
                if k in a:
                    cmp(a[k], b[k], f"{path}/{k}")
        elif isinstance(a, list):
            for i, (x, y) in enumerate(zip(a, b)):
                cmp(x, y, f"{path}[{i}]")
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=path)

    cmp(ref, traced)
    mel = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 16, 80)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(apply_generator(traced, mel, cfg, fast=True)),
        np.asarray(apply_generator(voc, mel, cfg, fast=False)),
        rtol=1e-4, atol=1e-5)


def test_phase_split_is_opt_in_and_default_off():
    """Round-2 regression guard: _conv_phase_split is 1.75x SLOWER end-to-end
    on the real chip (104.2 vs 59.6 ms full generator, PERF.md), so
    pack_generator_params must not emit its kernels unless explicitly asked."""
    cfg = VocoderConfig()
    voc = init_generator(jax.random.PRNGKey(1), cfg)
    default = pack_generator_params(voc, cfg)
    for rb in default["resblocks"]:
        for conv in rb["convs1"]:
            assert "kernel_packed_ps" not in conv
    opted = pack_generator_params(voc, cfg, phase_split=True)
    assert any("kernel_packed_ps" in conv
               for rb in opted["resblocks"] for conv in rb["convs1"])
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 20, 80)).astype(np.float32))
    o1 = apply_generator(voc, mel, cfg, fast=False)
    o2 = apply_generator(opted, mel, cfg, fast=True)
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


def test_phase_split_dilated_conv_matches_plain():
    """Phase-split λ-packing (PERF.md): a d-dilated conv decomposed into d
    phase streams with a dilation-1 packed conv must be exact vs the plain
    dilated conv, including zero-padding at the edges."""
    from expressive_fastspeech2_mandarin_tpu.models.hifigan import (
        _conv_phase_split,
        _pack_conv_weight,
    )
    from expressive_fastspeech2_mandarin_tpu.ops import conv1d
    from expressive_fastspeech2_mandarin_tpu.models.hifigan import get_padding

    rng = np.random.default_rng(0)
    for c, lam in ((32, 4), (64, 2)):
        for k, d in ((11, 5), (11, 3), (7, 5), (3, 5), (7, 3)):
            t = 2 * lam * d * 6  # divisible by d*lam
            x = rng.normal(size=(2, t, c)).astype(np.float32)
            kernel = rng.normal(size=(k, c, c)).astype(np.float32) * 0.1
            bias = rng.normal(size=(c,)).astype(np.float32)

            ref = conv1d(jnp.asarray(x), jnp.asarray(kernel),
                         jnp.asarray(bias),
                         padding=get_padding(k, d), dilation=d)

            ps, _, _ = _pack_conv_weight(kernel, 1, lam)
            conv = {"kernel_packed_ps": jnp.asarray(ps),
                    "bias": jnp.asarray(bias)}
            xp = jnp.asarray(x).reshape(2, t // lam, lam * c)
            out = _conv_phase_split(xp, conv, k, d, lam, c)
            out = np.asarray(out).reshape(2, t, c)
            np.testing.assert_allclose(out, np.asarray(ref),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"c={c} k={k} d={d}")
