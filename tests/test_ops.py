"""Op-level parity tests against torch semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from expressive_fastspeech2_mandarin_tpu.ops import (
    conv1d,
    conv_transpose1d,
    layer_norm,
    length_regulate,
    mask_from_lengths,
)
from expressive_fastspeech2_mandarin_tpu.models.variance import bucketize


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 37, 16)).astype(np.float32)
    w = rng.standard_normal((9, 16, 24)).astype(np.float32)
    b = rng.standard_normal((24,)).astype(np.float32)

    out = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=4)

    tconv = torch.nn.Conv1d(16, 24, 9, padding=4)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        tconv.bias.copy_(torch.from_numpy(b))
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(np.asarray(out), ref.transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


def test_conv1d_dilated_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 50, 8)).astype(np.float32)
    w = rng.standard_normal((3, 8, 8)).astype(np.float32)
    b = np.zeros((8,), np.float32)
    out = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                 padding=3, dilation=3)
    tconv = torch.nn.Conv1d(8, 8, 3, padding=3, dilation=3, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(np.asarray(out), ref.transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cin,cout,k,stride", [(16, 8, 16, 8), (8, 4, 4, 2)])
def test_conv_transpose1d_matches_torch(cin, cout, k, stride):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 25, cin)).astype(np.float32)
    # torch ConvTranspose1d weight: (Cin, Cout, K)
    wt = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32)
    pad = (k - stride) // 2

    out = conv_transpose1d(
        jnp.asarray(x), jnp.asarray(wt.transpose(2, 0, 1)), jnp.asarray(b),
        stride=stride, padding=pad)

    tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride, padding=pad)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(wt))
        tconv.bias.copy_(torch.from_numpy(b))
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(np.asarray(out), ref.transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 7, 32)).astype(np.float32)
    g = rng.standard_normal((32,)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    ln = torch.nn.LayerNorm(32)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(g))
        ln.bias.copy_(torch.from_numpy(b))
        ref = ln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_bucketize_matches_torch():
    boundaries = np.linspace(-2.0, 8.0, 255).astype(np.float32)
    vals = np.concatenate([
        np.random.default_rng(4).uniform(-3, 9, 1000).astype(np.float32),
        boundaries[:10],  # exact boundary hits
        np.array([-2.0, 8.0], np.float32),
    ])
    ours = np.asarray(bucketize(jnp.asarray(vals), jnp.asarray(boundaries)))
    ref = torch.bucketize(torch.from_numpy(vals),
                          torch.from_numpy(boundaries)).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_mask_from_lengths():
    m = mask_from_lengths(jnp.array([2, 4]), 5)
    expected = np.array([
        [False, False, True, True, True],
        [False, False, False, False, True],
    ])
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_length_regulate_matches_loop():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 6, 4)).astype(np.float32)
    durations = np.array([
        [2, 0, 3, 1, 0, 0],
        [1, 1, 1, 1, 1, 1],
        [0, 4, 0, 0, 2, 0],
    ])
    max_mel = 10
    out, mel_lens = length_regulate(
        jnp.asarray(x), jnp.asarray(durations), max_mel)

    # Reference semantics: repeat each phoneme vector d times, pad with zeros.
    for b in range(3):
        expanded = np.concatenate(
            [np.repeat(x[b, i:i + 1], durations[b, i], axis=0)
             for i in range(6)], axis=0)
        pad = np.zeros((max_mel - expanded.shape[0], 4), np.float32)
        ref = np.concatenate([expanded, pad], axis=0)
        np.testing.assert_allclose(np.asarray(out[b]), ref, rtol=1e-6)
        assert int(mel_lens[b]) == durations[b].sum()


def test_length_regulate_clamps_to_max():
    x = np.ones((1, 3, 2), np.float32)
    durations = np.array([[4, 4, 4]])
    out, mel_lens = length_regulate(jnp.asarray(x), jnp.asarray(durations), 8)
    assert out.shape == (1, 8, 2)
    assert int(mel_lens[0]) == 8


def test_attention_softmax_handles_padded_rows():
    """Padded query rows must not produce NaNs (keys remain valid subset)."""
    from expressive_fastspeech2_mandarin_tpu.ops.attention import _softmax

    scores = jnp.array([[0.5, -jnp.inf], [-jnp.inf, -jnp.inf]])
    out = _softmax(scores)
    assert not np.any(np.isnan(np.asarray(out)))
