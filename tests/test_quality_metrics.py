"""Objective quality metrics (dsp/quality.py): MCD, F0-RMSE, V/UV error —
positive and negative controls (VERDICT r4 item 4).

The reference has no objective audio-quality metric at all
(diagnose_synthesis.py:12-60 checks amplitude/RMS only); these tests pin
the behavior that makes vocoder ranking machine-checkable: identity → 0,
noise/detuned/devoiced inputs → large, and ordering between mild and
severe corruptions."""

import numpy as np
import pytest

from expressive_fastspeech2_mandarin_tpu.dsp.quality import (
    f0_metrics,
    mcd,
    mel_cepstra,
    wav_quality,
)

SR = 22050
HOP = 256


def _harmonic(f0: float, seconds: float = 1.0, n_harm: int = 8,
              seed: int = 0) -> np.ndarray:
    t = np.arange(int(SR * seconds)) / SR
    rng = np.random.default_rng(seed)
    x = sum((0.6 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6))
            for k in range(1, n_harm + 1))
    return (x / np.abs(x).max() * 0.7).astype(np.float64)


@pytest.fixture(scope="module")
def log_mel_fn():
    import jax
    import jax.numpy as jnp

    from expressive_fastspeech2_mandarin_tpu.config import Config
    from expressive_fastspeech2_mandarin_tpu.dsp.stft import MelSTFT

    pre = Config().preprocess
    stft = MelSTFT(pre.stft, pre.mel, pre.audio.sampling_rate)

    def fn(w):
        m, _ = jax.jit(stft.mel_energy)(jnp.asarray(w, jnp.float32)[None])
        return np.asarray(m)[0]

    return fn


def test_mcd_identity_and_ordering(log_mel_fn):
    x = _harmonic(150.0)
    m = log_mel_fn(x)
    assert mcd(m, m) == 0.0
    # Mild corruption (small gain error) < severe corruption (noise).
    m_gain = log_mel_fn(x * 1.2)
    rng = np.random.default_rng(1)
    m_noise = log_mel_fn(rng.normal(0, 0.2, x.shape))
    d_gain, d_noise = mcd(m, m_gain), mcd(m, m_noise)
    assert 0.0 < d_gain < d_noise
    assert d_noise > 5.0, f"noise MCD {d_noise} suspiciously small"


def test_mcd_dtw_handles_duration_mismatch(log_mel_fn):
    x = _harmonic(150.0, seconds=1.0)
    x_long = _harmonic(150.0, seconds=1.3)
    m, m_long = log_mel_fn(x), log_mel_fn(x_long)
    # Truncating compares misaligned frames; DTW must not be worse.
    assert mcd(m, m_long, use_dtw=True) <= mcd(m, m_long) + 1e-9


def test_cepstra_shape():
    lm = np.random.default_rng(0).normal(-4, 2, (50, 80))
    c = mel_cepstra(lm, n_coeffs=13)
    assert c.shape == (50, 13)


def test_f0_rmse_detuning():
    x = _harmonic(150.0)
    same = f0_metrics(x, _harmonic(150.0, seed=3), SR, HOP)
    detuned = f0_metrics(x, _harmonic(180.0, seed=3), SR, HOP)
    assert same["f0_rmse_hz"] < 5.0
    assert detuned["f0_rmse_hz"] > 20.0
    assert same["voiced_fraction_ref"] > 0.5


def test_vuv_error_devoicing():
    x = _harmonic(150.0)
    rng = np.random.default_rng(2)
    noise = rng.normal(0, 0.1, x.shape)
    agree = f0_metrics(x, x.copy(), SR, HOP)
    devoiced = f0_metrics(x, noise, SR, HOP)
    assert agree["vuv_error"] < 0.05
    assert devoiced["vuv_error"] > 0.5, (
        "white noise scored as voiced as often as speech")


def test_wav_quality_bundle(log_mel_fn):
    x = _harmonic(150.0)
    q = wav_quality(x, x.copy(), SR, log_mel_fn, HOP)
    assert q["mcd_db"] == 0.0
    assert q["vuv_error"] < 0.05
    rng = np.random.default_rng(4)
    q_bad = wav_quality(x, rng.normal(0, 0.2, x.shape), SR, log_mel_fn, HOP)
    assert q_bad["mcd_db"] > q["mcd_db"]
    assert q_bad["vuv_error"] > q["vuv_error"]
