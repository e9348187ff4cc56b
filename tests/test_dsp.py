"""DSP parity and property tests.

The STFT oracle below replicates the reference's conv1d-against-Fourier-basis
formulation literally in numpy (reference: audio/stft.py:15-81), so the test
is a genuine framing/padding/windowing parity check, not a self-comparison.
"""

import numpy as np
import pytest
import scipy.signal

from expressive_fastspeech2_mandarin_tpu.config import MelConfig, STFTConfig
from expressive_fastspeech2_mandarin_tpu.dsp import (
    MelSTFT,
    estimate_f0,
    mel_filterbank,
)


def _reference_stft_magnitude(audio, n_fft=1024, hop=256, win=1024):
    """Literal numpy transcription of the reference conv-STFT math."""
    fourier = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    basis = np.vstack([np.real(fourier[:cutoff]), np.imag(fourier[:cutoff])])
    window = scipy.signal.get_window("hann", win, fftbins=True)
    basis = basis * window[None, :]

    pad = n_fft // 2
    x = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    out = np.zeros((x.shape[0], 2 * cutoff, n_frames))
    for f in range(n_frames):
        seg = x[:, f * hop: f * hop + n_fft]
        out[:, :, f] = seg @ basis.T
    real, imag = out[:, :cutoff], out[:, cutoff:]
    return np.sqrt(real ** 2 + imag ** 2)  # (B, F, T')


@pytest.fixture(scope="module")
def melstft():
    return MelSTFT(STFTConfig(), MelConfig(), 22050)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(22050) / 22050
    sig = (0.5 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 440 * t)
           + 0.05 * rng.standard_normal(len(t)))
    return np.clip(sig, -1, 1).astype(np.float32)[None, :]


def test_magnitude_matches_reference_formulation(melstft, audio):
    mag = np.asarray(melstft.magnitude(audio))  # (B, T', F)
    ref = _reference_stft_magnitude(audio)      # (B, F, T')
    assert mag.shape == (1, ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(mag.transpose(0, 2, 1), ref,
                               rtol=1e-3, atol=1e-3)


def test_mel_energy_semantics(melstft, audio):
    mel, energy = melstft.mel_energy(audio)
    mag = np.asarray(melstft.magnitude(audio))
    # energy = L2 over freq (reference: audio/stft.py:176)
    np.testing.assert_allclose(np.asarray(energy),
                               np.linalg.norm(mag, axis=-1), rtol=1e-4)
    # log-clamp floor (reference: audio_processing.py:85-91)
    assert np.asarray(mel).min() >= np.log(1e-5) - 1e-6
    assert mel.shape == (1, mag.shape[1], 80)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # Every filter has support, peaks are monotonically increasing in freq.
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum(axis=1).min() > 0
    # Slaney normalization: peak amplitude shrinks with bandwidth; low
    # filters (narrow) have larger peaks than high (wide) ones.
    assert fb[0].max() > fb[-1].max()
    # Filters cover DC..8kHz: bin of 8kHz = 8000/ (22050/2) * 512
    assert peaks[-1] <= int(8000 / (22050 / 2) * 512) + 1


def test_istft_roundtrip(melstft, audio):
    frames = melstft.frame(audio) * np.asarray(melstft.window)[None, None, :]
    spec = np.fft.rfft(frames, axis=-1)
    rec = np.asarray(melstft.istft(np.abs(spec), np.angle(spec)))
    n = min(rec.shape[1], audio.shape[1])
    # Interior reconstruction should be near-exact (COLA).
    sl = slice(1024, n - 1024)
    np.testing.assert_allclose(rec[0, sl], audio[0, sl], atol=1e-3)


def test_griffin_lim_recovers_tone(melstft):
    t = np.arange(22050) / 22050
    sig = (0.8 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[None, :]
    mag = melstft.magnitude(sig)
    magn = np.asarray(mag)

    def spectral_err(n_iters):
        rec = np.asarray(melstft.griffin_lim(mag, n_iters=n_iters))
        mag_rec = np.asarray(melstft.magnitude(np.clip(rec, -1, 1)))
        return rec, np.linalg.norm(mag_rec - magn) / np.linalg.norm(magn)

    _, err0 = spectral_err(0)
    rec, err20 = spectral_err(20)
    # Phase iteration must reduce spectral error substantially.
    assert err20 < 0.6 * err0 < 0.5
    # Dominant frequency of the reconstruction is the original tone.
    spec = np.abs(np.fft.rfft(rec[0]))
    freq = np.fft.rfftfreq(rec.shape[1], 1 / 22050)
    assert abs(freq[spec.argmax()] - 330.0) < 5.0


@pytest.mark.parametrize("f0_true", [120.0, 220.0, 350.0])
def test_f0_estimation_pure_tone(f0_true):
    fs, hop = 22050, 256
    t = np.arange(int(fs * 0.6)) / fs
    sig = 0.6 * np.sin(2 * np.pi * f0_true * t)
    f0 = estimate_f0(sig, fs, hop)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.7 * len(f0)
    med = np.median(voiced)
    assert abs(med - f0_true) / f0_true < 0.05


def test_f0_estimation_harmonic_and_silence():
    fs, hop = 22050, 256
    t = np.arange(int(fs * 0.5)) / fs
    # Harmonic-rich signal (sawtooth-ish) at 180 Hz + leading silence.
    sig = sum((0.5 / k) * np.sin(2 * np.pi * 180 * k * t) for k in range(1, 5))
    sig = np.concatenate([np.zeros(int(fs * 0.2)), sig])
    f0 = estimate_f0(sig, fs, hop)
    n_sil = int(fs * 0.2 / hop)
    assert (f0[: max(n_sil - 3, 0)] == 0).mean() > 0.8
    voiced = f0[n_sil + 3:]
    voiced = voiced[voiced > 0]
    assert len(voiced) > 0
    assert abs(np.median(voiced) - 180.0) / 180.0 < 0.05


def test_f0_frame_count_matches_pyworld_convention():
    fs, hop = 22050, 256
    x = np.zeros(fs)
    f0 = estimate_f0(x, fs, hop)
    expected = int(len(x) / fs * 1000.0 / (hop / fs * 1000.0)) + 1
    assert len(f0) == expected


def test_f0_native_backend_matches_numpy():
    """The C++ extractor (native/pitch) must agree with the numpy
    implementation: identical frame counts, identical voiced/unvoiced
    decisions (up to a few boundary frames), and voiced F0 within 1 Hz."""
    from expressive_fastspeech2_mandarin_tpu.dsp import pitch as P

    lib = P._native_lib()
    if lib is None:
        pytest.skip("native pitch library not built")
    fs, hop = 22050, 256
    rng = np.random.default_rng(0)
    t = np.arange(int(fs * 0.8)) / fs
    vib = 200.0 + 15.0 * np.sin(2 * np.pi * 3.0 * t)
    phase = 2 * np.pi * np.cumsum(vib) / fs
    sig = sum((0.4 / k) * np.sin(k * phase) for k in range(1, 4))
    sig += 0.01 * rng.normal(size=len(sig))
    sig = np.concatenate([np.zeros(int(fs * 0.1)), sig])

    frame_period = hop / fs * 1000.0
    native = P._estimate_f0_native(lib, sig, fs, frame_period, 71.0, 800.0)
    assert native is not None
    f0_np, times = P.dio(sig, fs, frame_period=frame_period)
    numpy_f0 = P.stonemask(sig, f0_np, times, fs)

    assert len(native) == len(numpy_f0)
    agree_vuv = (native > 0) == (numpy_f0 > 0)
    assert agree_vuv.mean() > 0.95
    both = (native > 0) & (numpy_f0 > 0)
    assert both.sum() > 10
    assert np.max(np.abs(native[both] - numpy_f0[both])) < 1.0
