"""Mel-STFT feature extraction as pure JAX — the training-target DSP path.

Matches the reference TacotronSTFT numerics (reference: audio/stft.py:15-178):
reflect padding by n_fft/2, periodic Hann window, hop-strided frames,
magnitude spectra, Slaney mel projection, ``log(clamp(x, 1e-5))``
compression (audio/audio_processing.py:85-91), and energy = L2 norm of the
magnitudes over frequency (audio/stft.py:176).

The reference realizes the STFT as a CUDA conv1d against a precomputed
Fourier basis; here it is framing + rFFT, which XLA fuses and which is
mathematically identical (the conv rows are exactly cos/sin ⊙ window).

Also provides the inverse STFT and Griffin-Lim
(reference: audio/stft.py:83-122, audio/audio_processing.py:66-82).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..config import MelConfig, STFTConfig
from .mel import mel_filterbank


def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann, zero-padded centered to n_fft (reference pads with
    librosa.util.pad_center, audio/stft.py:39-43)."""
    w = scipy.signal.get_window("hann", win_length, fftbins=True)
    if n_fft > win_length:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    return w.astype(np.float32)


class MelSTFT:
    """Precomputes window + filterbank; methods are jit-friendly."""

    def __init__(self, stft: STFTConfig, mel: MelConfig, sampling_rate: int):
        self.n_fft = stft.filter_length
        self.hop = stft.hop_length
        self.win = stft.win_length
        self.sampling_rate = sampling_rate
        self.window = jnp.asarray(hann_window(self.win, self.n_fft))
        self.mel_basis = jnp.asarray(
            mel_filterbank(sampling_rate, self.n_fft, mel.n_mel_channels,
                           mel.mel_fmin, mel.mel_fmax))

    # -- forward ------------------------------------------------------------

    def frame(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T) → (B, n_frames, n_fft) reflect-padded hop-strided frames."""
        pad = self.n_fft // 2
        x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (x.shape[1] - self.n_fft) // self.hop
        idx = (jnp.arange(n_frames)[:, None] * self.hop
               + jnp.arange(self.n_fft)[None, :])
        return x[:, idx]

    def magnitude(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T) → (B, n_frames, n_fft//2+1) linear magnitude spectra."""
        frames = self.frame(audio) * self.window[None, None, :]
        spec = jnp.fft.rfft(frames, axis=-1)
        return jnp.abs(spec).astype(jnp.float32)

    def mel_energy(self, audio: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T) in [-1, 1] → (log-mel (B, T', n_mels), energy (B, T'))."""
        mag = self.magnitude(audio)
        mel = mag @ self.mel_basis.T
        mel = jnp.log(jnp.clip(mel, min=1e-5))
        energy = jnp.linalg.norm(mag, axis=-1)
        return mel, energy

    # -- inverse ------------------------------------------------------------

    @functools.cached_property
    def _win_sq(self) -> np.ndarray:
        w = hann_window(self.win, self.n_fft).astype(np.float64)
        return w ** 2

    def _window_sumsquare(self, n_frames: int) -> np.ndarray:
        n = self.n_fft + self.hop * (n_frames - 1)
        x = np.zeros(n)
        for i in range(n_frames):
            s = i * self.hop
            x[s: s + self.n_fft] += self._win_sq[: max(0, min(self.n_fft, n - s))]
        return x

    def istft(self, magnitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        """(B, T', F) magnitude+phase → (B, T) waveform (center-trimmed)."""
        n_frames = magnitude.shape[1]
        spec = magnitude * jnp.exp(1j * phase)
        frames = jnp.fft.irfft(spec, n=self.n_fft, axis=-1)
        frames = frames * self.window[None, None, :]

        n = self.n_fft + self.hop * (n_frames - 1)
        # Overlap-add via segment-sum scatter.
        idx = (jnp.arange(n_frames)[:, None] * self.hop
               + jnp.arange(self.n_fft)[None, :]).reshape(-1)
        out = jax.vmap(
            lambda fr: jnp.zeros(n).at[idx].add(fr.reshape(-1)))(frames)

        wss = self._window_sumsquare(n_frames)
        wss = np.where(wss > np.finfo(np.float32).tiny, wss, 1.0)
        out = out / jnp.asarray(wss, dtype=out.dtype)
        pad = self.n_fft // 2
        return out[:, pad: n - pad]

    def griffin_lim(self, magnitude: jnp.ndarray, n_iters: int = 30,
                    rng: jax.Array | None = None) -> jnp.ndarray:
        """(B, T', F) linear magnitudes → waveform via phase iteration."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        phase = jax.random.uniform(
            rng, magnitude.shape, minval=-np.pi, maxval=np.pi)

        def body(_, signal):
            spec = jnp.fft.rfft(
                self.frame(signal) * self.window[None, None, :], axis=-1)
            return self.istft(magnitude, jnp.angle(spec))

        signal = self.istft(magnitude, phase)
        return jax.lax.fori_loop(0, n_iters, body, signal)

    def mel_to_audio(self, log_mel: jnp.ndarray, n_iters: int = 60) -> jnp.ndarray:
        """Griffin-Lim from log-mel (reference: audio/tools.py:18-34
        'inv_mel_spec'; the reference projects back with the filterbank
        *transpose* ×1000 — here the pseudo-inverse is used instead, which
        reconstructs magnitudes at the correct scale)."""
        mel = jnp.exp(log_mel)
        mag = jnp.clip(mel @ jnp.asarray(
            np.linalg.pinv(np.asarray(self.mel_basis))).T, min=0.0)
        return self.griffin_lim(mag, n_iters=n_iters)
