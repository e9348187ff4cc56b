"""WAV I/O + resampling without librosa/soundfile.

``load_wav`` mirrors ``librosa.load`` semantics used by the reference
(reference: preprocessor/preprocessor.py:246-249): float32 in [-1, 1],
mono-mixed, resampled to the target rate (librosa defaults to 22050).
"""

from __future__ import annotations

import numpy as np
import scipy.signal
from scipy.io import wavfile


def load_wav(path: str, sr: int | None = 22050) -> tuple[np.ndarray, int]:
    """Returns (float32 mono audio in [-1, 1], sampling_rate)."""
    file_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    if sr is not None and file_sr != sr:
        audio = resample(audio, file_sr, sr)
        file_sr = sr
    return audio, file_sr


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return audio
    g = np.gcd(int(orig_sr), int(target_sr))
    return scipy.signal.resample_poly(
        audio, target_sr // g, orig_sr // g).astype(np.float32)


def save_wav(path: str, audio: np.ndarray, sr: int,
             max_wav_value: float = 32768.0) -> None:
    """Float audio → int16 wav (reference scaling: utils/model.py:83-87)."""
    data = np.clip(audio * max_wav_value, -32768, 32767).astype(np.int16)
    wavfile.write(path, sr, data)


def peak_normalize(audio: np.ndarray, peak: float = 0.95) -> np.ndarray:
    m = np.abs(audio).max()
    return audio if m == 0 else (audio / m * peak).astype(np.float32)
