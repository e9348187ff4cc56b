"""Signal processing: mel-STFT features, Griffin-Lim, F0 estimation."""

from .mel import mel_filterbank
from .pitch import dio, estimate_f0, stonemask
from .stft import MelSTFT, hann_window

__all__ = [
    "mel_filterbank",
    "MelSTFT",
    "hann_window",
    "dio",
    "stonemask",
    "estimate_f0",
]
