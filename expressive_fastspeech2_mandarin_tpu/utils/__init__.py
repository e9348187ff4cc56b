"""Runtime utilities: wav I/O, plotting, logging."""

from .logging import TrainLogger
from .plotting import expand_by_duration, plot_mel, save_mel_plot
from .wav import load_wav, peak_normalize, resample, save_wav

__all__ = [
    "TrainLogger",
    "plot_mel",
    "save_mel_plot",
    "expand_by_duration",
    "load_wav",
    "save_wav",
    "resample",
    "peak_normalize",
]
