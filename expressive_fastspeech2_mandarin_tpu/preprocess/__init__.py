"""Offline preprocessing: corpus prep, TextGrid I/O, feature extraction."""

from .esd import EMOTION_AROUSAL_VALENCE, prepare_esd
from .preprocessor import (
    Preprocessor,
    get_alignment,
    interpolate_unvoiced,
    phoneme_average,
    remove_outlier,
)
from .textgrid import Interval, TextGrid, Tier, read_textgrid, write_textgrid

__all__ = [
    "Preprocessor",
    "get_alignment",
    "remove_outlier",
    "interpolate_unvoiced",
    "phoneme_average",
    "TextGrid",
    "Tier",
    "Interval",
    "read_textgrid",
    "write_textgrid",
    "prepare_esd",
    "EMOTION_AROUSAL_VALENCE",
]
