"""Offline preprocessing: corpus prep, TextGrid I/O, feature extraction."""

from .aihub_mmv import create_dataset as create_aihub_dataset
from .aihub_mmv import extract_audio as extract_aihub_audio
from .aihub_mmv import prepare_aihub_mmv
from .esd import EMOTION_AROUSAL_VALENCE, prepare_esd
from .iemocap import prepare_iemocap
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
    "prepare_iemocap",
    "prepare_aihub_mmv",
    "create_aihub_dataset",
    "extract_aihub_audio",
    "EMOTION_AROUSAL_VALENCE",
]
