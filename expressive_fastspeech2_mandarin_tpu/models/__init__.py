"""Model zoo: FastSpeech2 acoustic model + HiFi-GAN vocoder."""

from .fastspeech2 import FastSpeech2, FastSpeech2Output, param_count
from .hifigan import apply_generator, init_generator

__all__ = [
    "FastSpeech2",
    "FastSpeech2Output",
    "param_count",
    "init_generator",
    "apply_generator",
]
