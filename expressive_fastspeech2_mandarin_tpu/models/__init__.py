"""Model zoo: FastSpeech2 acoustic model + HiFi-GAN vocoder."""

from .fastspeech2 import FastSpeech2, FastSpeech2Output, param_count
from .hifigan import apply_generator, init_generator, pack_generator_params
from .melgan import apply_melgan, convert_melgan, init_melgan

__all__ = [
    "FastSpeech2",
    "FastSpeech2Output",
    "param_count",
    "init_generator",
    "apply_generator",
    "pack_generator_params",
    "init_melgan",
    "apply_melgan",
    "convert_melgan",
]
