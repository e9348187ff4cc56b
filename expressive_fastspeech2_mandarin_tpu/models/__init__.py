"""Model zoo: FastSpeech2 acoustic model + HiFi-GAN vocoder."""

from .fastspeech2 import FastSpeech2, FastSpeech2Output, param_count
from .hifigan import (
    apply_generator,
    init_generator,
    load_generator_npz,
    pack_generator_params,
    save_generator_npz,
)
from .hifigan_disc import apply_mpd, apply_msd, init_mpd, init_msd
from .melgan import apply_melgan, convert_melgan, init_melgan

__all__ = [
    "save_generator_npz",
    "load_generator_npz",
    "init_mpd",
    "apply_mpd",
    "init_msd",
    "apply_msd",
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
