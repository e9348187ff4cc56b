"""Interop: PyTorch checkpoint conversion."""

from .torch_ckpt import (
    convert_fastspeech2,
    convert_hifigan,
    load_torch_state_dict,
)

__all__ = ["convert_fastspeech2", "convert_hifigan", "load_torch_state_dict"]
