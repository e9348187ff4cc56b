"""TPU-friendly compute primitives (XLA baseline; Pallas variants in
``ops.pallas``)."""

from .attention import multi_head_attention
from .conv import (
    batch_norm_inference,
    batch_norm_train,
    conv1d,
    conv_transpose1d,
    layer_norm,
)
from .length_regulator import frame_to_phoneme_index, length_regulate
from .masking import apply_padding_mask, mask_from_lengths

__all__ = [
    "multi_head_attention",
    "conv1d",
    "conv_transpose1d",
    "layer_norm",
    "batch_norm_inference",
    "batch_norm_train",
    "frame_to_phoneme_index",
    "length_regulate",
    "apply_padding_mask",
    "mask_from_lengths",
]
