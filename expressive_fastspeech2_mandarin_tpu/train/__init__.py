"""Training subsystem: loss, LR schedule, train/eval steps, checkpointing."""

from .loss import LossReport, fastspeech2_loss
from .schedule import make_optimizer, noam_schedule
from .state import CheckpointManager, TrainState, create_train_state
from .step import (
    make_eval_step,
    make_synth_step,
    make_train_multi_step,
    make_train_step,
)
from .vocoder import (
    SegmentSampler,
    VocoderTrainState,
    init_vocoder_train_state,
    make_vocoder_multi_step,
    make_vocoder_train_step,
    train_vocoder,
)

__all__ = [
    "VocoderTrainState",
    "init_vocoder_train_state",
    "make_vocoder_train_step",
    "make_vocoder_multi_step",
    "SegmentSampler",
    "train_vocoder",
    "LossReport",
    "fastspeech2_loss",
    "noam_schedule",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "CheckpointManager",
    "make_train_step",
    "make_train_multi_step",
    "make_eval_step",
    "make_synth_step",
]
