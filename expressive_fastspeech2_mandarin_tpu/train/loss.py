"""FastSpeech2 training loss (reference: model/loss.py:5-92).

MAE on mel and postnet-mel, MSE on pitch/energy/log-duration; every term is
a *mean over valid (unmasked) elements* — the reference's ``masked_select``
followed by ``nn.L1Loss``/``nn.MSELoss`` — realized here as masked sums
divided by counts so shapes stay static under jit. Total = unweighted sum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.fastspeech2 import FastSpeech2Output


class LossReport(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    postnet_mel: jnp.ndarray
    pitch: jnp.ndarray
    energy: jnp.ndarray
    duration: jnp.ndarray


def _masked_mean_abs(pred, target, valid):
    num = jnp.sum(jnp.abs(pred - target) * valid)
    return num / jnp.maximum(jnp.sum(valid), 1.0)


def _masked_mean_sq(pred, target, valid):
    num = jnp.sum(jnp.square(pred - target) * valid)
    return num / jnp.maximum(jnp.sum(valid), 1.0)


def fastspeech2_loss(
    out: FastSpeech2Output,
    mel_targets: jnp.ndarray,       # (B, T, n_mels)
    pitch_targets: jnp.ndarray,     # (B, S) or (B, T)
    energy_targets: jnp.ndarray,
    duration_targets: jnp.ndarray,  # (B, S) int
    *,
    pitch_feature_level: str = "phoneme_level",
    energy_feature_level: str = "phoneme_level",
) -> LossReport:
    src_valid = (~out.src_masks).astype(jnp.float32)
    mel_valid = (~out.mel_masks).astype(jnp.float32)

    log_d_targets = jnp.log(duration_targets.astype(jnp.float32) + 1.0)

    p_valid = src_valid if pitch_feature_level == "phoneme_level" else mel_valid
    e_valid = src_valid if energy_feature_level == "phoneme_level" else mel_valid

    mel_t = mel_targets[:, : out.mel.shape[1], :]
    mel_valid3 = jnp.broadcast_to(mel_valid[..., None], mel_t.shape)

    mel_loss = _masked_mean_abs(out.mel, mel_t, mel_valid3)
    postnet_loss = _masked_mean_abs(out.postnet_mel, mel_t, mel_valid3)
    pitch_loss = _masked_mean_sq(out.pitch_predictions, pitch_targets, p_valid)
    energy_loss = _masked_mean_sq(out.energy_predictions, energy_targets, e_valid)
    duration_loss = _masked_mean_sq(
        out.log_duration_predictions, log_d_targets, src_valid)

    total = mel_loss + postnet_loss + duration_loss + pitch_loss + energy_loss
    return LossReport(total, mel_loss, postnet_loss, pitch_loss, energy_loss,
                      duration_loss)
