"""Jitted training / evaluation steps with data-parallel sharding.

One call = one optimizer step (the reference's hot loop body,
train.py:75-168): forward (train mode: dropout + batch-stats BN) → loss →
grad → clip → Adam+Noam update. Under a multi-device mesh the batch arrives
sharded on the ``data`` axis and jit inserts the gradient all-reduce over
ICI automatically; the loss means are *global* means because masked
reductions divide by the global valid count.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.fastspeech2 import FastSpeech2
from .loss import LossReport, fastspeech2_loss
from .state import TrainState

Batch = dict[str, Any]


def _mel_targets(batch: Batch) -> jnp.ndarray:
    """Recover f32 mel targets from the H2D transfer encoding: int16
    per-utterance affine quantization (keys mel_scale/mel_offset present),
    bf16 cast, or plain f32 (TrainConfig.transfer_dtype)."""
    mels = batch["mels"].astype(jnp.float32)
    if "mel_scale" in batch:
        # encode: q = rint((m - lo)/scale) - 32768; offset = lo + 32768*scale
        mels = mels * batch["mel_scale"][:, None, None] \
            + batch["mel_offset"][:, None, None]
    return mels


def make_train_step(model: FastSpeech2, tx: optax.GradientTransformation,
                    cfg: Config, donate: bool = True):
    """Returns jitted ``train_step(state, batch) -> (state, LossReport)``.

    ``batch`` arrays: speakers/emotions/arousals/valences (B,), texts (B,S),
    src_lens (B,), mels (B,T,80), mel_lens (B,), pitches, energies,
    durations. S and T are static bucket sizes.
    """
    p_level = cfg.preprocess.pitch.feature
    e_level = cfg.preprocess.energy.feature
    amp = jnp.dtype(cfg.train.amp_dtype)

    def loss_fn(params, bn_state, batch, rng):
        # Mixed precision (TrainConfig.amp_dtype): master params stay f32 in
        # the state; the forward/backward runs on a bf16 cast (the cast's
        # transpose accumulates grads back to f32). Positional tables follow
        # the param dtype inside apply; attention/LN/BN statistics stay f32.
        if amp != jnp.float32:
            params = jax.tree.map(
                lambda x: x.astype(amp)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        # Mel targets may arrive quantized (cfg.train.transfer_dtype shrinks
        # the dominant H2D transfer); loss math stays f32.
        mels = _mel_targets(batch)
        out, new_bn = model.apply(
            params, bn_state,
            batch["speakers"], batch["emotions"], batch["arousals"],
            batch["valences"], batch["texts"], batch["src_lens"],
            max_mel_len=mels.shape[1],
            mel_lens=batch["mel_lens"],
            p_targets=batch["pitches"],
            e_targets=batch["energies"],
            d_targets=batch["durations"],
            deterministic=False,
            rng=rng,
        )
        report = fastspeech2_loss(
            out, mels, batch["pitches"], batch["energies"],
            batch["durations"],
            pitch_feature_level=p_level, energy_feature_level=e_level)
        return report.total, (report, new_bn)

    def train_step(state: TrainState, batch: Batch):
        rng, step_rng = jax.random.split(state.rng)
        grads, (report, new_bn) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.bn_state, batch, step_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt, bn_state=new_bn,
            step=state.step + 1, rng=rng)
        return new_state, report

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_train_multi_step(model: FastSpeech2,
                          tx: optax.GradientTransformation, cfg: Config,
                          n_steps: int, donate: bool = True):
    """Returns jitted ``multi_step(state, batches) -> (state, LossReport)``
    running ``n_steps`` optimizer steps on-device via ``lax.scan``.

    ``batches`` is a train-step batch with a leading (n_steps, ...) axis on
    every array. One host dispatch covers the whole chunk, so per-step host
    round-trip latency (dominant on remote-attached TPUs; the reference's
    per-batch Python loop at train.py:75-168 pays it every step) is
    amortized n_steps×. The returned report holds the *mean* losses of the
    chunk.
    """
    single = make_train_step(model, tx, cfg, donate=False)

    def multi_step(state: TrainState, batches: Batch):
        def body(carry, batch):
            new_state, report = single(carry, batch)
            return new_state, report

        state, reports = jax.lax.scan(body, state, batches)
        mean_report = jax.tree.map(lambda x: jnp.mean(x, axis=0), reports)
        return state, mean_report

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: FastSpeech2, cfg: Config):
    """Teacher-forced eval forward + loss (reference: evaluate.py:38-49)."""
    p_level = cfg.preprocess.pitch.feature
    e_level = cfg.preprocess.energy.feature

    @jax.jit
    def eval_step(params, bn_state, batch) -> LossReport:
        mels = _mel_targets(batch)  # see TrainConfig.transfer_dtype
        out, _ = model.apply(
            params, bn_state,
            batch["speakers"], batch["emotions"], batch["arousals"],
            batch["valences"], batch["texts"], batch["src_lens"],
            max_mel_len=mels.shape[1],
            mel_lens=batch["mel_lens"],
            p_targets=batch["pitches"],
            e_targets=batch["energies"],
            d_targets=batch["durations"],
            deterministic=True,
        )
        return fastspeech2_loss(
            out, mels, batch["pitches"], batch["energies"],
            batch["durations"],
            pitch_feature_level=p_level, energy_feature_level=e_level)

    return eval_step


def make_synth_step(model: FastSpeech2, cfg: Config, max_mel_len: int,
                    p_control: float = 1.0, e_control: float = 1.0,
                    d_control: float = 1.0):
    """Free-running inference forward (mel synthesis)."""

    @partial(jax.jit, static_argnames=())
    def synth_step(params, bn_state, batch):
        out, _ = model.apply(
            params, bn_state,
            batch["speakers"], batch["emotions"], batch["arousals"],
            batch["valences"], batch["texts"], batch["src_lens"],
            max_mel_len=max_mel_len,
            p_control=p_control, e_control=e_control, d_control=d_control,
            deterministic=True,
        )
        return out.postnet_mel, out.mel_lens, out.durations_rounded

    return synth_step
