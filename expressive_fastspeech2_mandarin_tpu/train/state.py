"""Train state + Orbax checkpointing.

Checkpoint contents mirror the reference's ``{"model": ..., "optimizer":
...}`` torch saves (reference: train.py:151-161) as a pytree
{params, opt_state, bn_state, step}; restore recovers the LR-schedule
position via ``step`` exactly like the reference's ``current_step`` restore
(model/optimizer.py:19).
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
import orbax.checkpoint as ocp


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    bn_state: Any
    step: jnp.ndarray  # scalar int32
    rng: jax.Array


def create_train_state(params, bn_state, tx: optax.GradientTransformation,
                       rng: jax.Array, step: int = 0) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        bn_state=bn_state,
        step=jnp.asarray(step, jnp.int32),
        rng=rng,
    )


class CheckpointManager:
    """Thin Orbax wrapper: save every ``save_step``, keep the latest N."""

    def __init__(self, directory: str, max_to_keep: int = 10):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, example: TrainState, step: int | None = None) -> TrainState:
        step = self._mgr.latest_step() if step is None else step
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(example._asdict()))
        return TrainState(**restored)

    def restore_dict(self, example: dict, step: int | None = None) -> dict:
        """Restore an arbitrary state dict (e.g. the vocoder trainer's)."""
        step = self._mgr.latest_step() if step is None else step
        return self._mgr.restore(step, args=ocp.args.StandardRestore(example))
