"""Drive the training stack end-to-end on a synthetic batch: jitted train
step (dropout + batch-stats BN + grad clip + Adam/Noam), loss must drop.

Usage: python examples/train_demo.py [--steps 30] [--cpu]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from expressive_fastspeech2_mandarin_tpu.config import Config
    from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2
    from expressive_fastspeech2_mandarin_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    print("backend:", jax.default_backend(), len(jax.devices()), "device(s)")
    cfg = Config()
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden)
    state = create_train_state(params, bn_state, tx, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    b, s, t = 4, 64, 250
    durations = rng.integers(1, 5, (b, s)).astype(np.int32)
    batch = {
        "speakers": rng.integers(0, 10, b).astype(np.int32),
        "emotions": rng.integers(0, 5, b).astype(np.int32),
        "arousals": rng.integers(0, 5, b).astype(np.int32),
        "valences": rng.integers(0, 5, b).astype(np.int32),
        "texts": rng.integers(4, 107, (b, s)).astype(np.int32),
        "src_lens": np.full((b,), s, np.int32),
        "mels": rng.normal(-1, 1, (b, t, 80)).astype(np.float32),
        "mel_lens": durations.sum(1).astype(np.int32),
        "pitches": rng.normal(0, 1, (b, s)).astype(np.float32),
        "energies": rng.normal(0, 1, (b, s)).astype(np.float32),
        "durations": durations,
    }

    step_fn = make_train_step(model, tx, cfg, donate=False)
    t0 = time.time()
    state, report = step_fn(state, batch)
    print(f"first step (compile): {time.time()-t0:.1f}s  "
          f"total={float(report.total):.3f} mel={float(report.mel):.3f}")
    t0 = time.time()
    for i in range(args.steps - 1):
        state, report = step_fn(state, batch)
    jax.block_until_ready(report)
    dt = (time.time() - t0) / max(args.steps - 1, 1)
    print(f"final: total={float(report.total):.3f} mel={float(report.mel):.3f} "
          f"dur={float(report.duration):.3f} @ step {int(state.step)}")
    print(f"steady-state: {dt*1000:.0f} ms/step (batch {b}) = {1/dt:.2f} steps/s")


if __name__ == "__main__":
    main()
