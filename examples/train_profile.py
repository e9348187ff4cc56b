"""Train-step per-op profile (VERDICT r4 item 3): settle the ~0.04 MFU
ceiling with data instead of assertion.

Runs the tuned recipe's step (B=32, bf16 amp, steps_per_call 10) under
``jax.profiler.trace``, parses the XPlane with tensorboard_plugin_profile,
and prints the top-K ops by self time — where the non-matmul wall time
actually goes — plus a B=32 vs B=64 device-time comparison that separates
"compute ceiling" from "host/dispatch bottleneck" for the flat B=64 row
in PERF.md's round-4 sweep.

Usage: python examples/train_profile.py [--top 25] [--batches 32 64]
Run on the TPU chip (one client at a time — do not run while training).
"""

import argparse
import glob
import json
import os
import tempfile
import time

import numpy as np


def build_step(jax, b, amp="bfloat16", spc=10):
    import jax.numpy as jnp

    from expressive_fastspeech2_mandarin_tpu.config import (
        Config,
        TrainConfig,
    )
    from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2
    from expressive_fastspeech2_mandarin_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_multi_step,
    )

    cfg = Config(train=TrainConfig(amp_dtype=amp))
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)
    state = create_train_state(params, bn_state, tx, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    s, t = 64, 500
    durations = np.full((b, s), t // s, np.int32)
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
    fn = make_train_multi_step(model, tx, cfg, spc, donate=False)
    stacked = {k: jnp.broadcast_to(jnp.asarray(v), (spc,) + v.shape)
               for k, v in batch.items()}
    stacked = jax.tree.map(jnp.copy, stacked)
    return fn, state, stacked, spc


def measure(jax, fn, state, stacked, spc, rounds=4):
    st, rep = fn(state, stacked)  # compile
    jax.block_until_ready(rep)
    t0 = time.perf_counter()
    for _ in range(rounds):
        st, rep = fn(st, stacked)
    jax.block_until_ready(rep)
    return (time.perf_counter() - t0) / (rounds * spc)


def op_table(trace_dir, top=25):
    """Top ops by self-time from the trace's XPlane (framework_op_stats)."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        return None
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats", {"tqx": "out:csv"})
    if isinstance(data, bytes):
        data = data.decode()
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--out", default="reports/train_profile")
    args = ap.parse_args()

    import jax

    from expressive_fastspeech2_mandarin_tpu.cli.common import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    os.makedirs(args.out, exist_ok=True)
    summary = {}
    for b in args.batches:
        fn, state, stacked, spc = build_step(jax, b)
        wall = measure(jax, fn, state, stacked, spc)
        # Trace 2 dispatch rounds (20 optimizer steps).
        trace_dir = tempfile.mkdtemp(prefix=f"efs2_prof_b{b}_")
        st, rep = fn(state, stacked)
        jax.block_until_ready(rep)
        with jax.profiler.trace(trace_dir):
            for _ in range(2):
                st, rep = fn(st, stacked)
            jax.block_until_ready(rep)
        csv = None
        try:
            csv = op_table(trace_dir, args.top)
        except Exception as e:
            print(f"op table parse failed: {e}")
        if csv:
            path = os.path.join(args.out, f"op_stats_b{b}.csv")
            with open(path, "w") as f:
                f.write(csv)
            print(f"wrote {path}")
        summary[f"b{b}"] = {
            "wall_ms_per_step": round(wall * 1e3, 2),
            "steps_per_s": round(1 / wall, 1),
            "samples_per_s": round(b / wall, 1),
        }
        print(b, summary[f"b{b}"], flush=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
