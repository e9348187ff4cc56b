"""Multi-process jax.distributed worker (launched by tests/test_distributed.py).

Each OS process is one "host" of a simulated pod: CPU backend with
``--xla_force_host_platform_device_count=K`` local devices, joined into a
global mesh via ``jax.distributed.initialize``. This executes, with *real*
worker processes (modeled on the reference MFA suite's real-multiprocessing
tests, MFA/montreal_forced_aligner/utils.py:653-760 + MFA/tests/conftest.py:
77-89), the exact multi-host code paths of train():

* ``parallel/mesh.py`` ``initialize_distributed`` + global ``make_mesh``
* per-host ``BucketedDataset`` row sharding (``shard_rows=True``)
* ``shard_batch`` global-array assembly from process-local rows
* the jitted train step with XLA-inserted gradient all-reduce
* ``evaluate()`` as a cross-host collective
* (mode "train") the full ``train.loop.train`` driver incl. Orbax
  multi-process checkpointing.

Writes a JSON result {losses, eval, param_sum, ...} for the parent test to
compare across topologies.
"""

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--num-procs", type=int, default=1)
    ap.add_argument("--proc-id", type=int, default=0)
    ap.add_argument("--coord", default="127.0.0.1:9876")
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--mode", choices=("steps", "train"), default="steps")
    ap.add_argument("--steps-per-call", type=int, default=1)
    args = ap.parse_args()

    # Backend selection must precede any jax import (conftest.py does the
    # same for in-process tests; this is a fresh interpreter).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{args.local_devices}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from expressive_fastspeech2_mandarin_tpu.parallel.mesh import (
        initialize_distributed,
        make_mesh,
        replicated,
        shard_batch,
    )

    initialize_distributed(args.coord, args.num_procs, args.proc_id)
    assert jax.process_count() == args.num_procs, (
        jax.process_count(), args.num_procs)
    assert jax.device_count() == args.num_procs * args.local_devices

    from expressive_fastspeech2_mandarin_tpu.data import (
        BucketedDataset,
        PreprocessedCorpus,
    )
    from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2
    from expressive_fastspeech2_mandarin_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from expressive_fastspeech2_mandarin_tpu.train.loop import evaluate, train
    from expressive_fastspeech2_mandarin_tpu.train.step import make_eval_step

    from tests.corpus_util import tiny_train_config

    cfg = tiny_train_config(args.corpus, args.outdir,
                            batch_size=args.batch_size,
                            total_step=args.steps,
                            steps_per_call=args.steps_per_call)

    def param_sum(tree) -> float:
        return float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree_util.tree_leaves(tree)))

    if args.mode == "train":
        state = train(cfg)
        result = {
            "mode": "train",
            "process_index": jax.process_index(),
            "device_count": jax.device_count(),
            "param_sum": param_sum(state.params),
            "final_step": int(state.step),
        }
    else:
        corpus = PreprocessedCorpus(args.corpus)
        model = FastSpeech2(cfg.model, cfg.preprocess, corpus.stats)
        mesh = make_mesh()
        n_hosts = jax.process_count()
        train_ds = BucketedDataset(
            corpus, "train.txt", args.batch_size, cfg.train.buckets,
            cfg.model.max_seq_len, drop_last=True, seed=cfg.train.seed,
            num_shards=n_hosts, shard_index=jax.process_index(),
            shard_rows=True)
        val_ds = BucketedDataset(
            corpus, "val.txt", args.batch_size, cfg.train.buckets,
            cfg.model.max_seq_len, seed=cfg.train.seed,
            num_shards=n_hosts, shard_index=jax.process_index(),
            shard_rows=True)

        params, bn_state = model.init(jax.random.PRNGKey(0))
        tx = make_optimizer(cfg.train.optimizer,
                            cfg.model.transformer.encoder_hidden)
        state = create_train_state(params, bn_state, tx,
                                   jax.random.PRNGKey(1))
        if n_hosts > 1:
            state = jax.device_put(state, replicated(mesh))
        step_fn = make_train_step(model, tx, cfg)
        eval_step = make_eval_step(model, cfg)

        # Per-host feed rate (host-side pipeline alone: iterate + collate,
        # no device work) + the exact rows this host serves — the
        # feed-rate guard: a pod starves when global-batch × target
        # steps/s exceeds Σ per-host feed rates (PERF.md "Feeding the
        # chip"); rows must tile the global batch disjointly.
        import time

        rows = train_ds.host_rows(0)
        n_fed = 0
        t0 = time.perf_counter()
        for ep in range(2):
            for b in train_ds.epoch(ep):
                n_fed += b["speakers"].shape[0]
        feed_rate = n_fed / (time.perf_counter() - t0)

        # Collective evaluate at the initial (bit-identical) params: a
        # deterministic cross-topology anchor, unlike post-Adam params.
        eval0 = evaluate(eval_step, state, val_ds, mesh)

        losses = []
        done = 0
        epoch = 0
        while done < args.steps:
            for batch in train_ds.epoch(epoch):
                state, report = step_fn(state, shard_batch(mesh, batch))
                losses.append(float(report.total))
                done += 1
                if done >= args.steps:
                    break
            epoch += 1

        evals = evaluate(eval_step, state, val_ds, mesh)
        result = {
            "mode": "steps",
            "process_index": jax.process_index(),
            "device_count": jax.device_count(),
            "losses": losses,
            "eval0": eval0,
            "eval": evals,
            "param_sum": param_sum(state.params),
            "host_rows": rows,
            "feed_samples_per_s": feed_rate,
        }

    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"worker {args.proc_id}: ok", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
