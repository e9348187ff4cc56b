"""Evaluation CLI: full-val-set teacher-forced loss means
(reference: evaluate.py:18-119)."""

from __future__ import annotations

import argparse

from .common import add_config_args, config_from_args


def main() -> None:
    ap = argparse.ArgumentParser(prog="efs2-evaluate")
    add_config_args(ap)
    ap.add_argument("--restore_step", type=int, default=None)
    args = ap.parse_args()

    import jax

    from ..data import BucketedDataset, PreprocessedCorpus
    from ..models import FastSpeech2
    from ..parallel.mesh import mesh_for_batch
    from ..train import CheckpointManager, create_train_state, make_optimizer
    from ..train.loop import evaluate as run_eval
    from ..train.step import make_eval_step

    cfg = config_from_args(args)
    corpus = PreprocessedCorpus(cfg.preprocess.path.preprocessed_path)
    model = FastSpeech2(cfg.model, cfg.preprocess, corpus.stats)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.train.optimizer,
                        cfg.model.transformer.encoder_hidden)
    state = create_train_state(params, bn_state, tx, jax.random.PRNGKey(1))
    ckpt = CheckpointManager(cfg.train.path.ckpt_path or "output/ckpt")
    state = ckpt.restore(state, args.restore_step)

    val_ds = BucketedDataset(corpus, "val.txt", cfg.train.optimizer.batch_size,
                             cfg.train.buckets, cfg.model.max_seq_len)
    mesh = mesh_for_batch(cfg.train.optimizer.batch_size)
    losses = run_eval(make_eval_step(model, cfg), state, val_ds, mesh)
    print(f"Validation at step {int(state.step)}: " + ", ".join(
        f"{k}={v:.4f}" for k, v in losses.items()))


if __name__ == "__main__":
    main()
