"""End-to-end pipeline driver: corpus prep → alignment → feature extraction
→ training (reference: train_pinyin_pipeline.py:30-150's orchestration, with
the native aligner instead of batched MFA subprocesses).

Each stage is skipped if its outputs already exist (resume semantics mirror
the reference pipeline's tolerance of partial completion).
"""

from __future__ import annotations

import argparse
import os

from .common import add_config_args, config_from_args


def main() -> None:
    ap = argparse.ArgumentParser(prog="efs2-pipeline")
    add_config_args(ap)
    ap.add_argument("--esd-root", default=None,
                    help="raw ESD dataset (skip if raw_path already prepared)")
    ap.add_argument("--total_steps", type=int, default=None)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--align-iters", type=int, default=8)
    ap.add_argument("--lexicon", default=None,
                    help="MFA-format pronunciation dictionary for the "
                         "aligner (default: cfg.path.lexicon_path if it "
                         "exists, else the built-in pinyin decomposition)")
    args = ap.parse_args()

    cfg = config_from_args(args)
    raw = cfg.preprocess.path.raw_path
    pre = cfg.preprocess.path.preprocessed_path
    tg_dir = os.path.join(pre, "TextGrid")

    # Stage 1: corpus prep.
    if args.esd_root and not os.path.exists(os.path.join(raw, "filelist.txt")):
        from ..preprocess import prepare_esd

        print("[1/4] preparing ESD corpus ...")
        prepare_esd(args.esd_root, raw,
                    sampling_rate=cfg.preprocess.audio.sampling_rate)
    else:
        print("[1/4] corpus prep: skipped (already prepared)")

    # Stage 2: forced alignment.
    if not os.path.isdir(tg_dir) or not os.listdir(tg_dir):
        from ..align import align_corpus

        lexicon = args.lexicon
        if lexicon is None and os.path.exists(
                cfg.preprocess.path.lexicon_path):
            lexicon = cfg.preprocess.path.lexicon_path
        print("[2/4] forced alignment (native aligner) ...")
        log = align_corpus(raw, tg_dir,
                           model_path=os.path.join(pre, "acoustic_model.bin"),
                           iters=args.align_iters, lexicon=lexicon)
        print(log.strip().splitlines()[-1])
    else:
        print("[2/4] alignment: skipped (TextGrids present)")

    # Stage 3: feature extraction — in a subprocess so its CPU-pinned JAX
    # doesn't preclude TPU training in stage 4 (a process can't switch
    # backends after init).
    if not os.path.exists(os.path.join(pre, "train.txt")):
        import subprocess
        import sys

        print("[3/4] feature extraction ...")
        subprocess.run(
            [sys.executable, "-m",
             "expressive_fastspeech2_mandarin_tpu.cli.preprocess", "features",
             "-p", args.preprocess_config, "-m", args.model_config,
             "-t", args.train_config],
            check=True)
    else:
        print("[3/4] features: skipped (train.txt present)")

    # Stage 4: training.
    if not args.skip_train:
        from ..train.loop import train

        print("[4/4] training ...")
        train(cfg, total_steps=args.total_steps)
    else:
        print("[4/4] training: skipped")


if __name__ == "__main__":
    main()
