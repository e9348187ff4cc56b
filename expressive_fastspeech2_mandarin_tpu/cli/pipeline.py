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
    ap.add_argument("--corpus-root", default=None,
                    help="raw corpus release for stage-1 prep; the prep "
                         "module is picked from the dataset name (IEMOCAP / "
                         "AIHub-MMV / ESD*). Defaults to "
                         "cfg.path.corpus_path when that directory exists")
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
    # Speaker dirs live under raw/<sub_dir_name> (e.g. IEMOCAP "sessions",
    # AIHub "clips"; ESD uses "" = raw itself) — both the aligner and the
    # feature extractor walk that level.
    align_root = os.path.join(raw, cfg.preprocess.path.sub_dir_name)
    pre = cfg.preprocess.path.preprocessed_path
    tg_dir = os.path.join(pre, "TextGrid")

    # Stage 1: corpus prep — dispatched on the dataset name (reference:
    # prepare_align imports preprocessor.<dataset> by config,
    # prepare_data.py / preprocessor/{esd_chinese,iemocap,aihub_mmv}.py).
    corpus_root = args.corpus_root or args.esd_root
    if corpus_root is None and os.path.isdir(cfg.preprocess.path.corpus_path):
        corpus_root = cfg.preprocess.path.corpus_path
    if corpus_root and not os.path.exists(os.path.join(raw, "filelist.txt")):
        sr = cfg.preprocess.audio.sampling_rate
        name = cfg.preprocess.dataset.lower()
        print(f"[1/4] preparing corpus ({cfg.preprocess.dataset}) ...")
        if "iemocap" in name:
            from ..preprocess import prepare_iemocap

            prepare_iemocap(
                corpus_root, raw, sampling_rate=sr,
                sub_dir_name=cfg.preprocess.path.sub_dir_name or "sessions",
                fixed_text_path=cfg.preprocess.path.fixed_text_path or None,
                cleaners=cfg.preprocess.text_cleaners)
        elif "aihub" in name:
            from ..preprocess import prepare_aihub_mmv

            prepare_aihub_mmv(
                corpus_root, raw, sampling_rate=sr,
                sub_dir_name=cfg.preprocess.path.sub_dir_name or "clips",
                fixed_text_path=cfg.preprocess.path.fixed_text_path or None,
                cleaners=cfg.preprocess.text_cleaners)
        else:
            from ..preprocess import prepare_esd

            prepare_esd(corpus_root, raw, sampling_rate=sr)
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
        log = align_corpus(align_root, tg_dir,
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
