"""HiFi-GAN vocoder training CLI.

The reference ships the training hyperparameters (hifigan/config.json) but
no trainer and no weights (utils/model.py:63-65 expects an absent git-LFS
checkpoint); ``efs2-train-vocoder`` trains the universal generator from a
wav corpus so synthesis has a neural vocoder without external artifacts.

Output layout under --out: ``ckpt/`` (Orbax, resumable), ``metrics.jsonl``,
``generator.npz`` (folded kernels — pass as ``--vocoder_ckpt`` to
efs2-synthesize or set model.yaml ``vocoder.ckpt_path``).
"""

from __future__ import annotations

import argparse
import os

from .common import add_config_args, config_from_args


def main() -> None:
    ap = argparse.ArgumentParser(prog="efs2-train-vocoder")
    add_config_args(ap)
    ap.add_argument("--wav_dir", default=None,
                    help="wav corpus root (default: preprocess raw_path)")
    ap.add_argument("--out", default=None,
                    help="output dir (default: <ckpt_path>/../vocoder)")
    ap.add_argument("--total_steps", type=int, default=None,
                    help="override vocoder_train.total_step")
    ap.add_argument("--limit", type=int, default=None,
                    help="cap the number of wavs loaded (smoke runs)")
    ap.add_argument("--init_ckpt", default=None,
                    help="warm-start the generator for fine-tuning: a "
                         "generator.npz or a torch HiFi-GAN checkpoint")
    ap.add_argument("--gta", default=None, metavar="ACOUSTIC_CKPT_DIR",
                    help="GTA fine-tuning: export teacher-forced predicted "
                         "mels from this acoustic checkpoint (Orbax dir) "
                         "and train on (predicted mel, real wav) pairs — "
                         "the FastSpeech2+HiFi-GAN production recipe")
    ap.add_argument("--paired_gt", action="store_true",
                    help="paired mode on the preprocessed GT mels "
                         "(ablation baseline for --gta)")
    ap.add_argument("--no-packed-generator", action="store_true",
                    help="disable the packed training generator (the "
                         "measured 1.16x step win, PERF.md 'Vocoder GAN "
                         "step'); packed is the CLI default, numerics "
                         "differ from plain only by float round-off")
    args = ap.parse_args()

    cfg = config_from_args(args)
    if not args.no_packed_generator and not cfg.vocoder_train.packed_generator:
        # Production default for the CLI; the dataclass default stays False
        # so torch-oracle parity tests replicate the plain recipe exactly.
        import dataclasses

        cfg = dataclasses.replace(cfg, vocoder_train=dataclasses.replace(
            cfg.vocoder_train, packed_generator=True))
    wav_dir = args.wav_dir or cfg.preprocess.path.raw_path
    if not wav_dir or not os.path.isdir(wav_dir):
        ap.error(f"--wav_dir not found: {wav_dir!r}")
    out = args.out or os.path.join(
        os.path.dirname(cfg.train.path.ckpt_path or "output/ckpt"),
        "vocoder")

    from ..train.vocoder import load_corpus_wavs, train_vocoder

    init_params = None
    if args.init_ckpt:
        from ..synth.synthesizer import _load_vocoder

        init_params = _load_vocoder(args.init_ckpt)
    if args.gta or args.paired_gt:
        from ..train.vocoder import export_gta_mels, load_paired_corpus

        mel_dir = None
        if args.gta:
            mel_dir = os.path.join(out, "gta_mels")
            if not os.path.isdir(mel_dir) or not os.listdir(mel_dir):
                export_gta_mels(cfg, args.gta, mel_dir)
        pairs = load_paired_corpus(cfg, mel_dir=mel_dir)
        if args.limit:
            pairs = pairs[:args.limit]
        sr = cfg.preprocess.audio.sampling_rate
        print(f"vocoder training (paired{'/GTA' if args.gta else ''}): "
              f"{len(pairs)} utterances "
              f"({sum(len(w) for _m, w in pairs) / sr:.1f} s) → {out}")
        train_vocoder(cfg, None, out, total_steps=args.total_steps,
                      init_generator_params=init_params, pairs=pairs)
        return

    wavs = load_corpus_wavs(wav_dir, cfg.preprocess.audio.sampling_rate,
                            limit=args.limit)
    print(f"vocoder training: {len(wavs)} utterances "
          f"({sum(len(w) for w in wavs) / cfg.preprocess.audio.sampling_rate:.1f} s), "
          f"batch {cfg.vocoder_train.batch_size} × "
          f"{cfg.vocoder_train.segment_size} samples → {out}")
    train_vocoder(cfg, wavs, out, total_steps=args.total_steps,
                  init_generator_params=init_params)


if __name__ == "__main__":
    main()
