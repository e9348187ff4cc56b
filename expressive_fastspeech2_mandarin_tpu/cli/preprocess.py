"""Preprocess CLI: feature extraction from aligned corpus
(reference: preprocess.py + prepare_align.py + prepare_esd_data*.py).

Subcommands:
  features  — TextGrids + wavs → mel/pitch/energy/duration + metadata
  esd       — ESD dataset layout → raw_data/ (wav+lab+filelist)
"""

from __future__ import annotations

import argparse

from .common import add_config_args, config_from_args


def main() -> None:
    ap = argparse.ArgumentParser(prog="efs2-preprocess")
    sub = ap.add_subparsers(dest="cmd", required=True)

    feat = sub.add_parser("features", help="extract training features")
    add_config_args(feat)
    feat.add_argument("--num-workers", type=int, default=None)

    esd = sub.add_parser("esd", help="prepare ESD corpus into raw_data/")
    esd.add_argument("--esd-root", required=True)
    esd.add_argument("--raw-path", required=True)
    esd.add_argument("--sampling-rate", type=int, default=22050)

    args = ap.parse_args()

    # Preprocessing is CPU work; never claim the TPU.
    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.cmd == "features":
        from ..preprocess import Preprocessor

        cfg = config_from_args(args)
        pre = Preprocessor(cfg.preprocess, num_workers=args.num_workers)
        out = pre.build_from_path()
        print(f"wrote {len(out)} utterances to "
              f"{cfg.preprocess.path.preprocessed_path}")
    elif args.cmd == "esd":
        from ..preprocess import prepare_esd

        prepare_esd(args.esd_root, args.raw_path,
                    sampling_rate=args.sampling_rate)
        print(f"prepared ESD corpus at {args.raw_path}")


if __name__ == "__main__":
    main()
