"""IPA alternative-pipeline CLI — harvest phone inventories from MFA
TextGrids and re-encode metadata with them.

TPU-native equivalent of the reference's IPA tooling
(reference: create_ipa_symbols.py, reprocess_with_ipa.py; SURVEY.md §2.2).

Subcommands:
  harvest  — walk a TextGrid tree, collect the phone inventory + counts,
             write a JSON inventory loadable via
             ``text.symbols.load_symbol_table`` / preprocess.yaml
  reencode — rewrite train/val metadata phones fields from TextGrids
             (``{@p1 @p2 ...}``), e.g. after switching to the IPA inventory
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="efs2-ipa")
    sub = ap.add_subparsers(dest="cmd", required=True)

    hv = sub.add_parser("harvest")
    hv.add_argument("--textgrid-dir", required=True)
    hv.add_argument("--out", default="ipa_inventory.json")
    hv.add_argument("--name", default="harvested")
    hv.add_argument("--top", type=int, default=20,
                    help="print the N most frequent phones")

    re_ = sub.add_parser("reencode")
    re_.add_argument("--metadata", required=True, nargs="+",
                     help="train.txt / val.txt files to re-encode")
    re_.add_argument("--textgrid-dir", required=True)
    re_.add_argument("--suffix", default="_ipa",
                     help="output files get this suffix before .txt")

    args = ap.parse_args()
    from ..preprocess.ipa_harvest import (
        harvest_phones,
        reencode_metadata,
        write_inventory,
    )

    if args.cmd == "harvest":
        counts = harvest_phones(args.textgrid_dir)
        data = write_inventory(counts, args.out, name=args.name)
        print(f"{len(counts)} unique phones -> {args.out}")
        for phone, n in counts.most_common(args.top):
            print(f"  {phone}: {n}")
        del data
    elif args.cmd == "reencode":
        for meta in args.metadata:
            out = (meta[:-4] if meta.endswith(".txt") else meta) + \
                args.suffix + ".txt"
            written, dropped = reencode_metadata(meta, args.textgrid_dir, out)
            print(json.dumps({"input": meta, "output": out,
                              "written": written, "dropped": dropped}))


if __name__ == "__main__":
    main()
