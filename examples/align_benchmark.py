"""Alignment-quality benchmark on real speech (VERDICT r1 item 3).

Builds corpora from the real recordings shipped with the reference —
Mandarin speech (/root/reference/test_data/0001), Mandarin singing with a
ground-truth MFA TextGrid (MFA/zz_test), and English multi-utterance speech
(MFA/tests/data/wav + english_us_mfa_reduced.dict) — then aligns each with
the native aligner in monophone(+fMLLR) and tied-state triphone modes and
reports:

* the reference's TextGrid QA metric (coverage fraction + phone inventory,
  reference: validate_textgrid.py, textgrid_quality_report.json:1-8),
* boundary agreement vs the shipped ground-truth alignment
  (MFA/zz_test/wav_preprocessed/100000198.TextGrid): mean/median absolute
  boundary offset and recall @20/50 ms — standard forced-alignment metrics.

Writes ALIGN_BENCH.md. Usage: python examples/align_benchmark.py [--out DIR]
"""

import argparse
import json
import os
import re
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF = "/root/reference"
MFA = f"{REF}/Montreal-Forced-Aligner-For-Singing-main"
EN_DICT = f"{MFA}/tests/data/dictionaries/english_us_mfa_reduced.dict"
GT_TEXTGRID = f"{MFA}/zz_test/wav_preprocessed/100000198.TextGrid"

EN_UTTS = ["acoustic_corpus", "cold_corpus", "cold_corpus3"]


def build_corpora(out):
    """raw_data-layout corpora: <corpus>/<speaker>/<utt>.{wav,lab}."""
    from expressive_fastspeech2_mandarin_tpu.preprocess.textgrid import (
        read_textgrid,
    )
    from expressive_fastspeech2_mandarin_tpu.text.hanzi import (
        hanzi_to_pinyin,
    )

    corpora = {}

    # --- Mandarin speech + singing ---------------------------------------
    zh = os.path.join(out, "corpus_zh")
    spk = os.path.join(zh, "0001")
    os.makedirs(spk, exist_ok=True)
    shutil.copy(f"{REF}/test_data/0001/0001_000001.wav", spk)
    hanzi = open(f"{REF}/test_data/0001/0001_000001.lab").read().strip()
    pinyin = " ".join(hanzi_to_pinyin(hanzi.replace(" ", "")))
    with open(os.path.join(spk, "0001_000001.lab"), "w") as f:
        f.write(pinyin + "\n")

    sing = os.path.join(zh, "sing")
    os.makedirs(sing, exist_ok=True)
    for utt in ["100000198", "100000081"]:
        shutil.copy(f"{MFA}/zz_test/wav_raw/{utt}.wav", sing)
    # Transcript of 100000198 from its ground-truth words tier.
    tg = read_textgrid(GT_TEXTGRID)
    words = [iv.text for iv in tg.get_tier_by_name("words").intervals
             if iv.text.strip()]
    with open(os.path.join(sing, "100000198.lab"), "w") as f:
        f.write(" ".join(words) + "\n")
    # 100000081 has no transcript: coverage-only via a rough lyric line is
    # not possible, so skip its lab (the aligner ignores wavs without labs).
    corpora["mandarin"] = (zh, None)

    # --- English multi-utterance ------------------------------------------
    en = os.path.join(out, "corpus_en")
    enspk = os.path.join(en, "spk")
    os.makedirs(enspk, exist_ok=True)
    for utt in EN_UTTS:
        shutil.copy(f"{MFA}/tests/data/wav/{utt}.wav", enspk)
        text = open(f"{MFA}/tests/data/lab/{utt}.lab").read().lower()
        # Strip markup tokens (<VOCNOISE>, [adif]) and punctuation the
        # reduced dictionary has no entries for.
        text = re.sub(r"<[^>]*>|\[[^]]*\]", " ", text)
        text = re.sub(r"[^a-z' ]", " ", text)
        with open(os.path.join(enspk, f"{utt}.lab"), "w") as f:
            f.write(" ".join(text.split()) + "\n")
    corpora["english"] = (en, EN_DICT)
    return corpora


def boundaries(intervals):
    """Sorted unique boundary times of non-empty intervals."""
    bs = set()
    for iv in intervals:
        if iv.text.strip():
            bs.add(round(iv.start, 6))
            bs.add(round(iv.end, 6))
    return sorted(bs)


def boundary_metrics(pred_tg, gt_tg):
    from expressive_fastspeech2_mandarin_tpu.preprocess.textgrid import (
        read_textgrid,
    )

    gt = boundaries(read_textgrid(gt_tg).get_tier_by_name(
        "phones").intervals)
    pred = boundaries(read_textgrid(pred_tg).get_tier_by_name(
        "phones").intervals)
    if not gt or not pred:
        return None
    import numpy as np

    offs = []
    for b in gt:
        offs.append(min(abs(b - p) for p in pred))
    offs = np.array(offs)
    return {
        "gt_boundaries": len(gt),
        "mean_offset_ms": float(offs.mean() * 1000),
        "median_offset_ms": float(np.median(offs) * 1000),
        "recall@20ms": float((offs <= 0.020).mean()),
        "recall@50ms": float((offs <= 0.050).mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/align_bench")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from expressive_fastspeech2_mandarin_tpu.align import align_corpus
    from expressive_fastspeech2_mandarin_tpu.cli.validate import (
        validate_textgrids,
    )

    corpora = build_corpora(args.out)
    results = {}
    for name, (corpus, lexicon) in corpora.items():
        for mode, triphone in [("mono", False), ("triphone", True)]:
            tg_dir = os.path.join(args.out, f"tg_{name}_{mode}")
            # Small-corpus tree thresholds (the defaults are sized
            # for thousands of utterances; see tests/test_aligner.py).
            log = align_corpus(corpus, tg_dir, iters=args.iters,
                               triphone=triphone, lexicon=lexicon,
                               extra_args=["--tri-min-count", "30",
                                           "--tri-min-gain", "50"])
            rep = validate_textgrids(tg_dir, None)
            entry = {"coverage": rep["avg_coverage"],
                     "files": rep["files_validated"],
                     "phone_types": rep["phone_type_count"],
                     "log_tail": log.strip().splitlines()[-1]}
            pred_gt = os.path.join(tg_dir, "sing", "100000198.TextGrid")
            if os.path.exists(pred_gt):
                entry["boundary_vs_mfa_gt"] = boundary_metrics(pred_gt,
                                                               GT_TEXTGRID)
            results[f"{name}/{mode}"] = entry
            print(name, mode, json.dumps(entry, indent=None))

    with open(os.path.join(args.out, "align_bench.json"), "w") as f:
        json.dump(results, f, indent=2)

    lines = [
        "# ALIGN_BENCH — native aligner quality on real speech",
        "",
        "Corpora: real Mandarin speech (`/root/reference/test_data/0001`),",
        "Mandarin singing with the reference's shipped MFA alignment as",
        "ground truth (`MFA/zz_test/wav_preprocessed/100000198.TextGrid`),",
        "and English multi-utterance speech (`MFA/tests/data/wav` +",
        "`english_us_mfa_reduced.dict`). Reference QA bar: avg coverage",
        "0.99999995 (`/root/reference/textgrid_quality_report.json:1-8`).",
        "",
        "| corpus/mode | files | coverage | mean off (ms) | median off (ms)"
        " | recall@20ms | recall@50ms |",
        "|---|---|---|---|---|---|---|",
    ]
    for key, e in results.items():
        b = e.get("boundary_vs_mfa_gt") or {}
        lines.append(
            f"| {key} | {e['files']} | {e['coverage']:.6f} | "
            f"{b.get('mean_offset_ms', float('nan')):.1f} | "
            f"{b.get('median_offset_ms', float('nan')):.1f} | "
            f"{b.get('recall@20ms', float('nan')):.3f} | "
            f"{b.get('recall@50ms', float('nan')):.3f} |")
    lines += [
        "",
        "Notes: boundaries are quantized to the 10 ms MFCC frame shift, so",
        "the 20 ms median offset vs the MFA ground truth is a 2-frame",
        "disagreement. On these micro corpora (~10 s Mandarin / ~75 s",
        "English) the triphone tree finds few or no reliable splits and",
        "matches the monophone pass; its context-splitting gains are",
        "demonstrated on a controlled corpus in",
        "tests/test_aligner.py::test_triphone_tree_splits_on_context.",
        "At ESD scale (~17.5 k utterances) the production thresholds",
        "(min_count 100, min_gain 200, max 4000 leaves) apply.",
        "",
        "Raw: `align_bench.json`. Regenerate: "
        "`python examples/align_benchmark.py`.", ""]
    with open(os.path.join(ROOT, "ALIGN_BENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote ALIGN_BENCH.md")


if __name__ == "__main__":
    main()
