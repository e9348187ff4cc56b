"""Build a REAL-AUDIO Mandarin training corpus for the end-to-end pipeline
run (VERDICT r3 item 1): real phone segments cut from the shipped recordings
(the same machinery ALIGN_BENCH tier 2 uses — singing cut at its GT
TextGrid, speech cut at a high-iteration monophone alignment), resampled to
one rate and re-concatenated into utterances with pseudo-speakers and
emotion conditioning.  Output is the exact ``raw_data`` contract that
``efs2-pipeline`` consumes unmodified (reference corpus-prep contract:
preprocessor/esd_chinese.py:240-301 — per-speaker wav+lab, 8-field
filelist.txt, speaker_info.txt), plus the aligner lexicon and a harvested
symbol-table JSON for training.

Emotion conditioning carries real acoustic signal: each emotion applies a
gain multiplier and a duration stretch (resample-based time-scale) to its
segments, so the emotion/arousal/valence embeddings have physical energy
and duration differences to learn, on top of per-speaker channel gain.

Usage: python examples/pipeline_corpus.py [--out raw_data/Pipeline-Concat-ZH]
       [--n-utts 360] [--speakers 6] [--seed 4]
"""

import argparse
import json
import os
import shutil
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SR = 22050
EDGE_SIL_S = 0.15
GAP_SIL_S = 0.10

# Emotion -> (gain multiplier, duration stretch).  The AV values are the
# ESD table (reference: synthesize_chinese_pinyin.py:281-287, replicated in
# preprocess/esd.py EMOTION_AROUSAL_VALENCE).
EMOTION_STYLE = {
    "Angry": (1.25, 0.92),
    "Happy": (1.10, 0.96),
    "Neutral": (1.00, 1.00),
    "Sad": (0.60, 1.12),
    "Surprise": (1.35, 0.90),
}


def collect_segments(work_dir: str):
    """Cut real phone segments from the shipped recordings and resample
    everything to SR.  Reuses the ALIGN_BENCH corpus machinery."""
    import align_benchmark as ab
    from expressive_fastspeech2_mandarin_tpu.utils.wav import resample

    ab.build_micro_corpora(work_dir)
    sr_sing, sing = ab.cut_segments_from_gt()
    by_rate = {sr_sing: list(sing)}
    speech = ab.cut_segments_by_alignment(
        os.path.join(work_dir, "corpus_zh"),
        os.path.join(work_dir, "tg_zh_cut"), None)
    for sr, segs in speech.items():
        by_rate.setdefault(sr, []).extend(segs)
    out = []
    for sr, segs in by_rate.items():
        for p, x in segs:
            out.append((p, resample(x, sr, SR) if sr != SR else x))
    return out


def build(out_dir: str, n_utts: int, n_speakers: int, seed: int,
          snr_db: float = 30.0, phones_per_utt=(8, 16),
          gain_jitter: float = 0.0, stretch_jitter: float = 0.0,
          dataset: str | None = None):
    from expressive_fastspeech2_mandarin_tpu.utils.wav import (
        resample,
        save_wav,
    )

    rng = np.random.default_rng(seed)
    work = os.path.join(out_dir, "_segments_work")
    segments = collect_segments(work)
    emotions = list(EMOTION_STYLE)
    dataset = dataset or os.path.basename(os.path.normpath(out_dir))
    speakers = [f"{i + 1:04d}" for i in range(n_speakers)]
    spk_gain = 0.45 + 0.25 * rng.random(n_speakers)

    from expressive_fastspeech2_mandarin_tpu.preprocess.esd import (
        EMOTION_AROUSAL_VALENCE,
    )

    filelist, phone_set = [], set()
    total_s = 0.0
    for i in range(n_utts):
        emotion = emotions[i % len(emotions)]
        spk_i = (i // len(emotions)) % n_speakers
        spk = speakers[spk_i]
        gain_mul, stretch = EMOTION_STYLE[emotion]
        n_ph = int(rng.integers(phones_per_utt[0], phones_per_utt[1] + 1))
        idx = rng.integers(0, len(segments), n_ph)
        parts = [np.zeros(int(EDGE_SIL_S * SR), np.float32)]
        labels = []
        for j, k in enumerate(idx):
            p, x = segments[k]
            st = stretch
            if stretch_jitter > 0.0:
                # Per-segment duration jitter (endurance corpus): duration
                # targets vary per instance, so the val split cannot be
                # predicted by memorizing a fixed per-phone duration.
                st *= 1.0 + rng.uniform(-stretch_jitter, stretch_jitter)
            if st != 1.0:
                # Time-stretch by resampling: emotion-dependent duration.
                x = resample(x, SR, int(round(SR * st)))
            if gain_jitter > 0.0:
                # Per-segment energy jitter, lognormal around the emotion
                # gain — same purpose for the energy/pitch targets.
                x = x * float(np.exp(rng.normal(0.0, gain_jitter)))
            parts.append(x)
            labels.append(p)
            if j + 1 < n_ph and rng.random() < 0.25:
                parts.append(np.zeros(int(GAP_SIL_S * SR), np.float32))
        parts.append(np.zeros(int(EDGE_SIL_S * SR), np.float32))
        wav = np.concatenate(parts) * (spk_gain[spk_i] * gain_mul)
        p_sig = float((wav ** 2).mean()) + 1e-12
        wav = wav + rng.normal(0, np.sqrt(p_sig / 10 ** (snr_db / 10)),
                               len(wav)).astype(np.float32)
        wav = np.clip(wav, -1.0, 1.0)

        base = f"{spk}_{i:06d}"
        spk_dir = os.path.join(out_dir, spk)
        os.makedirs(spk_dir, exist_ok=True)
        save_wav(os.path.join(spk_dir, base + ".wav"), wav, SR)
        text = " ".join(labels)
        with open(os.path.join(spk_dir, base + ".lab"), "w") as f:
            f.write(text + "\n")
        aro, val = EMOTION_AROUSAL_VALENCE[emotion]
        filelist.append("|".join([base, text, spk, dataset,
                                  "default", emotion, aro, val]))
        phone_set.update(labels)
        total_s += len(wav) / SR

    with open(os.path.join(out_dir, "filelist.txt"), "w") as f:
        f.write("\n".join(filelist) + "\n")
    with open(os.path.join(out_dir, "speaker_info.txt"), "w") as f:
        f.write("\n".join(f"{s}|unknown" for s in speakers) + "\n")
    # Identity lexicon: every "word" in the .lab files IS its phone.
    with open(os.path.join(out_dir, "identity.dict"), "w") as f:
        for p in sorted(phone_set):
            f.write(f"{p}\t{p}\n")
    # Symbol inventory harvested from the corpus labels (prefix "" mirrors
    # the bare-phone pinyin-table convention; auto-loaded by
    # text/symbols.py:_resolve_table_name wherever symbol_table= is a path).
    # Internal gap silences survive the edge trim as "sp" phones in the
    # alignment, so the silence symbols must be encodable.
    with open(os.path.join(out_dir, "symbols.json"), "w") as f:
        json.dump({"name": dataset.lower(),
                   "phonemes": sorted(phone_set | {"sp", "sil", "spn"}),
                   "prefix": ""}, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    print(f"corpus: {n_utts} utts, {n_speakers} speakers x "
          f"{len(emotions)} emotions, {total_s / 3600:.2f} h, "
          f"{len(phone_set)} phone types -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="raw_data/Pipeline-Concat-ZH")
    ap.add_argument("--n-utts", type=int, default=360)
    ap.add_argument("--speakers", type=int, default=6)
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--gain-jitter", type=float, default=0.0,
                    help="per-segment lognormal gain jitter sigma "
                         "(endurance corpus: 0.12)")
    ap.add_argument("--stretch-jitter", type=float, default=0.0,
                    help="per-segment uniform duration jitter fraction "
                         "(endurance corpus: 0.06)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    build(args.out, args.n_utts, args.speakers, args.seed,
          gain_jitter=args.gain_jitter, stretch_jitter=args.stretch_jitter)


if __name__ == "__main__":
    main()
