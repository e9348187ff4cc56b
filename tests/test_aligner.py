"""Native C++ aligner end-to-end test: build, train+align a synthetic
corpus with known boundaries, verify TextGrids + accuracy."""

import json
import os
import shutil

import numpy as np
import pytest

from expressive_fastspeech2_mandarin_tpu.preprocess import read_textgrid
from expressive_fastspeech2_mandarin_tpu.utils.wav import save_wav

SR = 16000
FREQ = {"b": 300, "a": 800, "n": 400, "h": 1800, "ao": 600}


def _render(rng, phones, durs):
    parts = [np.zeros(int(SR * 0.08))]
    for p, d in zip(phones, durs):
        t = np.arange(int(SR * d)) / SR
        f = FREQ[p]
        sig = (0.4 * np.sin(2 * np.pi * f * t)
               + 0.2 * np.sin(2 * np.pi * 2.1 * f * t)
               + 0.01 * rng.standard_normal(len(t)))
        env = np.minimum(1, np.minimum(np.arange(len(t)) / 400,
                                       (len(t) - np.arange(len(t))) / 400))
        parts.append(sig * env)
    parts.append(np.zeros(int(SR * 0.08)))
    return np.concatenate(parts).astype(np.float32)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_aligner_end_to_end(tmp_path):
    from expressive_fastspeech2_mandarin_tpu.align import (
        align_corpus,
        ensure_built,
    )

    ensure_built()

    rng = np.random.default_rng(0)
    corpus = tmp_path / "corpus" / "0001"
    os.makedirs(corpus)
    truth = {}
    for i in range(30):
        words = [("b", "a", "n"), ("h", "ao")]
        phones = [p for w in words for p in w]
        durs = rng.uniform(0.08, 0.2, len(phones))
        wav = _render(rng, phones, durs)
        base = f"0001_{i:06d}"
        save_wav(str(corpus / f"{base}.wav"), wav, SR)
        with open(corpus / f"{base}.lab", "w") as f:
            f.write("ban hao\n")
        t0, bounds = 0.08, []
        for p, d in zip(phones, durs):
            bounds.append((p, t0, t0 + d))
            t0 += d
        truth[base] = bounds

    model_path = str(tmp_path / "am.bin")
    log = align_corpus(str(tmp_path / "corpus"), str(tmp_path / "tg"),
                       model_path=model_path, iters=6, threads=2)
    assert "aligned 30 utterances" in log
    assert os.path.exists(model_path)

    errs = []
    for base, bounds in truth.items():
        tg = read_textgrid(str(tmp_path / "tg" / "0001" / f"{base}.TextGrid"))
        tier = tg.get_tier_by_name("phones")
        pred = [(iv.text, iv.start, iv.end) for iv in tier.intervals
                if iv.text not in ("", "sil", "sp")]
        assert [p for p, _, _ in pred] == [p for p, _, _ in bounds]
        for (_, ta, tb), (_, pa, pb) in zip(bounds, pred):
            errs += [abs(ta - pa), abs(tb - pb)]
        # MFA-parity words tier (MFA textgrid.py:344-361): one interval
        # per .lab word, spanning exactly the union of its phone spans.
        words = tg.get_tier_by_name("words")
        labeled = [(iv.text, iv.start, iv.end) for iv in words.intervals
                   if iv.text.strip()]
        assert [w for w, _, _ in labeled] == ["ban", "hao"]
        assert abs(labeled[0][1] - pred[0][1]) < 1e-6
        assert abs(labeled[0][2] - pred[2][2]) < 1e-6
        assert abs(labeled[1][1] - pred[3][1]) < 1e-6
        assert abs(labeled[1][2] - pred[4][2]) < 1e-6
    mean_err = float(np.mean(errs))
    assert mean_err < 0.04, f"mean boundary error {mean_err*1000:.1f}ms"

    # Reuse the saved model: align again without retraining.
    log2 = align_corpus(str(tmp_path / "corpus"), str(tmp_path / "tg2"),
                        model_path=model_path, threads=2)
    assert "loaded model" in log2
    assert "aligned 30 utterances" in log2


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_speaker_adaptation_pass(tmp_path):
    """The fMLLR-style second pass must run per speaker and keep boundary
    accuracy on a corpus with a strong per-speaker channel difference
    (MFA equivalent: align -> calc_fmllr -> align)."""
    from expressive_fastspeech2_mandarin_tpu.align import (
        align_corpus,
        ensure_built,
    )

    ensure_built()
    rng = np.random.default_rng(1)
    truth = {}
    for spk, gain, tilt in (("0001", 1.0, 0.0), ("0002", 0.18, 0.35)):
        corpus = tmp_path / "corpus" / spk
        os.makedirs(corpus)
        for i in range(15):
            phones = ["b", "a", "n", "h", "ao"]
            durs = rng.uniform(0.08, 0.2, len(phones))
            wav = _render(rng, phones, durs)
            # Speaker "channel": gain + mild high-pass tilt.
            if tilt:
                wav = wav - tilt * np.concatenate([[0], wav[:-1]])
            wav = (wav * gain).astype(np.float32)
            base = f"{spk}_{i:06d}"
            save_wav(str(corpus / f"{base}.wav"), wav, SR)
            with open(corpus / f"{base}.lab", "w") as f:
                f.write("ban hao\n")
            t0, bounds = 0.08, []
            for p, d in zip(phones, durs):
                bounds.append((p, t0, t0 + d))
                t0 += d
            truth[(spk, base)] = bounds

    log = align_corpus(str(tmp_path / "corpus"), str(tmp_path / "tg"),
                       iters=6, threads=2)
    assert "speaker adapt: 2 speakers" in log
    assert "aligned 30 utterances" in log
    errs = []
    for (spk, base), bounds in truth.items():
        tg = read_textgrid(str(tmp_path / "tg" / spk / f"{base}.TextGrid"))
        tier = tg.get_tier_by_name("phones")
        pred = [(iv.text, iv.start, iv.end) for iv in tier.intervals
                if iv.text not in ("", "sil", "sp")]
        assert [p for p, _, _ in pred] == [p for p, _, _ in bounds]
        for (_, ta, tb), (_, pa, pb) in zip(bounds, pred):
            errs += [abs(ta - pa), abs(tb - pb)]
    assert float(np.mean(errs)) < 0.04

    # --no-adapt must skip the pass.
    log2 = align_corpus(str(tmp_path / "corpus"), str(tmp_path / "tg2"),
                        iters=4, threads=2, speaker_adapt=False)
    assert "speaker adapt" not in log2


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_triphone_tree_splits_on_context(tmp_path):
    """Tied-state triphone stage (MFA equivalent: mono → triphone chain,
    MFA/montreal_forced_aligner/acoustic_modeling/triphone.py): on a corpus
    where the SAME phone sounds different depending on its left neighbor,
    the decision tree must split by context and alignment must stay
    accurate; the .tri sidecar model must round-trip."""
    import re

    from expressive_fastspeech2_mandarin_tpu.align import (
        align_corpus,
        ensure_built,
    )

    ensure_built()
    rng = np.random.default_rng(1)
    corpus = tmp_path / "corpus" / "0001"
    os.makedirs(corpus)
    truth = {}
    for i in range(40):
        # "ban nao": the 'a' in 'ban' (after b) vs in 'nao'... keep it
        # simple: alternate words so 'a' appears after both 'b' and 'h'.
        words = [("b", "a", "n"), ("h", "a", "n")]
        phones = [p for w in words for p in w]
        durs = rng.uniform(0.08, 0.2, len(phones))
        parts = [np.zeros(int(SR * 0.08))]
        for j, (p, d) in enumerate(zip(phones, durs)):
            t = np.arange(int(SR * d)) / SR
            f = FREQ.get(p, 500)
            if p == "a":  # context-dependent realization of 'a'
                f = 700 if phones[j - 1] == "b" else 1100
            sig = (0.4 * np.sin(2 * np.pi * f * t)
                   + 0.2 * np.sin(2 * np.pi * 2.1 * f * t)
                   + 0.01 * rng.standard_normal(len(t)))
            env = np.minimum(1, np.minimum(np.arange(len(t)) / 400,
                                           (len(t) - np.arange(len(t))) / 400))
            parts.append(sig * env)
        parts.append(np.zeros(int(SR * 0.08)))
        wav = np.concatenate(parts).astype(np.float32)
        base = f"0001_{i:06d}"
        save_wav(str(corpus / f"{base}.wav"), wav, SR)
        with open(corpus / f"{base}.lab", "w") as f:
            f.write("ban han\n")
        t0, bounds = 0.08, []
        for p, d in zip(phones, durs):
            bounds.append((p, t0, t0 + d))
            t0 += d
        truth[base] = bounds

    model_path = str(tmp_path / "am.bin")
    # triphone=True forces the tree stage (the "auto" default would pick
    # monophone here — this corpus is data-rich per state by design).
    log = align_corpus(
        str(tmp_path / "corpus"), str(tmp_path / "tg"),
        model_path=model_path, iters=6, threads=2, triphone=True,
        extra_args=["--tri-min-count", "30", "--tri-min-gain", "50"])
    m = re.search(r"triphone tree: (\d+) tied states from (\d+) roots", log)
    assert m, log
    tied, roots = int(m.group(1)), int(m.group(2))
    assert tied > roots, f"no context splits happened ({tied} vs {roots})"
    assert os.path.exists(model_path + ".tri")

    errs = []
    for base, bounds in truth.items():
        tg = read_textgrid(str(tmp_path / "tg" / "0001" / f"{base}.TextGrid"))
        tier = tg.get_tier_by_name("phones")
        pred = [(iv.text, iv.start, iv.end) for iv in tier.intervals
                if iv.text not in ("", "sil", "sp")]
        assert [p for p, _, _ in pred] == [p for p, _, _ in bounds]
        for (_, ta, tb), (_, pa, pb) in zip(bounds, pred):
            errs += [abs(ta - pa), abs(tb - pb)]
    mean_err = float(np.mean(errs))
    assert mean_err < 0.04, f"mean boundary error {mean_err*1000:.1f}ms"

    # Sidecar round-trip: re-align loads the triphone model, no retraining.
    log2 = align_corpus(str(tmp_path / "corpus"), str(tmp_path / "tg2"),
                        model_path=model_path, threads=2)
    assert "loaded triphone model" in log2
    assert "aligned 40 utterances" in log2


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_lda_stage(tmp_path):
    """Opt-in LDA feature-space stage (MFA equivalent:
    MFA/montreal_forced_aligner/acoustic_modeling/lda_trainer.py): splice
    +-3 static cepstra, project to a class-discriminant subspace, re-run
    Viterbi-EM in the projected space. Must keep boundary accuracy on the
    clean synthetic corpus and round-trip its .lda sidecar.

    Default-OFF rationale (measured, ALIGN_BENCH.md): the spliced window
    blurs boundary localization on real speech, so the shipped chain stops
    at mono->fMLLR->tri."""
    from expressive_fastspeech2_mandarin_tpu.align import (
        align_corpus,
        ensure_built,
    )

    ensure_built()
    rng = np.random.default_rng(2)
    corpus = tmp_path / "corpus" / "0001"
    os.makedirs(corpus)
    truth = {}
    for i in range(30):
        phones = ["b", "a", "n", "h", "ao"]
        durs = rng.uniform(0.08, 0.2, len(phones))
        wav = _render(rng, phones, durs)
        base = f"0001_{i:06d}"
        save_wav(str(corpus / f"{base}.wav"), wav, SR)
        with open(corpus / f"{base}.lab", "w") as f:
            f.write("ban hao\n")
        t0, bounds = 0.08, []
        for p, d in zip(phones, durs):
            bounds.append((p, t0, t0 + d))
            t0 += d
        truth[base] = bounds

    model_path = str(tmp_path / "am.bin")
    log = align_corpus(str(tmp_path / "corpus"), str(tmp_path / "tg"),
                       model_path=model_path, iters=6, threads=2,
                       extra_args=["--lda"])
    assert "lda: projected to 40 dims" in log
    assert "aligned 30 utterances" in log
    assert os.path.exists(model_path + ".lda")

    errs = []
    for base, bounds in truth.items():
        tg = read_textgrid(str(tmp_path / "tg" / "0001" / f"{base}.TextGrid"))
        tier = tg.get_tier_by_name("phones")
        pred = [(iv.text, iv.start, iv.end) for iv in tier.intervals
                if iv.text not in ("", "sil", "sp")]
        assert [p for p, _, _ in pred] == [p for p, _, _ in bounds]
        for (_, ta, tb), (_, pa, pb) in zip(bounds, pred):
            errs += [abs(ta - pa), abs(tb - pb)]
    mean_err = float(np.mean(errs))
    assert mean_err < 0.05, f"mean boundary error {mean_err*1000:.1f}ms"

    # Sidecar round-trip: aligning with the saved model must re-apply the
    # projection (GMMs live in the projected space).
    log2 = align_corpus(str(tmp_path / "corpus"), str(tmp_path / "tg2"),
                        model_path=model_path, threads=2)
    assert "loaded LDA projection (40 dims)" in log2
    assert "aligned 30 utterances" in log2


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_tri_auto_selection(tmp_path):
    """VERDICT r3 item 4: the default ``triphone="auto"`` must pick the
    stage from per-state data volume — monophone below the calibrated band
    (tiny corpora, where ALIGN_BENCH measured tri to lose), triphone inside
    it.  The band itself is calibrated in native/aligner/align_main.cc."""
    from expressive_fastspeech2_mandarin_tpu.align import (
        align_corpus,
        ensure_built,
    )

    ensure_built()
    rng = np.random.default_rng(7)

    def build(n_utts, name):
        corpus = tmp_path / name / "0001"
        os.makedirs(corpus)
        for i in range(n_utts):
            phones = ["b", "a", "n", "h", "ao"]
            durs = rng.uniform(0.08, 0.2, len(phones))
            save_wav(str(corpus / f"u{i:04d}.wav"),
                     _render(rng, phones, durs), SR)
            with open(corpus / f"u{i:04d}.lab", "w") as f:
                f.write("ban hao\n")
        return str(tmp_path / name)

    # 4 utterances: ~19 frames/state median — below the band → monophone.
    log = align_corpus(build(4, "small"), str(tmp_path / "tg_small"),
                       iters=4, threads=2)
    assert "-> monophone" in log, log
    assert "tied states" not in log

    # 16 utterances: ~75 frames/state — inside the band → triphone.
    log2 = align_corpus(build(16, "mid"), str(tmp_path / "tg_mid"),
                        iters=4, threads=2)
    assert "-> triphone" in log2, log2
    assert "triphone tree" in log2
    # Both decisions produce TextGrids for every utterance.
    assert len(os.listdir(tmp_path / "tg_small" / "0001")) == 4
    assert len(os.listdir(tmp_path / "tg_mid" / "0001")) == 16
