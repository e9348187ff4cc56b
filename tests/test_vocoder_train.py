"""HiFi-GAN vocoder training subsystem.

Covers: MPD/MSD numerics vs a torch oracle built to the published HiFi-GAN
V1 architecture (the reference ships only its training hyperparameters,
hifigan/config.json — no discriminator code to cite), the period-axis→batch
folding trick, weight-norm fold equivalence, frame-exact segment windows
vs the full-utterance mel, npz round-trip, and the GAN train step itself
(single vs lax.scan multi-step equality, loss decrease on an overfit
smoke).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from expressive_fastspeech2_mandarin_tpu.config import (
    AudioConfig,
    Config,
    ModelConfig,
    PreprocessConfig,
    STFTConfig,
    VocoderConfig,
    VocoderTrainConfig,
)
from expressive_fastspeech2_mandarin_tpu.dsp.stft import MelSTFT
from expressive_fastspeech2_mandarin_tpu.models.hifigan import (
    apply_generator,
    init_generator,
    load_generator_npz,
    save_generator_npz,
)
from expressive_fastspeech2_mandarin_tpu.models.hifigan_disc import (
    _apply_mpd_sub,
    _apply_msd_sub,
    _avg_pool,
    apply_mpd,
    apply_msd,
    fold_weight_norm,
    generator_weight_norm,
    init_mpd,
    init_msd,
    wn_kernel,
)
from expressive_fastspeech2_mandarin_tpu.train.vocoder import (
    SegmentSampler,
    VocoderTrainState,
    context_samples,
    init_vocoder_train_state,
    logmel_from_context,
    make_vocoder_multi_step,
    make_vocoder_train_step,
)


def tiny_cfg(**vt_overrides) -> Config:
    """Shrunken end-to-end vocoder-training config (hop 64 = prod(ups))."""
    vt = dict(batch_size=2, segment_size=1024, mpd_periods=(2, 3),
              msd_scales=2, steps_per_call=1, lr_decay_steps=10)
    vt.update(vt_overrides)
    return Config(
        preprocess=PreprocessConfig(
            audio=AudioConfig(sampling_rate=16000),
            stft=STFTConfig(filter_length=256, hop_length=64,
                            win_length=256)),
        model=ModelConfig(vocoder=VocoderConfig(
            upsample_rates=(4, 4, 2, 2),
            upsample_kernel_sizes=(8, 8, 4, 4),
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 2),))),
        vocoder_train=VocoderTrainConfig(**vt))


# ---------------------------------------------------------------------------
# Discriminator numerics vs torch oracle


def _torch_weight(wn_params, transposed=False):
    """Folded kernel (K, Cin, Cout) → torch Conv layout (Cout, Cin, K)."""
    import torch

    k = np.asarray(wn_kernel(wn_params, transposed=transposed))
    return torch.from_numpy(np.ascontiguousarray(k.transpose(2, 1, 0)))


def test_mpd_matches_torch_oracle():
    """Period-axis→batch folding is exact vs torch Conv2d((5,1),(3,1))."""
    import torch
    import torch.nn.functional as F

    period = 3
    rng = np.random.default_rng(0)
    sub = init_mpd(jax.random.PRNGKey(0), periods=(period,))["subs"][0]
    wav = rng.normal(0, 0.3, (2, 1000)).astype(np.float32)

    logits, fmaps = _apply_mpd_sub(sub, jnp.asarray(wav), period)

    x = torch.from_numpy(wav)[:, None, :]  # (B, 1, T)
    n_pad = (-1000) % period
    x = F.pad(x, (0, n_pad), "reflect")
    b, _, t = x.shape
    x = x.view(b, 1, t // period, period)
    t_fmaps = []
    for i, c in enumerate(sub["convs"]):
        w = _torch_weight(c)[:, :, :, None]  # (Cout, Cin, K, 1)
        stride = (3, 1) if i < 4 else (1, 1)
        x = F.conv2d(x, w, torch.from_numpy(np.asarray(c["bias"])),
                     stride=stride, padding=(2, 0))
        x = F.leaky_relu(x, 0.1)
        t_fmaps.append(x)
    w = _torch_weight(sub["conv_post"])[:, :, :, None]
    x = F.conv2d(x, w, torch.from_numpy(np.asarray(sub["conv_post"]["bias"])),
                 padding=(1, 0))
    t_fmaps.append(x)
    t_logits = torch.flatten(x, 1, -1)

    assert logits.shape == tuple(t_logits.shape)
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               atol=2e-5)
    for ours, theirs in zip(fmaps, t_fmaps):
        # ours: (B·p, T/p, C) → torch (B, C, T/p, p)
        th = theirs.numpy()
        b2, c2, t2, p2 = th.shape
        ours_np = np.asarray(ours).reshape(b2, p2, t2, c2)
        np.testing.assert_allclose(
            ours_np.transpose(0, 3, 2, 1), th, atol=2e-5)


def test_msd_matches_torch_oracle():
    """Grouped strided 1-D convs + AvgPool1d(4,2,2) scales vs torch."""
    import torch
    import torch.nn.functional as F

    from expressive_fastspeech2_mandarin_tpu.models.hifigan_disc import (
        _MSD_CONVS,
    )

    rng = np.random.default_rng(1)
    params = init_msd(jax.random.PRNGKey(1), n_scales=2)
    wav = rng.normal(0, 0.3, (2, 1024)).astype(np.float32)

    logits, fmaps = apply_msd(params, jnp.asarray(wav))

    x0 = torch.from_numpy(wav)[:, None, :]
    pool = torch.nn.AvgPool1d(4, 2, padding=2)
    for scale, sub in enumerate(params["subs"]):
        x = x0 if scale == 0 else pool(x0)
        for c, (_ci, _co, k, stride, groups) in zip(sub["convs"], _MSD_CONVS):
            x = F.conv1d(x, _torch_weight(c),
                         torch.from_numpy(np.asarray(c["bias"])),
                         stride=stride, padding=(k - 1) // 2, groups=groups)
            x = F.leaky_relu(x, 0.1)
        x = F.conv1d(x, _torch_weight(sub["conv_post"]),
                     torch.from_numpy(np.asarray(sub["conv_post"]["bias"])),
                     padding=1)
        t_logits = torch.flatten(x, 1, -1)
        assert logits[scale].shape == tuple(t_logits.shape)
        np.testing.assert_allclose(np.asarray(logits[scale]),
                                   t_logits.numpy(), atol=3e-5)


def test_avg_pool_matches_torch():
    import torch

    wav = np.random.default_rng(2).normal(size=(3, 333)).astype(np.float32)
    ours = np.asarray(_avg_pool(jnp.asarray(wav)))
    theirs = torch.nn.AvgPool1d(4, 2, padding=2)(
        torch.from_numpy(wav)[:, None, :])[:, 0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


# ---------------------------------------------------------------------------
# Weight norm


def test_weight_norm_fold_roundtrip():
    """wn(init) folds back to the original kernels; after scaling g the
    folded kernel direction is unchanged and magnitude follows g."""
    cfg = tiny_cfg()
    gen = init_generator(jax.random.PRNGKey(0), cfg.model.vocoder)
    wn = generator_weight_norm(gen)
    folded = fold_weight_norm(wn)
    np.testing.assert_allclose(np.asarray(folded["conv_pre"]["kernel"]),
                               np.asarray(gen["conv_pre"]["kernel"]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(folded["ups"][0]["kernel"]),
        np.asarray(gen["ups"][0]["kernel"]), rtol=1e-6)

    wn2 = jax.tree.map(lambda x: x, wn)
    wn2["conv_pre"]["g"] = 2.0 * wn2["conv_pre"]["g"]
    folded2 = fold_weight_norm(wn2)
    np.testing.assert_allclose(
        np.asarray(folded2["conv_pre"]["kernel"]),
        2.0 * np.asarray(gen["conv_pre"]["kernel"]), rtol=1e-5)

    # Folded params drive the standard generator unchanged.
    mel = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 8, 80)).astype(np.float32))
    wav = apply_generator(folded, mel, cfg.model.vocoder, fast=False)
    assert wav.shape == (1, 8 * 64)
    assert np.isfinite(np.asarray(wav)).all()


def test_generator_npz_roundtrip(tmp_path):
    cfg = tiny_cfg()
    gen = init_generator(jax.random.PRNGKey(3), cfg.model.vocoder)
    path = str(tmp_path / "generator.npz")
    save_generator_npz(path, gen)
    back = load_generator_npz(path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        gen, back)
    mel = jnp.asarray(np.zeros((1, 4, 80), np.float32))
    np.testing.assert_array_equal(
        np.asarray(apply_generator(gen, mel, cfg.model.vocoder, fast=False)),
        np.asarray(apply_generator(back, mel, cfg.model.vocoder,
                                   fast=False)))


# ---------------------------------------------------------------------------
# Frame-exact segment windows


def test_context_window_mel_matches_full_utterance():
    """logmel_from_context rows == the full-utterance MelSTFT rows at the
    sampled frame offset (the property that makes vocoder training
    consistent with the preprocessor's mels)."""
    cfg = tiny_cfg()
    pre = cfg.preprocess
    stft = MelSTFT(pre.stft, pre.mel, pre.audio.sampling_rate)
    rng = np.random.default_rng(4)
    wav = rng.normal(0, 0.3, 5000).astype(np.float32)

    full_mel, _ = stft.mel_energy(jnp.asarray(wav)[None])
    half = pre.stft.filter_length // 2
    padded = np.pad(wav, (half, half), mode="reflect")
    ctx = context_samples(cfg)
    n_frames = cfg.vocoder_train.segment_size // pre.stft.hop_length
    for f in (0, 7, 31):
        window = jnp.asarray(padded[None, f * 64: f * 64 + ctx])
        mel = logmel_from_context(window, stft, n_frames)
        np.testing.assert_allclose(
            np.asarray(mel[0]), np.asarray(full_mel[0, f: f + n_frames]),
            atol=1e-5)
        # and the target slice is the original waveform
        np.testing.assert_array_equal(
            np.asarray(window[0, half: half + 1024]),
            wav[f * 64: f * 64 + 1024])


def test_segment_sampler_shapes_and_short_utterances():
    cfg = tiny_cfg()
    wavs = [np.zeros(300, np.float32),  # shorter than one segment
            np.random.default_rng(0).normal(
                size=4000).astype(np.float32)]
    s = SegmentSampler(cfg, wavs, seed=0)
    batch = s.sample(4)
    assert batch.shape == (4, context_samples(cfg))
    assert np.isfinite(batch).all()


# ---------------------------------------------------------------------------
# Train step


@pytest.fixture(scope="module")
def trained_pair():
    """Run a few steps once; reused by several assertions below."""
    cfg = tiny_cfg()
    state = init_vocoder_train_state(cfg)
    step = make_vocoder_train_step(cfg, donate=False)
    rng = np.random.default_rng(5)
    t = np.arange(4000) / 16000
    wavs = [(0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.normal(size=4000)).astype(np.float32)
            for _ in range(3)]
    sampler = SegmentSampler(cfg, wavs, seed=1)
    ctx = jnp.asarray(sampler.sample(cfg.vocoder_train.batch_size))
    reports = []
    for _ in range(3):
        state, report = step(state, ctx)
        reports.append(report)
    return cfg, state, ctx, reports


def test_train_step_runs_and_counts(trained_pair):
    cfg, state, ctx, reports = trained_pair
    assert int(state.step) == 3
    for r in reports:
        for v in r._asdict().values():
            assert np.isfinite(np.asarray(v)).all()
    # fixed batch, 3 updates: the generator should be fitting it
    assert float(reports[-1].mel_l1) < float(reports[0].mel_l1)


def test_multi_step_equals_singles(trained_pair):
    """lax.scan chunking is the same computation as sequential singles."""
    cfg, _state, ctx, _reports = trained_pair
    s1 = init_vocoder_train_state(cfg)
    step = make_vocoder_train_step(cfg, donate=False)
    s1, r1 = step(s1, ctx)
    s1, r2 = step(s1, ctx)

    s2 = init_vocoder_train_state(cfg)
    multi = make_vocoder_multi_step(cfg, 2)
    stacked = jnp.broadcast_to(ctx, (2,) + ctx.shape)
    s2, rm = multi(s2, stacked)

    assert int(s2.step) == int(s1.step) == 2
    np.testing.assert_allclose(
        float(rm.mel_l1), (float(r1.mel_l1) + float(r2.mel_l1)) / 2,
        rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        s1.gen, s2.gen)


def test_train_vocoder_loop_and_export(tmp_path):
    """The driver loop: metrics.jsonl, Orbax ckpt, generator.npz export
    loadable by the Synthesizer's npz path."""
    from expressive_fastspeech2_mandarin_tpu.train.vocoder import (
        train_vocoder,
    )

    cfg = tiny_cfg(total_step=2, log_step=1, save_step=2)
    rng = np.random.default_rng(6)
    wavs = [rng.normal(0, 0.2, 3000).astype(np.float32) for _ in range(2)]
    out = str(tmp_path / "voc")
    state = train_vocoder(cfg, wavs, out, log=lambda *_: None)
    assert int(state.step) == 2
    assert (tmp_path / "voc" / "metrics.jsonl").exists()
    gen = load_generator_npz(str(tmp_path / "voc" / "generator.npz"))
    mel = jnp.asarray(np.zeros((1, 4, 80), np.float32))
    wav = apply_generator(gen, mel, cfg.model.vocoder, fast=False)
    assert wav.shape == (1, 256)


# ---------------------------------------------------------------------------
# Data parallelism


def test_vocoder_dp_matches_single_device():
    """The GAN step under an 8-device data-sharded mesh reproduces the
    1-device loss trajectory (jit inserts the gradient all-reduces for
    both optimizers; the step itself is deterministic)."""
    from expressive_fastspeech2_mandarin_tpu.parallel import make_mesh
    from expressive_fastspeech2_mandarin_tpu.parallel.mesh import (
        data_sharding,
    )

    cfg = tiny_cfg(batch_size=8, segment_size=512, mpd_periods=(2,),
                   msd_scales=1)
    state0 = init_vocoder_train_state(cfg)
    step = make_vocoder_train_step(cfg, donate=False)
    rng = np.random.default_rng(7)
    wavs = [rng.normal(0, 0.2, 2500).astype(np.float32) for _ in range(3)]
    ctx_np = SegmentSampler(cfg, wavs, seed=2).sample(8)

    def run(mesh, steps=2):
        state = jax.device_put(state0)
        ctx = jax.device_put(ctx_np, data_sharding(mesh))
        out = []
        for _ in range(steps):
            state, report = step(state, ctx)
            out.append((float(report.gen_total), float(report.disc),
                        float(report.mel_l1)))
        return out

    r1 = run(make_mesh(devices=jax.devices()[:1]))
    r8 = run(make_mesh(devices=jax.devices()))
    np.testing.assert_allclose(r1, r8, rtol=2e-4, atol=1e-5)


def test_finetune_init_from_folded_params():
    """Warm-starting from folded kernels reproduces them exactly after
    weight-norm fold (the --init_ckpt fine-tuning path)."""
    cfg = tiny_cfg()
    gen = init_generator(jax.random.PRNGKey(9), cfg.model.vocoder)
    state = init_vocoder_train_state(cfg, init_generator_params=gen)
    refolded = fold_weight_norm(state.gen)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        gen, refolded)


def test_validate_vocoder_copysynth(tmp_path):
    """efs2-validate vocoder: copy-synthesis round-trip on a tiny config."""
    from expressive_fastspeech2_mandarin_tpu.cli.validate import (
        validate_vocoder,
    )
    from expressive_fastspeech2_mandarin_tpu.utils.wav import save_wav

    cfg = tiny_cfg()
    gen = init_generator(jax.random.PRNGKey(11), cfg.model.vocoder)
    npz = str(tmp_path / "generator.npz")
    save_generator_npz(npz, gen)
    rng = np.random.default_rng(12)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i in range(3):
        save_wav(str(wav_dir / f"u{i}.wav"),
                 0.3 * rng.normal(size=4000).astype(np.float32), 16000)
    out = validate_vocoder(cfg, npz, str(wav_dir), n=2,
                           out_dir=str(tmp_path / "cs"))
    assert len(out["files"]) == 2
    assert np.isfinite(out["mel_l1_hifigan_mean"])
    assert (tmp_path / "cs").exists()
