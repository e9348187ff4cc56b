"""Benchmark: training throughput + synthesis throughput on one chip.

Prints ONE JSON line. Primary metric: training steps/s at the reference's
batch size 4 (baseline: 3.5 steps/s on a GTX 1080 Ti, derived from
README.md:232-233 — 900k steps in 72 h). Extra fields report synthesis
audio-seconds/s/chip and RTF (mel + HiFi-GAN vocoder), the BASELINE.json
headline metric with no published reference value.
"""

import json
import time

import numpy as np


def _train_bench(jax, steps=30, b=4, s=64, t=500, steps_per_call=10):
    from expressive_fastspeech2_mandarin_tpu.config import Config
    from expressive_fastspeech2_mandarin_tpu.models import FastSpeech2
    from expressive_fastspeech2_mandarin_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_multi_step,
        make_train_step,
    )

    cfg = Config()
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden)
    state = create_train_state(params, bn_state, tx, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    durations = np.full((b, s), t // s, np.int32)
    batch = {
        "speakers": rng.integers(0, 10, b).astype(np.int32),
        "emotions": rng.integers(0, 5, b).astype(np.int32),
        "arousals": rng.integers(0, 5, b).astype(np.int32),
        "valences": rng.integers(0, 5, b).astype(np.int32),
        "texts": rng.integers(4, 107, (b, s)).astype(np.int32),
        "src_lens": np.full((b,), s, np.int32),
        "mels": rng.normal(-1, 1, (b, t, 80)).astype(np.float32),
        "mel_lens": durations.sum(1).astype(np.int32),
        "pitches": rng.normal(0, 1, (b, s)).astype(np.float32),
        "energies": rng.normal(0, 1, (b, s)).astype(np.float32),
        "durations": durations,
    }
    import jax.numpy as jnp

    # Inputs are staged on device up front: the real loop overlaps H2D with
    # compute (async dispatch, no per-step host sync), so steady-state
    # throughput is compute-bound, which is what this measures.
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_fn = make_train_step(model, tx, cfg, donate=False)
    state, report = step_fn(state, batch)  # compile
    jax.block_until_ready(report)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, report = step_fn(state, batch)
    jax.block_until_ready(report)
    single = (time.perf_counter() - t0) / steps

    # Production path: steps_per_call optimizer steps per host dispatch
    # (train.steps_per_call; lax.scan chunk) — amortizes per-dispatch
    # latency, dominant on remote-attached chips.
    multi_fn = make_train_multi_step(model, tx, cfg, steps_per_call,
                                     donate=False)
    stacked = {k: jnp.broadcast_to(v, (steps_per_call,) + v.shape)
               for k, v in batch.items()}
    stacked = jax.tree.map(jnp.copy, stacked)
    state, report = multi_fn(state, stacked)  # compile
    jax.block_until_ready(report)
    rounds = max(1, steps // steps_per_call)
    t0 = time.perf_counter()
    for _ in range(rounds):
        state, report = multi_fn(state, stacked)
    jax.block_until_ready(report)
    multi = (time.perf_counter() - t0) / (rounds * steps_per_call)
    return 1.0 / multi, 1.0 / single


def _synth_bench(jax, iters=10, b=8, s=64, t=1000, hop=256, sr=22050):
    import jax.numpy as jnp

    from expressive_fastspeech2_mandarin_tpu.config import Config
    from expressive_fastspeech2_mandarin_tpu.models import (
        FastSpeech2,
        apply_generator,
        init_generator,
    )

    from expressive_fastspeech2_mandarin_tpu.models.hifigan import (
        pack_generator_params,
    )

    cfg = Config()
    model = FastSpeech2(cfg.model, cfg.preprocess)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    voc = pack_generator_params(
        init_generator(jax.random.PRNGKey(1), cfg.model.vocoder),
        cfg.model.vocoder, fused=True, fused_stages=(0,))

    rng = np.random.default_rng(0)
    durations = np.full((b, s), t // s, np.int32)
    args = (
        jnp.asarray(rng.integers(0, 10, b).astype(np.int32)),
        jnp.asarray(rng.integers(0, 5, b).astype(np.int32)),
        jnp.asarray(rng.integers(0, 5, b).astype(np.int32)),
        jnp.asarray(rng.integers(0, 5, b).astype(np.int32)),
        jnp.asarray(rng.integers(4, 107, (b, s)).astype(np.int32)),
        jnp.asarray(np.full((b,), s, np.int32)),
    )
    d_t = jnp.asarray(durations)
    mel_lens = jnp.asarray(durations.sum(1).astype(np.int32))

    voc = jax.tree.map(lambda x: x.astype(jnp.bfloat16), voc)

    @jax.jit
    def synth(params, bn_state, voc, d_t, mel_lens, *args):
        out, _ = model.apply(
            params, bn_state, *args, max_mel_len=t,
            mel_lens=mel_lens, d_targets=d_t, deterministic=True)
        wav = apply_generator(voc, out.postnet_mel.astype(jnp.bfloat16),
                              cfg.model.vocoder)
        return wav.astype(jnp.float32)

    wav = synth(params, bn_state, voc, d_t, mel_lens, *args)
    jax.block_until_ready(wav)
    t0 = time.perf_counter()
    for _ in range(iters):
        wav = synth(params, bn_state, voc, d_t, mel_lens, *args)
    jax.block_until_ready(wav)
    dt = (time.perf_counter() - t0) / iters
    audio_seconds = b * t * hop / sr
    return audio_seconds / dt, dt / audio_seconds


def main():
    import jax

    backend = jax.default_backend()
    train_steps_per_s, single_steps_per_s = _train_bench(jax)
    audio_s_per_s, rtf = _synth_bench(jax)
    baseline = 3.5  # steps/s, GTX 1080 Ti (derived, README.md:232-233)
    print(json.dumps({
        "metric": "train_steps_per_s_bs4",
        "value": round(train_steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(train_steps_per_s / baseline, 2),
        "extra": {
            "train_steps_per_s_single_dispatch": round(single_steps_per_s, 2),
            "synth_audio_seconds_per_s_per_chip": round(audio_s_per_s, 1),
            "synth_rtf": round(rtf, 5),
            "backend": backend,
            "synth_config": "batch 8 x 1000 mel frames, FastSpeech2 + HiFi-GAN",
        },
    }))


if __name__ == "__main__":
    main()
