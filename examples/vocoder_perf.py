"""Vocoder GAN-step performance decomposition (VERDICT r4 weak #1).

Measures the efs2-train-vocoder hot loop with the same discipline the
synthesis path got in round 3: per-component wall-clock (generator
forward, MPD/MSD forward and backward, mel loss), whole-step time, and
MFU from XLA's compiled cost analysis — for the shipped configuration and
the candidate optimizations (discriminator bf16, packed training
generator), so adopt/reject decisions are measurements, not FLOP
arguments.

Usage: python examples/vocoder_perf.py [--amp bfloat16] [--iters 10]
Writes a markdown-ready table to stdout; run on the TPU chip.
"""

import argparse
import json
import time

import numpy as np

V5E_BF16_PEAK = 197e12


def _timed(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _flops(fn, *args):
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--spc", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from expressive_fastspeech2_mandarin_tpu.cli.common import (
        enable_compilation_cache,
    )
    from expressive_fastspeech2_mandarin_tpu.config import (
        Config,
        VocoderTrainConfig,
    )
    from expressive_fastspeech2_mandarin_tpu.dsp.stft import MelSTFT
    from expressive_fastspeech2_mandarin_tpu.models.hifigan import (
        apply_generator,
        pack_generator_params_traced,
    )
    from expressive_fastspeech2_mandarin_tpu.models.hifigan_disc import (
        apply_mpd,
        apply_msd,
        discriminator_loss,
        fold_weight_norm,
    )
    from expressive_fastspeech2_mandarin_tpu.train.vocoder import (
        SegmentSampler,
        init_vocoder_train_state,
        logmel_from_context,
        make_vocoder_multi_step,
        make_vocoder_train_step,
    )

    enable_compilation_cache()
    b, seg, hop = args.batch, 8192, 256
    n_frames = seg // hop
    results = {}

    def measure_step(tag, **cfg_kw):
        cfg = Config(vocoder_train=VocoderTrainConfig(
            amp_dtype=args.amp, steps_per_call=args.spc, **cfg_kw))
        state = init_vocoder_train_state(cfg)
        rng = np.random.default_rng(0)
        wavs = [rng.normal(0, 0.2, 40000).astype(np.float32)
                for _ in range(4)]
        sampler = SegmentSampler(cfg, wavs, seed=0)
        fn = make_vocoder_multi_step(cfg, args.spc)
        stacked = jnp.asarray(np.stack(
            [sampler.sample(b) for _ in range(args.spc)]))
        # donate: run through a non-donating single step for timing reuse
        state2, rep = fn(state, stacked)
        jax.block_until_ready(rep)
        t0 = time.perf_counter()
        n = max(1, args.iters // 2)
        st = state2
        for _ in range(n):
            st, rep = fn(st, stacked)
        jax.block_until_ready(rep)
        dt = (time.perf_counter() - t0) / (n * args.spc)
        fl = _flops(fn, state, stacked)
        mfu = (fl / args.spc) / dt / V5E_BF16_PEAK if fl else None
        results[tag] = {"ms_per_step": round(dt * 1e3, 1),
                        "steps_per_s": round(1 / dt, 2),
                        "mfu": round(mfu, 4) if mfu else None}
        print(f"{tag}: {results[tag]}", flush=True)
        return cfg

    cfg = measure_step("full_step")
    measure_step("full_step_packed_gen", packed_generator=True)
    # Fresh (undonated) state for the standalone component timings.
    state = init_vocoder_train_state(cfg)

    # ---- components (each jitted standalone; amp like the step uses) ----
    amp = jnp.dtype(args.amp)
    vcfg = cfg.vocoder_train
    pre = cfg.preprocess
    mel_in = MelSTFT(pre.stft, pre.mel, pre.audio.sampling_rate)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.normal(0, 0.2, (b, seg + 1024 - 256)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 0.2, (b, seg)), jnp.float32)
    mel = jnp.asarray(rng.normal(-4, 2, (b, n_frames, 80)), jnp.float32)

    def cast(tree, dtype):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def gen_fwd(gp, m):
        folded = cast(fold_weight_norm(gp), amp)
        return apply_generator(folded, m.astype(amp), cfg.model.vocoder,
                               fast=False).astype(jnp.float32)

    g_fwd = jax.jit(gen_fwd)
    comp = {"gen_fwd": _timed(g_fwd, state.gen, mel, iters=args.iters)}

    def gen_fwd_packed(gp, m):
        folded = cast(fold_weight_norm(gp), amp)
        packed = pack_generator_params_traced(folded, cfg.model.vocoder)
        return apply_generator(packed, m.astype(amp), cfg.model.vocoder,
                               fast=True).astype(jnp.float32)

    try:
        comp["gen_fwd_packed"] = _timed(jax.jit(gen_fwd_packed), state.gen,
                                        mel, iters=args.iters)
    except Exception as e:
        print(f"packed gen fwd failed: {e}")

    def gen_bwd(gp, m, ct):
        _, vjp = jax.vjp(lambda p: gen_fwd(p, m), gp)
        return vjp(ct)

    comp["gen_fwd_bwd"] = _timed(jax.jit(gen_bwd), state.gen, mel, y,
                                 iters=args.iters)

    def gen_bwd_packed(gp, m, ct):
        _, vjp = jax.vjp(lambda p: gen_fwd_packed(p, m), gp)
        return vjp(ct)

    try:
        comp["gen_fwd_bwd_packed"] = _timed(
            jax.jit(gen_bwd_packed), state.gen, mel, y, iters=args.iters)
    except Exception as e:
        print(f"packed gen bwd failed: {e}")

    for damp, suffix in ((jnp.float32, ""), (amp, "_bf16")):
        if suffix and amp == jnp.float32:
            continue

        def mpd_fwd(dp, w):
            return apply_mpd(dp, w.astype(damp), vcfg.mpd_periods)[0]

        def msd_fwd(dp, w):
            return apply_msd(dp, w.astype(damp))[0]

        comp[f"mpd_fwd{suffix}"] = _timed(jax.jit(mpd_fwd), state.mpd, y,
                                          iters=args.iters)
        comp[f"msd_fwd{suffix}"] = _timed(jax.jit(msd_fwd), state.msd, y,
                                          iters=args.iters)

        def d_grad(dp, w, wg):
            def loss(dp):
                pr, _ = apply_mpd(dp["mpd"], w.astype(damp), vcfg.mpd_periods)
                pg, _ = apply_mpd(dp["mpd"], wg.astype(damp),
                                  vcfg.mpd_periods)
                sr, _ = apply_msd(dp["msd"], w.astype(damp))
                sg, _ = apply_msd(dp["msd"], wg.astype(damp))
                return (discriminator_loss(pr, pg)
                        + discriminator_loss(sr, sg))

            return jax.grad(loss)(dp)

        comp[f"disc_fwd_bwd_both{suffix}"] = _timed(
            jax.jit(d_grad), {"mpd": state.mpd, "msd": state.msd}, y,
            y + 0.01, iters=args.iters)

    def melspec(c):
        return logmel_from_context(c, mel_in, n_frames)

    comp["mel_from_context"] = _timed(jax.jit(melspec), ctx,
                                      iters=args.iters)

    results["components_ms"] = {k: round(v * 1e3, 2)
                                for k, v in comp.items()}
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
