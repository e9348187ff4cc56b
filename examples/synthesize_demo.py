"""End-to-end demo: hanzi text → phoneme IDs → FastSpeech2 → HiFi-GAN → wav.

Runs on whatever backend JAX selects (TPU under axon, CPU elsewhere).
Without a trained checkpoint this produces noise audio — the point is to
exercise the full public pipeline with real shapes.

Usage:  python examples/synthesize_demo.py [--text 今天天气真好] [--out /tmp/demo.wav]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

from expressive_fastspeech2_mandarin_tpu.config import ModelConfig, PreprocessConfig
from expressive_fastspeech2_mandarin_tpu.models import (
    FastSpeech2,
    apply_generator,
    init_generator,
    param_count,
)
from expressive_fastspeech2_mandarin_tpu.text import chinese_text_to_ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="今天天气真好")
    ap.add_argument("--out", default="/tmp/demo.wav")
    ap.add_argument("--speaker", type=int, default=0)
    ap.add_argument("--emotion", type=int, default=1)
    ap.add_argument("--pitch-control", type=float, default=1.0)
    ap.add_argument("--energy-control", type=float, default=1.0)
    ap.add_argument("--duration-control", type=float, default=1.0)
    args = ap.parse_args()

    print("backend:", jax.default_backend(), jax.devices())

    model_cfg = ModelConfig()
    pre_cfg = PreprocessConfig()
    model = FastSpeech2(model_cfg, pre_cfg)
    rng = jax.random.PRNGKey(0)
    params, state = model.init(rng)
    # With random weights the duration predictor emits ~0 ⇒ round(exp(0)-1)=0
    # frames. Bias it to ~6 frames/phoneme so the demo synthesizes real audio
    # lengths (a trained checkpoint needs no such nudge).
    dur_lin = params["variance_adaptor"]["duration_predictor"]["linear"]
    dur_lin["b"] = dur_lin["b"] + float(np.log(7.0))
    print(f"FastSpeech2 params: {param_count(params)/1e6:.1f}M")
    voc_params = init_generator(jax.random.PRNGKey(1), model_cfg.vocoder)
    print(f"HiFi-GAN params: {param_count(voc_params)/1e6:.1f}M")

    ids = chinese_text_to_ids(args.text)
    print(f"text: {args.text} -> {len(ids)} phonemes: {ids}")

    max_src, max_mel = 32, 512
    texts = np.zeros((1, max_src), np.int32)
    texts[0, : len(ids)] = ids

    @jax.jit
    def synthesize(params, state, texts, src_lens, spk, emo, aro, val):
        out, _ = model.apply(
            params, state, spk, emo, aro, val, texts, src_lens,
            max_mel_len=max_mel,
            p_control=args.pitch_control,
            e_control=args.energy_control,
            d_control=args.duration_control,
        )
        return out.postnet_mel, out.mel_lens

    @jax.jit
    def vocode(voc_params, mel):
        return apply_generator(voc_params, mel, model_cfg.vocoder)

    batch_args = (
        jnp.asarray(texts), jnp.asarray([len(ids)]),
        jnp.asarray([args.speaker]), jnp.asarray([args.emotion]),
        jnp.asarray([2]), jnp.asarray([2]),
    )
    t0 = time.time()
    mel, mel_lens = synthesize(params, state, *batch_args)
    mel.block_until_ready()
    print(f"acoustic model: compile+run {time.time()-t0:.1f}s, "
          f"mel {mel.shape}, mel_len {int(mel_lens[0])}")

    t0 = time.time()
    wav = vocode(voc_params, mel)
    wav.block_until_ready()
    print(f"vocoder: compile+run {time.time()-t0:.1f}s, wav {wav.shape}")

    t0 = time.time()
    mel2, _ = synthesize(params, state, *batch_args)
    wav2 = vocode(voc_params, mel2)
    wav2.block_until_ready()
    n_samples = int(mel_lens[0]) * pre_cfg.stft.hop_length
    audio_s = n_samples / pre_cfg.audio.sampling_rate
    dt = time.time() - t0
    print(f"steady-state: {dt*1000:.1f}ms for {audio_s:.2f}s audio "
          f"(RTF {dt/audio_s:.4f}, {audio_s/dt:.1f} audio-s/s)")

    samples = np.asarray(wav2[0, :n_samples])
    wavfile.write(args.out, pre_cfg.audio.sampling_rate,
                  (samples * 32768.0).astype(np.int16))
    print(f"wrote {args.out} ({audio_s:.2f}s @ {pre_cfg.audio.sampling_rate}Hz)")


if __name__ == "__main__":
    main()
