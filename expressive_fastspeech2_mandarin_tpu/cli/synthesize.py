"""Synthesis CLI (reference: synthesize_chinese_pinyin.py:156-307).

Modes:
  single — one hanzi/phoneme-string utterance with speaker/emotion/controls
  batch  — a metadata file (train.txt format) synthesized in batches
"""

from __future__ import annotations

import argparse
import os

from .common import add_config_args, config_from_args


def main() -> None:
    ap = argparse.ArgumentParser(prog="efs2-synthesize")
    add_config_args(ap)
    ap.add_argument("--mode", choices=["single", "batch", "grid"],
                    required=True,
                    help="grid: every speaker x emotion for one text "
                         "(reference: generate_emotion_samples.py)")
    ap.add_argument("--text", default=None, help="single: hanzi or {phones}")
    ap.add_argument("--source", default=None, help="batch: metadata file")
    ap.add_argument("--speaker_id", default="0001")
    ap.add_argument("--emotion", default="Neutral",
                    choices=["Angry", "Happy", "Neutral", "Sad", "Surprise"])
    ap.add_argument("--restore_step", type=int, default=None,
                    help="orbax checkpoint step (native checkpoints)")
    ap.add_argument("--torch_ckpt", default=None,
                    help="reference .pth.tar model checkpoint to convert")
    ap.add_argument("--vocoder_ckpt", default=None,
                    help="HiFi-GAN generator checkpoint (.pth.tar)")
    ap.add_argument("--vocoder", choices=["hifigan", "griffin_lim"],
                    default=None)
    ap.add_argument("--pitch_control", type=float, default=1.0)
    ap.add_argument("--energy_control", type=float, default=1.0)
    ap.add_argument("--duration_control", type=float, default=1.0)
    ap.add_argument("--output_name", default=None)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--save_mel", action="store_true",
                    help="also save the predicted mel as <name>_mel.npy "
                         "(parity drills, vocoder A/B tests)")
    ap.add_argument("--stream_chunk_frames", type=int, default=0,
                    help="single mode: >0 streams the vocoder in chunks of "
                         "this many mel frames (incremental wav write)")
    args = ap.parse_args()

    if args.mode in ("single", "grid"):
        assert args.text is not None, f"--text required in {args.mode} mode"
    else:
        assert args.source is not None, "--source required in batch mode"

    cfg = config_from_args(args)
    from ..synth import Synthesizer

    if args.torch_ckpt:
        synth = Synthesizer.from_torch_checkpoint(
            cfg, args.torch_ckpt, args.vocoder_ckpt)
    else:
        synth = Synthesizer.from_orbax(
            cfg, cfg.train.path.ckpt_path or "output/ckpt",
            args.vocoder_ckpt, step=args.restore_step)

    out_dir = args.out_dir or cfg.train.path.result_path or "output/result"
    controls = dict(pitch_control=args.pitch_control,
                    energy_control=args.energy_control,
                    duration_control=args.duration_control)

    if args.mode == "single":
        name = args.output_name or f"synthesis_{args.speaker_id}_{args.emotion}"
        if args.stream_chunk_frames > 0:
            import numpy as np

            from ..utils.wav import save_wav

            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"{name}.wav")
            chunks = []
            for i, chunk in enumerate(synth.synthesize_streaming(
                    args.text, args.speaker_id, args.emotion,
                    chunk_frames=args.stream_chunk_frames, **controls)):
                chunks.append(chunk)
                print(f"chunk {i}: {len(chunk)} samples")
            save_wav(path, np.concatenate(chunks),
                     synth.cfg.preprocess.audio.sampling_rate)
            print(path)
            return
        results = synth.synthesize(
            [args.text], [args.speaker_id], [args.emotion],
            basenames=[name], vocoder=args.vocoder, **controls)
    elif args.mode == "grid":
        speakers = sorted(synth.speaker_map) or ["0"]
        emotions = sorted(synth.emotion_maps.get("emotion", {})) or ["Neutral"]
        results = []
        for spk in speakers:
            results += synth.synthesize(
                [args.text] * len(emotions), [spk] * len(emotions), emotions,
                basenames=[f"grid_{spk}_{emo}" for emo in emotions],
                vocoder=args.vocoder, **controls)
    else:
        from ..data.metadata import read_metadata

        utts = read_metadata(args.source)
        results = []
        for i in range(0, len(utts), 8):
            chunk = utts[i: i + 8]
            results += synth.synthesize(
                [u.phone_text for u in chunk],
                [u.speaker for u in chunk],
                [u.emotion for u in chunk],
                basenames=[u.basename for u in chunk],
                vocoder=args.vocoder, **controls)

    paths = synth.save_results(results, out_dir, save_mel=args.save_mel)
    for p in paths:
        print(p)


if __name__ == "__main__":
    main()
