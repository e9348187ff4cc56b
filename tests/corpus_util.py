"""Shared synthetic-corpus + tiny-config builders.

Used by both in-process tests and the multi-process distributed worker
(tests/distributed_worker.py), so every process constructs bit-identical
data and configs from (path, seed) alone.
"""

import json
import os

import numpy as np

from expressive_fastspeech2_mandarin_tpu.config import (
    BucketConfig,
    Config,
    ModelConfig,
    OptimizerConfig,
    PathConfig,
    PreprocessConfig,
    StepConfig,
    TrainConfig,
    TransformerConfig,
    VariancePredictorConfig,
)


def make_synthetic_corpus(root: str, n_utts: int = 24, seed: int = 0,
                          n_val: int = 8) -> str:
    """Write a reference-format preprocessed dir (mel/pitch/energy/duration
    npys + metadata + stats) of synthetic utterances."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    speakers = {"0001": 0, "0002": 1}
    emotions = {
        "emotion_dict": {"Happy": 0, "Sad": 1, "Angry": 2},
        "arousal_dict": {"0.8": 0, "0.3": 1, "0.9": 2},
        "valence_dict": {"0.8": 0, "0.2": 1, "0.1": 2},
    }
    stats = {"pitch": [-2.0, 8.0, 0.0, 1.0], "energy": [-1.0, 7.0, 0.0, 1.0]}
    for name, obj in [("speakers.json", speakers),
                      ("emotions.json", emotions), ("stats.json", stats)]:
        with open(os.path.join(root, name), "w") as f:
            json.dump(obj, f)
    for sub in ("mel", "pitch", "energy", "duration"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    emo_keys = [("Happy", "0.8", "0.8"), ("Sad", "0.3", "0.2"),
                ("Angry", "0.9", "0.1")]
    lines = []
    for i in range(n_utts):
        spk = "0001" if i % 2 == 0 else "0002"
        base = f"{spk}_{i:06d}"
        s = int(rng.integers(6, 16))
        durations = rng.integers(1, 5, s)
        mel_len = int(durations.sum())
        np.save(os.path.join(root, "duration", f"{spk}-duration-{base}.npy"),
                durations)
        np.save(os.path.join(root, "mel", f"{spk}-mel-{base}.npy"),
                rng.normal(size=(mel_len, 80)).astype(np.float32))
        np.save(os.path.join(root, "pitch", f"{spk}-pitch-{base}.npy"),
                rng.normal(size=s).astype(np.float32))
        np.save(os.path.join(root, "energy", f"{spk}-energy-{base}.npy"),
                rng.normal(size=s).astype(np.float32))
        phones = " ".join(rng.choice(["b", "a", "n", "zh", "ong", "i"], s))
        emo, aro, val = emo_keys[i % 3]
        lines.append(
            f"{base}|{spk}|{{{phones}}}|raw text|{spk}|x|{emo}|{aro}|{val}")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(lines[n_val:]) + "\n")
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(lines[:n_val]) + "\n")
    return root


def tiny_train_config(corpus_dir: str, out_dir: str, batch_size: int = 4,
                      total_step: int = 8, steps_per_call: int = 1) -> Config:
    """Deterministic tiny config pointing at ``corpus_dir``."""
    model = ModelConfig(
        transformer=TransformerConfig(
            encoder_layer=1, decoder_layer=1, encoder_hidden=32,
            decoder_hidden=32, conv_filter_size=64, encoder_head=2,
            decoder_head=2),
        variance_predictor=VariancePredictorConfig(filter_size=32),
        n_speakers=4, n_emotions=3, n_arousals=3, n_valences=3,
        max_seq_len=128,
    )
    return Config(
        preprocess=PreprocessConfig(
            path=PathConfig(preprocessed_path=corpus_dir)),
        model=model,
        train=TrainConfig(
            path=PathConfig(
                ckpt_path=os.path.join(out_dir, "ckpt"),
                log_path=os.path.join(out_dir, "log"),
                result_path=os.path.join(out_dir, "result")),
            optimizer=OptimizerConfig(batch_size=batch_size, warm_up_step=10),
            step=StepConfig(total_step=total_step, log_step=2, synth_step=4,
                            val_step=4, save_step=total_step),
            buckets=BucketConfig(src_buckets=(16, 24),
                                 mel_buckets=(64, 96, 128)),
            steps_per_call=steps_per_call,
        ),
    )
