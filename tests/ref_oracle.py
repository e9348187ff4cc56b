"""Test-only helper to load the PyTorch reference as a numerical oracle.

The reference lives read-only at /root/reference and is used strictly as an
oracle for parity tests — none of its code ships in this framework. Missing
optional dependencies (unidecode, g2pk, jamo, quickspacer) are stubbed so the
torch-only model code imports on CPU.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "model"))


def _stub(name: str, **attrs) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_reference_path() -> None:
    """Put /root/reference on sys.path with stubs for absent deps."""
    if REFERENCE_PATH in sys.path:
        return

    class _Spacer:
        def __init__(self, *a, **k):
            pass

        def space(self, texts, *a, **k):
            return texts

    class _G2p:
        def __call__(self, text, *a, **k):
            return text

    class _Engine:
        def number_to_words(self, n, **k):
            return str(n)

    _stub("unidecode", unidecode=lambda s: s)
    _stub("inflect", engine=lambda: _Engine())
    _stub("quickspacer", Spacer=_Spacer)
    _stub("g2pk", G2p=_G2p)
    jamo = _stub(
        "jamo",
        hangul_to_jamo=lambda s: list(s),
        h2j=lambda s: s,
        j2h=lambda *a: "".join(a),
    )
    jamo_jamo = _stub("jamo.jamo", _jamo_char_to_hcj=lambda c: c)
    jamo.jamo = jamo_jamo

    sys.path.insert(0, REFERENCE_PATH)


def make_reference_configs(tmpdir: str, n_bins: int = 256):
    """Build the reference's (preprocess, model, train) config dicts with a
    tiny preprocessed dir (stats/speakers/emotions jsons) under ``tmpdir``."""
    import json

    stats = {
        "pitch": [-1.9, 9.5, 0.0, 1.0],
        "energy": [-1.5, 8.2, 0.0, 1.0],
    }
    speakers = {f"{i + 1:04d}": i for i in range(10)}
    emotions = {
        "emotion_dict": {e: i for i, e in enumerate(
            ["Angry", "Happy", "Neutral", "Sad", "Surprise"])},
        "arousal_dict": {a: i for i, a in enumerate(
            ["0.3", "0.5", "0.8", "0.9"])},
        "valence_dict": {v: i for i, v in enumerate(
            ["0.1", "0.2", "0.5", "0.6", "0.8"])},
    }
    os.makedirs(tmpdir, exist_ok=True)
    for name, obj in [("stats.json", stats), ("speakers.json", speakers),
                      ("emotions.json", emotions)]:
        with open(os.path.join(tmpdir, name), "w") as f:
            json.dump(obj, f)

    preprocess_config = {
        "dataset": "ESD-Chinese-Singing-MFA",
        "path": {"preprocessed_path": tmpdir},
        "preprocessing": {
            "val_size": 512,
            "text": {"text_cleaners": ["basic_cleaners"], "language": "zh"},
            "audio": {"sampling_rate": 22050, "max_wav_value": 32768.0},
            "stft": {"filter_length": 1024, "hop_length": 256,
                     "win_length": 1024},
            "mel": {"n_mel_channels": 80, "mel_fmin": 0, "mel_fmax": 8000},
            "pitch": {"feature": "phoneme_level", "normalization": True},
            "energy": {"feature": "phoneme_level", "normalization": True},
        },
    }
    model_config = {
        "transformer": {
            "encoder_layer": 4, "encoder_head": 2, "encoder_hidden": 256,
            "decoder_layer": 6, "decoder_head": 2, "decoder_hidden": 256,
            "conv_filter_size": 1024, "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2, "decoder_dropout": 0.2,
        },
        "variance_predictor": {"filter_size": 256, "kernel_size": 3,
                               "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear",
                               "n_bins": n_bins},
        "multi_speaker": True,
        "multi_emotion": True,
        "max_seq_len": 2000,
        "vocoder": {"model": "HiFi-GAN", "speaker": "universal"},
    }
    train_config = {
        "path": {"ckpt_path": tmpdir, "log_path": tmpdir,
                 "result_path": tmpdir},
        "optimizer": {
            "batch_size": 4, "betas": [0.9, 0.98], "eps": 1e-9,
            "weight_decay": 0.0, "grad_clip_thresh": 1.0, "grad_acc_step": 1,
            "warm_up_step": 4000, "anneal_steps": [300000, 400000, 500000],
            "anneal_rate": 0.3,
        },
        "step": {"total_step": 900000, "log_step": 100, "synth_step": 1000,
                 "val_step": 1000, "save_step": 100000},
    }
    return preprocess_config, model_config, train_config
