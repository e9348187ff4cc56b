"""PyTorch checkpoint → JAX param-tree conversion.

Converts the reference's ``torch.save({"model": state_dict, ...})``
checkpoints (reference: train.py:151-161, utils/model.py:15-28) and the
HiFi-GAN generator checkpoint (``{"generator": state_dict}``,
utils/model.py:60-69) into this framework's parameter pytrees.

Layout conventions here (see ops/conv.py): linear weights are stored
``(d_in, d_out)`` (torch: ``(d_out, d_in)``), conv kernels ``(K, Cin, Cout)``
(torch Conv1d: ``(Cout, Cin, K)``; torch ConvTranspose1d: ``(Cin, Cout, K)``),
so every mapping below is a pure transpose. Weight-norm ``weight_g/weight_v``
pairs are folded into plain kernels, matching the reference's
``remove_weight_norm`` at load (hifigan/models.py:166-174).

Only numpy is required; ``torch`` is needed only to deserialize ``.pth.tar``
files (use :func:`load_torch_state_dict`).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Params = dict[str, Any]


def load_torch_state_dict(path: str, key: str | None = None) -> dict[str, np.ndarray]:
    """Load a torch checkpoint file into a flat {name: np.ndarray} dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        ckpt = ckpt[key]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()
            if hasattr(v, "detach")}


def _lin(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "b": sd[f"{prefix}.bias"]}


def _conv(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    # torch Conv1d (Cout, Cin, K) -> (K, Cin, Cout)
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 1, 0)),
            "bias": sd[f"{prefix}.bias"]}


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {"g": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"]}


def _fft_block(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "attn": {
            "wq": _lin(sd, f"{prefix}.slf_attn.w_qs"),
            "wk": _lin(sd, f"{prefix}.slf_attn.w_ks"),
            "wv": _lin(sd, f"{prefix}.slf_attn.w_vs"),
            "fc": _lin(sd, f"{prefix}.slf_attn.fc"),
            "ln": _ln(sd, f"{prefix}.slf_attn.layer_norm"),
        },
        "ffn": {
            "w1": _conv(sd, f"{prefix}.pos_ffn.w_1"),
            "w2": _conv(sd, f"{prefix}.pos_ffn.w_2"),
            "ln": _ln(sd, f"{prefix}.pos_ffn.layer_norm"),
        },
    }


def _variance_predictor(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "conv1": _conv(sd, f"{prefix}.conv_layer.conv1d_1.conv"),
        "ln1": _ln(sd, f"{prefix}.conv_layer.layer_norm_1"),
        "conv2": _conv(sd, f"{prefix}.conv_layer.conv1d_2.conv"),
        "ln2": _ln(sd, f"{prefix}.conv_layer.layer_norm_2"),
        "linear": _lin(sd, f"{prefix}.linear_layer"),
    }


def convert_fastspeech2(
    sd: Mapping[str, np.ndarray],
) -> tuple[Params, Params, dict[str, np.ndarray]]:
    """Reference FastSpeech2 state_dict → (params, bn_state, consts_override).

    ``consts_override`` carries the checkpoint's pitch/energy bin boundaries
    (saved as buffers, reference: model/modules.py:48-71) so inference uses
    the exact training-time bucket edges.
    """
    n_enc = len({k.split(".")[2] for k in sd
                 if k.startswith("encoder.layer_stack.")})
    n_dec = len({k.split(".")[2] for k in sd
                 if k.startswith("decoder.layer_stack.")})

    params: Params = {
        "encoder": {
            "embed": sd["encoder.src_word_emb.weight"],
            "layers": [_fft_block(sd, f"encoder.layer_stack.{i}")
                       for i in range(n_enc)],
        },
        "decoder": {
            "layers": [_fft_block(sd, f"decoder.layer_stack.{i}")
                       for i in range(n_dec)],
        },
        "variance_adaptor": {
            "duration_predictor": _variance_predictor(
                sd, "variance_adaptor.duration_predictor"),
            "pitch_predictor": _variance_predictor(
                sd, "variance_adaptor.pitch_predictor"),
            "energy_predictor": _variance_predictor(
                sd, "variance_adaptor.energy_predictor"),
            "pitch_embedding": sd["variance_adaptor.pitch_embedding.weight"],
            "energy_embedding": sd["variance_adaptor.energy_embedding.weight"],
        },
        "mel_linear": _lin(sd, "mel_linear"),
    }

    n_post = len({k.split(".")[2] for k in sd
                  if k.startswith("postnet.convolutions.")})
    convs, bns = [], []
    for i in range(n_post):
        conv = _conv(sd, f"postnet.convolutions.{i}.0.conv")
        conv["bn_g"] = sd[f"postnet.convolutions.{i}.1.weight"]
        conv["bn_b"] = sd[f"postnet.convolutions.{i}.1.bias"]
        convs.append(conv)
        bns.append({"mean": sd[f"postnet.convolutions.{i}.1.running_mean"],
                    "var": sd[f"postnet.convolutions.{i}.1.running_var"]})
    params["postnet"] = {"convs": convs}

    if "speaker_emb.weight" in sd:
        params["speaker_emb"] = sd["speaker_emb.weight"]
    if "emotion_emb.weight" in sd:
        params["emotion_emb"] = sd["emotion_emb.weight"]
        params["arousal_emb"] = sd["arousal_emb.weight"]
        params["valence_emb"] = sd["valence_emb.weight"]
        params["emotion_linear"] = _lin(sd, "emotion_linear.0")

    consts = {}
    if "variance_adaptor.pitch_bins" in sd:
        consts["pitch_bins"] = sd["variance_adaptor.pitch_bins"]
        consts["energy_bins"] = sd["variance_adaptor.energy_bins"]

    return params, {"postnet": {"convs": bns}}, consts


# ---------------------------------------------------------------------------
# HiFi-GAN


def _fold_weight_norm(sd: Mapping[str, np.ndarray], prefix: str) -> np.ndarray:
    """weight = g * v / ||v|| with the norm over all dims except dim 0
    (torch weight_norm default)."""
    if f"{prefix}.weight" in sd:
        return sd[f"{prefix}.weight"]
    v = sd[f"{prefix}.weight_v"]
    g = sd[f"{prefix}.weight_g"]
    norm = np.sqrt(np.sum(v.reshape(v.shape[0], -1) ** 2, axis=1))
    scale = (g.reshape(-1) / norm).reshape((-1,) + (1,) * (v.ndim - 1))
    return v * scale


def _wn_conv(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    w = _fold_weight_norm(sd, prefix)  # (Cout, Cin, K)
    return {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
            "bias": sd[f"{prefix}.bias"]}


def _wn_conv_transpose(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    w = _fold_weight_norm(sd, prefix)  # (Cin, Cout, K)
    return {"kernel": np.ascontiguousarray(w.transpose(2, 0, 1)),
            "bias": sd[f"{prefix}.bias"]}


def convert_hifigan(
    sd: Mapping[str, np.ndarray],
    n_ups: int = 4,
    n_resblock_kernels: int = 3,
    n_resblock_layers: int = 3,
) -> Params:
    """Reference HiFi-GAN generator state_dict → vocoder params."""
    params: Params = {
        "conv_pre": _wn_conv(sd, "conv_pre"),
        "ups": [_wn_conv_transpose(sd, f"ups.{i}") for i in range(n_ups)],
        "resblocks": [],
        "conv_post": _wn_conv(sd, "conv_post"),
    }
    for i in range(n_ups * n_resblock_kernels):
        params["resblocks"].append({
            "convs1": [_wn_conv(sd, f"resblocks.{i}.convs1.{j}")
                       for j in range(n_resblock_layers)],
            "convs2": [_wn_conv(sd, f"resblocks.{i}.convs2.{j}")
                       for j in range(n_resblock_layers)],
        })
    return params


# ---------------------------------------------------------------------------
# Inverse direction: JAX param tree → reference torch state dict
# (keeps checkpoint-parity machinery warm for the day the reference's 900k
# weights materialize: a natively-trained checkpoint can be exported and
# loaded by the reference's get_model, utils/model.py:15-28).


def _lin_out(out: dict[str, np.ndarray], prefix: str, p: Params) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    out[f"{prefix}.bias"] = np.asarray(p["b"])


def _conv_out(out: dict[str, np.ndarray], prefix: str, p: Params) -> None:
    # (K, Cin, Cout) -> torch Conv1d (Cout, Cin, K)
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"]).transpose(2, 1, 0))
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _ln_out(out: dict[str, np.ndarray], prefix: str, p: Params) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["g"])
    out[f"{prefix}.bias"] = np.asarray(p["b"])


def _fft_block_out(out: dict[str, np.ndarray], prefix: str, p: Params) -> None:
    _lin_out(out, f"{prefix}.slf_attn.w_qs", p["attn"]["wq"])
    _lin_out(out, f"{prefix}.slf_attn.w_ks", p["attn"]["wk"])
    _lin_out(out, f"{prefix}.slf_attn.w_vs", p["attn"]["wv"])
    _lin_out(out, f"{prefix}.slf_attn.fc", p["attn"]["fc"])
    _ln_out(out, f"{prefix}.slf_attn.layer_norm", p["attn"]["ln"])
    _conv_out(out, f"{prefix}.pos_ffn.w_1", p["ffn"]["w1"])
    _conv_out(out, f"{prefix}.pos_ffn.w_2", p["ffn"]["w2"])
    _ln_out(out, f"{prefix}.pos_ffn.layer_norm", p["ffn"]["ln"])


def _variance_predictor_out(out: dict[str, np.ndarray], prefix: str,
                            p: Params) -> None:
    _conv_out(out, f"{prefix}.conv_layer.conv1d_1.conv", p["conv1"])
    _ln_out(out, f"{prefix}.conv_layer.layer_norm_1", p["ln1"])
    _conv_out(out, f"{prefix}.conv_layer.conv1d_2.conv", p["conv2"])
    _ln_out(out, f"{prefix}.conv_layer.layer_norm_2", p["ln2"])
    _lin_out(out, f"{prefix}.linear_layer", p["linear"])


def export_fastspeech2(params: Params, bn_state: Params,
                       consts: Mapping[str, np.ndarray] | None = None
                       ) -> dict[str, np.ndarray]:
    """params/bn_state (+ pitch/energy bin consts) → reference-format flat
    state dict; exact inverse of :func:`convert_fastspeech2`."""
    out: dict[str, np.ndarray] = {}
    out["encoder.src_word_emb.weight"] = np.asarray(
        params["encoder"]["embed"])
    for i, blk in enumerate(params["encoder"]["layers"]):
        _fft_block_out(out, f"encoder.layer_stack.{i}", blk)
    for i, blk in enumerate(params["decoder"]["layers"]):
        _fft_block_out(out, f"decoder.layer_stack.{i}", blk)
    va = params["variance_adaptor"]
    for name in ("duration", "pitch", "energy"):
        _variance_predictor_out(
            out, f"variance_adaptor.{name}_predictor",
            va[f"{name}_predictor"])
    out["variance_adaptor.pitch_embedding.weight"] = np.asarray(
        va["pitch_embedding"])
    out["variance_adaptor.energy_embedding.weight"] = np.asarray(
        va["energy_embedding"])
    _lin_out(out, "mel_linear", params["mel_linear"])
    for i, conv in enumerate(params["postnet"]["convs"]):
        _conv_out(out, f"postnet.convolutions.{i}.0.conv", conv)
        out[f"postnet.convolutions.{i}.1.weight"] = np.asarray(conv["bn_g"])
        out[f"postnet.convolutions.{i}.1.bias"] = np.asarray(conv["bn_b"])
        bn = bn_state["postnet"]["convs"][i]
        out[f"postnet.convolutions.{i}.1.running_mean"] = np.asarray(
            bn["mean"])
        out[f"postnet.convolutions.{i}.1.running_var"] = np.asarray(bn["var"])
    if "speaker_emb" in params:
        out["speaker_emb.weight"] = np.asarray(params["speaker_emb"])
    if "emotion_emb" in params:
        out["emotion_emb.weight"] = np.asarray(params["emotion_emb"])
        out["arousal_emb.weight"] = np.asarray(params["arousal_emb"])
        out["valence_emb.weight"] = np.asarray(params["valence_emb"])
        _lin_out(out, "emotion_linear.0", params["emotion_linear"])
    if consts:
        if "pitch_bins" in consts:
            out["variance_adaptor.pitch_bins"] = np.asarray(
                consts["pitch_bins"])
            out["variance_adaptor.energy_bins"] = np.asarray(
                consts["energy_bins"])
    return out


def save_torch_checkpoint(path: str, state_dict: Mapping[str, np.ndarray],
                          key: str = "model") -> None:
    """Write a reference-format ``torch.save({key: state_dict})`` file."""
    import torch

    torch.save({key: {k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in state_dict.items()}}, path)
