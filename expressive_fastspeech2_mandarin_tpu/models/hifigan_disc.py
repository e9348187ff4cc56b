"""HiFi-GAN discriminators (MPD + MSD) and weight-norm parameterization.

The reference ships HiFi-GAN *training* hyperparameters
(hifigan/config.json: batch 16, Adam(0.8, 0.99), lr_decay 0.999,
segment 8192) but no training code and no generator weights — the
universal checkpoint it loads at utils/model.py:63-65 is an absent
git-LFS pointer. This module supplies the missing half so the vocoder can
actually be trained, following the published HiFi-GAN V1 recipe the
config.json parameters come from (Kong et al. 2020: multi-period +
multi-scale discriminators, LSGAN losses, feature matching, 45× mel L1).

TPU-native formulation:

* **MPD as batched 1-D convs.** The paper's period discriminators reshape
  the waveform to (T/p, p) and run Conv2d with kernel (5, 1) / stride
  (3, 1) — the period axis is never mixed by any kernel. Folding the
  period axis into the batch dimension turns every MPD conv into a plain
  1-D conv over (B·p, T/p, C) with full 128-lane utilization, instead of a
  width-1 Conv2d that XLA tiles poorly.
* **Weight norm as an explicit (v, g) parameterization** computed inside
  the jitted step (torch ``weight_norm``); ``fold_weight_norm`` collapses
  it to plain kernels for the packed inference path — the same
  train-normalized / inference-folded split as the reference
  (utils/model.py:66-69 removes weight norm before inference).

Known deviation from the paper: the first MSD scale uses weight norm like
the others instead of spectral norm (whose power-iteration ``u`` vectors
are extra mutable state a functional step would have to carry, for a
normalization the paper itself reports as a minor variant).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops import conv1d
from .hifigan import get_padding
from .init import conv1d_params

Params = dict[str, Any]
LRELU_SLOPE = 0.1

MPD_PERIODS = (2, 3, 5, 7, 11)
_MPD_CHANNELS = (1, 32, 128, 512, 1024)
_MSD_CONVS = (
    # (c_in, c_out, kernel, stride, groups)
    (1, 128, 15, 1, 1),
    (128, 128, 41, 2, 4),
    (128, 256, 41, 2, 16),
    (256, 512, 41, 4, 16),
    (512, 1024, 41, 4, 16),
    (1024, 1024, 41, 1, 16),
    (1024, 1024, 5, 1, 1),
)


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


# ---------------------------------------------------------------------------
# Weight norm


def weight_norm_params(conv: Params, *, transposed: bool = False) -> Params:
    """Plain conv params → torch-style weight-norm params {v, g, bias}.

    ``g`` starts at ‖v‖ so the parameterized kernel equals the original —
    torch's ``weight_norm`` init. Torch normalizes over all axes but dim 0
    of its weight layout: per-C_out for Conv1d/Conv2d, per-C_in for
    ConvTranspose1d (whose torch layout is (C_in, C_out, K)).
    """
    v = conv["kernel"]
    axes = (0, 2) if transposed else (0, 1)
    g = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return {"v": v, "g": g, "bias": conv["bias"]}


def wn_kernel(p: Params, *, transposed: bool = False) -> jnp.ndarray:
    """(v, g) → kernel = g · v / ‖v‖ (norm in f32 for bf16 stability)."""
    v = p["v"]
    axes = (0, 2) if transposed else (0, 1)
    sq = jnp.sum(v.astype(jnp.float32) ** 2, axis=axes, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24)).astype(v.dtype)
    return p["g"] * v / norm


def _is_wn(p) -> bool:
    return isinstance(p, dict) and "v" in p and "g" in p


def generator_weight_norm(params: Params) -> Params:
    """Generator plain-param tree → weight-norm tree (ups are transposed)."""
    out: Params = {
        "conv_pre": weight_norm_params(params["conv_pre"]),
        "conv_post": weight_norm_params(params["conv_post"]),
        "ups": [weight_norm_params(u, transposed=True)
                for u in params["ups"]],
        "resblocks": [
            {key: [weight_norm_params(c) for c in rb[key]]
             for key in ("convs1", "convs2")}
            for rb in params["resblocks"]
        ],
    }
    return out


def fold_weight_norm(params: Params) -> Params:
    """Weight-norm generator tree → plain kernels (inference contract;
    reference removes weight norm the same way, utils/model.py:66-69)."""

    def fold(p: Params, transposed: bool = False) -> Params:
        if not _is_wn(p):
            return p
        return {"kernel": wn_kernel(p, transposed=transposed),
                "bias": p["bias"]}

    return {
        "conv_pre": fold(params["conv_pre"]),
        "conv_post": fold(params["conv_post"]),
        "ups": [fold(u, transposed=True) for u in params["ups"]],
        "resblocks": [
            {key: [fold(c) for c in rb[key]]
             for key in ("convs1", "convs2")}
            for rb in params["resblocks"]
        ],
    }


def _wn_conv1d(x, p, **kw):
    # Kernel follows the input dtype: feeding bf16 waveforms runs the
    # discriminator convs in bf16 (weight-norm statistics stay f32 inside
    # wn_kernel; master params and losses stay f32 in the train step).
    kernel = wn_kernel(p) if _is_wn(p) else p["kernel"]
    if kernel.dtype != x.dtype:
        kernel = kernel.astype(x.dtype)
    return conv1d(x, kernel, p["bias"].astype(x.dtype), **kw)


# ---------------------------------------------------------------------------
# Multi-period discriminator


def init_mpd(rng, periods: tuple[int, ...] = MPD_PERIODS) -> Params:
    """One sub-discriminator per period; Conv2d weights stored in the
    folded-1-D layout (K, C_in, C_out) (the (k, 1) period axis is dropped —
    it is identically 1 everywhere in the paper's MPD)."""
    subs = []
    for _ in periods:
        rng, *keys = jax.random.split(rng, 7)
        convs = []
        for i in range(len(_MPD_CHANNELS) - 1):
            convs.append(weight_norm_params(conv1d_params(
                keys[i], _MPD_CHANNELS[i], _MPD_CHANNELS[i + 1], 5)))
        convs.append(weight_norm_params(
            conv1d_params(keys[4], 1024, 1024, 5)))
        subs.append({
            "convs": convs,
            "conv_post": weight_norm_params(
                conv1d_params(keys[5], 1024, 1, 3)),
        })
    return {"subs": subs}


def _apply_mpd_sub(sub: Params, wav: jnp.ndarray, period: int):
    """(B, T) → (logits (B, -1), fmaps). Period axis folded into batch."""
    b, t = wav.shape
    n_pad = (-t) % period
    if n_pad:
        wav = jnp.pad(wav, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    # (B, T) → (B, T/p, p) → period-major batch (B·p, T/p, 1)
    x = wav.reshape(b, t // period, period)
    x = x.transpose(0, 2, 1).reshape(b * period, t // period, 1)
    fmaps = []
    for i, c in enumerate(sub["convs"]):
        stride = 3 if i < 4 else 1
        x = _wn_conv1d(x, c, padding=get_padding(5), stride=stride)
        x = _lrelu(x)
        fmaps.append(x)
    x = _wn_conv1d(x, sub["conv_post"], padding=1)
    fmaps.append(x)
    # (B·p, t', 1) → (B, t'·p) in the torch flatten order (time-major).
    logits = x.reshape(b, period, -1).transpose(0, 2, 1).reshape(b, -1)
    return logits, fmaps


def apply_mpd(params: Params, wav: jnp.ndarray,
              periods: tuple[int, ...] = MPD_PERIODS):
    """(B, T) waveform → (list of per-period logits, list of fmap lists).
    ``periods`` is static (shapes depend on it)."""
    logits, fmaps = [], []
    for sub, p in zip(params["subs"], periods):
        lg, fm = _apply_mpd_sub(sub, wav, p)
        logits.append(lg)
        fmaps.append(fm)
    return logits, fmaps


# ---------------------------------------------------------------------------
# Multi-scale discriminator


def init_msd(rng, n_scales: int = 3) -> Params:
    subs = []
    for _ in range(n_scales):
        rng, *keys = jax.random.split(rng, len(_MSD_CONVS) + 2)
        convs = []
        for i, (c_in, c_out, k, _s, groups) in enumerate(_MSD_CONVS):
            # grouped conv kernel: (K, C_in/groups, C_out)
            convs.append(weight_norm_params(
                conv1d_params(keys[i], c_in // groups, c_out, k)))
        subs.append({
            "convs": convs,
            "conv_post": weight_norm_params(
                conv1d_params(keys[-1], 1024, 1, 3)),
        })
    return {"subs": subs}


def _avg_pool(wav: jnp.ndarray, k: int = 4, stride: int = 2,
              pad: int = 2) -> jnp.ndarray:
    """torch AvgPool1d(4, 2, padding=2) (count_include_pad=True)."""
    x = jnp.pad(wav, ((0, 0), (pad, pad)))
    n = 1 + (x.shape[1] - k) // stride
    idx = jnp.arange(n) * stride
    windows = x[:, idx[:, None] + jnp.arange(k)[None, :]]
    return windows.mean(-1)


def _apply_msd_sub(sub: Params, wav: jnp.ndarray):
    x = wav[:, :, None]  # (B, T, 1)
    fmaps = []
    for c, (_ci, _co, k, stride, groups) in zip(sub["convs"], _MSD_CONVS):
        x = _wn_conv1d(x, c, padding=(k - 1) // 2, stride=stride,
                       groups=groups)
        x = _lrelu(x)
        fmaps.append(x)
    x = _wn_conv1d(x, sub["conv_post"], padding=1)
    fmaps.append(x)
    return x.reshape(x.shape[0], -1), fmaps


def apply_msd(params: Params, wav: jnp.ndarray):
    """(B, T) → per-scale logits + fmaps; scales are ×1, ×2, ×4 avg-pooled."""
    logits, fmaps = [], []
    x = wav
    for i, sub in enumerate(params["subs"]):
        if i > 0:
            x = _avg_pool(x)
        lg, fm = _apply_msd_sub(sub, x)
        logits.append(lg)
        fmaps.append(fm)
    return logits, fmaps


# ---------------------------------------------------------------------------
# GAN losses (LSGAN, per the HiFi-GAN recipe the reference's config.json
# parameters belong to)


def discriminator_loss(real_logits, fake_logits):
    # Losses reduce in f32 even when the conv stack ran in bf16.
    loss = 0.0
    for dr, dg in zip(real_logits, fake_logits):
        dr, dg = dr.astype(jnp.float32), dg.astype(jnp.float32)
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_adv_loss(fake_logits):
    loss = 0.0
    for dg in fake_logits:
        loss = loss + jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
    return loss


def feature_matching_loss(real_fmaps, fake_fmaps):
    loss = 0.0
    for sub_r, sub_g in zip(real_fmaps, fake_fmaps):
        for fr, fg in zip(sub_r, sub_g):
            loss = loss + jnp.mean(
                jnp.abs(fr.astype(jnp.float32) - fg.astype(jnp.float32)))
    return 2.0 * loss
