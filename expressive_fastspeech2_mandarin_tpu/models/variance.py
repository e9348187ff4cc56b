"""Variance adaptor: duration/pitch/energy prediction, quantized embedding,
and vectorized length regulation.

Reference semantics: model/modules.py:17-296. Key parity points replicated:

* VariancePredictor: conv(k, pad=(k-1)//2) → ReLU → LN → dropout →
  conv(k, pad=1) → ReLU → LN → dropout → linear → squeeze, output
  masked_fill(0) at padding (modules.py:197-250).
* duration rounding: ``clamp(round(exp(log_d) - 1) * d_control, min=0)``
  (modules.py:132-135).
* pitch/energy bucketize into n_bins-1 boundaries, embedding lookup
  (modules.py:80-100).
* the energy-control quirk: the reference scales the *energy* prediction by
  ``p_control`` (modules.py:122-126); replicated behind
  ``ModelConfig.replicate_energy_control_bug``.

The Python expand/cat loop of the reference LengthRegulator is replaced by a
cumsum + searchsorted + gather (see ``ops.length_regulator``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import conv1d, layer_norm, length_regulate, mask_from_lengths
from .init import conv1d_params, layer_norm_params, linear_params

Params = dict[str, Any]


def init_variance_predictor(rng, d_in: int, d_filter: int, k: int) -> Params:
    keys = jax.random.split(rng, 3)
    return {
        "conv1": conv1d_params(keys[0], d_in, d_filter, k),
        "ln1": layer_norm_params(d_filter),
        "conv2": conv1d_params(keys[1], d_filter, d_filter, k),
        "ln2": layer_norm_params(d_filter),
        "linear": linear_params(keys[2], d_filter, 1),
    }


def apply_variance_predictor(
    params: Params,
    x: jnp.ndarray,
    pad_mask: jnp.ndarray,
    k: int,
    *,
    dropout: float = 0.5,
    deterministic: bool = True,
    rng=None,
    inert: bool = False,
) -> jnp.ndarray:
    """(B, T, D) → (B, T) scalar predictions, zeroed at padding.

    ``inert``: zero the hidden activations at padded positions between the
    two convs, so conv2 sees the implicit zeros an exact-length run would
    (ModelConfig.padding_inert; the reference masks only the output,
    modules.py:247-249)."""
    h = conv1d(x, params["conv1"]["kernel"], params["conv1"]["bias"],
               padding=(k - 1) // 2)
    h = jax.nn.relu(h)
    h = layer_norm(h, params["ln1"]["g"], params["ln1"]["b"])
    if inert:
        h = jnp.where(pad_mask[..., None], 0.0, h)
    if not deterministic:
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    # NB: the reference hard-codes padding=1 for the second conv
    # (modules.py:224-232); identical for the default kernel_size=3.
    h = conv1d(h, params["conv2"]["kernel"], params["conv2"]["bias"], padding=1)
    h = jax.nn.relu(h)
    h = layer_norm(h, params["ln2"]["g"], params["ln2"]["b"])
    if not deterministic:
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    out = (h @ params["linear"]["w"] + params["linear"]["b"])[..., 0]
    return jnp.where(pad_mask, 0.0, out)


def bucketize(values: jnp.ndarray, boundaries: jnp.ndarray) -> jnp.ndarray:
    """torch.bucketize(right=False) equivalent: index of first boundary
    >= value is returned for exact hits on the left, i.e. the count of
    boundaries strictly below ``value`` plus hits handling — matches
    ``searchsorted(side='left')``."""
    return jnp.searchsorted(boundaries, values, side="left").astype(jnp.int32)


def make_variance_bins(stats_min: float, stats_max: float, n_bins: int,
                       quantization: str) -> jnp.ndarray:
    """Bucket boundaries from corpus stats (reference: modules.py:48-71)."""
    if quantization == "log":
        return jnp.exp(
            jnp.linspace(jnp.log(stats_min), jnp.log(stats_max), n_bins - 1)
        )
    return jnp.linspace(stats_min, stats_max, n_bins - 1)


def init_variance_adaptor(rng, cfg: ModelConfig) -> Params:
    d = cfg.transformer.encoder_hidden
    vp = cfg.variance_predictor
    keys = jax.random.split(rng, 5)
    return {
        "duration_predictor": init_variance_predictor(keys[0], d, vp.filter_size, vp.kernel_size),
        "pitch_predictor": init_variance_predictor(keys[1], d, vp.filter_size, vp.kernel_size),
        "energy_predictor": init_variance_predictor(keys[2], d, vp.filter_size, vp.kernel_size),
        "pitch_embedding": jax.random.normal(
            keys[3], (cfg.variance_embedding.n_bins, d)),
        "energy_embedding": jax.random.normal(
            keys[4], (cfg.variance_embedding.n_bins, d)),
    }


def apply_variance_adaptor(
    params: Params,
    x: jnp.ndarray,
    src_mask: jnp.ndarray,
    consts: dict[str, jnp.ndarray],
    cfg: ModelConfig,
    max_mel_len: int,
    *,
    pitch_feature_level: str = "phoneme_level",
    energy_feature_level: str = "phoneme_level",
    mel_mask: jnp.ndarray | None = None,
    pitch_target: jnp.ndarray | None = None,
    energy_target: jnp.ndarray | None = None,
    duration_target: jnp.ndarray | None = None,
    p_control: float = 1.0,
    e_control: float = 1.0,
    d_control: float = 1.0,
    deterministic: bool = True,
    rng=None,
):
    """Reference: model/modules.py:102-158. Returns
    (frames, p_pred, e_pred, log_d_pred, d_rounded, mel_lens, mel_mask)."""
    vp_k = cfg.variance_predictor.kernel_size
    vp_drop = cfg.variance_predictor.dropout

    def predictor(name, inp, mask, i):
        sub = None if deterministic else jax.random.fold_in(rng, i)
        return apply_variance_predictor(
            params[name], inp, mask, vp_k,
            dropout=vp_drop, deterministic=deterministic, rng=sub,
            inert=cfg.padding_inert,
        )

    def variance_embed(name, prediction, target, control, bins):
        if target is not None:
            return prediction, params[name][bucketize(target, bins)]
        scaled = prediction * control
        return scaled, params[name][bucketize(scaled, bins)]

    def inert(v, mask):
        # padding_inert: keep padded positions at zero after every embedding
        # add, so downstream convs (energy predictor, frame-level
        # predictors) see exact-length implicit zeros (ModelConfig note).
        return jnp.where(mask[..., None], 0.0, v) if cfg.padding_inert else v

    log_d_pred = predictor("duration_predictor", x, src_mask, 0)

    p_pred = e_pred = None
    if pitch_feature_level == "phoneme_level":
        p_pred, p_emb = variance_embed(
            "pitch_embedding", predictor("pitch_predictor", x, src_mask, 1),
            pitch_target, p_control, consts["pitch_bins"])
        x = inert(x + p_emb, src_mask)
    if energy_feature_level == "phoneme_level":
        e_ctl = p_control if cfg.replicate_energy_control_bug else e_control
        e_pred, e_emb = variance_embed(
            "energy_embedding", predictor("energy_predictor", x, src_mask, 2),
            energy_target, e_ctl, consts["energy_bins"])
        x = inert(x + e_emb, src_mask)

    if duration_target is not None:
        frames, mel_lens = length_regulate(x, duration_target, max_mel_len)
        d_rounded = duration_target
        # mel_mask provided by caller (teacher forcing).
    else:
        d_rounded = jnp.maximum(
            jnp.round(jnp.exp(log_d_pred) - 1.0) * d_control, 0.0
        )
        frames, mel_lens = length_regulate(x, d_rounded, max_mel_len)
        mel_mask = mask_from_lengths(mel_lens, max_mel_len)

    if "frame_level" in (pitch_feature_level, energy_feature_level):
        # Length-regulated padded rows gather from the clamped last phone;
        # zero them before any frame-level predictor conv reads them.
        frames = inert(frames, mel_mask)
    if pitch_feature_level == "frame_level":
        p_pred, p_emb = variance_embed(
            "pitch_embedding", predictor("pitch_predictor", frames, mel_mask, 3),
            pitch_target, p_control, consts["pitch_bins"])
        frames = inert(frames + p_emb, mel_mask)
    if energy_feature_level == "frame_level":
        e_ctl = p_control if cfg.replicate_energy_control_bug else e_control
        e_pred, e_emb = variance_embed(
            "energy_embedding", predictor("energy_predictor", frames, mel_mask, 4),
            energy_target, e_ctl, consts["energy_bins"])
        frames = inert(frames + e_emb, mel_mask)

    return frames, p_pred, e_pred, log_d_pred, d_rounded, mel_lens, mel_mask
