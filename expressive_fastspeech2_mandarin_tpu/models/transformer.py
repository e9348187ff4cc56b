"""FFT-block transformer encoder/decoder.

Semantics match the reference exactly (post-LN residual order, ``-inf`` key
masking before softmax, masked_fill-to-zero after each sublayer, sinusoidal
absolute positions, decoder clamp to ``max_seq_len``):
reference: transformer/Models.py, transformer/Layers.py:11-30,
transformer/SubLayers.py, transformer/Modules.py.

The implementation is TPU-first: feature-last activations, batched-einsum
attention (see ``ops.attention``), conv-FFN via ``lax.conv_general_dilated``,
everything static-shaped under ``jit``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TransformerConfig
from ..ops import conv1d, layer_norm, multi_head_attention
from .init import conv1d_params, layer_norm_params, linear_params

Params = dict[str, Any]


def sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoidal position table (reference: transformer/Models.py:10-30)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


# ---------------------------------------------------------------------------
# FFT block


def init_fft_block(rng, d_model: int, n_head: int, d_k: int, d_inner: int,
                   kernel_size: tuple[int, int]) -> Params:
    keys = jax.random.split(rng, 6)
    return {
        "attn": {
            "wq": linear_params(keys[0], d_model, n_head * d_k),
            "wk": linear_params(keys[1], d_model, n_head * d_k),
            "wv": linear_params(keys[2], d_model, n_head * d_k),
            "fc": linear_params(keys[3], n_head * d_k, d_model),
            "ln": layer_norm_params(d_model),
        },
        "ffn": {
            "w1": conv1d_params(keys[4], d_model, d_inner, kernel_size[0]),
            "w2": conv1d_params(keys[5], d_inner, d_model, kernel_size[1]),
            "ln": layer_norm_params(d_model),
        },
    }


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def apply_fft_block(
    params: Params,
    x: jnp.ndarray,
    pad_mask: jnp.ndarray,
    n_head: int,
    kernel_size: tuple[int, int],
    *,
    dropout: float = 0.0,
    deterministic: bool = True,
    rng=None,
    attention_impl: str = "auto",
) -> jnp.ndarray:
    """One FFT block over (B, T, D); ``pad_mask`` (B, T) True at padding."""
    a = params["attn"]
    residual = x
    out = multi_head_attention(
        x, a["wq"]["w"], a["wq"]["b"], a["wk"]["w"], a["wk"]["b"],
        a["wv"]["w"], a["wv"]["b"], n_head, pad_mask,
        impl=attention_impl,
    )
    out = out @ a["fc"]["w"] + a["fc"]["b"]
    if not deterministic:
        rng, sub = jax.random.split(rng)
        out = _dropout(out, dropout, sub, deterministic)
    out = layer_norm(out + residual, a["ln"]["g"], a["ln"]["b"])
    out = jnp.where(pad_mask[..., None], 0.0, out)

    f = params["ffn"]
    residual = out
    h = conv1d(out, f["w1"]["kernel"], f["w1"]["bias"],
               padding=(kernel_size[0] - 1) // 2)
    h = jax.nn.relu(h)
    h = conv1d(h, f["w2"]["kernel"], f["w2"]["bias"],
               padding=(kernel_size[1] - 1) // 2)
    if not deterministic:
        rng, sub = jax.random.split(rng)
        h = _dropout(h, dropout, sub, deterministic)
    h = layer_norm(h + residual, f["ln"]["g"], f["ln"]["b"])
    h = jnp.where(pad_mask[..., None], 0.0, h)
    return h


# ---------------------------------------------------------------------------
# Encoder / Decoder stacks


def init_encoder(rng, cfg: TransformerConfig, vocab_size: int) -> Params:
    d_k = cfg.encoder_hidden // cfg.encoder_head
    keys = jax.random.split(rng, cfg.encoder_layer + 1)
    embed = jax.random.normal(keys[0], (vocab_size, cfg.encoder_hidden))
    embed = embed.at[0].set(0.0)  # padding_idx=0 (reference: Models.py:56-58)
    return {
        "embed": embed,
        "layers": [
            init_fft_block(keys[i + 1], cfg.encoder_hidden, cfg.encoder_head,
                           d_k, cfg.conv_filter_size, cfg.conv_kernel_size)
            for i in range(cfg.encoder_layer)
        ],
    }


def apply_encoder(
    params: Params,
    texts: jnp.ndarray,
    pad_mask: jnp.ndarray,
    pos_table: jnp.ndarray,
    cfg: TransformerConfig,
    *,
    deterministic: bool = True,
    rng=None,
) -> jnp.ndarray:
    """(B, S) int phoneme IDs → (B, S, D) encodings."""
    t = texts.shape[1]
    x = params["embed"][texts] + pos_table[None, :t, :]
    for i, layer in enumerate(params["layers"]):
        sub = None if deterministic else jax.random.fold_in(rng, i)
        x = apply_fft_block(
            layer, x, pad_mask, cfg.encoder_head, cfg.conv_kernel_size,
            dropout=cfg.encoder_dropout, deterministic=deterministic, rng=sub,
            attention_impl=cfg.attention_impl,
        )
    return x


def init_decoder(rng, cfg: TransformerConfig) -> Params:
    d_k = cfg.decoder_hidden // cfg.decoder_head
    keys = jax.random.split(rng, cfg.decoder_layer)
    return {
        "layers": [
            init_fft_block(keys[i], cfg.decoder_hidden, cfg.decoder_head,
                           d_k, cfg.conv_filter_size, cfg.conv_kernel_size)
            for i in range(cfg.decoder_layer)
        ],
    }


def apply_decoder(
    params: Params,
    x: jnp.ndarray,
    pad_mask: jnp.ndarray,
    pos_table: jnp.ndarray,
    cfg: TransformerConfig,
    *,
    deterministic: bool = True,
    rng=None,
) -> jnp.ndarray:
    """(B, T, D) frame states → (B, T, D).

    T is static and must already respect ``max_seq_len`` (the reference's
    runtime clamp, transformer/Models.py:154-162, becomes a shape contract
    under XLA; longer inference sequences use a longer ``pos_table``
    regenerated at trace time, matching Models.py:145-151).
    """
    t = x.shape[1]
    x = x + pos_table[None, :t, :]
    for i, layer in enumerate(params["layers"]):
        sub = None if deterministic else jax.random.fold_in(rng, i)
        x = apply_fft_block(
            layer, x, pad_mask, cfg.decoder_head, cfg.conv_kernel_size,
            dropout=cfg.decoder_dropout, deterministic=deterministic, rng=sub,
            attention_impl=cfg.attention_impl,
        )
    return x
