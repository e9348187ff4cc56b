"""PostNet: 5× conv1d(512, k=5) + BatchNorm + tanh (last layer linear),
dropout 0.5; the residual add is done by the caller.

Reference: transformer/Layers.py:33-137 (note the reference applies dropout
in both train and eval via ``F.dropout(..., self.training)`` — dropout is
correctly off at eval, BatchNorm uses running stats at eval).

BatchNorm running statistics live in a separate ``state`` pytree so the
optimizer never touches them.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops import batch_norm_inference, batch_norm_train, conv1d
from .init import conv1d_params

Params = dict[str, Any]


def init_postnet(
    rng,
    n_mel_channels: int = 80,
    embedding_dim: int = 512,
    kernel_size: int = 5,
    n_convolutions: int = 5,
) -> tuple[Params, Params]:
    """Returns (params, bn_state)."""
    keys = jax.random.split(rng, n_convolutions)
    convs = []
    state = []
    dims = (
        [(n_mel_channels, embedding_dim)]
        + [(embedding_dim, embedding_dim)] * (n_convolutions - 2)
        + [(embedding_dim, n_mel_channels)]
    )
    for key, (c_in, c_out) in zip(keys, dims):
        convs.append({
            **conv1d_params(key, c_in, c_out, kernel_size),
            "bn_g": jnp.ones((c_out,)),
            "bn_b": jnp.zeros((c_out,)),
        })
        state.append({
            "mean": jnp.zeros((c_out,)),
            "var": jnp.ones((c_out,)),
        })
    return {"convs": convs}, {"convs": state}


def apply_postnet(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    *,
    kernel_size: int = 5,
    mask: jnp.ndarray | None = None,
    deterministic: bool = True,
    rng=None,
) -> tuple[jnp.ndarray, Params]:
    """(B, T, n_mels) → (B, T, n_mels) residual; returns updated bn state.

    ``mask`` (True at padded frames, ModelConfig.padding_inert): each
    layer's output is zeroed at padded rows so the next conv sees the
    implicit zeros an exact-length run would — bucketed numerics equal
    unpadded numerics."""
    pad = (kernel_size - 1) // 2
    new_state = []
    n = len(params["convs"])
    for i, (conv, bn) in enumerate(zip(params["convs"], state["convs"])):
        x = conv1d(x, conv["kernel"], conv["bias"], padding=pad)
        if deterministic:
            x = batch_norm_inference(x, conv["bn_g"], conv["bn_b"],
                                     bn["mean"], bn["var"])
            new_state.append(bn)
        else:
            x, m, v = batch_norm_train(x, conv["bn_g"], conv["bn_b"],
                                       bn["mean"], bn["var"])
            new_state.append({"mean": m, "var": v})
        if i < n - 1:
            x = jnp.tanh(x)
        if not deterministic:
            sub = jax.random.fold_in(rng, i)
            keep = jax.random.bernoulli(sub, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
        if mask is not None:
            x = jnp.where(mask[..., None], 0.0, x)
    return x, {"convs": new_state}
