"""HiFi-GAN V1 universal generator (inference vocoder).

Topology (reference: hifigan/models.py:112-174 + hifigan/config.json):
conv_pre(80→512, k7) → 4× [leaky_relu → ConvTranspose1d ×(8,8,2,2) →
MRF: mean of 3 ResBlocks (k ∈ {3,7,11}, dilations (1,3,5))] → leaky_relu →
conv_post(→1, k7) → tanh.

TPU-native formulation: feature-last activations, transposed convs as
input-dilated convolutions (``ops.conv_transpose1d``) which XLA lowers to
MXU matmuls; weight-norm is folded into plain kernels at conversion time
(the reference also removes weight norm before inference,
utils/model.py:66-69).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import VocoderConfig
from ..ops import conv1d, conv_transpose1d
from .init import conv1d_params

Params = dict[str, Any]
LRELU_SLOPE = 0.1


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def init_resblock(rng, channels: int, kernel_size: int,
                  dilations: tuple[int, ...]) -> Params:
    keys = jax.random.split(rng, 2 * len(dilations))
    return {
        "convs1": [conv1d_params(keys[2 * i], channels, channels, kernel_size)
                   for i in range(len(dilations))],
        "convs2": [conv1d_params(keys[2 * i + 1], channels, channels, kernel_size)
                   for i in range(len(dilations))],
    }


def apply_resblock(params: Params, x: jnp.ndarray, kernel_size: int,
                   dilations: tuple[int, ...]) -> jnp.ndarray:
    for c1, c2, d in zip(params["convs1"], params["convs2"], dilations):
        xt = _lrelu(x)
        xt = conv1d(xt, c1["kernel"], c1["bias"],
                    padding=get_padding(kernel_size, d), dilation=d)
        xt = _lrelu(xt)
        xt = conv1d(xt, c2["kernel"], c2["bias"],
                    padding=get_padding(kernel_size, 1))
        x = xt + x
    return x


def init_generator(rng, cfg: VocoderConfig, n_mels: int = 80) -> Params:
    num_ups = len(cfg.upsample_rates)
    keys = jax.random.split(rng, 2 + num_ups + num_ups * len(cfg.resblock_kernel_sizes))
    ki = iter(range(len(keys)))
    params: Params = {
        "conv_pre": conv1d_params(keys[next(ki)], n_mels,
                                  cfg.upsample_initial_channel, 7),
        "ups": [],
        "resblocks": [],
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_in = cfg.upsample_initial_channel // (2 ** i)
        c_out = cfg.upsample_initial_channel // (2 ** (i + 1))
        params["ups"].append(conv1d_params(keys[next(ki)], c_in, c_out, k))
        for kr, dr in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            params["resblocks"].append(
                init_resblock(keys[next(ki)], c_out, kr, tuple(dr)))
    ch = cfg.upsample_initial_channel // (2 ** num_ups)
    params["conv_post"] = conv1d_params(keys[next(ki)], ch, 1, 7)
    return params


def apply_generator(params: Params, mel: jnp.ndarray,
                    cfg: VocoderConfig) -> jnp.ndarray:
    """(B, T, n_mels) mel → (B, T*prod(upsample_rates)) waveform in [-1, 1]."""
    num_kernels = len(cfg.resblock_kernel_sizes)
    x = conv1d(mel, params["conv_pre"]["kernel"], params["conv_pre"]["bias"],
               padding=3)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _lrelu(x)
        up = params["ups"][i]
        x = conv_transpose1d(x, up["kernel"], up["bias"],
                             stride=u, padding=(k - u) // 2)
        xs = None
        for j in range(num_kernels):
            rb = params["resblocks"][i * num_kernels + j]
            out = apply_resblock(
                rb, x, cfg.resblock_kernel_sizes[j],
                tuple(cfg.resblock_dilation_sizes[j]))
            xs = out if xs is None else xs + out
        x = xs / num_kernels
    # The reference's final activation is a *default-slope* (0.01) leaky_relu
    # (hifigan/models.py:162: F.leaky_relu without LRELU_SLOPE).
    x = jax.nn.leaky_relu(x, 0.01)
    x = conv1d(x, params["conv_post"]["kernel"], params["conv_post"]["bias"],
               padding=3)
    return jnp.tanh(x)[..., 0]
