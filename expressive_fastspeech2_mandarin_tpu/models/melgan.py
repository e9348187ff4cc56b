"""MelGAN generator — the reference's alternative vocoder
(reference: utils/model.py:46-56 loads ``descriptinc/melgan-neurips`` via
torch.hub; inference divides the log-mel by ln(10) since MelGAN was trained
on log10 mels, utils/model.py:78-79).

Architecture (melgan-neurips multi-speaker generator): reflect-pad conv7
(80→512) → per ratio r ∈ (8,8,2,2): leaky_relu(0.2) → ConvTranspose1d
(k=2r, stride=r, pad=r//2) halving channels → 3 ResnetBlocks with dilations
3^j (reflect-padded dilated conv3 + conv1, plus conv1 shortcut) → leaky_relu
→ reflect-pad conv7 (32→1) → tanh.

Weight-norm is folded at conversion (interop.torch_ckpt semantics).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv1d, conv_transpose1d
from .init import conv1d_params

Params = dict[str, Any]

RATIOS = (8, 8, 2, 2)
NGF = 32
N_RESIDUAL = 3


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _reflect_conv(x, conv, kernel_size, dilation=1):
    pad = dilation * (kernel_size - 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    return conv1d(x, conv["kernel"], conv["bias"], padding=0,
                  dilation=dilation)


def init_melgan(rng, n_mels: int = 80) -> Params:
    n_ups = len(RATIOS)
    mult = 2 ** n_ups
    keys = iter(jax.random.split(rng, 2 + n_ups * (1 + 3 * N_RESIDUAL)))
    params: Params = {
        "conv_pre": conv1d_params(next(keys), n_mels, NGF * mult, 7),
        "ups": [],
        "resblocks": [],  # [stage][residual] each with block1/block3/shortcut
    }
    ch = NGF * mult
    for r in RATIOS:
        params["ups"].append(conv1d_params(next(keys), ch, ch // 2, 2 * r))
        ch //= 2
        stage = []
        for j in range(N_RESIDUAL):
            stage.append({
                "conv_dilated": conv1d_params(next(keys), ch, ch, 3),
                "conv_1x1": conv1d_params(next(keys), ch, ch, 1),
                "shortcut": conv1d_params(next(keys), ch, ch, 1),
            })
        params["resblocks"].append(stage)
    params["conv_post"] = conv1d_params(next(keys), ch, 1, 7)
    return params


def apply_melgan(params: Params, log_mel: jnp.ndarray,
                 from_natural_log: bool = True) -> jnp.ndarray:
    """(B, T, n_mels) log-mel → (B, T*256) waveform.

    ``from_natural_log=True`` divides by ln(10), reproducing the reference's
    ``vocoder.inverse(mels / np.log(10))`` (utils/model.py:78-79).
    """
    x = log_mel / np.log(10.0) if from_natural_log else log_mel
    x = _reflect_conv(x, params["conv_pre"], 7)
    for i, r in enumerate(RATIOS):
        x = _lrelu(x)
        up = params["ups"][i]
        x = conv_transpose1d(x, up["kernel"], up["bias"], stride=r,
                             padding=r // 2)
        for j in range(N_RESIDUAL):
            rb = params["resblocks"][i][j]
            h = _lrelu(x)
            h = _reflect_conv(h, rb["conv_dilated"], 3, dilation=3 ** j)
            h = _lrelu(h)
            h = conv1d(h, rb["conv_1x1"]["kernel"], rb["conv_1x1"]["bias"])
            s = conv1d(x, rb["shortcut"]["kernel"], rb["shortcut"]["bias"])
            x = h + s
    x = _lrelu(x)
    x = _reflect_conv(x, params["conv_post"], 7)
    return jnp.tanh(x)[..., 0]


def convert_melgan(sd: dict[str, np.ndarray]) -> Params:
    """torch.hub melgan-neurips ``mel2wav.model`` Sequential state dict →
    params (weight-norm folded). Sequential indices: 1=conv_pre, then per
    stage s: base=2+s*(2+N_RESIDUAL), base+1=upsample,
    base+2+j=ResnetBlock; final conv at the penultimate index."""
    from ..interop.torch_ckpt import _fold_weight_norm

    def conv(prefix):
        w = _fold_weight_norm(sd, prefix)  # (Cout, Cin, K)
        return {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
                "bias": sd[f"{prefix}.bias"]}

    def convt(prefix):
        w = _fold_weight_norm(sd, prefix)  # (Cin, Cout, K)
        return {"kernel": np.ascontiguousarray(w.transpose(2, 0, 1)),
                "bias": sd[f"{prefix}.bias"]}

    # Strip an optional "model." / "mel2wav.model." prefix.
    for pfx in ("mel2wav.model.", "model.", ""):
        if any(k.startswith(pfx + "1.") for k in sd):
            break
    sd = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}

    params: Params = {"conv_pre": conv("1"), "ups": [], "resblocks": []}
    idx = 2
    for _ in RATIOS:
        idx += 1  # LeakyReLU
        params["ups"].append(convt(str(idx)))
        idx += 1
        stage = []
        for _j in range(N_RESIDUAL):
            stage.append({
                "conv_dilated": conv(f"{idx}.block.2"),
                "conv_1x1": conv(f"{idx}.block.4"),
                "shortcut": conv(f"{idx}.shortcut"),
            })
            idx += 1
        params["resblocks"].append(stage)
    idx += 2  # LeakyReLU, ReflectionPad
    params["conv_post"] = conv(str(idx))
    return params
