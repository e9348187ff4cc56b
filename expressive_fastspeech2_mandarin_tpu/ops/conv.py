"""1-D convolution primitives with explicit, torch-compatible semantics.

All convs operate on feature-last ``(B, T, C)`` activations — the layout XLA
tiles best onto the TPU MXU — with kernels stored as ``(K, C_in, C_out)``.
The torch→here weight conversion is a single transpose (torch Conv1d keeps
``(C_out, C_in, K)``).

``conv1d`` matches ``torch.nn.Conv1d(stride=1, padding=p, dilation=d)``;
``conv_transpose1d`` matches ``torch.nn.ConvTranspose1d(stride=s,
padding=p)`` via the standard input-dilation equivalence — this is how the
HiFi-GAN upsampling stack is expressed natively for XLA
(reference: hifigan/models.py:112-174).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DN = ("NWC", "WIO", "NWC")  # batch-time-feature, kernel (K, Cin, Cout)


# Above this im2col-buffer size (elements of B*T*K*Cin) the explicit-matmul
# path would blow HBM (e.g. the vocoder's 256k-sample stages) — fall back to
# lax.conv there.
_IM2COL_MAX_ELEMENTS = 16 * 1024 * 1024


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    padding: int = 0,
    dilation: int = 1,
    stride: int = 1,
    groups: int = 1,
    im2col: bool | None = None,
) -> jnp.ndarray:
    """(B, T, Cin) ⊛ (K, Cin/groups, Cout) → (B, T', Cout).

    ``im2col=None`` auto-selects an explicit shifted-slice + matmul
    formulation for small kernels: XLA:TPU's conv *gradient* lowering is
    ~8× slower than the equivalent matmul at this model's training shapes
    (measured v5e: FFN k=9 backward 0.35 ms conv vs 0.044 ms im2col), so
    every conv on the training path goes through the MXU as a plain dot.
    """
    k = kernel.shape[0]
    if im2col is None:
        im2col = (
            stride == 1 and groups == 1 and dilation == 1
            and x.size // x.shape[-1] * k * kernel.shape[1]
            <= _IM2COL_MAX_ELEMENTS)
    if im2col and stride == 1 and groups == 1 and dilation == 1:
        c_in = kernel.shape[1]
        if k == 1:
            if padding > 0:
                x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
            out = jnp.einsum(
                "btc,co->bto", x, kernel[0],
                preferred_element_type=x.dtype)
        else:
            xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
            t_out = xp.shape[1] - k + 1
            cols = jnp.concatenate(
                [xp[:, i: i + t_out, :] for i in range(k)], axis=-1)
            out = jnp.einsum(
                "btk,ko->bto", cols, kernel.reshape(k * c_in, -1),
                preferred_element_type=x.dtype)
        return out if bias is None else out + bias
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Torch-semantics ConvTranspose1d on (B, T, Cin).

    ``kernel`` is (K, Cin, Cout) — i.e. torch's ConvTranspose1d weight
    ``(Cin, Cout, K)`` transposed to (K, Cin, Cout).  Output length is
    ``(T-1)*stride - 2*padding + K`` (output_padding=0).

    Implemented as input dilation + a flipped-kernel convolution, which XLA
    lowers to MXU-friendly code instead of scatter.
    """
    k = kernel.shape[0]
    # conv_transpose(x, w) == conv(dilate(x, stride), flip(w), pad = K-1-p)
    flipped = jnp.flip(kernel, axis=0)
    out = lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def layer_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last axis (torch nn.LayerNorm semantics).

    Statistics accumulate in f32 regardless of the activation dtype so the
    bf16 mixed-precision path (TrainConfig.amp_dtype) keeps full-precision
    normalization; the result returns in x's dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)
            * gamma + beta)


def batch_norm_inference(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """BatchNorm over the channel (last) axis using running statistics."""
    inv = lax.rsqrt(running_var + eps)
    return (x - running_mean) * inv * gamma + beta


def batch_norm_train(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    *,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training-mode BatchNorm over (B, T, C): normalize with batch stats,
    return (out, new_running_mean, new_running_var).

    Matches torch BatchNorm1d: batch stats are biased for normalization,
    unbiased for the running-average update; torch ``momentum`` weighs the
    *new* observation.
    """
    axes = tuple(range(x.ndim - 1))
    # Batch statistics in f32 (bf16 means over B*T elements drift; the
    # running state stays f32 so the train-state pytree keeps its dtypes
    # under the amp path).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf - mean), axis=axes)  # biased
    n = x.size // x.shape[-1]
    unbiased = var * (n / max(n - 1, 1))
    out = (((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)
           * gamma + beta)
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * unbiased
    return out, new_mean, new_var
