"""Fused HiFi-GAN MRF resblock as a Pallas TPU kernel.

A resblock (reference: hifigan/models.py:20-60) is a chain of three
``x += conv2(lrelu(conv1(lrelu(x))))`` pairs. The XLA path streams every
conv's full activation through HBM (~12 streams per resblock); this kernel
keeps the whole chain VMEM-resident per time tile, so HBM traffic drops to
one read + one write of the activation and the MXU runs back-to-back.

Formulation: every conv is a short FIR of matmuls over the (time-packed)
channel dim — y[t] = Σ_β x[t+β] @ W[β] — with

* λ-packed block-polyphase kernels for small-channel stages (λ = 128/C
  consecutive timesteps folded into lanes, see models/hifigan.py), all β in
  a dense range, and
* the raw dilated taps (β = (i-center)·d) for full-lane stages (λ = 1),
  skipping the zero taps a dense dilated expansion would compute.

Halos: each grid cell reads its neighbor time tiles via three BlockSpecs on
the same (zero-padded) input, so no manual DMA is needed and Pallas
pipelines/double-buffers the loads. Zero-padding parity with the per-conv
``padding=same`` reference semantics is kept by masking rows outside the
true sequence after every conv.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class ConvMeta:
    tap_start: int            # index of first tap in the stacked taps array
    offsets: tuple[int, ...]  # row offset of each tap relative to the output


@dataclass(frozen=True)
class ResBlockMeta:
    convs: tuple[ConvMeta, ...]  # conv1,conv2 interleaved: (c1_0,c2_0,c1_1,…)
    halo: int                    # max one-sided margin consumed by the chain
    cp: int                      # packed channel count (λ·C)


def _conv_offsets(k: int, dilation: int, lam: int) -> tuple[int, ...]:
    """Row offsets of the FIR taps — static, derivable without weights."""
    if lam == 1:
        center = (k - 1) // 2
        return tuple((i - center) * dilation for i in range(k))
    from ...models.hifigan import _pack_padding

    left, right = _pack_padding(k, dilation, lam)
    return tuple(range(-left, right + 1))


def _conv_taps(kernel, dilation: int, lam: int):
    """Stacked (n_taps, Cp, Cp) tap matrices + their row offsets."""
    import numpy as np

    from ...models.hifigan import _pack_conv_weight

    kernel = np.asarray(kernel)
    k = kernel.shape[0]
    if lam == 1:
        return kernel, _conv_offsets(k, dilation, lam)
    packed, left, right = _pack_conv_weight(kernel, dilation, lam)
    offsets = tuple(range(-left, right + 1))
    assert offsets == _conv_offsets(k, dilation, lam)
    return packed, offsets


@functools.cache
def resblock_meta(kernel_size: int, dilations: tuple[int, ...], lam: int,
                  cp: int) -> ResBlockMeta:
    """Static meta for a resblock shape — no weights needed, cacheable, so
    ``apply_generator`` can reconstruct it under jit from config alone."""
    conv_metas = []
    total = 0
    for d in dilations:
        for dil in (d, 1):
            offs = _conv_offsets(kernel_size, dil, lam)
            conv_metas.append(ConvMeta(total, offs))
            total += len(offs)
    left = sum(-min(cm.offsets) for cm in conv_metas)
    right = sum(max(cm.offsets) for cm in conv_metas)
    return ResBlockMeta(tuple(conv_metas), max(left, right), cp)


def pack_resblock(rb_params, kernel_size: int, dilations: tuple[int, ...],
                  lam: int, dtype=jnp.bfloat16):
    """Precompute the stacked taps / biases / static meta for one resblock.

    Returns ``(taps, biases, meta)``: taps (TOTAL, Cp, Cp), biases (6, Cp),
    meta a hashable ResBlockMeta.
    """
    import numpy as np

    taps_list, conv_metas, biases = [], [], []
    total = 0
    for c1, c2, d in zip(rb_params["convs1"], rb_params["convs2"], dilations):
        for conv, dil in ((c1, d), (c2, 1)):
            t, offs = _conv_taps(conv["kernel"], dil, lam)
            conv_metas.append(ConvMeta(total, offs))
            taps_list.append(t)
            total += t.shape[0]
            bias = np.asarray(conv["bias"])
            biases.append(np.tile(bias, lam) if lam > 1 else bias)
    taps = jnp.asarray(np.concatenate(taps_list, axis=0), dtype)
    bias_arr = jnp.asarray(np.stack(biases), jnp.float32)
    cp = taps.shape[-1]
    meta = resblock_meta(kernel_size, tuple(dilations), lam, cp)
    assert meta.convs == tuple(conv_metas)
    return taps, bias_arr, meta


def _lrelu(x):
    # Compare in f32: v5e Mosaic does not lower bf16 vector compares.
    xf = x.astype(jnp.float32)
    return jnp.where(xf >= 0, xf, xf * LRELU_SLOPE).astype(x.dtype)


def _kernel(left_ref, center_ref, right_ref, taps_ref, bias_ref, out_ref,
            *, meta: ResBlockMeta, tile: int, t_real: int):
    h = meta.halo
    i = pl.program_id(1)
    n = tile + 2 * h
    dtype = center_ref.dtype

    # Assemble the haloed window from the three neighbor blocks.
    x = jnp.concatenate(
        [left_ref[0, tile - h:, :], center_ref[0], right_ref[0, :h, :]],
        axis=0)

    # Rows outside the true sequence must stay zero after every conv to
    # match per-conv zero padding (reference pads each conv independently).
    g = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) + i * tile - h
    valid = jnp.logical_and(g >= 0, g < t_real)

    # Fully unrolled chain with static margin tracking: after a conv whose
    # taps span [-l, r], rows [vl, n-vr) of the buffer are exact.
    vl = vr = 0
    state = x
    ci = 0
    for _pair in range(len(meta.convs) // 2):
        xt = state
        for _sub in range(2):
            cm = meta.convs[ci]
            bias = bias_ref[ci: ci + 1, :]  # (1, Cp) f32
            ci += 1
            l_need = -min(cm.offsets)
            r_need = max(cm.offsets)
            new_vl = vl + l_need
            new_vr = vr + r_need
            rows = n - new_vl - new_vr
            act = _lrelu(xt)  # keep activation in the compute dtype (bf16)
            acc = None
            for j, off in enumerate(cm.offsets):
                w = taps_ref[cm.tap_start + j].astype(dtype)
                seg = jax.lax.slice_in_dim(
                    act, new_vl + off, new_vl + off + rows, axis=0)
                part = jnp.dot(seg, w, preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            acc = acc + bias
            # Re-embed into a full-height buffer (margins zero) and re-apply
            # the sequence mask so the next conv sees zeros outside the
            # utterance. concatenate is the Mosaic-supported way to do this.
            full = jnp.concatenate([
                jnp.zeros((new_vl, meta.cp), jnp.float32),
                acc,
                jnp.zeros((new_vr, meta.cp), jnp.float32),
            ], axis=0)
            xt = jnp.where(valid, full, 0.0).astype(dtype)
            vl, vr = new_vl, new_vr
        state = (xt.astype(jnp.float32) +
                 state.astype(jnp.float32)).astype(dtype)
    out_ref[0] = state[h: h + tile, :]


@functools.partial(jax.jit, static_argnames=("meta", "tile", "interpret"))
def resblock_fused(x: jnp.ndarray, taps: jnp.ndarray, biases: jnp.ndarray,
                   meta: ResBlockMeta, tile: int = 512,
                   interpret: bool = False) -> jnp.ndarray:
    """Apply one fused resblock to ``x`` of shape (B, Tp, Cp)."""
    b, t_real, cp = x.shape
    assert cp == meta.cp
    t_pad = -(-t_real // tile) * tile
    xp = jnp.pad(x, ((0, 0), (tile, tile + t_pad - t_real), (0, 0)))
    grid = (b, t_pad // tile)
    block = (1, tile, cp)
    out = pl.pallas_call(
        functools.partial(_kernel, meta=meta, tile=tile, t_real=t_real),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cp), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda bb, ii: (bb, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda bb, ii: (bb, ii + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda bb, ii: (bb, ii + 2, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(taps.shape, lambda bb, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(biases.shape, lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, xp, xp, taps, biases)
    return out[:, :t_real, :]
