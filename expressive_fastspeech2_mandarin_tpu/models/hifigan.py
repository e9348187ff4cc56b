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
import numpy as np

from ..config import VocoderConfig
from ..ops import conv1d, conv_transpose1d
from .init import conv1d_params

Params = dict[str, Any]
LRELU_SLOPE = 0.1


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


# ---------------------------------------------------------------------------
# Polyphase lane-packing fast path.
#
# The late MRF stages run 32/64-channel convolutions over hundreds of
# thousands of timesteps; with feature-last layout the 128-lane VPU/MXU is
# 2-4x underutilized. Folding λ = 128/C consecutive timesteps into the
# channel dim ((B, T, C) → (B, T/λ, λC)) and expanding each conv kernel into
# its block-polyphase form restores full lanes. Measured on v5e
# (B=8, T=256k, C=32, k=11, d=5): 8.7 ms → 5.6 ms f32 / 4.9 ms bf16, exact
# numerics (maxdiff ~2e-6).


def _pack_conv_weight(kernel: np.ndarray, dilation: int, lam: int):
    """(K, C, C) conv kernel → (KB, λC, λC) block-polyphase kernel (numpy,
    done once at load time — traced scatter construction compiles terribly).

    Returns (packed_kernel, pad_left_blocks, pad_right_blocks); the packed
    conv over (B, T/λ, λC) with that padding equals the original centered
    conv over (B, T, C).
    """
    kernel = np.asarray(kernel)
    k, c_in, c_out = kernel.shape
    center = (k - 1) // 2
    entries: dict[int, list[tuple[int, int, int]]] = {}
    for j in range(lam):
        for i in range(k):
            s = (i - center) * dilation + j
            entries.setdefault(s // lam, []).append((j, i, s % lam))
    beta_min, beta_max = min(entries), max(entries)
    kb = beta_max - beta_min + 1
    packed = np.zeros((kb, lam * c_in, lam * c_out), kernel.dtype)
    for beta, items in entries.items():
        bi = beta - beta_min
        for j, i, j_in in items:
            packed[bi, j_in * c_in: (j_in + 1) * c_in,
                   j * c_out: (j + 1) * c_out] += kernel[i]
    return packed, -beta_min, beta_max


def _pack_padding(k: int, dilation: int, lam: int) -> tuple[int, int]:
    """Static (pad_left, pad_right) block padding for a packed conv."""
    center = (k - 1) // 2
    offs = [(i - center) * dilation + j for j in range(lam) for i in range(k)]
    return -(min(offs) // lam), max(offs) // lam


def _stage_lam(ch: int) -> int:
    return 128 // ch if (ch < 128 and 128 % ch == 0) else 1


def _pack_conv_weight_traced(kernel: jnp.ndarray, dilation: int, lam: int):
    """jit-traceable :func:`_pack_conv_weight`: identical layout, built with
    ONE scatter-add from a static index map (fine to trace — unlike the
    per-tap Python scatter loop this compiles to a single XLA scatter), so
    the training step can pack folded weight-norm kernels inside jit. The
    scatter's transpose is a gather, so it is cheaply differentiable."""
    k, c_in, c_out = kernel.shape
    center = (k - 1) // 2
    rows = []  # (bi, j_in, j, i)
    betas = [((i - center) * dilation + j) // lam
             for j in range(lam) for i in range(k)]
    beta_min, beta_max = min(betas), max(betas)
    for j in range(lam):
        for i in range(k):
            s = (i - center) * dilation + j
            rows.append((s // lam - beta_min, s % lam, j, i))
    bi, j_in, j, i = (np.asarray(x) for x in zip(*rows))
    kb = beta_max - beta_min + 1
    packed = jnp.zeros((kb, lam, c_in, lam, c_out), kernel.dtype)
    packed = packed.at[bi, j_in, :, j, :].add(kernel[i])
    return packed.reshape(kb, lam * c_in, lam * c_out)


def _pack_transposed_conv_traced(kernel: jnp.ndarray,
                                 stride: int) -> jnp.ndarray:
    """jit-traceable :func:`_pack_transposed_conv` (same contract)."""
    k, c_in, c_out = kernel.shape
    u = stride
    assert k == 2 * u and u % 2 == 0
    rows = []  # (dt+1, r, tau)
    for r in range(u):
        for dt in ((-1, 0) if r < u // 2 else (0, 1)):
            rows.append((dt + 1, r, r + u // 2 - u * dt))
    d, r, tau = (np.asarray(x) for x in zip(*rows))
    packed = jnp.zeros((3, c_in, u, c_out), kernel.dtype)
    packed = packed.at[d, :, r, :].set(kernel[tau])
    return packed.reshape(3, c_in, u * c_out)


def pack_generator_params_traced(params: Params,
                                 cfg: VocoderConfig) -> Params:
    """jit-traceable :func:`pack_generator_params` (polyphase + packed MRF
    layouts only — no Pallas fused taps, whose kernel has no vjp): lets the
    vocoder TRAINING step fold weight norm and pack inside the jitted step
    each iteration, running the measured fast generator path. Numerics are
    identical to the numpy packer (tested in tests/test_vocoder_fast.py)."""
    params = dict(params)
    params["resblocks"] = [dict(rb) for rb in params["resblocks"]]
    params["ups"] = [dict(up) for up in params["ups"]]
    for up, u, k in zip(params["ups"], cfg.upsample_rates,
                        cfg.upsample_kernel_sizes):
        if k == 2 * u and u % 2 == 0:
            up["kernel_poly"] = _pack_transposed_conv_traced(up["kernel"], u)
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        lam = _stage_lam(ch)
        if lam == 1:
            continue
        for j in range(num_kernels):
            rb = params["resblocks"][i * num_kernels + j]
            dil = cfg.resblock_dilation_sizes[j]
            rb["convs1"] = [dict(c) for c in rb["convs1"]]
            rb["convs2"] = [dict(c) for c in rb["convs2"]]
            for conv, d in zip(rb["convs1"], dil):
                conv["kernel_packed"] = _pack_conv_weight_traced(
                    conv["kernel"], d, lam)
            for conv in rb["convs2"]:
                conv["kernel_packed"] = _pack_conv_weight_traced(
                    conv["kernel"], 1, lam)
    return params


def _pack_transposed_conv(kernel: np.ndarray, stride: int) -> np.ndarray:
    """(K=2u, Cin, Cout) ConvTranspose1d kernel → (3, Cin, u·Cout) plain-conv
    kernel computing all u output phases per input step.

    An input-dilated transposed conv makes XLA multiply mostly zeros (only
    K/u = 2 taps contribute per output sample). With padding (K-u)/2 = u/2,
    output phase r draws from x[t-1],x[t] (r < u/2) or x[t],x[t+1]
    (r ≥ u/2) with tap τ = r + u/2 - u·dt, so one k=3 conv emitting u·Cout
    packed features followed by a free sample-major reshape is exact.
    """
    kernel = np.asarray(kernel)
    k, c_in, c_out = kernel.shape
    u = stride
    assert k == 2 * u, "polyphase packing assumes kernel_size == 2*stride"
    # The phase split at r < u//2 and tap index r + u//2 - u*dt assume the
    # transposed-conv padding (k-u)/2 equals exactly u/2, which requires an
    # even stride; an odd u would pass the k==2u check but shift the audio.
    assert u % 2 == 0, "polyphase packing assumes an even upsample rate"
    packed = np.zeros((3, c_in, u * c_out), kernel.dtype)
    for r in range(u):
        dts = (-1, 0) if r < u // 2 else (0, 1)
        for dt in dts:
            tau = r + u // 2 - u * dt
            packed[dt + 1, :, r * c_out: (r + 1) * c_out] = kernel[tau]
    return packed


def _upsample_poly(x: jnp.ndarray, up: Params, stride: int) -> jnp.ndarray:
    """Apply a packed transposed conv: (B,T,Cin) → (B,T·u,Cout)."""
    b, t, _ = x.shape
    out = conv1d(x, up["kernel_poly"], padding=1)
    c_out = out.shape[-1] // stride
    out = out.reshape(b, t * stride, c_out)
    return out + up["bias"]


def pack_generator_params(params: Params, cfg: VocoderConfig,
                          fused: bool = False,
                          fused_dtype=jnp.bfloat16,
                          fused_stages: tuple[int, ...] | None = None,
                          phase_split: bool = False) -> Params:
    """Augment generator params with precomputed polyphase kernels for the
    small-channel MRF stages. Call once after init/conversion; apply_generator
    picks the packed path up automatically.

    ``fused=True`` additionally precomputes the stacked FIR taps consumed by
    the fused Pallas resblock kernel (ops/pallas/mrf_resblock.py) for every
    stage; apply_generator then runs the whole MRF VMEM-resident.

    ``phase_split=True`` (measured opt-in, default OFF) additionally packs
    dilation-1 kernels so dilated convs run via phase streams. The FLOP model
    favors it (k=11 d=5 λ=2: 4.9× → 1.27× executed blocks), but on a real
    v5e chip it LOSES big: full generator 104.2 ms with phase-split vs
    59.6 ms without (B=8, T=1000 mel frames). The d phase streams shrink each
    conv to T/(d·λ) steps — too short to amortize MXU ramp-up — and the two
    reshape+transpose relayouts per conv add HBM round-trips that outweigh
    the FLOP savings. Per the measure-then-adopt policy, any caller enabling
    this must cite an end-to-end timing where it wins.
    """
    from ..ops.pallas.mrf_resblock import pack_resblock

    params = dict(params)
    params["resblocks"] = [dict(rb) for rb in params["resblocks"]]
    params["ups"] = [dict(up) for up in params["ups"]]
    for up, u, k in zip(params["ups"], cfg.upsample_rates,
                        cfg.upsample_kernel_sizes):
        if k == 2 * u and u % 2 == 0:
            up["kernel_poly"] = jnp.asarray(
                _pack_transposed_conv(up["kernel"], u))
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        lam = _stage_lam(ch)
        for j in range(num_kernels):
            rb = params["resblocks"][i * num_kernels + j]
            k = cfg.resblock_kernel_sizes[j]
            dil = cfg.resblock_dilation_sizes[j]
            rb["convs1"] = [dict(c) for c in rb["convs1"]]
            rb["convs2"] = [dict(c) for c in rb["convs2"]]
            if fused and (fused_stages is None or i in fused_stages):
                taps, biases, _ = pack_resblock(rb, k, tuple(dil), lam,
                                                dtype=fused_dtype)
                rb["fused_taps"] = taps
                rb["fused_biases"] = biases
            if lam == 1:
                continue
            for conv, d in zip(rb["convs1"], dil):
                pk, _, _ = _pack_conv_weight(conv["kernel"], d, lam)
                conv["kernel_packed"] = jnp.asarray(pk)
                if d > 1 and phase_split:
                    # Dilation-1 packed kernel for the phase-split path
                    # (each phase stream sees the dilated taps as adjacent).
                    ps, _, _ = _pack_conv_weight(conv["kernel"], 1, lam)
                    conv["kernel_packed_ps"] = jnp.asarray(ps)
            for conv in rb["convs2"]:
                pk, _, _ = _pack_conv_weight(conv["kernel"], 1, lam)
                conv["kernel_packed"] = jnp.asarray(pk)
    return params


def _conv_packed(xp: jnp.ndarray, conv: Params, k: int, dilation: int,
                 lam: int, c: int) -> jnp.ndarray:
    """Centered conv executed in λ-packed layout: xp is (B, T/λ, λC)."""
    pl_, pr = _pack_padding(k, dilation, lam)
    out = jax.lax.conv_general_dilated(
        xp, conv["kernel_packed"], (1,), [(pl_, pr)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=xp.dtype)
    return out + jnp.tile(conv["bias"], lam)


def _conv_phase_split(xp: jnp.ndarray, conv: Params, k: int, dilation: int,
                      lam: int, c: int) -> jnp.ndarray:
    """Dilated conv via phase splitting (the PERF.md "phase-split
    λ-packing"): a d-dilated centered conv only ever mixes samples of the
    same residue t mod d, so split the signal into d phase streams (free
    reshapes/transposes), run a *dilation-1* λ-packed conv per stream
    (streams ride the batch dim), and interleave back.

    Cuts the packed-kernel FLOP blowup from ≈(k−1)d/λ+1 blocks to
    ≈(k−1)/λ+1, e.g. k=11 d=5 λ=2: 4.9× → 1.27× executed FLOPs. Exact:
    stream-edge zero blocks correspond 1:1 to the original conv's zero
    padding.
    """
    b, tb, cl = xp.shape  # packed (B, T/λ, λC)
    d = dilation
    t = tb * lam
    x = xp.reshape(b, t, c)
    # (B, T, C) → (B·d, T/d, C): stream s holds samples t ≡ s (mod d).
    xs = (x.reshape(b, t // d, d, c).transpose(0, 2, 1, 3)
          .reshape(b * d, t // d, c))
    xsp = xs.reshape(b * d, t // (d * lam), lam * c)
    pl_, pr = _pack_padding(k, 1, lam)
    out = jax.lax.conv_general_dilated(
        xsp, conv["kernel_packed_ps"], (1,), [(pl_, pr)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=xp.dtype)
    out = out + jnp.tile(conv["bias"], lam)
    out = (out.reshape(b, d, t // d, c).transpose(0, 2, 1, 3)
           .reshape(b, tb, lam * c))
    return out


def apply_resblock_packed(params: Params, xp: jnp.ndarray, kernel_size: int,
                          dilations: tuple[int, ...], lam: int,
                          c: int) -> jnp.ndarray:
    """Whole resblock in packed layout; lrelu/residual are elementwise and
    therefore layout-invariant."""
    t = xp.shape[1] * lam
    for c1, c2, d in zip(params["convs1"], params["convs2"], dilations):
        xt = _lrelu(xp)
        if d > 1 and "kernel_packed_ps" in c1 and t % (d * lam) == 0:
            xt = _conv_phase_split(xt, c1, kernel_size, d, lam, c)
        else:
            xt = _conv_packed(xt, c1, kernel_size, d, lam, c)
        xt = _lrelu(xt)
        xt = _conv_packed(xt, c2, kernel_size, 1, lam, c)
        xp = xt + xp
    return xp


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
                    cfg: VocoderConfig, fast: bool = True) -> jnp.ndarray:
    """(B, T, n_mels) mel → (B, T*prod(upsample_rates)) waveform in [-1, 1].

    ``fast=True`` runs small-channel MRF stages in the λ-packed layout (see
    above); numerics are within float round-off of the plain path.
    """
    from ..ops.pallas.mrf_resblock import resblock_fused, resblock_meta

    num_kernels = len(cfg.resblock_kernel_sizes)
    x = conv1d(mel, params["conv_pre"]["kernel"], params["conv_pre"]["bias"],
               padding=3)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _lrelu(x)
        up = params["ups"][i]
        if fast and "kernel_poly" in up:
            x = _upsample_poly(x, up, u)
        else:
            x = conv_transpose1d(x, up["kernel"], up["bias"],
                                 stride=u, padding=(k - u) // 2)
        ch, t_cur = x.shape[-1], x.shape[1]
        stage_rb0 = params["resblocks"][i * num_kernels]
        fused_ok = (fast and "fused_taps" in stage_rb0
                    and t_cur % _stage_lam(ch) == 0)
        packed_ok = (fast and not fused_ok and ch < 128 and 128 % ch == 0
                     and t_cur % (128 // ch) == 0
                     and "kernel_packed" in stage_rb0["convs1"][0])
        lam = _stage_lam(ch) if (fused_ok or packed_ok) else 1
        b_sz = x.shape[0]
        if lam > 1:
            x = x.reshape(b_sz, t_cur // lam, lam * ch)
        xs = None
        for j in range(num_kernels):
            rb = params["resblocks"][i * num_kernels + j]
            if fused_ok:
                meta = resblock_meta(
                    cfg.resblock_kernel_sizes[j],
                    tuple(cfg.resblock_dilation_sizes[j]), lam, lam * ch)
                out = resblock_fused(
                    x, rb["fused_taps"], rb["fused_biases"], meta,
                    interpret=jax.default_backend() == "cpu")
            elif lam > 1:
                out = apply_resblock_packed(
                    rb, x, cfg.resblock_kernel_sizes[j],
                    tuple(cfg.resblock_dilation_sizes[j]), lam, ch)
            else:
                out = apply_resblock(
                    rb, x, cfg.resblock_kernel_sizes[j],
                    tuple(cfg.resblock_dilation_sizes[j]))
            xs = out if xs is None else xs + out
        x = xs / num_kernels
        if lam > 1:
            x = x.reshape(b_sz, t_cur, ch)
    # The reference's final activation is a *default-slope* (0.01) leaky_relu
    # (hifigan/models.py:162: F.leaky_relu without LRELU_SLOPE).
    x = jax.nn.leaky_relu(x, 0.01)
    x = conv1d(x, params["conv_post"]["kernel"], params["conv_post"]["bias"],
               padding=3)
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# Native generator checkpoint (plain folded kernels; the artifact
# train.vocoder.train_vocoder exports and Synthesizer loads)


def _flatten_tree(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_tree(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_tree(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def save_generator_npz(path: str, params: Params) -> None:
    """Folded (plain-kernel) generator tree → .npz with path keys."""
    np.savez(path, **dict(_flatten_tree(params)))


def load_generator_npz(path: str) -> Params:
    """Inverse of :func:`save_generator_npz` (integer path components
    rebuild lists)."""
    flat = np.load(path)
    root: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)
