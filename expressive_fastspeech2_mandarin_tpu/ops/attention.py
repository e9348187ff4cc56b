"""Batched multi-head self-attention for FFT blocks.

Numerically equivalent to the reference's head-folded ``bmm`` attention with
``-inf`` key masking before softmax (reference: transformer/SubLayers.py:8-57,
transformer/Modules.py:6-25).

Two implementations share the projection layout (fused ``(D_model, H*D_head)``
Q/K/V mats — the reference's ``w_qs/w_ks/w_vs`` shapes, so conversion is a
transpose):

* ``"xla"`` — batched einsums over (B, H, T, D); XLA maps the contractions
  onto the MXU. Works on every backend.
* ``"flash"`` — the fused TPU Pallas flash-attention kernel
  (ops/pallas/flash_mha.py): no (T, T) scores matrix in HBM, f32 online
  softmax, custom VJP.
* ``"auto"`` (default) — flash when on TPU with a lane-aligned head dim,
  else xla.
"""

from __future__ import annotations

import jax.numpy as jnp


def multi_head_attention(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    bq: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    wv: jnp.ndarray,
    bv: jnp.ndarray,
    n_head: int,
    key_padding_mask: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Self-attention core: (B, T, D) → (B, T, H*Dv).

    ``key_padding_mask`` is (B, T) with True at padded keys; masked scores
    get ``-inf`` pre-softmax, matching the reference bit-for-bit for rows
    that have at least one valid key.
    """
    b, t, _ = x.shape
    dk = wq.shape[1] // n_head

    def split(h):
        return h.reshape(b, t, n_head, -1).transpose(0, 2, 1, 3)  # (B,H,T,D)

    q = split(x @ wq + bq)
    k = split(x @ wk + bk)
    v = split(x @ wv + bv)
    sm_scale = float(dk) ** -0.5

    if impl == "auto":
        from .pallas.flash_mha import supported

        impl = "flash" if supported(t, dk) else "xla"

    if impl == "flash":
        from .pallas.flash_mha import flash_mha

        out = flash_mha(q, k, v, key_padding_mask, sm_scale)
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * sm_scale
        scores = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, scores)
        attn = _softmax(scores)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(b, t, -1).astype(x.dtype)


def _softmax(scores: jnp.ndarray) -> jnp.ndarray:
    # Stable softmax that tolerates fully-masked rows (all -inf → zeros).
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.where(s == 0.0, 1.0, s)
