"""Parameter initializers matching torch layer defaults.

Training-dynamics parity with the reference requires the same init
distributions as torch's ``nn.Linear`` / ``nn.Conv1d`` (kaiming-uniform with
a=√5 ⇒ U(±1/√fan_in) for weights, U(±1/√fan_in) for biases) and
``nn.Embedding`` (N(0,1)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform(rng, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def linear_params(rng, d_in: int, d_out: int, dtype=jnp.float32):
    """Torch nn.Linear init; weight stored as (d_in, d_out)."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(d_in)
    return {
        "w": uniform(kw, (d_in, d_out), bound, dtype),
        "b": uniform(kb, (d_out,), bound, dtype),
    }


def conv1d_params(rng, c_in: int, c_out: int, k: int, dtype=jnp.float32):
    """Torch nn.Conv1d init; kernel stored as (K, C_in, C_out)."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(c_in * k)
    return {
        "kernel": uniform(kw, (k, c_in, c_out), bound, dtype),
        "bias": uniform(kb, (c_out,), bound, dtype),
    }


def embedding_params(rng, n: int, d: int, padding_idx: int | None = None,
                     dtype=jnp.float32):
    emb = jax.random.normal(rng, (n, d), dtype)
    if padding_idx is not None:
        emb = emb.at[padding_idx].set(0.0)
    return emb


def layer_norm_params(d: int, dtype=jnp.float32):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
