"""Straight-through Gumbel softmax (model/gumbel_softmax.py:8-27).

Imported by the reference trainer (super_resolution.py:28) but never called
in the main path; provided for the same ablations, with an explicit jax PRNG
key instead of torch's global RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gumbel(key: jax.Array, shape, eps: float = 1e-20) -> jax.Array:
    u = jax.random.uniform(key, shape)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_softmax_sample(key: jax.Array, logits: jax.Array, temperature: float) -> jax.Array:
    y = jax.nn.log_softmax(logits, axis=-1) + sample_gumbel(key, logits.shape)
    return jax.nn.softmax(y / temperature, axis=-1)


def gumbel_softmax(key: jax.Array, logits: jax.Array, temperature: float = 0.8) -> jax.Array:
    """One-hot forward, soft-sample gradients (straight-through)."""
    y = gumbel_softmax_sample(key, logits, temperature)
    y_hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), y.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(y_hard - y) + y
