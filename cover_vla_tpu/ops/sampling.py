"""Sampling / embedding helpers for the flow-matching policy.

 - `sinusoidal_time_embedding` mirrors create_sinusoidal_pos_embedding
   (modeling_pi0.py:71-89): geometric periods between min/max period.
 - `sample_beta` mirrors sample_beta (modeling_pi0.py:92-95): Beta(a, b)
   via the Kumaraswamy-style two-uniform trick the reference uses.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def sinusoidal_time_embedding(time: jax.Array, dimension: int,
                              min_period: float = 4e-3,
                              max_period: float = 4.0) -> jax.Array:
    """[B] scalar times -> [B, dimension] sin/cos embedding (fp32)."""
    if dimension % 2 != 0:
        raise ValueError(f"dimension ({dimension}) must be even")
    # Static constants computed in float64 like the reference, then fp32.
    fraction = np.linspace(0.0, 1.0, dimension // 2, dtype=np.float64)
    period = min_period * (max_period / min_period) ** fraction
    scaling = jnp.asarray((1.0 / period * 2 * np.pi).astype(np.float32))
    sin_input = scaling[None, :] * time.astype(jnp.float32)[:, None]
    return jnp.concatenate([jnp.sin(sin_input), jnp.cos(sin_input)], axis=1)


def sample_beta(key: jax.Array, alpha: float, beta: float,
                bsize: int) -> jax.Array:
    """Beta(alpha, beta) samples via u1^(1/a) / (u1^(1/a) + u2^(1/b))."""
    k1, k2 = jax.random.split(key)
    g1 = jax.random.uniform(k1, (bsize,)) ** (1.0 / alpha)
    g2 = jax.random.uniform(k2, (bsize,)) ** (1.0 / beta)
    return g1 / (g1 + g2)


def sample_flow_time(key: jax.Array, bsize: int) -> jax.Array:
    """pi0 training time distribution: Beta(1.5, 1) * 0.999 + 0.001."""
    return sample_beta(key, 1.5, 1.0, bsize) * 0.999 + 0.001


def sample_noise(key: jax.Array, shape, noise_std: float = 1.0) -> jax.Array:
    """fp32 Gaussian noise; noise_std drives best-of-N candidate diversity
    (modeling_pi0.py:502-510)."""
    return jax.random.normal(key, shape, dtype=jnp.float32) * noise_std
