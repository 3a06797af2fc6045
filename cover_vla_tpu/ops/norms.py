"""Normalization ops.

Numerics follow the reference stacks: Gemma RMSNorm computes in fp32 with a
(1 + weight) scale and returns the input dtype (HF GemmaRMSNorm, used via
paligemma_with_expert.py); SigLIP LayerNorm is a standard affine LayerNorm
computed in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gemma-style RMSNorm: fp32 compute, (1 + w) scaling, cast back."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    out = x32 * (1.0 + weight.astype(jnp.float32))
    return out.astype(dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-6) -> jax.Array:
    """Standard LayerNorm, computed in fp32, returned in input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
