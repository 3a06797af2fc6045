"""Rotary position embedding, fp32, half-split (Gemma/big_vision convention).

Semantics match the reference apply_rope
(lerobot_custom/.../pi0/paligemma_with_expert.py:34-57): the head dim is
split into two contiguous halves [x1, x2] and rotated as
    out = [x1*cos - x2*sin, x2*cos + x1*sin]
with radians = positions / theta**(2i/d), computed in fp32 regardless of
input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_rope(x: jax.Array, positions: jax.Array,
               max_wavelength: float = 10_000.0) -> jax.Array:
    """Apply RoPE.

    Args:
      x: [B, L, H, D] queries or keys.
      positions: [B, L] integer positions.
    Returns:
      [B, L, H, D] in x.dtype (rotation computed in fp32).
    """
    dtype = x.dtype
    d = x.shape[-1]
    d_half = d // 2
    x32 = x.astype(jnp.float32)

    freq_exponents = (2.0 / d) * jnp.arange(d_half, dtype=jnp.float32)
    timescale = max_wavelength ** freq_exponents            # [d/2]
    radians = positions[..., None].astype(jnp.float32) / timescale  # [B, L, d/2]
    radians = radians[..., None, :]                          # [B, L, 1, d/2]
    sin, cos = jnp.sin(radians), jnp.cos(radians)

    x1, x2 = x32[..., :d_half], x32[..., d_half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dtype)
