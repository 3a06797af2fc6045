"""Prefix-LM / block attention mask construction.

`make_att_2d_masks` reproduces the big_vision mask_ar convention used by the
reference (lerobot_custom/.../pi0/modeling_pi0.py:98-128): tokens can attend
to valid tokens whose cumulative att_mask is <= their own, so
  att = [0,0,0,1,1,1] -> prefix-LM (bidirectional prefix, causal tail)
  att = [1,0,1,0]     -> block-causal over 2 blocks.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def make_att_2d_masks(pad_masks: jax.Array, att_masks: jax.Array) -> jax.Array:
    """Build [B, N, N] boolean attention masks.

    Args:
      pad_masks: bool[B, N], True where the token is a real input.
      att_masks: int[B, N], 1 where previous tokens may NOT attend to it.
    """
    if att_masks.ndim != 2 or pad_masks.ndim != 2:
        raise ValueError("expected 2D pad/att masks")
    cumsum = jnp.cumsum(att_masks.astype(jnp.int32), axis=1)
    att_2d = cumsum[:, None, :] <= cumsum[:, :, None]
    pad_2d = pad_masks[:, None, :] & pad_masks[:, :, None]
    return att_2d & pad_2d


def prefix_att_masks(batch: int, num_img_tokens: int, num_lang_tokens: int) -> jax.Array:
    """att_masks for the pi0 prefix: all-bidirectional (zeros)."""
    return jnp.zeros((batch, num_img_tokens + num_lang_tokens), dtype=jnp.int32)


def suffix_att_masks(batch: int, chunk_size: int) -> jax.Array:
    """att_masks for the pi0 suffix: [1] state + [1, 0...] actions.

    State starts a block (prefix cannot attend to it); the action chunk is a
    second block that is bidirectional among itself
    (modeling_pi0.py:607-618).
    """
    m = [1] + [1] + [0] * (chunk_size - 1)
    return jnp.broadcast_to(jnp.asarray(m, dtype=jnp.int32), (batch, len(m)))
