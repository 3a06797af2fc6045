"""Attention ops: GQA with fp32 softmax, mask-driven (prefix-LM / block masks).

This replaces the reference's eager torch attention
(paligemma_with_expert.py:376-434): queries/keys upcast to fp32, scores
scaled by head_dim**-0.5, masked with a large negative constant
(big_neg from gemma/modules.py), softmax in fp32, probs cast back to the
value dtype for the PV matmul so the MXU runs in bf16.

Shapes use [B, S, H, D] ("BSHD") throughout; KV heads are broadcast to query
groups via einsum rather than materialised repeats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG_NEG = -2.3819763e38  # matches gemma/modules.py masking constant
HIGHEST = jax.lax.Precision.HIGHEST  # true-fp32 MXU passes for upcast score math

# Attention-score matmul precision. HIGHEST reproduces the reference's
# fp32-upcast eager attention bit-for-fp32; DEFAULT ("fast math") lets the
# MXU run reduced-precision passes — measured +11% end-to-end verified-step
# throughput with identical selected actions (scores differ by ~5e-5).
_SCORE_PRECISION = jax.lax.Precision.HIGHEST


def set_fast_math(enabled: bool) -> None:
    """Trade exact fp32 score parity for speed. Affects newly TRACED
    programs only — call before building/jitting models."""
    global _SCORE_PRECISION
    _SCORE_PRECISION = (jax.lax.Precision.DEFAULT if enabled
                        else jax.lax.Precision.HIGHEST)


def score_precision():
    return _SCORE_PRECISION


def gqa_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  mask: jax.Array) -> jax.Array:
    """Grouped-query attention.

    Args:
      q: [B, Sq, Hq, D]
      k: [B, Skv, Hkv, D]  (Hq % Hkv == 0)
      v: [B, Skv, Hkv, D]
      mask: bool[B, Sq, Skv] — True where attention is allowed.
    Returns:
      [B, Sq, Hq * D] attention output in v.dtype.
    """
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    groups = hq // hkv

    q32 = q.astype(jnp.float32).reshape(b, sq, hkv, groups, d)
    k32 = k.astype(jnp.float32)
    # scores: [B, Hkv, G, Sq, Skv]
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", q32, k32,
                        precision=HIGHEST) * (d ** -0.5)
    scores = jnp.where(mask[:, None, None, :, :], scores, BIG_NEG)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, sq, hq * d)


# Dense-MHA backend for the ViT/text towers: "xla" (eager einsum, exact
# parity posture) or "pallas" (flash streaming softmax — no HBM score
# tensor; ~19% faster at the verifier's 577-token shape on v5e, bf16-level
# numeric deviation like any flash-vs-eager pair). Only mask/bias-free
# calls take the pallas path. The backend is plumbed per-call from the
# model configs (VitConfig.attn_impl / Pi0Config.attention_impl) — the
# single source of truth; engines built from different configs coexist in
# one process. (A process-global default toggle existed through round 3
# and was removed: two sources of truth.)


def mha_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  mask: jax.Array | None = None,
                  bias: jax.Array | None = None,
                  backend: str | None = None,
                  fast_math: bool | None = None) -> jax.Array:
    """Standard multi-head attention (used by ViT towers / verifier heads).

    Args:
      q: [B, Sq, H, D]; k, v: [B, Skv, H, D]
      mask: optional bool[B, Sq, Skv] (True = attend).
      bias: optional float[B, Sq, Skv] added to the scores.
      backend: "xla" (default) | "pallas" — plumb from model configs.
      fast_math: None = module default; True allows reduced-precision MXU
        passes for the score matmul.
    Returns: [B, Sq, H * D].
    """
    backend = "xla" if backend is None else backend
    assert backend in ("xla", "pallas"), backend
    if backend == "pallas" and mask is None and bias is None:
        from cover_vla_tpu.ops.pallas_attention import pallas_mha_dense
        return pallas_mha_dense(q, k, v)
    prec = score_precision() if fast_math is None else (
        jax.lax.Precision.DEFAULT if fast_math else jax.lax.Precision.HIGHEST)
    b, sq, h, d = q.shape
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32),
                        precision=prec) * (d ** -0.5)
    if bias is not None:
        scores = scores + bias[:, None, :, :].astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, BIG_NEG)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(b, sq, h * d)
