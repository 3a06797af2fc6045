"""int8 (w8a8) quantized matmul path for serving.

The v5e MXU runs int8 at 394 TOPS vs 197 bf16 TFLOP/s; a chained-matmul
microbenchmark on this chip measures ~1.23x end-to-end including the
dynamic activation-quant overhead. Serving-only and OPT-IN: weights are
quantized once per checkpoint load (`quantize_gemma_stack`), activations
per token at runtime; training and the parity-exact default path stay
bf16. There is no reference counterpart (the reference serves bf16;
SURVEY §2.7 lists bnb AdamW8bit as its only 8-bit use) — this is a
TPU-native capability beyond parity.

Scheme: symmetric per-output-channel weight scales, symmetric per-token
dynamic activation scales (absmax / 127), int8 x int8 -> int32 MXU
accumulation, fp32 rescale, cast back to the compute dtype. The layer
dict itself carries the mode: a quantized stack stores `<name>` as int8
plus `<name>_scale` fp32 — `gemma._mm` dispatches on key presence, so
every forward (prefill, fused train-style forward, shared-prefix decode,
AR decode) works unchanged off either params tree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# weight names carrying the Gemma stack's matmuls (ops/quant + models/gemma)
GEMMA_MATMUL_KEYS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., K, N] weight -> (int8 weight, fp32 scale[..., 1, N]).

    Per-output-channel symmetric: scale = absmax / 127 over the
    contraction axis (-2), so the int8 grid spans each column's range.
    """
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quant_act(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., K] activations -> (int8, fp32 per-token scale[..., 1])."""
    x32 = jnp.asarray(x, jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(xq: jax.Array, xs: jax.Array, wq: jax.Array,
                ws: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """(int8 [..., K] @ int8 [K, N]) * scales -> out_dtype [..., N].

    int32 MXU accumulation is exact; all quantization error lives in the
    rounding of x and w.
    """
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * ws.reshape(-1)).astype(out_dtype)


def quantize_gemma_stack(params: Params) -> Params:
    """Quantize one Gemma stack's params ({'layers': ..., 'final_norm',
    optional 'embed'}): each matmul weight [depth, K, N] becomes int8 with
    a fp32 `<name>_scale` [depth, 1, N]. Norms (fp32) and the embedding
    (a gather, not a matmul) stay untouched."""
    layers = dict(params["layers"])
    for name in GEMMA_MATMUL_KEYS:
        q, s = quantize_weight(layers[name])
        layers[name] = q
        layers[name + "_scale"] = s
    out = dict(params)
    out["layers"] = layers
    return out


# ViT block matmul sub-dicts ({kernel, bias}) relative to one block entry
VIT_MATMUL_PATHS = (("attn", "q"), ("attn", "k"), ("attn", "v"),
                    ("attn", "o"), ("mlp", "fc1"), ("mlp", "fc2"))


def _quantize_dense(sub: Params) -> Params:
    """{kernel, bias} -> {kernel: int8, scale, bias} (models/siglip._vmm
    dispatches on the `scale` key)."""
    q, s = quantize_weight(sub["kernel"])
    out = dict(sub)
    out["kernel"] = q
    out["scale"] = s
    return out


def quantize_vit_stack(params: Params) -> Params:
    """Quantize a ViT stack's block matmuls ([depth, K, N] stacked kernels,
    per-output-channel scales). Patch embed, norms, biases and positional
    embeddings stay in their original dtypes."""
    blocks = {k: dict(v) if isinstance(v, dict) else v
              for k, v in params["blocks"].items()}
    for outer, inner in VIT_MATMUL_PATHS:
        blocks[outer] = dict(blocks[outer])
        blocks[outer][inner] = _quantize_dense(blocks[outer][inner])
    out = dict(params)
    out["blocks"] = blocks
    return out


def quantize_pi0_policy(params: Params, vision: bool = True) -> Params:
    """Serving-time transform of a full pi0 tree: int8-quantize the two
    Gemma stacks (PaliGemma LM + action expert — ~75% of the verified
    step's matmul FLOPs, docs/roofline.md) and, by default, the SigLIP
    vision tower's block matmuls. The small fp32 action/state projections
    stay fp32."""
    out = dict(params)
    out["paligemma"] = quantize_gemma_stack(params["paligemma"])
    out["expert"] = quantize_gemma_stack(params["expert"])
    if vision:
        out["vision"] = quantize_vit_stack(params["vision"])
    return out


def quantize_verifier(params: Params) -> Params:
    """Serving-time transform of a verifier tree: int8-quantize the
    SigLIP2 backbone ViT's block matmuls. The text tower (64 tokens, one
    pass per step), trajectory encoder and ensemble heads are a rounding
    error of the step's FLOPs and carry the scoring-sensitive math — they
    stay in their trained dtypes."""
    out = dict(params)
    out["backbone"] = dict(params["backbone"])
    out["backbone"]["vision"] = quantize_vit_stack(
        params["backbone"]["vision"])
    return out


def is_quantized(layer: Params) -> bool:
    return "q_scale" in layer


def dequantize_weight(wq: jax.Array, ws: jax.Array,
                      dtype=jnp.bfloat16) -> jax.Array:
    """Exact inverse of the grid mapping (for tests/debug)."""
    return (wq.astype(jnp.float32) * ws).astype(dtype)


def quant_error_stats(w) -> Dict[str, float]:
    """Relative RMS error of the int8 grid for a weight tensor."""
    w32 = np.asarray(w, np.float32)
    q, s = quantize_weight(w32)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    rms = float(np.sqrt(np.mean(w32 ** 2))) or 1.0
    return {"rel_rms_err": float(np.sqrt(np.mean((deq - w32) ** 2))) / rms}
