"""Gemma decoder stack + the pi0 fused dual-transformer forward.

Reimplements the *behaviour* of the reference PaliGemmaWithExpertModel
(lerobot_custom/.../pi0/paligemma_with_expert.py:236-360) TPU-first:

  * Layer weights are stacked along a leading [depth] axis and the layer
    loop is a `lax.scan`, so XLA compiles one layer body.
  * The fused forward computes Q/K/V per model on its own token span,
    concatenates along the sequence, runs one shared attention, then applies
    per-model o_proj/MLP — exactly the reference dataflow.
  * Decode uses a *shared-prefix* KV cache: all N candidates of a batch row
    attend to one copy of the row's prefix keys/values instead of N
    replicated copies (the reference replicates the whole prefill B× —
    run_simpler_eval_with_openpi.py:312-313). Softmax is computed jointly
    over [prefix | own suffix] scores in fp32.

Numerics: weights bf16, RMSNorm/softmax/RoPE in fp32, logits via fp32
accumulation on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import GemmaConfig
from cover_vla_tpu.ops.norms import rms_norm
from cover_vla_tpu.ops.rope import apply_rope
from cover_vla_tpu.ops.attention import BIG_NEG, HIGHEST, score_precision

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_gemma(key: jax.Array, cfg: GemmaConfig, *,
               param_dtype=jnp.bfloat16) -> Params:
    """Initialise a Gemma decoder stack with [depth]-stacked layer weights."""
    keys = jax.random.split(key, 10)
    d, w, m = cfg.depth, cfg.width, cfg.mlp_dim
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim

    def norm(k, *shape):
        return (jax.random.normal(k, shape, dtype=jnp.float32) * 0.02
                ).astype(param_dtype)

    params: Params = {
        "layers": {
            "input_ln": jnp.zeros((d, w), dtype=jnp.float32),
            "q": norm(keys[0], d, w, qd),
            "k": norm(keys[1], d, w, kvd),
            "v": norm(keys[2], d, w, kvd),
            "o": norm(keys[3], d, qd, w),
            "post_ln": jnp.zeros((d, w), dtype=jnp.float32),
            "gate": norm(keys[4], d, w, m),
            "up": norm(keys[5], d, w, m),
            "down": norm(keys[6], d, m, w),
        },
        "final_norm": jnp.zeros((w,), dtype=jnp.float32),
    }
    if cfg.vocab_size:
        params["embed"] = norm(keys[7], cfg.vocab_size, w)
    return params


def embed_tokens(params: Params, tokens: jax.Array) -> jax.Array:
    return jnp.take(params["embed"], tokens, axis=0)


# ---------------------------------------------------------------------------
# Layer pieces
# ---------------------------------------------------------------------------


def _dtype(layers_or_layer: Params):
    """Compute dtype of a stack: its q weight's dtype, or bf16 when the
    stack is int8-quantized (ops/quant: the layer dict carries the mode)."""
    d = layers_or_layer["q"].dtype
    return jnp.bfloat16 if d == jnp.int8 else d


def _mm(x: jax.Array, layer: Params, name: str,
        xq=None, xs=None) -> jax.Array:
    """x @ layer[name], dispatching to the int8 path when the layer dict
    carries `<name>_scale` (ops/quant.quantize_gemma_stack). Pass a
    pre-quantized (xq, xs) to share one activation quant across the
    q/k/v (or gate/up) projections of the same input."""
    w = layer[name]
    s = layer.get(name + "_scale")
    if s is None:
        return x.astype(w.dtype) @ w
    from cover_vla_tpu.ops import quant
    if xq is None:
        xq, xs = quant.quant_act(x)
    return quant.int8_matmul(xq, xs, w, s)


def _qkv(layer: Params, cfg: GemmaConfig, h: jax.Array,
         positions: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """input RMSNorm -> q/k/v projections -> RoPE. h: [..., S, W]."""
    x = rms_norm(h, layer["input_ln"], cfg.rms_eps).astype(_dtype(layer))
    shape = x.shape[:-1]
    xq = xs = None
    if "q_scale" in layer:   # quantize the normed input once for q/k/v
        from cover_vla_tpu.ops import quant
        xq, xs = quant.quant_act(x)
    q = _mm(x, layer, "q", xq, xs).reshape(*shape, cfg.num_heads,
                                           cfg.head_dim)
    k = _mm(x, layer, "k", xq, xs).reshape(*shape, cfg.num_kv_heads,
                                           cfg.head_dim)
    v = _mm(x, layer, "v", xq, xs).reshape(*shape, cfg.num_kv_heads,
                                           cfg.head_dim)
    q = apply_rope(q.reshape(-1, *q.shape[-3:]),
                   positions.reshape(-1, positions.shape[-1]),
                   cfg.rope_theta).reshape(q.shape)
    k = apply_rope(k.reshape(-1, *k.shape[-3:]),
                   positions.reshape(-1, positions.shape[-1]),
                   cfg.rope_theta).reshape(k.shape)
    return q, k, v


def _post_attention(layer: Params, cfg: GemmaConfig, h: jax.Array,
                    attn_out: jax.Array) -> jax.Array:
    """o_proj + residual + post-LN + GeGLU MLP + residual."""
    out = _mm(attn_out.astype(_dtype(layer)), layer, "o")
    h = h + out
    y = rms_norm(h, layer["post_ln"], cfg.rms_eps).astype(_dtype(layer))
    yq = ys = None
    if "gate_scale" in layer:
        from cover_vla_tpu.ops import quant
        yq, ys = quant.quant_act(y)
    gated = jax.nn.gelu(_mm(y, layer, "gate", yq, ys), approximate=True) \
        * _mm(y, layer, "up", yq, ys)
    return h + _mm(gated, layer, "down")


def _take_layer(layers: Params, i_or_slice) -> Params:
    return jax.tree_util.tree_map(lambda x: x[i_or_slice], layers)


# ---------------------------------------------------------------------------
# Fused training forward (both spans, no cache)
# ---------------------------------------------------------------------------


def fused_forward(pg_params: Params, ex_params: Params,
                  pg_cfg: GemmaConfig, ex_cfg: GemmaConfig,
                  prefix_emb: jax.Array, suffix_emb: jax.Array,
                  positions: jax.Array, mask: jax.Array,
                  remat: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Run the fused dual-transformer on [prefix | suffix].

    Args:
      prefix_emb: [B, P, W_pg] (PaliGemma span)
      suffix_emb: [B, S, W_ex] (expert span)
      positions: [B, P + S] RoPE positions for the concatenated sequence.
      mask: bool[B, P + S, P + S] attention mask (True = attend).
    Returns:
      (prefix_out, suffix_out) after each model's final RMSNorm.
    """
    p_len = prefix_emb.shape[1]
    pos_p, pos_s = positions[:, :p_len], positions[:, p_len:]

    def body(carry, layer_pair):
        h_p, h_s = carry
        lp, ls = layer_pair
        qp, kp, vp = _qkv(lp, pg_cfg, h_p, pos_p)
        qs, ks, vs = _qkv(ls, ex_cfg, h_s, pos_s)
        q = jnp.concatenate([qp, qs], axis=1)
        k = jnp.concatenate([kp, ks], axis=1)
        v = jnp.concatenate([vp, vs], axis=1)
        attn = _masked_gqa(q, k, v, mask)
        h_p = _post_attention(lp, pg_cfg, h_p, attn[:, :p_len])
        h_s = _post_attention(ls, ex_cfg, h_s, attn[:, p_len:])
        return (h_p, h_s), None

    if remat:
        # trade FLOPs for activation memory: recompute each layer in the
        # backward pass (jax.checkpoint over the scanned layer body)
        body = jax.checkpoint(body, prevent_cse=False)

    (h_p, h_s), _ = jax.lax.scan(
        body, (prefix_emb.astype(_dtype(pg_params["layers"])),
               suffix_emb.astype(_dtype(ex_params["layers"]))),
        (pg_params["layers"], ex_params["layers"]))
    h_p = rms_norm(h_p, pg_params["final_norm"], pg_cfg.rms_eps)
    h_s = rms_norm(h_s, ex_params["final_norm"], ex_cfg.rms_eps)
    return h_p, h_s


def _masked_gqa(q: jax.Array, k: jax.Array, v: jax.Array,
                mask: jax.Array, precision=None) -> jax.Array:
    """GQA attention, fp32 softmax. q:[B,Sq,Hq,D] k/v:[B,Skv,Hkv,D]."""
    b, sq, hq, dim = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    q32 = q.astype(jnp.float32).reshape(b, sq, hkv, g, dim)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", q32, k.astype(jnp.float32),
                        precision=precision or score_precision())
    scores = scores * (dim ** -0.5)
    scores = jnp.where(mask[:, None, None, :, :], scores, BIG_NEG)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, sq, hq * dim)


# ---------------------------------------------------------------------------
# Prefill (PaliGemma span only) -> KV cache
# ---------------------------------------------------------------------------


def prefill(pg_params: Params, cfg: GemmaConfig, prefix_emb: jax.Array,
            positions: jax.Array, mask: jax.Array,
            return_hidden: bool = False, attn_impl: str = "xla",
            fast_math: bool | None = None):
    """Run the LM on the prefix, emitting per-layer K/V.

    Returns (hidden_or_None, cache) with cache = {"k": [L,B,P,Hkv,D],
    "v": [L,B,P,Hkv,D]} kept in bf16 (HBM-resident across the Euler loop).
    """

    prec = None if fast_math is None else (
        jax.lax.Precision.DEFAULT if fast_math else jax.lax.Precision.HIGHEST)
    if attn_impl == "pallas":
        from cover_vla_tpu.ops.pallas_attention import pallas_prefix_gqa
        attn_fn = lambda q, k, v: pallas_prefix_gqa(q, k, v, mask)
    else:
        attn_fn = lambda q, k, v: _masked_gqa(q, k, v, mask, precision=prec)

    def body(h, layer):
        q, k, v = _qkv(layer, cfg, h, positions)
        attn = attn_fn(q, k, v)
        h = _post_attention(layer, cfg, h, attn)
        return h, {"k": k, "v": v}

    h, cache = jax.lax.scan(body, prefix_emb.astype(_dtype(pg_params["layers"])),
                            pg_params["layers"])
    if return_hidden:
        return rms_norm(h, pg_params["final_norm"], cfg.rms_eps), cache
    return None, cache


# ---------------------------------------------------------------------------
# Autoregressive greedy decode (pi0-FAST action-token generation)
# ---------------------------------------------------------------------------


def lm_logits(params: Params, cfg: GemmaConfig, hidden: jax.Array) -> jax.Array:
    """Tied-embedding LM head: logits = hidden @ embed^T, fp32."""
    return jnp.matmul(hidden.astype(jnp.float32),
                      params["embed"].astype(jnp.float32).T,
                      precision=jax.lax.Precision.HIGHEST)


def ar_generate(params: Params, cfg: GemmaConfig, prefix_emb: jax.Array,
                prefix_pad: jax.Array, max_new_tokens: int,
                eos_id: int, pad_id: int = 0) -> jax.Array:
    """Greedy autoregressive generation after a (right-padded) prefix.

    The KV cache is preallocated to [L, B, P + max_new, Hkv, D]; new tokens
    occupy fixed slots P+t with per-row RoPE positions (so right padding
    needs no shifting — invalid key slots are masked). Rows that emit EOS
    keep generating pad tokens (masked by callers).

    Returns int32[B, max_new_tokens].
    """
    b, p_len, _ = prefix_emb.shape
    positions = jnp.cumsum(prefix_pad.astype(jnp.int32), axis=1) - 1
    mask2d = prefix_pad[:, None, :] & prefix_pad[:, :, None]
    hidden, cache = prefill(params, cfg, prefix_emb, positions, mask2d,
                            return_hidden=True)

    total = p_len + max_new_tokens
    kdt = cache["k"].dtype
    kc = jnp.zeros((cfg.depth, b, total, cfg.num_kv_heads, cfg.head_dim), kdt
                   ).at[:, :, :p_len].set(cache["k"])
    vc = jnp.zeros_like(kc).at[:, :, :p_len].set(cache["v"])
    key_valid = jnp.concatenate(
        [prefix_pad, jnp.zeros((b, max_new_tokens), bool)], axis=1)

    n_valid = jnp.sum(prefix_pad.astype(jnp.int32), axis=1)       # [B]
    last_idx = n_valid - 1
    first_logits = lm_logits(params, cfg, hidden[jnp.arange(b), last_idx])
    token = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    done = token == eos_id
    token = jnp.where(done, pad_id, token)

    scale = jnp.asarray(cfg.width ** 0.5, dtype=params["embed"].dtype)

    def step(carry, t):
        kc, vc, key_valid, token, done, pos = carry
        emb = (embed_tokens(params, token[:, None]) * scale)
        key_valid = key_valid.at[:, p_len + t].set(True)

        def layer_body(h, xs):
            layer, kcl, vcl = xs
            q, k, v = _qkv(layer, cfg, h, pos[:, None])
            kcl = jax.lax.dynamic_update_slice_in_dim(
                kcl, k.astype(kcl.dtype), p_len + t, axis=1)
            vcl = jax.lax.dynamic_update_slice_in_dim(
                vcl, v.astype(vcl.dtype), p_len + t, axis=1)
            attn = _masked_gqa(q, kcl, vcl, key_valid[:, None, :])
            h = _post_attention(layer, cfg, h, attn)
            return h, (kcl, vcl)

        h, (kc, vc) = jax.lax.scan(
            layer_body, emb.astype(_dtype(params["layers"])),
            (params["layers"], kc, vc))
        h = rms_norm(h, params["final_norm"], cfg.rms_eps)
        logits = lm_logits(params, cfg, h[:, 0])
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_done = done | (next_token == eos_id)
        next_token = jnp.where(done, pad_id, next_token)
        return (kc, vc, key_valid, next_token, next_done, pos + 1), token

    init = (kc, vc, key_valid, token, done, n_valid)
    _, tokens = jax.lax.scan(step, init, jnp.arange(max_new_tokens))
    return tokens.T  # [B, max_new]


# ---------------------------------------------------------------------------
# Shared-prefix decode (expert span only, N candidates per cached row)
# ---------------------------------------------------------------------------


def decode_shared_prefix(ex_params: Params, cfg: GemmaConfig,
                         suffix_emb: jax.Array, positions: jax.Array,
                         cache: Params, prefix_pad: jax.Array,
                         suffix_mask: jax.Array,
                         attn_impl: str = "xla",
                         fast_math: bool | None = None) -> jax.Array:
    """Expert forward over N candidates sharing one prefix KV cache per row.

    Args:
      suffix_emb: [B, N, S, W] expert token embeddings (N candidates).
      positions: [B, S] RoPE positions of suffix tokens (same for all N).
      cache: {"k","v"}: [L, B, P, Hkv, D] from `prefill`.
      prefix_pad: bool[B, P] — valid prefix tokens.
      suffix_mask: bool[B, S, S] — intra-candidate attention mask.
    Returns:
      [B, N, S, W] expert hidden states after final RMSNorm.
    """
    b, n, s, w = suffix_emb.shape
    pos = jnp.broadcast_to(positions[:, None, :], (b, n, s))

    def body(h, xs):
        layer, kc, vc = xs
        q, k, v = _qkv(layer, cfg, h, pos)  # q: [B,N,S,Hq,D]; k/v: [B,N,S,Hkv,D]
        attn = _shared_prefix_gqa(q, k, v, kc, vc, prefix_pad, suffix_mask,
                                  attn_impl=attn_impl, fast_math=fast_math)
        h = _post_attention(layer, cfg, h, attn)
        return h, None

    h, _ = jax.lax.scan(body, suffix_emb.astype(_dtype(ex_params["layers"])),
                        (ex_params["layers"], cache["k"], cache["v"]))
    return rms_norm(h, ex_params["final_norm"], cfg.rms_eps)


def _shared_prefix_gqa(q: jax.Array, k_suf: jax.Array, v_suf: jax.Array,
                       k_pre: jax.Array, v_pre: jax.Array,
                       prefix_pad: jax.Array,
                       suffix_mask: jax.Array,
                       attn_impl: str = "xla",
                       fast_math: bool | None = None) -> jax.Array:
    """Attention of candidate suffix queries over [shared prefix | own suffix].

    q: [B, N, S, Hq, D]; k_suf/v_suf: [B, N, S, Hkv, D];
    k_pre/v_pre: [B, P, Hkv, D]; prefix_pad: bool[B, P];
    suffix_mask: bool[B, S, S].

    The joint softmax over prefix+suffix scores is computed in fp32; the
    prefix keys are NOT replicated across candidates — the contraction
    broadcasts them, which XLA maps to one MXU pass per row. Under
    attn_impl="pallas" the whole op runs as a flash kernel that keeps
    the score tensor in VMEM (ops.pallas_attention.pallas_shared_prefix_gqa).
    """
    if attn_impl == "pallas":
        from cover_vla_tpu.ops.pallas_attention import (
            pallas_shared_prefix_gqa)
        return pallas_shared_prefix_gqa(q, k_suf, v_suf, k_pre, v_pre,
                                        prefix_pad, suffix_mask)
    prec = score_precision() if fast_math is None else (
        jax.lax.Precision.DEFAULT if fast_math else jax.lax.Precision.HIGHEST)
    b, n, s, hq, d = q.shape
    hkv = k_suf.shape[3]
    g = hq // hkv
    q32 = q.astype(jnp.float32).reshape(b, n, s, hkv, g, d) * (d ** -0.5)

    # [B, N, Hkv, G, S, P]
    scores_pre = jnp.einsum("bnshgd,bphd->bnhgsp", q32,
                            k_pre.astype(jnp.float32),
                            precision=prec)
    scores_pre = jnp.where(prefix_pad[:, None, None, None, None, :],
                           scores_pre, BIG_NEG)
    # [B, N, Hkv, G, S, S]
    scores_suf = jnp.einsum("bnshgd,bnthd->bnhgst", q32,
                            k_suf.astype(jnp.float32),
                            precision=prec)
    scores_suf = jnp.where(suffix_mask[:, None, None, None, :, :],
                           scores_suf, BIG_NEG)

    joint = jnp.concatenate([scores_pre, scores_suf], axis=-1)
    probs = jax.nn.softmax(joint, axis=-1)
    p_pre = probs[..., : scores_pre.shape[-1]].astype(v_pre.dtype)
    p_suf = probs[..., scores_pre.shape[-1]:].astype(v_suf.dtype)

    out = jnp.einsum("bnhgsp,bphd->bnshgd", p_pre, v_pre)
    out = out + jnp.einsum("bnhgst,bnthd->bnshgd", p_suf, v_suf)
    return out.reshape(b, n, s, hq * d)
