"""Pallas TPU kernel: masked prefix-LM GQA attention (prefill path).

Replaces the XLA einsum attention for the PaliGemma prefill, where the
reference's eager semantics require fp32 scores/softmax over bf16 Q/K. The
kernel keeps Q/K/V in bf16 in VMEM, computes the score block on the MXU
with fp32 accumulation, applies the boolean mask with the gemma big-neg
constant, and runs a streaming (flash) softmax over KV blocks — one pass,
no [S, S] fp32 score tensor in HBM.

Layout: grid (batch*heads, q-blocks); BlockSpecs stream Q tiles and the
full K/V of the (batch, kv-head) into VMEM. Sizes here (S≈330-400, D=256)
fit VMEM comfortably; KV is processed in 128-row blocks via fori_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -2.3819763e38
_BLOCK_Q = 128
_BLOCK_K = 128


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                      kv_len: int):
    """One (batch*head, q-block) program.

    q_ref: [1, BLOCK_Q, D] bf16; k_ref/v_ref: [1, Skv, D] bf16;
    mask_ref: [1, BLOCK_Q, Skv] int8; o_ref: [1, BLOCK_Q, D] fp32.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    d = q.shape[-1]
    num_kv_blocks = pl.cdiv(kv_len, _BLOCK_K)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * _BLOCK_K, _BLOCK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQ, BK]
        m = mask_ref[0, :, pl.ds(i * _BLOCK_K, _BLOCK_K)] != 0
        s = jnp.where(m, s, BIG_NEG)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, pl.ds(i * _BLOCK_K, _BLOCK_K), :].astype(jnp.float32)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((q.shape[0], 1), BIG_NEG, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros((q.shape[0], d), jnp.float32)
    m_f, l_f, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    # fully-masked rows (padding queries) produce l == 0; emit zeros
    o_ref[0] = jnp.where(l_f > 0, acc / jnp.maximum(l_f, 1e-37), 0.0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Shared-prefix decode attention — the pi0 Euler loop's hot op
# ---------------------------------------------------------------------------


def _shared_prefix_kernel(q_ref, kp_ref, vp_ref, ks_ref, vs_ref,
                          pmask_ref, smask_ref, o_ref, *, scale: float,
                          p_len: int):
    """One (batch*kv-head) program: all N candidates' suffix queries attend
    [shared prefix | own suffix] with ONE online softmax — the fp32
    [rows, P] score tensor never leaves VMEM (the XLA path materialises
    ~54 MB/layer in HBM, 10x per control step).

    q_ref: [1, ROWS, D] bf16 (rows = N*S*G, candidate-major);
    kp/vp_ref: [1, P_pad, D] bf16 shared prefix; ks/vs_ref: [1, NS_pad, D]
    bf16 per-candidate suffix keys; pmask_ref: [1, P_pad] int8 valid prefix
    keys; smask_ref: [1, ROWS, NS_pad] int8 block-diagonal candidate mask.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    rows, d = q.shape
    num_pre_blocks = pl.cdiv(p_len, _BLOCK_K)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = kp_ref[0, pl.ds(i * _BLOCK_K, _BLOCK_K), :]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [ROWS, BK]
        # pmask_ref is [1, 8, P_pad] fp32 bias rows (0 valid / BIG_NEG
        # padded) — 2-D sublane-aligned loads keep Mosaic happy
        s = s + pmask_ref[0, 0:1, pl.ds(i * _BLOCK_K, _BLOCK_K)]

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new).astype(jnp.bfloat16).astype(jnp.float32)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = vp_ref[0, pl.ds(i * _BLOCK_K, _BLOCK_K), :].astype(jnp.float32)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((rows, 1), BIG_NEG, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, d), jnp.float32)
    m_f, l_f, acc = jax.lax.fori_loop(0, num_pre_blocks, body,
                                      (m0, l0, acc0))

    # own-suffix keys: one small block with the block-diagonal mask
    ks = ks_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(smask_ref[0] != 0, s, BIG_NEG)
    m_new = jnp.maximum(m_f, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new).astype(jnp.bfloat16).astype(jnp.float32)
    alpha = jnp.exp(m_f - m_new)
    l_f = l_f * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jax.lax.dot_general(
        p, vs_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = acc / jnp.maximum(l_f, 1e-37)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_shared_prefix_gqa(q: jax.Array, k_suf: jax.Array,
                             v_suf: jax.Array, k_pre: jax.Array,
                             v_pre: jax.Array, prefix_pad: jax.Array,
                             suffix_mask: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Flash counterpart of models.gemma._shared_prefix_gqa.

    q: [B, N, S, Hq, D]; k_suf/v_suf: [B, N, S, Hkv, D];
    k_pre/v_pre: [B, P, Hkv, D]; prefix_pad: bool[B, P];
    suffix_mask: bool[B, S, S]. Returns [B, N, S, Hq*D] in v_suf.dtype.
    """
    b, n, s, hq, d = q.shape
    hkv = k_suf.shape[3]
    g = hq // hkv
    p_len = k_pre.shape[1]
    scale = d ** -0.5
    rows = n * s * g
    rows_pad = _round_up(rows, 128)
    p_pad = _round_up(p_len, _BLOCK_K)
    ns = n * s
    ns_pad = _round_up(ns, 128)

    # candidate-major row layout per (b, kv-head)
    qh = q.reshape(b, n, s, hkv, g, d).transpose(0, 3, 1, 2, 4, 5)
    qh = qh.reshape(b * hkv, rows, d)
    qh = jnp.pad(qh.astype(jnp.bfloat16), ((0, 0), (0, rows_pad - rows),
                                           (0, 0)))
    kp = k_pre.transpose(0, 2, 1, 3).reshape(b * hkv, p_len, d)
    kp = jnp.pad(kp.astype(jnp.bfloat16), ((0, 0), (0, p_pad - p_len),
                                           (0, 0)))
    vp = v_pre.transpose(0, 2, 1, 3).reshape(b * hkv, p_len, d)
    vp = jnp.pad(vp.astype(jnp.bfloat16), ((0, 0), (0, p_pad - p_len),
                                           (0, 0)))
    ks = k_suf.transpose(0, 3, 1, 2, 4).reshape(b * hkv, ns, d)
    ks = jnp.pad(ks.astype(jnp.bfloat16), ((0, 0), (0, ns_pad - ns),
                                           (0, 0)))
    vs = v_suf.transpose(0, 3, 1, 2, 4).reshape(b * hkv, ns, d)
    vs = jnp.pad(vs.astype(jnp.bfloat16), ((0, 0), (0, ns_pad - ns),
                                           (0, 0)))
    pbias = jnp.where(jnp.pad(prefix_pad, ((0, 0), (0, p_pad - p_len))),
                      0.0, BIG_NEG).astype(jnp.float32)
    pbias = jnp.repeat(pbias[:, None], hkv, 1).reshape(b * hkv, 1, p_pad)
    pbias = jnp.broadcast_to(pbias, (b * hkv, 8, p_pad))

    # block-diagonal candidate mask [rows, NS]: row (n,s_q,g) attends key
    # (n', s_k) iff n' == n and suffix_mask[s_q, s_k]
    row_n = jnp.arange(rows) // (s * g)
    row_s = (jnp.arange(rows) // g) % s
    key_n = jnp.arange(ns) // s
    key_s = jnp.arange(ns) % s
    block = (row_n[:, None] == key_n[None, :])
    smask = block[None] & suffix_mask[:, row_s][:, :, key_s]   # [B,rows,NS]
    smask = jnp.pad(smask, ((0, 0), (0, rows_pad - rows),
                            (0, ns_pad - ns)))
    smask = jnp.repeat(smask[:, None], hkv, 1).reshape(
        b * hkv, rows_pad, ns_pad).astype(jnp.int8)

    out = pl.pallas_call(
        functools.partial(_shared_prefix_kernel, scale=scale, p_len=p_len),
        out_shape=jax.ShapeDtypeStruct((b * hkv, rows_pad, d), jnp.float32),
        grid=(b * hkv,),
        in_specs=[
            pl.BlockSpec((1, rows_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_pad, ns_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qh, kp, vp, ks, vs, pbias, smask)

    out = out[:, :rows].reshape(b, hkv, n, s, g, d)
    out = out.transpose(0, 2, 3, 1, 4, 5)          # [B, N, S, Hkv, G, D]
    return out.reshape(b, n, s, hq * d).astype(v_suf.dtype)


# ---------------------------------------------------------------------------
# Dense (mask-free) flash MHA — the ViT / text towers
# ---------------------------------------------------------------------------

_BLOCK_QD = 256
_BLOCK_KD = 256


def _dense_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      kv_len: int):
    """One (batch*head, q-block) program; no mask (bidirectional towers).

    Numerics mirror ops.attention.mha_attention exactly: bf16 Q/K with fp32
    accumulation on the MXU (identical to the fp32-upcast eager scores —
    upcasting bf16 inputs adds no information), fp32 streaming softmax, and
    probabilities cast to bf16 for the PV product (the reference casts
    probs to value dtype, paligemma_with_expert.py:424)."""
    q = q_ref[0].astype(jnp.float32) * scale
    d = q.shape[-1]
    num_kv_blocks = pl.cdiv(_round_up(kv_len, _BLOCK_KD), _BLOCK_KD)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * _BLOCK_KD, _BLOCK_KD), :]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = i * _BLOCK_KD + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, BIG_NEG)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new).astype(jnp.bfloat16).astype(jnp.float32)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, pl.ds(i * _BLOCK_KD, _BLOCK_KD), :].astype(jnp.float32)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((q.shape[0], 1), BIG_NEG, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros((q.shape[0], d), jnp.float32)
    _, l_f, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    o_ref[0] = acc / jnp.maximum(l_f, 1e-37)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mha_dense(q: jax.Array, k: jax.Array, v: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Mask-free flash MHA (q/k/v: [B, S(q/kv), H, D] -> [B, Sq, H*D]).

    Streams KV blocks through VMEM with an online softmax — the fp32
    [B, H, S, S] score tensor never touches HBM (341 MB/layer for the
    SigLIP2 verifier at 16 episodes x 577 tokens). Measured ~19% faster
    than the XLA einsum path at that shape on v5e."""
    b, s, h, d = q.shape
    skv = k.shape[1]
    scale = d ** -0.5
    s_pad = _round_up(s, _BLOCK_QD)
    skv_pad = _round_up(skv, _BLOCK_KD)
    qp = jnp.pad(q.astype(jnp.bfloat16),
                 ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    kp = jnp.pad(k.astype(jnp.bfloat16),
                 ((0, 0), (0, skv_pad - skv), (0, 0), (0, 0)))
    vp = jnp.pad(v.astype(jnp.bfloat16),
                 ((0, 0), (0, skv_pad - skv), (0, 0), (0, 0)))
    qh = qp.transpose(0, 2, 1, 3).reshape(b * h, s_pad, d)
    kh = kp.transpose(0, 2, 1, 3).reshape(b * h, skv_pad, d)
    vh = vp.transpose(0, 2, 1, 3).reshape(b * h, skv_pad, d)

    out = pl.pallas_call(
        functools.partial(_dense_mha_kernel, scale=scale, kv_len=skv),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), jnp.float32),
        grid=(b * h, s_pad // _BLOCK_QD),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_QD, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_QD, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qh, kh, vh)
    out = out.reshape(b, h, s_pad, d)[:, :, :s]
    return out.transpose(0, 2, 1, 3).reshape(b, s, h * d).astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_prefix_gqa(q: jax.Array, k: jax.Array, v: jax.Array,
                      mask: jax.Array, interpret: bool = False) -> jax.Array:
    """Masked GQA attention via the Pallas flash kernel.

    q: [B, S, Hq, D]; k/v: [B, Skv, Hkv, D]; mask: bool[B, S, Skv]
    (True = attend). Returns [B, S, Hq*D] in v.dtype.
    Hq % Hkv == 0; each q head attends its kv group's single head.
    """
    b, s, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    groups = hq // hkv
    scale = d ** -0.5

    s_pad = _round_up(s, _BLOCK_Q)
    skv_pad = _round_up(skv, _BLOCK_K)
    qp = jnp.pad(q.astype(jnp.bfloat16),
                 ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    kp = jnp.pad(k.astype(jnp.bfloat16),
                 ((0, 0), (0, skv_pad - skv), (0, 0), (0, 0)))
    vp = jnp.pad(v.astype(jnp.bfloat16),
                 ((0, 0), (0, skv_pad - skv), (0, 0), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, s_pad - s), (0, skv_pad - skv)))

    # Fold query heads of each KV group into query ROWS so K/V are loaded
    # once per (batch, kv-head) — no materialised head replication.
    # qh: [B*Hkv, G*S, D]; kv: [B*Hkv, Skv, D]; mask shared across the group.
    qh = qp.transpose(0, 2, 1, 3).reshape(b, hkv, groups * s_pad, d)
    qh = qh.reshape(b * hkv, groups * s_pad, d)
    kh = kp.transpose(0, 2, 1, 3).reshape(b * hkv, skv_pad, d)
    vh = vp.transpose(0, 2, 1, 3).reshape(b * hkv, skv_pad, d)
    mh = jnp.repeat(mp[:, None], hkv, axis=1).reshape(
        b * hkv, s_pad, skv_pad).astype(jnp.int8)

    rows = groups * s_pad
    grid = (b * hkv, rows // _BLOCK_Q)
    q_blocks_per_head = s_pad // _BLOCK_Q

    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, kv_len=skv_pad),
        out_shape=jax.ShapeDtypeStruct((b * hkv, rows, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BLOCK_Q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # mask tile follows the q row position within the head
            pl.BlockSpec((1, _BLOCK_Q, skv_pad),
                         lambda i, j, qb=q_blocks_per_head: (i, j % qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_Q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qh, kh, vh, mh)

    out = out.reshape(b, hkv, groups, s_pad, d)[:, :, :, :s]
    out = out.transpose(0, 3, 1, 2, 4)                 # [B, S, Hkv, G, D]
    return out.reshape(b, s, hq * d).astype(v.dtype)
