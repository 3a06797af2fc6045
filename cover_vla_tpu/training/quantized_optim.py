"""Blockwise 8-bit AdamW (bitsandbytes AdamW8bit equivalent, optax-style).

The reference trains pi0 with bnb.optim.AdamW8bit
(INT-ACT/src/agent/trainer.py:204-210) to shrink optimizer memory 4x. Here
the Adam moments are stored as int8 with per-block fp32 absmax scales
(block_size consecutive elements share a scale, like bnb's blockwise
dynamic quantization); the update dequantises, applies fp32 Adam math with
bias correction, decoupled weight decay, and requantises — all inside the
jitted train step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class _Q8(NamedTuple):
    values: Any   # int8, padded flat [-1, block]
    scales: Any   # fp32 per block


class Adam8bitState(NamedTuple):
    count: jax.Array
    mu: Any       # pytree of _Q8
    nu: Any       # pytree of _Q8


def _quantize(x: jax.Array, block: int) -> _Q8:
    flat = x.reshape(-1)
    pad = (-flat.size) % block
    flat = jnp.pad(flat, (0, pad)).reshape(-1, block)
    scales = jnp.max(jnp.abs(flat), axis=1, keepdims=True) / 127.0
    q = jnp.round(flat / jnp.maximum(scales, 1e-20))
    return _Q8(q.astype(jnp.int8), scales.astype(jnp.float32))


def _dequantize(q: _Q8, shape) -> jax.Array:
    flat = q.values.astype(jnp.float32) * q.scales
    size = 1
    for s in shape:
        size *= s
    return flat.reshape(-1)[:size].reshape(shape)


def adamw_8bit(learning_rate, b1: float = 0.9, b2: float = 0.95,
               eps: float = 1e-8, weight_decay: float = 1e-10,
               block_size: int = 256) -> optax.GradientTransformation:
    def init(params):
        def zeros(p):
            return _quantize(jnp.zeros_like(p, jnp.float32), block_size)
        return Adam8bitState(
            jnp.zeros((), jnp.int32),
            jax.tree_util.tree_map(zeros, params),
            jax.tree_util.tree_map(zeros, params))

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def upd(g, qm, qv, p):
            g = g.astype(jnp.float32)
            m = b1 * _dequantize(qm, g.shape) + (1 - b1) * g
            v = b2 * _dequantize(qv, g.shape) + (1 - b2) * g * g
            v = jnp.maximum(v, 0.0)
            step = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            step = step + weight_decay * p.astype(jnp.float32)
            return (-lr * step).astype(p.dtype), _quantize(m, block_size), \
                _quantize(v, block_size)

        # _Q8 moments sit one level deeper than param leaves; flatten the
        # moment trees up to the param structure so leaves line up
        treedef = jax.tree_util.tree_structure(params)
        g_leaves = treedef.flatten_up_to(grads)
        p_leaves = treedef.flatten_up_to(params)
        m_leaves = treedef.flatten_up_to(state.mu)
        n_leaves = treedef.flatten_up_to(state.nu)
        outs = [upd(g, m, n, p) for g, m, n, p in
                zip(g_leaves, m_leaves, n_leaves, p_leaves)]
        updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
        return updates, Adam8bitState(count, mu, nu)

    return optax.GradientTransformation(init, update)
