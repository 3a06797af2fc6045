"""Pytree parameter utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def cast_tree(params, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)


def param_bytes(params) -> int:
    return sum(int(x.size * x.dtype.itemsize)
               for x in jax.tree_util.tree_leaves(params))
