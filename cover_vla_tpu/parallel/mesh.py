"""Device mesh + sharding rules (SPMD via jax.sharding / pjit).

Replaces the reference's torch DDP/FSDP wrappers
(INT-ACT/src/agent/trainer.py:145-166, finetune_trajectory_bridge_ddp.py:
424-438): a ('dp', 'fsdp') mesh; the batch is sharded over both axes, and
parameters/optimizer state are sharded along 'fsdp' on each tensor's
largest divisible axis (ZeRO-3 style). XLA inserts the all-gathers /
reduce-scatters over ICI; gradient averaging over 'dp' falls out of the
sharded-batch loss mean (the NCCL all_reduce equivalent).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, fsdp: Optional[int] = None,
              devices=None) -> Mesh:
    """Build a ('dp', 'fsdp') mesh. Defaults: all devices on fsdp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and fsdp is None:
        dp, fsdp = 1, n
    elif dp is None:
        dp = n // fsdp
    elif fsdp is None:
        fsdp = n // dp
    assert dp * fsdp == n, f"mesh {dp}x{fsdp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, ("dp", "fsdp"))


def fsdp_sharding(params, mesh: Mesh, axis: str = "fsdp",
                  min_size: int = 2 ** 14):
    """NamedSharding pytree: shard each tensor's largest divisible dim.

    Tensors smaller than min_size elements (norm scales, biases) stay
    replicated — sharding them wastes collective latency.
    """
    axis_size = mesh.shape[axis]

    def rule(x):
        if x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % axis_size == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) dim over both mesh axes."""
    def rule(x):
        if getattr(x, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(("dp", "fsdp")))
    return rule


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
