"""Multi-host initialisation + cross-host collectives helpers.

The reference's distributed backend is torch.distributed NCCL
(SURVEY.md §5): init_process_group from torchrun env vars, all_reduce for
metric aggregation, barrier. The TPU-native equivalents:

  * `init_multihost()` wraps jax.distributed.initialize (coordinator from
    env or args); after it, jax.devices() spans the slice and pjit programs
    communicate over ICI/DCN automatically.
  * metric aggregation is `jax.experimental.multihost_utils`
    process_allgather / host-level psum (`aggregate_metrics`).
  * `barrier()` = sync_global_devices.

Checkpoint gathering: Orbax handles multihost sharded save/restore
natively (convert.checkpoints works unchanged under a global mesh).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax


def resolve_multihost_env(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None,
                          env: Optional[Dict[str, str]] = None
                          ) -> Optional[Dict]:
    """Resolve the jax.distributed.initialize kwargs from explicit args or
    the standard env vars (COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID). Returns None for a single-process run (no coordinator
    configured anywhere). Raises on a half-configured environment —
    NUM_PROCESSES/PROCESS_ID present without a coordinator address was
    silently treated as single-process before, which turns one typo in
    COORDINATOR_ADDRESS into a wrong-world-size run."""
    env = os.environ if env is None else env
    coordinator_address = coordinator_address or env.get(
        "COORDINATOR_ADDRESS")
    env_np, env_pid = env.get("NUM_PROCESSES"), env.get("PROCESS_ID")
    if coordinator_address is None:
        if num_processes or env_np or process_id or env_pid:
            raise ValueError(
                "NUM_PROCESSES/PROCESS_ID configured but no "
                "COORDINATOR_ADDRESS — refusing a silent single-process "
                "fallback in a multihost launch")
        return None
    return {
        "coordinator_address": coordinator_address,
        "num_processes": (num_processes if num_processes is not None
                          else int(env_np) if env_np is not None else 1),
        "process_id": (process_id if process_id is not None
                       else int(env_pid) if env_pid is not None else 0),
    }


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialise jax.distributed from args or the standard env vars;
    no-op (returns False) when single-process."""
    kwargs = resolve_multihost_env(coordinator_address, num_processes,
                                   process_id)
    if kwargs is None:
        return False
    jax.distributed.initialize(**kwargs)
    return True


def barrier(name: str = "barrier") -> None:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def aggregate_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean of scalar metrics across processes (the reference's
    dist.all_reduce on metric deques — trainer.py:456,537)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)
    return {k: float(gathered[:, i].mean()) for i, k in enumerate(keys)}
