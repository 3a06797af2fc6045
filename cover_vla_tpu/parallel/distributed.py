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


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", 1)),
        process_id=process_id or int(os.environ.get("PROCESS_ID", 0)))


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
