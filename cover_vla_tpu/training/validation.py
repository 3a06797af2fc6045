"""Validation: rolled-out action accuracy vs ground truth.

Mirrors BaseTrainer.validate (INT-ACT/src/agent/trainer.py:347-383) and
get_action_accuracy (src/utils/metric.py:6): sample an action chunk with
fixed noise, compare per-dimension against the ground-truth chunk at
multiple tolerance thresholds.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import Pi0Config
from cover_vla_tpu.models import pi0

DEFAULT_THRESHOLDS = (0.01, 0.05, 0.1)


def action_accuracy(pred: np.ndarray, gt: np.ndarray,
                    thresholds: Sequence[float] = DEFAULT_THRESHOLDS
                    ) -> Dict[str, float]:
    """Fraction of action elements within each absolute-error threshold."""
    err = np.abs(np.asarray(pred) - np.asarray(gt))
    out = {f"acc@{t}": float((err < t).mean()) for t in thresholds}
    out["mae"] = float(err.mean())
    return out


def validate_pi0(params, cfg: Pi0Config, batch: Dict,
                 thresholds: Sequence[float] = DEFAULT_THRESHOLDS,
                 seed: int = 0) -> Dict[str, float]:
    """Deterministic (zero-noise) chunk sampling vs the batch's GT actions."""
    b = batch["state"].shape[0]
    noise = jnp.zeros((b, 1, cfg.chunk_size, cfg.max_action_dim), jnp.float32)
    pred = pi0.sample_actions(
        params, cfg, jax.random.PRNGKey(seed), batch["images"],
        batch["img_masks"], batch["lang_tokens"], batch["lang_masks"],
        batch["state"], num_candidates=1, noise=noise)[:, 0]
    gt = np.asarray(batch["actions"])
    mask = ~np.asarray(batch.get(
        "actions_is_pad", np.zeros(gt.shape[:2], bool)))
    pred_np = np.asarray(pred)[mask]
    gt_np = gt[mask]
    return action_accuracy(pred_np, gt_np, thresholds)
