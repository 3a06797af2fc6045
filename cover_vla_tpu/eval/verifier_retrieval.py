"""Offline verifier retrieval harness.

Mirrors sample_and_test_bridge_merged_ensemble
(efficient_ensemble_merged.py:458-582): for each probe, the ground-truth
trajectory is hidden in a pool of `pool_size` distractors; report top-1
accuracy, mean rank of the GT, and the mean L2 distance between the
top-ranked trajectory and the GT."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import VerifierConfig
from cover_vla_tpu.models import verifier


def retrieval_test(params, cfg: VerifierConfig, images: np.ndarray,
                   text_tokens: np.ndarray, trajectories: np.ndarray,
                   pool_size: int = 20, seed: int = 0) -> Dict:
    """
    images: [N, H, W, 3]; text_tokens: [N, T]; trajectories: [N, Hist, D].
    For each sample i, scores its (image, text) against {GT_i} + distractors
    drawn from the other samples.
    """
    n = len(images)
    rng = np.random.default_rng(seed)
    score_fn = jax.jit(lambda p, i, t, a: verifier.score_actions(
        p, cfg, i, t, a))

    ranks, top1, l2 = [], [], []
    for i in range(n):
        others = [j for j in range(n) if j != i]
        distractors = rng.choice(others, size=min(pool_size - 1, len(others)),
                                 replace=False)
        pool_idx = np.concatenate([[i], distractors])
        pool = trajectories[pool_idx]
        scores = np.asarray(score_fn(
            params, jnp.asarray(images[i:i + 1]),
            jnp.asarray(text_tokens[i:i + 1]), jnp.asarray(pool)))
        order = np.argsort(-scores)
        rank = int(np.where(order == 0)[0][0])
        ranks.append(rank)
        top1.append(rank == 0)
        best = pool[order[0]]
        l2.append(float(np.linalg.norm(best - trajectories[i])))

    return {
        "top1_accuracy": float(np.mean(top1)),
        "mean_rank": float(np.mean(ranks)),     # 0 = perfect
        "mean_l2_top1": float(np.mean(l2)),
        "num_samples": n,
        "pool_size": pool_size,
    }


def display_results(results: Dict) -> str:
    lines = [
        "Verifier retrieval test",
        f"  samples:        {results['num_samples']} "
        f"(pool {results['pool_size']})",
        f"  top-1 accuracy: {results['top1_accuracy']:.3f}",
        f"  mean GT rank:   {results['mean_rank']:.2f}",
        f"  mean L2@top1:   {results['mean_l2_top1']:.4f}",
    ]
    return "\n".join(lines)
