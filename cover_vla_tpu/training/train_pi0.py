"""pi0 finetuning: sharded (DP x FSDP) train step + trainer loop.

The TPU-native counterpart of INT-ACT's BaseTrainer (trainer.py:286-545):
bf16 compute with fp32 optimizer state, gradient accumulation
(optax.MultiSteps, replacing DDP no_sync), cosine-warmup AdamW, frozen
parameter masks (freeze vision encoder / train expert only,
paligemma_with_expert.py:196-209), and metric aggregation — all inside one
pjit'd step over a ('dp','fsdp') mesh instead of DDP/FSDP wrappers.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from cover_vla_tpu.configs import Pi0Config
from cover_vla_tpu.models import pi0
from cover_vla_tpu.parallel.mesh import fsdp_sharding, make_mesh


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def freeze_mask(params, train_expert_only: bool = True,
                freeze_vision: bool = True, train_state_proj: bool = True):
    """True = trainable. Mirrors pi0 freeze flags (configuration_pi0.py)."""
    def rule(path, _):
        top = path[0].key
        if top == "vision" and (freeze_vision or train_expert_only):
            return False
        if top in ("paligemma", "mm_proj") and train_expert_only:
            return False
        if top == "state_proj":
            return train_state_proj
        return True
    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer(lr_schedule, mask=None, optimizer: str = "adamw",
                   accumulate_steps: int = 1,
                   **kw) -> optax.GradientTransformation:
    """optimizer: "adamw" | "adamw_8bit" (block-quantised moments, the
    bnb AdamW8bit counterpart — trainer.py:204-210)."""
    if optimizer == "adamw_8bit":
        from cover_vla_tpu.training.quantized_optim import adamw_8bit
        tx = optax.chain(optax.clip_by_global_norm(kw.pop("grad_clip", 1.0)),
                         adamw_8bit(lr_schedule, **kw))
        if accumulate_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    elif optimizer == "adamw":
        from cover_vla_tpu.training.optim import make_adamw
        tx = make_adamw(lr_schedule, accumulate_steps=accumulate_steps, **kw)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if mask is not None:
        # frozen leaves get zero updates (optax.masked would pass raw grads
        # through for de-selected leaves — NOT a freeze)
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def loss_fn(params, cfg: Pi0Config, key, batch) -> Tuple[jax.Array, Dict]:
    """batch: images [B,n,H,W,3], img_masks [B,n], lang_tokens [B,T],
    lang_masks [B,T], state [B,32], actions [B,chunk,32],
    actions_is_pad optional bool[B, chunk]."""
    losses = pi0.flow_matching_loss(
        params, cfg, key, batch["images"], batch["img_masks"],
        batch["lang_tokens"], batch["lang_masks"], batch["state"],
        batch["actions"])
    if "actions_is_pad" in batch:
        in_bound = (~batch["actions_is_pad"])[..., None]
        losses = losses * in_bound
    loss = losses.mean()
    return loss, {"loss": loss}


class PartitionedTrainState(NamedTuple):
    """Full param tree + optimizer state over ONLY the trainable leaves —
    frozen weights get no gradient buffers and no moments (what
    train_expert_only means memory-wise: grads+moments for ~330M of the
    3.3B params instead of the whole tree)."""
    params: Any
    opt_state: Any
    step: jax.Array


def _partition_leaves(params, mask):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    mask_leaves = treedef.flatten_up_to(mask)
    train = [p for p, m in zip(leaves, mask_leaves) if m]
    frozen = [p for p, m in zip(leaves, mask_leaves) if not m]
    return train, frozen, mask_leaves, treedef


def _merge_leaves(train, frozen, mask_leaves, treedef):
    it_t, it_f = iter(train), iter(frozen)
    leaves = [next(it_t) if m else next(it_f) for m in mask_leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_partitioned_train_step(cfg: Pi0Config,
                                tx: optax.GradientTransformation, mask):
    """Train step differentiating only mask=True leaves. `tx` is a plain
    optimizer (no freeze wrapper needed)."""

    def train_step(state: PartitionedTrainState, key, batch):
        train, frozen, mask_leaves, treedef = _partition_leaves(
            state.params, mask)

        def loss_on_trainable(train_leaves):
            params = _merge_leaves(train_leaves, frozen, mask_leaves, treedef)
            return loss_fn(params, cfg, key, batch)

        (loss, metrics), grads = jax.value_and_grad(
            loss_on_trainable, has_aux=True)(train)
        updates, opt_state = tx.update(grads, state.opt_state, train)
        train = optax.apply_updates(train, updates)
        params = _merge_leaves(train, frozen, mask_leaves, treedef)
        metrics["grad_norm"] = optax.global_norm(grads)
        return PartitionedTrainState(params, opt_state, state.step + 1), \
            metrics

    return jax.jit(train_step, donate_argnums=(0,))


def init_partitioned_state(params, tx, mask) -> PartitionedTrainState:
    train, _, _, _ = _partition_leaves(params, mask)
    return PartitionedTrainState(params, tx.init(train),
                                 jnp.zeros((), jnp.int32))


def init_partitioned_train_state(key, cfg: Pi0Config, tx, mask=None,
                                 mesh=None) -> PartitionedTrainState:
    """Initialise a partitioned (expert-only) state, optionally FSDP-sharded.

    On a mesh, both the full param tree and the trainable-leaf optimizer
    state are sharded along 'fsdp' at init time (no full host
    materialisation) — this is the multi-device counterpart of the
    reference's freeze semantics (paligemma_with_expert.py:196-209 +
    trainer.py:109-123): frozen leaves carry no grads and no moments,
    regardless of mesh shape.
    """
    abstract = jax.eval_shape(lambda k: pi0.init_pi0(k, cfg), key)
    if mask is None:
        mask = freeze_mask(abstract, train_expert_only=True)
    if mesh is None:
        params = jax.jit(lambda k: pi0.init_pi0(k, cfg))(key)
        return init_partitioned_state(params, tx, mask), mask

    shardings = fsdp_sharding(abstract, mesh)
    params = jax.jit(lambda k: pi0.init_pi0(k, cfg),
                     out_shardings=shardings)(key)
    train_abs, _, _, _ = _partition_leaves(abstract, mask)
    opt_abs = jax.eval_shape(tx.init, train_abs)
    opt_shardings = fsdp_sharding(opt_abs, mesh)

    def _init_opt(p):
        train, _, _, _ = _partition_leaves(p, mask)
        return tx.init(train)

    opt_state = jax.jit(_init_opt, out_shardings=opt_shardings)(params)
    state = PartitionedTrainState(params, opt_state,
                                  jnp.zeros((), jnp.int32))
    return state, mask


def make_train_step(cfg: Pi0Config, tx: optax.GradientTransformation,
                    mesh=None):
    """Build the (optionally pjit-sharded) train step."""

    def train_step(state: TrainState, key, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, cfg, key, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(train_step)

    # shard params/opt-state along fsdp, batch along (dp, fsdp)
    def shard_step(state: TrainState, key, batch):
        return train_step(state, key, batch)

    return jax.jit(shard_step, donate_argnums=(0,))


def init_train_state(key, cfg: Pi0Config, tx, mesh=None) -> TrainState:
    """Initialise params (+optimizer state), sharded over the mesh if given."""
    if mesh is None:
        params = jax.jit(lambda k: pi0.init_pi0(k, cfg))(key)
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    abstract = jax.eval_shape(lambda k: pi0.init_pi0(k, cfg), key)
    shardings = fsdp_sharding(abstract, mesh)
    params = jax.jit(lambda k: pi0.init_pi0(k, cfg),
                     out_shardings=shardings)(key)
    opt_state = jax.jit(tx.init,
                        out_shardings=fsdp_sharding(
                            jax.eval_shape(tx.init, abstract), mesh))(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def shard_batch(batch, mesh):
    """Place a host batch sharded over (dp, fsdp) on the leading axis."""
    def put(x):
        sh = NamedSharding(mesh, P(("dp", "fsdp")))
        return jax.device_put(x, sh)
    return jax.tree_util.tree_map(put, batch)
