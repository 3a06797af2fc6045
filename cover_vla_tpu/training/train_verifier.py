"""Verifier contrastive training: symmetric InfoNCE over (image+text,
trajectory) pairs, frozen SigLIP2 backbone, trainable heads only.

TPU-native counterpart of train_siglip2_bridge_ddp
(bridge_verifier/ensemble_eval/finetune_trajectory_bridge_ddp.py:548-1300):
NCCL DDP -> a ('dp','fsdp') mesh with a sharded batch (gradient averaging
falls out of the loss mean); symmetric cross-entropy (:893-899); top-k
retrieval accuracy both directions (:446-469); linear-warmup LR (:826-837);
grad-norm metrics (:489-508); checkpoint save/rotate via
convert.checkpoints. Ensemble members are trained as independent seeds
(the reference trains members in separate runs and merges; here a member
index selects which head stack the step updates)."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cover_vla_tpu.configs import VerifierConfig
from cover_vla_tpu.models import verifier


class VerifierTrainState(NamedTuple):
    members: Any          # trainable head params (vmapped member axis)
    opt_state: Any
    step: jax.Array


def info_nce_loss(member, cfg: VerifierConfig, feats, action_histories
                  ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric InfoNCE for one member given frozen backbone features."""
    it = verifier.member_image_text_embed(member, cfg, feats)
    ac = verifier.member_action_embed(member, cfg, action_histories)
    scale = jnp.exp(member["logit_scale"])
    logits = scale * jnp.matmul(it, ac.T,
                                precision=jax.lax.Precision.HIGHEST)
    b = logits.shape[0]
    labels = jnp.arange(b)
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (loss_i.mean() + loss_a.mean())
    metrics = {
        "loss": loss,
        "logit_scale": member["logit_scale"],
        **retrieval_metrics(logits),
    }
    return loss, metrics


def retrieval_metrics(logits: jax.Array, ks=(1, 5)) -> Dict[str, jax.Array]:
    """Top-k retrieval accuracy, image->action and action->image."""
    b = logits.shape[0]
    labels = jnp.arange(b)
    out = {}
    for name, l in (("i2a", logits), ("a2i", logits.T)):
        ranks = jnp.sum(l > jnp.take_along_axis(
            l, labels[:, None], axis=1), axis=1)
        for k in ks:
            out[f"top{k}_{name}"] = jnp.mean(ranks < k)
    return out


def make_train_step(cfg: VerifierConfig, tx: optax.GradientTransformation,
                    member_idx: int = 0):
    """Jitted step updating ONE member's heads; the backbone is a frozen
    input (no gradients flow into it)."""

    def step(state: VerifierTrainState, backbone, batch):
        feats = verifier.extract_features(
            {"backbone": backbone}, cfg, batch["images"], batch["text_tokens"])
        feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

        def loss_fn(members):
            member = jax.tree_util.tree_map(lambda x: x[member_idx], members)
            return info_nce_loss(member, cfg, feats,
                                 batch["action_histories"])

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.members)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.members)
        members = optax.apply_updates(state.members, updates)
        return VerifierTrainState(members, opt_state, state.step + 1), metrics

    return jax.jit(step)


def _ensemble_grads(members, backbone, batch, cfg: VerifierConfig):
    feats = verifier.extract_features(
        {"backbone": backbone}, cfg, batch["images"], batch["text_tokens"])
    feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

    def loss_fn(members):
        losses, metrics = jax.vmap(
            lambda m: info_nce_loss(m, cfg, feats,
                                    batch["action_histories"]))(members)
        return losses.mean(), metrics

    (_, per_member), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(members)
    metrics = {k: v.mean() for k, v in per_member.items()}
    metrics["member_loss"] = per_member["loss"]
    return grads, metrics


def make_ensemble_train_step(cfg: VerifierConfig,
                             tx: optax.GradientTransformation, mesh=None):
    """Jitted step updating ALL members at once (vmapped member axis; the
    reference trains members as separate seeded runs and merges —
    finetune...py:1500-1519 + efficient_ensemble_merged.py:36-53; here
    member diversity comes from independent initialisations while the MXU
    batches the K head stacks in one pass).

    With a mesh, the step is the exact multi-device counterpart of the
    reference's NCCL DDP (finetune...py:424-438,674): the batch is sharded
    over the mesh, every device computes the symmetric InfoNCE over its
    LOCAL batch shard (local negatives — the DDP semantics, since DDP
    never gathers logits across ranks), and gradients are averaged with a
    pmean (the all-reduce). Params/optimizer state stay replicated (the
    trainable heads are ~10 MB)."""

    if mesh is None:
        def step(state: VerifierTrainState, backbone, batch):
            grads, metrics = _ensemble_grads(state.members, backbone,
                                             batch, cfg)
            metrics["grad_norm"] = optax.global_norm(grads)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.members)
            members = optax.apply_updates(state.members, updates)
            return VerifierTrainState(members, opt_state, state.step + 1), \
                metrics

        return jax.jit(step)

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    axes = tuple(mesh.axis_names)
    rep, shard = P(), P(axes)

    def local(members, backbone, batch):
        grads, metrics = _ensemble_grads(members, backbone, batch, cfg)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, axes), grads)
        metrics = {k: jax.lax.pmean(v, axes) for k, v in metrics.items()}
        return grads, metrics

    # check_rep=False: the scans inside the verifier towers mix replicated
    # carries with batch-varying activations, which the replication checker
    # cannot type; grads are explicitly pmean'd so outputs ARE replicated
    smapped = shard_map(local, mesh=mesh,
                        in_specs=(rep, rep, shard),
                        out_specs=(rep, rep), check_rep=False)

    def step(state: VerifierTrainState, backbone, batch):
        grads, metrics = smapped(state.members, backbone, batch)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.members)
        members = optax.apply_updates(state.members, updates)
        return VerifierTrainState(members, opt_state, state.step + 1), metrics

    return jax.jit(step)


def shard_verifier_batch(batch, mesh):
    """Place a host batch sharded over the mesh's axes (leading dim)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return {k: jax.device_put(np.asarray(v), sh) if not isinstance(v, list)
            else v for k, v in batch.items()}


def ensemble_eval_metrics(members, cfg: VerifierConfig, backbone,
                          batch) -> Dict[str, jax.Array]:
    """Validation retrieval metrics averaged over members (the reference's
    in-training retrieval accuracy, finetune...py:446-469)."""
    feats = verifier.extract_features(
        {"backbone": backbone}, cfg, batch["images"], batch["text_tokens"])

    def one(m):
        _, metrics = info_nce_loss(m, cfg, feats, batch["action_histories"])
        return metrics

    per_member = jax.vmap(one)(members)
    return {k: v.mean() for k, v in per_member.items()}


def init_train_state(key, cfg: VerifierConfig, tx,
                     num_members: int = 1) -> Tuple[Any, VerifierTrainState]:
    """Returns (frozen backbone params, trainable state)."""
    params = verifier.init_verifier(key, cfg, num_members=num_members)
    members = params["members"]
    return params["backbone"], VerifierTrainState(
        members, tx.init(members), jnp.zeros((), jnp.int32))
