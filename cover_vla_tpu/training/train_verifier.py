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


# ---------------------------------------------------------------------------
# From-scratch training (backbone unfrozen)
# ---------------------------------------------------------------------------


class FullVerifierTrainState(NamedTuple):
    """Joint state when the backbone trains too: params holds the whole
    verifier tree ({"backbone", "members"})."""
    params: Any
    opt_state: Any
    step: jax.Array


def make_full_train_step(cfg: VerifierConfig,
                         tx: optax.GradientTransformation):
    """Contrastive step over the WHOLE verifier, backbone included.

    The reference always freezes its pretrained SigLIP2
    (finetune_trajectory_bridge_ddp.py:189-191) because the backbone
    arrives pretrained; training from scratch (synthetic benchmarks, new
    domains without open_clip weights) needs backbone gradients — a frozen
    random tower collapses all images to near-identical features, leaving
    InfoNCE at chance."""

    def step(state: FullVerifierTrainState, batch):
        def loss_fn(params):
            feats = verifier.extract_features(
                params, cfg, batch["images"], batch["text_tokens"])

            def one(m):
                return info_nce_loss(m, cfg, feats,
                                     batch["action_histories"])

            losses, per_member = jax.vmap(one)(params["members"])
            return losses.mean(), {k: v.mean()
                                   for k, v in per_member.items()}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FullVerifierTrainState(params, opt_state, state.step + 1), \
            metrics

    return jax.jit(step)


def init_full_train_state(key, cfg: VerifierConfig, tx,
                          num_members: int = 1) -> FullVerifierTrainState:
    params = verifier.init_verifier(key, cfg, num_members=num_members)
    return FullVerifierTrainState(params, tx.init(params),
                                  jnp.zeros((), jnp.int32))


def ranking_loss(member, cfg: VerifierConfig, feats, pos_traj, neg_trajs
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Candidate-ranking CE: the expert future must outscore M corrupted
    futures under the SAME frame/history — the decision the CoVer engine
    actually makes at every control step (argmax over candidate chunks,
    verified_step.py step 7). Square InfoNCE's in-batch negatives are
    other frames' trajectories, which barely differ on near-scripted data;
    explicit hard negatives carry the direction/gripper signal.

    pos_traj: [B, H, 7]; neg_trajs: [B, M, H, 7]."""
    it = verifier.member_image_text_embed(member, cfg, feats)     # [B, D]
    b, m = neg_trajs.shape[0], neg_trajs.shape[1]
    all_trajs = jnp.concatenate([pos_traj[:, None], neg_trajs], axis=1)
    flat = all_trajs.reshape(b * (m + 1), *all_trajs.shape[2:])
    ac = verifier.member_action_embed(member, cfg, flat)
    ac = ac.reshape(b, m + 1, -1)
    scale = jnp.exp(member["logit_scale"])
    logits = scale * jnp.einsum(
        "bd,bmd->bm", it, ac, precision=jax.lax.Precision.HIGHEST)
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.zeros((b,), jnp.int32)).mean()
    acc = jnp.mean(jnp.argmax(logits, axis=1) == 0)
    return loss, {"loss": loss, "rank_acc": acc,
                  "logit_scale": member["logit_scale"]}


def listwise_ranking_loss(member, cfg: VerifierConfig, feats, cand_trajs,
                          qualities, tau: float = 1.0
                          ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Listwise candidate ranking: score ALL N candidates of each state
    and cross-entropy against quality-derived soft targets
    softmax(q / tau). Pairwise pos-vs-worst mining teaches shortcuts (the
    mined negatives share surface features, e.g. early gripper releases)
    and never contrasts the runner-up candidates an argmax will actually
    face; the listwise target orders the WHOLE slate.

    cand_trajs: [B, N, H, 7]; qualities: [B, N]."""
    it = verifier.member_image_text_embed(member, cfg, feats)     # [B, D]
    b, n = cand_trajs.shape[0], cand_trajs.shape[1]
    flat = cand_trajs.reshape(b * n, *cand_trajs.shape[2:])
    ac = verifier.member_action_embed(member, cfg, flat).reshape(b, n, -1)
    scale = jnp.exp(member["logit_scale"])
    logits = scale * jnp.einsum(
        "bd,bnd->bn", it, ac, precision=jax.lax.Precision.HIGHEST)
    targets = jax.nn.softmax(qualities / tau, axis=-1)
    loss = optax.softmax_cross_entropy(logits, targets).mean()
    top1 = jnp.mean(jnp.argmax(logits, 1) == jnp.argmax(qualities, 1))
    # quality actually captured by the argmax pick vs the best possible
    picked = jnp.take_along_axis(qualities, jnp.argmax(logits, 1)[:, None],
                                 axis=1)[:, 0]
    regret = jnp.mean(qualities.max(1) - picked)
    return loss, {"loss": loss, "rank_acc": top1, "regret": regret,
                  "logit_scale": member["logit_scale"]}


def quality_regression_loss(member, cfg: VerifierConfig, feats, cand_trajs,
                            qualities, q_scale: float = 5.0
                            ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Dense distillation of a progress oracle into the verifier score:
    MSE between the (scaled-cosine) score of every candidate and its true
    quality. Every candidate contributes a gradient — much denser signal
    than listwise CE, whose per-slate loss mostly moves the argmax. The
    scoring architecture is unchanged (score = exp(logit_scale) * cosine),
    so the trained heads drop straight into the engine."""
    it = verifier.member_image_text_embed(member, cfg, feats)
    b, n = cand_trajs.shape[0], cand_trajs.shape[1]
    flat = cand_trajs.reshape(b * n, *cand_trajs.shape[2:])
    ac = verifier.member_action_embed(member, cfg, flat).reshape(b, n, -1)
    scale = jnp.exp(member["logit_scale"])
    scores = scale * jnp.einsum(
        "bd,bnd->bn", it, ac, precision=jax.lax.Precision.HIGHEST)
    target = qualities / q_scale
    loss = jnp.mean((scores - target) ** 2)
    top1 = jnp.mean(jnp.argmax(scores, 1) == jnp.argmax(qualities, 1))
    picked = jnp.take_along_axis(qualities, jnp.argmax(scores, 1)[:, None],
                                 axis=1)[:, 0]
    regret = jnp.mean(qualities.max(1) - picked)
    return loss, {"loss": loss, "rank_acc": top1, "regret": regret,
                  "logit_scale": member["logit_scale"]}


def make_regression_train_step(cfg: VerifierConfig,
                               tx: optax.GradientTransformation,
                               q_scale: float = 5.0,
                               train_backbone: bool = True):
    """Jitted quality-regression step (same batch contract as the
    listwise step: images, text_tokens, cand_trajs, qualities)."""

    def step(state: FullVerifierTrainState, batch):
        def loss_fn(params):
            feats = verifier.extract_features(
                params, cfg, batch["images"], batch["text_tokens"])
            if not train_backbone:
                feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

            def one(member):
                return quality_regression_loss(
                    member, cfg, feats, batch["cand_trajs"],
                    batch["qualities"], q_scale=q_scale)

            losses, per_member = jax.vmap(one)(params["members"])
            return losses.mean(), {k: v.mean()
                                   for k, v in per_member.items()}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FullVerifierTrainState(params, opt_state, state.step + 1), \
            metrics

    return jax.jit(step)


def make_listwise_train_step(cfg: VerifierConfig,
                             tx: optax.GradientTransformation,
                             tau: float = 1.0,
                             train_backbone: bool = True):
    """Jitted listwise step over the whole verifier (all members).
    batch: images [B,H,W,3], text_tokens [B,T], cand_trajs [B,N,H,7],
    qualities [B,N]."""

    def step(state: FullVerifierTrainState, batch):
        def loss_fn(params):
            feats = verifier.extract_features(
                params, cfg, batch["images"], batch["text_tokens"])
            if not train_backbone:
                feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

            def one(member):
                return listwise_ranking_loss(
                    member, cfg, feats, batch["cand_trajs"],
                    batch["qualities"], tau=tau)

            losses, per_member = jax.vmap(one)(params["members"])
            return losses.mean(), {k: v.mean()
                                   for k, v in per_member.items()}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FullVerifierTrainState(params, opt_state, state.step + 1), \
            metrics

    return jax.jit(step)


def make_ranking_train_step(cfg: VerifierConfig,
                            tx: optax.GradientTransformation,
                            train_backbone: bool = True):
    """Jitted ranking step over the whole verifier (all members).

    batch: images [B,H,W,3], text_tokens [B,T], pos_traj [B,H,7],
    neg_trajs [B,M,H,7]."""

    def step(state: FullVerifierTrainState, batch):
        def loss_fn(params):
            feats = verifier.extract_features(
                params, cfg, batch["images"], batch["text_tokens"])
            if not train_backbone:
                feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

            def one(member):
                return ranking_loss(member, cfg, feats, batch["pos_traj"],
                                    batch["neg_trajs"])

            losses, per_member = jax.vmap(one)(params["members"])
            return losses.mean(), {k: v.mean()
                                   for k, v in per_member.items()}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FullVerifierTrainState(params, opt_state, state.step + 1), \
            metrics

    return jax.jit(step)
