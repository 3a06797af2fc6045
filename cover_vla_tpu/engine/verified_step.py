"""The fused CoVer verified-control step — one jitted on-device program.

This is the TPU-native replacement for the reference's host-orchestrated
hot loop (run_simpler_eval_with_openpi.py:259-440 + eval_utils.py:172-221 +
efficient_ensemble_merged.py:309-456), which made 2-3 GPU round trips and
ran per-candidate numpy loops on the host every control step. Here
EVERYTHING between raw pixels and the selected execution-format action chunk
runs inside a single jit:

  1. image preprocessing for the policy (LANCZOS4 -> uint8 -> [-1,1]) and
     the verifier (bicubic 384 -> mean/std 0.5) as separable-matmul kernels;
  2. proprio bound-normalisation + zero-pad to 32;
  3. pi0 sampling: ONE vision-tower pass, K prompt prefills, N candidates
     per prompt decoding against a shared HBM KV cache over the 10-step
     Euler scan;
  4. on-device action decoding to BOTH formats: execution
     [xyz | axis-angle | gripper ±1] and verifier [xyz | euler | gripper 0/1]
     (SimplerAdapter.postprocess{,_verifier}, simpler.py:96-166);
  5. trajectory assembly (<=6 past actions + chunk future, top-padded -5);
  6. SigLIP2 ensemble scoring of all K*N candidates under the CURRENT
     instruction (row-0 semantics);
  7. two-stage selection without host branching: stage 1 accepts candidate
     0 if its score >= threshold, else stage-2 group-mean language
     selection + argmax (computed unconditionally, selected with where);
  8. gripper majority voting within the winning language group.

The host receives only: the winner's execution chunk, its verifier-format
chunk (for the action-history ring), the winning language index, and the
score — a few hundred bytes per control step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import Pi0Config, VerifierConfig, CoVerConfig
from cover_vla_tpu.data.stats import DatasetStatistics
from cover_vla_tpu.models import pi0, verifier
from cover_vla_tpu.ops.image import (
    resize_bicubic_pil, resize_bilinear_tf_antialias,
    resize_lanczos4_uint8_device)
from cover_vla_tpu.utils.geometry import euler_to_rotvec

Params = Dict[str, Any]


class VerifiedStepResult(NamedTuple):
    exec_chunk: jax.Array      # [chunk, 7] execution-format winner actions
    verifier_chunk: jax.Array  # [chunk, 7] verifier-format winner actions
    winner_idx: jax.Array      # int32 — global candidate index in [0, K*N)
    winner_group: jax.Array    # int32 — language/prompt index in [0, K)
    max_score: jax.Array       # fp32 — winning cosine similarity
    used_stage2: jax.Array     # bool — stage-2 rescore was taken
    deferred: jax.Array        # bool — low-affinity approach-phase pick
    #                            deferred to candidate 0 (CoVerConfig.
    #                            defer_threshold; False when disabled)
    scores: jax.Array          # [K*N] all candidate scores (diagnostics)
    raw_gripper: jax.Array     # [chunk] winner's raw [0,1] gripper output
    #                            (fractal sticky-gripper postprocessing
    #                             needs the pre-binarised value,
    #                             simpler.py:427-459)


def _policy_image(raw_u8: jax.Array, size: int) -> jax.Array:
    """Raw uint8 frame -> policy input, matching the host adapter chain
    cv2-LANCZOS4-resize(uint8) -> /255 -> (x-.5)/.5 (simpler.py:43-65).
    The resize is cv2's 8-bit fixed-point path, reproduced bit-exactly
    on-device (int32 taps + rounding shift + saturation)."""
    x = resize_lanczos4_uint8_device(raw_u8, size, size).astype(jnp.float32)
    return (x / 255.0 - 0.5) / 0.5


def _verifier_image(raw_u8: jax.Array, size: int) -> jax.Array:
    """Raw uint8 frame -> verifier input, matching the reference chain
    exactly (process_raw_image_to_jpg, eval_utils.py:228-286: despite the
    name there is no JPEG encode — it is tf.image.resize BILINEAR
    antialias=True to 256 + a truncating uint8 cast), then the open_clip
    PIL-bicubic resize + mean/std 0.5 normalisation."""
    x = raw_u8.astype(jnp.float32)[None]
    if x.shape[1] != 256 or x.shape[2] != 256:
        x = resize_bilinear_tf_antialias(x, 256, 256)
        x = jnp.clip(jnp.floor(x), 0, 255)   # tf.cast(float32, uint8)
    x = resize_bicubic_pil(x, size, size)
    return ((x / 255.0) - 0.5) / 0.5


def decode_candidates(actions: jax.Array, a_p01: jax.Array,
                      a_p99: jax.Array):
    """Normalised policy outputs [..., 7] -> both engine action formats.

    THE shared denormalisation formula — the single source for the engine,
    the oracle/injected arms, and the experiment's ranking-data collector
    (drift between host copies of this math is what the injected selection
    mode exists to eliminate).

    Returns (exec [xyz | axis-angle | gripper ±1],
             verif [xyz | euler | gripper 0/1],
             grip raw [0, 1] policy gripper output).
    Mirrors SimplerAdapter.postprocess / postprocess_verifier
    (simpler.py:96-166, 211-226).
    """
    body = (actions[..., :6] + 1) / 2 * (a_p99[:6] - a_p01[:6]) + a_p01[:6]
    grip = actions[..., 6:]
    exec_grip = 2.0 * (grip > 0.5) - 1.0
    verif_grip = (grip >= 0.5).astype(jnp.float32)
    rotvec = euler_to_rotvec(body[..., 3:6])
    exec_chunks = jnp.concatenate([body[..., :3], rotvec, exec_grip], -1)
    verif_chunks = jnp.concatenate([body, verif_grip], -1)
    return exec_chunks, verif_chunks, grip


def assemble_trajectories(verif_chunks: jax.Array, history: jax.Array,
                          history_len: jax.Array, max_history: int,
                          padding_value: float):
    """[C, chunk, 7] candidate futures + [max_history, 7] shared past ->
    [C, max_history + chunk, 7] verifier trajectories, -5 top padding
    (eval_utils.py:172-221 + efficient_ensemble_merged.py:378-390)."""
    c = verif_chunks.shape[0]
    hist = jnp.broadcast_to(history[None], (c,) + history.shape)
    traj = jnp.concatenate([hist, verif_chunks], axis=1)
    row = jnp.arange(traj.shape[1])[None, :, None]
    valid = row >= (max_history - history_len)
    return jnp.where(valid, traj, padding_value)


def select_from_scores(scores: jax.Array, n_samples: int,
                       rescore_threshold: float):
    """Two-stage branch-free selection over [K*N] candidate scores
    (run_simpler_eval_with_openpi.py:346-365 + merged engine :427-447):
    stage 1 accepts candidate 0 iff its score >= threshold; stage 2 picks
    the best candidate inside the group-mean-best language group. A
    threshold of +inf disables the gate (always stage 2 / pure grouped
    argmax). Returns (winner, max_score, used_stage2)."""
    n = n_samples
    score0 = scores[0]
    grouped = scores.reshape(-1, n)
    group_means = jnp.mean(grouped, axis=1)
    best_group = jnp.argmax(group_means)
    best_in_group = jnp.argmax(grouped[best_group])
    stage2_idx = best_group * n + best_in_group
    used_stage2 = score0 < rescore_threshold
    winner = jnp.where(used_stage2, stage2_idx, 0)
    max_score = jnp.where(used_stage2, scores[stage2_idx], score0)
    return winner, max_score, used_stage2


def vote_gripper(exec_chunks: jax.Array, exec_chunk: jax.Array,
                 winner_group: jax.Array, n_samples: int) -> jax.Array:
    """Majority gripper vote over the winning language group's candidates,
    applied to the executed chunk's FIRST step
    (run_simpler_eval_with_openpi.py:375-392)."""
    group_grippers = jax.lax.dynamic_slice_in_dim(
        exec_chunks[:, 0, 6], winner_group * n_samples, n_samples)
    close_votes = jnp.sum(group_grippers >= 0)
    open_votes = n_samples - close_votes
    voted = jnp.where(
        close_votes > open_votes, 1.0,
        jnp.where(open_votes > close_votes, -1.0,
                  jnp.where(exec_chunk[0, 6] >= 0, 1.0, -1.0)))
    return exec_chunk.at[0, 6].set(jnp.sign(voted))


def _build_step(pcfg: Pi0Config, vcfg: VerifierConfig,
                ccfg: CoVerConfig, stats: DatasetStatistics):
    """Build the unjitted single-episode verified step (see
    make_verified_step for the argument contract)."""
    if ccfg.max_history + pcfg.chunk_size != vcfg.history_length:
        raise ValueError(
            f"verifier history_length ({vcfg.history_length}) must equal "
            f"max_history ({ccfg.max_history}) + chunk_size ({pcfg.chunk_size})")

    a_p01 = jnp.asarray(stats.action.p01, jnp.float32)
    a_p99 = jnp.asarray(stats.action.p99, jnp.float32)
    p_p01 = jnp.asarray(stats.proprio.p01, jnp.float32)
    p_p99 = jnp.asarray(stats.proprio.p99, jnp.float32)
    K, N = ccfg.n_rephrases, ccfg.n_samples

    def step(policy_params: Params, verifier_params: Params, key: jax.Array,
             raw_image: jax.Array, proprio: jax.Array,
             lang_tokens: jax.Array, lang_masks: jax.Array,
             verifier_tokens: jax.Array, history: jax.Array,
             history_len: jax.Array) -> VerifiedStepResult:
        """
        raw_image: uint8[H, W, 3] env frame.
        proprio: fp32[7] raw euler-format proprio (host does quat->euler).
        lang_tokens/masks: [K, T] policy prompts (row 0 = current task).
        verifier_tokens: int[Tv] current-instruction SigLIP2 tokens.
        history: fp32[max_history, 7] verifier-format past actions, valid
          entries occupy the LAST history_len rows.
        history_len: int32 in [0, max_history].
        """
        # 1-2. observation preprocessing ---------------------------------
        if ccfg.selection == "random":
            key, sel_key = jax.random.split(key)
        img = _policy_image(raw_image, pcfg.vision.image_size)
        state_norm = 2 * (proprio - p_p01) / (p_p99 - p_p01 + 1e-8) - 1
        state_norm = jnp.clip(state_norm, -1, 1)
        state = jnp.zeros((1, pcfg.max_state_dim), jnp.float32
                          ).at[0, :7].set(state_norm)
        state_k = jnp.broadcast_to(state, (K, pcfg.max_state_dim))

        # 3. pi0: shared vision tower, K prefills, N candidates each -----
        images = img[None, None]                       # [1, 1, H, W, 3]
        img_masks = jnp.ones((1, pcfg.num_images), dtype=bool)
        actions = pi0.sample_actions(
            policy_params, pcfg, key, images, img_masks, lang_tokens,
            lang_masks, state_k, num_candidates=N, noise_std=ccfg.noise_std)
        actions = actions.reshape(K * N, pcfg.chunk_size,
                                  pcfg.max_action_dim)[..., :7]

        # 4. both action formats, on-device ------------------------------
        exec_chunks, verif_chunks, grip = decode_candidates(
            actions, a_p01, a_p99)

        # 5. trajectories: [K*N, max_history + chunk, 7], -5 top padding --
        traj = assemble_trajectories(verif_chunks, history, history_len,
                                     ccfg.max_history,
                                     vcfg.action_padding_value)

        # 6. verifier scoring under the current instruction --------------
        # (skipped entirely for the ablation baselines — "random"/"first"
        #  are the no-verifier arms of the reference's headline comparison)
        deferred = jnp.bool_(False)
        if ccfg.selection == "verifier":
            vimg = _verifier_image(raw_image, vcfg.vision.image_size)
            feats = verifier.extract_features(
                verifier_params, vcfg, vimg, verifier_tokens[None])
            fused_it, fused_ac = verifier.ensemble_embed(
                verifier_params, vcfg, feats, traj)
            scores = jnp.matmul(fused_it, fused_ac.T,
                                precision=jax.lax.Precision.HIGHEST)[0]

            # 7. two-stage selection, branch-free ------------------------
            winner, max_score, used_stage2 = select_from_scores(
                scores, N, ccfg.rescore_threshold)

            # 7b. phase-aware deference (see CoVerConfig.defer_threshold):
            # an unfamiliar scene (low affinity to the ID calibration
            # prototype) means the verifier cannot ground the pick object,
            # so approach-phase picks fall back to the policy prior;
            # carry-phase ranking (object held, gripper closed) is
            # identity-free geometry and stays verified
            if ccfg.defer_threshold != float("-inf"):
                calib = verifier_params.get("calibration")
                if calib is None:
                    raise ValueError(
                        "CoVerConfig.defer_threshold is set but the "
                        "verifier checkpoint has no 'calibration' entry — "
                        "run `verification_scaling.py calibrate` first")
                proto = jnp.asarray(calib["prototype"], jnp.float32)
                affinity = jnp.dot(fused_it[0], proto,
                                   precision=jax.lax.Precision.HIGHEST)
                approach = proprio[6] > 0.5      # raw gripper still open
                deferred = approach & (affinity < ccfg.defer_threshold)
                winner = jnp.where(deferred, 0, winner)
                max_score = jnp.where(deferred, scores[0], max_score)
                used_stage2 = used_stage2 & ~deferred
        elif ccfg.selection == "random":
            scores = jnp.zeros((K * N,), jnp.float32)
            winner = jax.random.randint(sel_key, (), 0, K * N)
            max_score = jnp.float32(0.0)
            used_stage2 = jnp.bool_(False)
        elif ccfg.selection == "first":
            scores = jnp.zeros((K * N,), jnp.float32)
            winner = jnp.int32(0)
            max_score = jnp.float32(0.0)
            used_stage2 = jnp.bool_(False)
        else:
            raise ValueError(f"unknown selection mode {ccfg.selection!r} "
                             "(the 'injected' mode uses make_propose_step "
                             "+ make_select_step)")

        exec_chunk = exec_chunks[winner]
        verifier_chunk = verif_chunks[winner]

        # 8. gripper majority vote within the winning language group -----
        # (a deferred step executes the UNvoted policy prior — candidate 0
        # exactly as the "first" baseline would)
        winner_group = winner // N
        if ccfg.gripper_vote:
            voted = vote_gripper(exec_chunks, exec_chunk, winner_group, N)
            exec_chunk = jnp.where(deferred, exec_chunk, voted)

        return VerifiedStepResult(
            exec_chunk=exec_chunk, verifier_chunk=verifier_chunk,
            winner_idx=winner.astype(jnp.int32),
            winner_group=winner_group.astype(jnp.int32),
            max_score=max_score, used_stage2=used_stage2,
            deferred=deferred, scores=scores,
            raw_gripper=grip[winner, :, 0])

    return step


def make_verified_step(pcfg: Pi0Config, vcfg: VerifierConfig,
                       ccfg: CoVerConfig, stats: DatasetStatistics):
    """Jitted verified_step(policy_params, verifier_params, key, raw_image,
    proprio, lang_tokens, lang_masks, verifier_tokens, history, history_len)
    for ONE episode."""
    return jax.jit(_build_step(pcfg, vcfg, ccfg, stats))


def make_verified_step_batched(pcfg: Pi0Config, vcfg: VerifierConfig,
                               ccfg: CoVerConfig, stats: DatasetStatistics):
    """Episode-batched verified step: every per-episode argument gains a
    leading E axis (raw_image [E,H,W,3], proprio [E,7], lang_tokens [E,K,T],
    lang_masks [E,K,T], verifier_tokens [E,Tv], history [E,max_hist,7],
    history_len int32[E], key [E,2]).

    One dispatch drives E parallel environments (the reference's MS3
    n_parallel_eval evaluation mode, simplerMS3_evaluator.py) — this both
    amortises per-dispatch host/interconnect latency and fills the chip:
    the policy runs E*K prefills and E*K*N candidate decodes in one program.
    """
    step = _build_step(pcfg, vcfg, ccfg, stats)
    return jax.jit(jax.vmap(step, in_axes=(None, None, 0, 0, 0, 0, 0, 0,
                                           0, 0)))


class ProposeResult(NamedTuple):
    exec_chunks: jax.Array      # [K*N, chunk, 7] execution-format candidates
    verifier_chunks: jax.Array  # [K*N, chunk, 7] verifier-format candidates
    trajectories: jax.Array     # [K*N, history_length, 7] verifier trajs
    raw_grippers: jax.Array     # [K*N, chunk, 1] raw [0,1] gripper outputs


def _build_propose(pcfg: Pi0Config, vcfg: VerifierConfig,
                   ccfg: CoVerConfig, stats: DatasetStatistics):
    """Candidate-proposal half of the injected-score selection mode: runs
    steps 1-5 of the verified step (preprocess, sample, decode both action
    formats, assemble trajectories) and returns ALL candidates to the host
    so an external scorer — a privileged oracle, a remote model, a replayed
    score vector — can rank them. Selection then runs on-device through
    the IDENTICAL code the verifier arm uses (make_select_step), so every
    arm of a scaling grid differs only in the score vector
    (the ablation-arm discipline of the reference's headline table,
    README.md:136-155)."""
    if ccfg.max_history + pcfg.chunk_size != vcfg.history_length:
        raise ValueError(
            f"verifier history_length ({vcfg.history_length}) must equal "
            f"max_history ({ccfg.max_history}) + chunk_size ({pcfg.chunk_size})")
    a_p01 = jnp.asarray(stats.action.p01, jnp.float32)
    a_p99 = jnp.asarray(stats.action.p99, jnp.float32)
    p_p01 = jnp.asarray(stats.proprio.p01, jnp.float32)
    p_p99 = jnp.asarray(stats.proprio.p99, jnp.float32)
    K, N = ccfg.n_rephrases, ccfg.n_samples

    def propose(policy_params: Params, key: jax.Array,
                raw_image: jax.Array, proprio: jax.Array,
                lang_tokens: jax.Array, lang_masks: jax.Array,
                history: jax.Array, history_len: jax.Array) -> ProposeResult:
        img = _policy_image(raw_image, pcfg.vision.image_size)
        state_norm = 2 * (proprio - p_p01) / (p_p99 - p_p01 + 1e-8) - 1
        state_norm = jnp.clip(state_norm, -1, 1)
        state = jnp.zeros((1, pcfg.max_state_dim), jnp.float32
                          ).at[0, :7].set(state_norm)
        state_k = jnp.broadcast_to(state, (K, pcfg.max_state_dim))
        images = img[None, None]
        img_masks = jnp.ones((1, pcfg.num_images), dtype=bool)
        actions = pi0.sample_actions(
            policy_params, pcfg, key, images, img_masks, lang_tokens,
            lang_masks, state_k, num_candidates=N, noise_std=ccfg.noise_std)
        actions = actions.reshape(K * N, pcfg.chunk_size,
                                  pcfg.max_action_dim)[..., :7]
        exec_chunks, verif_chunks, grip = decode_candidates(
            actions, a_p01, a_p99)
        traj = assemble_trajectories(verif_chunks, history, history_len,
                                     ccfg.max_history,
                                     vcfg.action_padding_value)
        return ProposeResult(exec_chunks, verif_chunks, traj, grip)

    return propose


def _build_select(ccfg: CoVerConfig):
    """Selection half of the injected-score mode: the EXACT two-stage gate
    + group-mean language selection + gripper vote the verifier arm runs,
    applied to an externally supplied score vector."""
    N = ccfg.n_samples

    def select(scores: jax.Array, exec_chunks: jax.Array,
               verif_chunks: jax.Array,
               raw_grippers: jax.Array) -> VerifiedStepResult:
        winner, max_score, used_stage2 = select_from_scores(
            scores, N, ccfg.rescore_threshold)
        exec_chunk = exec_chunks[winner]
        verifier_chunk = verif_chunks[winner]
        winner_group = winner // N
        if ccfg.gripper_vote:
            exec_chunk = vote_gripper(exec_chunks, exec_chunk,
                                      winner_group, N)
        return VerifiedStepResult(
            exec_chunk=exec_chunk, verifier_chunk=verifier_chunk,
            winner_idx=winner.astype(jnp.int32),
            winner_group=winner_group.astype(jnp.int32),
            max_score=max_score.astype(jnp.float32),
            used_stage2=used_stage2, deferred=jnp.bool_(False),
            scores=scores, raw_gripper=raw_grippers[winner, :, 0])

    return select


def make_propose_step_batched(pcfg: Pi0Config, vcfg: VerifierConfig,
                              ccfg: CoVerConfig, stats: DatasetStatistics):
    """Episode-batched candidate proposal (leading E axis on every
    per-episode argument: key [E,2], raw_image [E,H,W,3], proprio [E,7],
    lang_tokens/masks [E,K,T], history [E,max_hist,7], history_len [E])."""
    propose = _build_propose(pcfg, vcfg, ccfg, stats)
    return jax.jit(jax.vmap(propose, in_axes=(None, 0, 0, 0, 0, 0, 0, 0)))


def make_select_step_batched(ccfg: CoVerConfig):
    """Episode-batched injected-score selection (scores [E, K*N] plus the
    batched ProposeResult arrays)."""
    select = _build_select(ccfg)
    return jax.jit(jax.vmap(select, in_axes=(0, 0, 0, 0)))


def make_verified_step_sharded(pcfg: Pi0Config, vcfg: VerifierConfig,
                               ccfg: CoVerConfig, stats: DatasetStatistics,
                               mesh):
    """Multi-chip episode-parallel verified step: the E axis is sharded
    over every device of `mesh` (params replicated — the 3.3B policy fits a
    chip; SURVEY.md §2.7: scaling is along the batch/candidate axis). Each
    chip runs its episodes' full sample->score->select; no collectives are
    needed in the loop, so throughput scales linearly over ICI-attached
    chips. E must be a multiple of the mesh size."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = _build_step(pcfg, vcfg, ccfg, stats)
    vstep = jax.vmap(step, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0))
    axes = tuple(mesh.axis_names)
    ep = NamedSharding(mesh, P(axes))         # shard leading episode axis
    rep = NamedSharding(mesh, P())
    return jax.jit(vstep,
                   in_shardings=(rep, rep) + (ep,) * 8,
                   out_shardings=ep)
