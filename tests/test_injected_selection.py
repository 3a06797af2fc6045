"""Engine-native injected-score selection (propose/select split).

The guarantee under test: every selection arm — verifier, oracle/injected,
random, first — runs the IDENTICAL candidate-generation and selection
program, differing only in the score vector (the ablation-arm discipline
of the reference's headline table, /root/reference/README.md:136-155)."""

import dataclasses

import numpy as np
import jax
import pytest

from cover_vla_tpu.configs import (
    tiny_pi0_config, tiny_verifier_config, CoVerConfig)
from cover_vla_tpu.data.stats import DatasetStatistics
from cover_vla_tpu.models import pi0, verifier
from cover_vla_tpu.engine.verified_step import (
    _verifier_image, make_propose_step_batched, make_select_step_batched,
    make_verified_step_batched)

PCFG = tiny_pi0_config()
VCFG = tiny_verifier_config()
CCFG = CoVerConfig(n_samples=3, n_rephrases=2, selection="injected")
STATS = DatasetStatistics.from_json()
E = 2


@pytest.fixture(scope="module")
def params():
    return (pi0.init_pi0(jax.random.PRNGKey(0), PCFG),
            verifier.init_verifier(jax.random.PRNGKey(1), VCFG, 1))


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    k, t = CCFG.n_rephrases, PCFG.tokenizer_max_length
    return dict(
        raw=rng.integers(0, 255, (E, 256, 256, 3)).astype(np.uint8),
        prop=rng.uniform(-0.1, 0.1, (E, 7)).astype(np.float32),
        lt=rng.integers(0, PCFG.paligemma.vocab_size,
                        (E, k, t)).astype(np.int32),
        lm=np.ones((E, k, t), bool),
        vt=rng.integers(0, VCFG.text.vocab_size,
                        (E, VCFG.text.context_length)).astype(np.int32),
        hist=rng.uniform(-1, 1, (E, CCFG.max_history, 7)).astype(np.float32),
        hlen=np.asarray([2, 0], np.int32),
        keys=jax.random.split(jax.random.PRNGKey(3), E))


def test_injected_with_verifier_scores_equals_fused_step(params, inputs):
    """propose -> host verifier scoring -> select reproduces the fused
    verifier step's winner, actions and scores exactly — the two paths are
    the same program cut at the score vector."""
    pp, vp = params
    i = inputs
    fused_ccfg = dataclasses.replace(CCFG, selection="verifier")
    fused = make_verified_step_batched(PCFG, VCFG, fused_ccfg, STATS)
    rf = fused(pp, vp, i["keys"], i["raw"], i["prop"], i["lt"], i["lm"],
               i["vt"], i["hist"], i["hlen"])

    propose = make_propose_step_batched(PCFG, VCFG, CCFG, STATS)
    select = make_select_step_batched(CCFG)
    prop = propose(pp, i["keys"], i["raw"], i["prop"], i["lt"], i["lm"],
                   i["hist"], i["hlen"])
    # score on the host exactly as the fused step does internally
    scores = np.stack([
        np.asarray(verifier.score_actions(
            vp, VCFG, _verifier_image(i["raw"][e], VCFG.vision.image_size),
            i["vt"][e][None], prop.trajectories[e]))
        for e in range(E)])
    ri = select(scores, prop.exec_chunks, prop.verifier_chunks,
                prop.raw_grippers)

    np.testing.assert_allclose(scores, np.asarray(rf.scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ri.winner_idx),
                                  np.asarray(rf.winner_idx))
    np.testing.assert_allclose(np.asarray(ri.exec_chunk),
                               np.asarray(rf.exec_chunk),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ri.verifier_chunk),
                               np.asarray(rf.verifier_chunk),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ri.used_stage2),
                                  np.asarray(rf.used_stage2))


def test_injected_selection_semantics(params, inputs):
    """Gate + grouped argmax semantics on a hand-made score vector, and
    threshold=inf disables the gate (pure grouped argmax)."""
    pp, _ = params
    i = inputs
    propose = make_propose_step_batched(PCFG, VCFG, CCFG, STATS)
    prop = propose(pp, i["keys"], i["raw"], i["prop"], i["lt"], i["lm"],
                   i["hist"], i["hlen"])
    kn = CCFG.n_rephrases * CCFG.n_samples

    # candidate 0 above the 0.1 gate -> stage 1 accepts it
    select = make_select_step_batched(CCFG)
    scores = np.full((E, kn), -1.0, np.float32)
    scores[:, 0] = 0.2
    scores[:, kn - 1] = 5.0        # better candidate, but gate short-cuts
    r = select(scores, prop.exec_chunks, prop.verifier_chunks,
               prop.raw_grippers)
    assert all(int(w) == 0 for w in r.winner_idx)
    assert not any(bool(s) for s in r.used_stage2)

    # candidate 0 below the gate -> group-mean language selection + argmax
    scores = np.zeros((E, kn), np.float32)
    grouped = scores.reshape(E, CCFG.n_rephrases, CCFG.n_samples)
    grouped[:, 1, :] = 1.0         # group 1 wins the mean
    grouped[:, 1, 2] = 3.0         # its best member
    grouped[:, 0, 1] = 2.0         # a big score in the losing group
    # (candidate 0 itself stays at 0.0 < 0.1 so the gate fires stage 2)
    r = select(scores, prop.exec_chunks, prop.verifier_chunks,
               prop.raw_grippers)
    assert all(int(w) == CCFG.n_samples + 2 for w in r.winner_idx)
    assert all(int(g) == 1 for g in r.winner_group)
    assert all(bool(s) for s in r.used_stage2)
    np.testing.assert_allclose(np.asarray(r.max_score), 3.0)

    # threshold=inf: even a huge candidate-0 score goes through stage 2
    ccfg_inf = dataclasses.replace(CCFG, rescore_threshold=float("inf"),
                                   gripper_vote=False)
    select_inf = make_select_step_batched(ccfg_inf)
    scores = np.zeros((E, kn), np.float32)
    scores[:, 0] = 100.0
    r = select_inf(scores, prop.exec_chunks, prop.verifier_chunks,
                   prop.raw_grippers)
    assert all(bool(s) for s in r.used_stage2)
    assert all(int(w) == 0 for w in r.winner_idx)  # argmax still picks 0
    # winner's chunk is returned verbatim (no vote) in exec format
    np.testing.assert_allclose(np.asarray(r.exec_chunk),
                               np.asarray(prop.exec_chunks[:, 0]))


def test_injected_oracle_through_batched_evaluator(params):
    """The oracle arm runs end-to-end through the REAL batched evaluator
    (engine propose/select + cohort env stepping + history machinery) and
    scores every candidate with the privileged progress oracle."""
    from cover_vla_tpu.eval.evaluator import EvalConfig, evaluate_suite_batched
    from cover_vla_tpu.eval.fake_env import make_fake_env
    from cover_vla_tpu.eval.fake_expert import chunk_quality

    pp, vp = params
    calls = {"n": 0}

    def factory(envs):
        def score_fn(exec_chunks):
            calls["n"] += 1
            e_n, kn = exec_chunks.shape[:2]
            return np.asarray(
                [[chunk_quality(envs[e], exec_chunks[e, i])
                  for i in range(kn)] for e in range(e_n)], np.float32)
        return score_fn

    ccfg = dataclasses.replace(CCFG, n_rephrases=1, gripper_vote=False,
                               rescore_threshold=float("inf"))
    cfg = EvalConfig(task_suite="simpler_carrot_on_plate",
                     num_trials_per_task=2, max_steps=8)
    out = evaluate_suite_batched(
        pp, vp, PCFG, VCFG, ccfg, cfg, n_parallel=2, seed=0,
        env_fn=lambda t: make_fake_env(t, max_steps=8),
        score_fn_factory=factory)
    assert calls["n"] > 0
    assert out["summary"]["total_episodes"] == 2

    # forgetting the factory raises instead of silently selecting garbage
    with pytest.raises(ValueError):
        evaluate_suite_batched(
            pp, vp, PCFG, VCFG, ccfg, cfg, n_parallel=2, seed=0,
            env_fn=lambda t: make_fake_env(t, max_steps=8))
