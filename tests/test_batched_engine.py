"""Episode-batched verified step: vmap equivalence + lockstep evaluation."""

import numpy as np
import jax
import pytest

from cover_vla_tpu.configs import (
    tiny_pi0_config, tiny_verifier_config, CoVerConfig)
from cover_vla_tpu.data.stats import DatasetStatistics
from cover_vla_tpu.models import pi0, verifier
from cover_vla_tpu.engine import (
    make_verified_step, make_verified_step_batched,
    BatchedCoVerEngine, evaluate_batched)
from cover_vla_tpu.eval.adapters import BridgeSimplerAdapter
from cover_vla_tpu.eval.fake_env import FakeWidowXEnv

PCFG = tiny_pi0_config()
VCFG = tiny_verifier_config()
CCFG = CoVerConfig(n_samples=2, n_rephrases=2)
STATS = DatasetStatistics.from_json()


@pytest.fixture(scope="module")
def params():
    return (pi0.init_pi0(jax.random.PRNGKey(0), PCFG),
            verifier.init_verifier(jax.random.PRNGKey(1), VCFG, 1))


def test_batched_equals_single(params):
    """vmapped E=2 batched step == two independent single steps."""
    pp, vp = params
    rng = np.random.default_rng(0)
    e = 2
    raw = rng.integers(0, 255, (e, 256, 256, 3)).astype(np.uint8)
    prop = rng.uniform(-0.1, 0.1, (e, 7)).astype(np.float32)
    k, t = CCFG.n_rephrases, PCFG.tokenizer_max_length
    lt = rng.integers(0, PCFG.paligemma.vocab_size, (e, k, t)).astype(np.int32)
    lm = np.ones((e, k, t), bool)
    vt = rng.integers(0, VCFG.text.vocab_size,
                      (e, VCFG.text.context_length)).astype(np.int32)
    hist = rng.uniform(-1, 1, (e, CCFG.max_history, 7)).astype(np.float32)
    hlen = np.asarray([2, 0], np.int32)
    keys = jax.random.split(jax.random.PRNGKey(3), e)

    batched = make_verified_step_batched(PCFG, VCFG, CCFG, STATS)
    single = make_verified_step(PCFG, VCFG, CCFG, STATS)

    rb = batched(pp, vp, keys, raw, prop, lt, lm, vt, hist, hlen)
    for i in range(e):
        rs = single(pp, vp, keys[i], raw[i], prop[i], lt[i], lm[i], vt[i],
                    hist[i], hlen[i])
        np.testing.assert_allclose(np.asarray(rb.exec_chunk[i]),
                                   np.asarray(rs.exec_chunk),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rb.scores[i]),
                                   np.asarray(rs.scores),
                                   rtol=1e-4, atol=1e-4)
        assert int(rb.winner_idx[i]) == int(rs.winner_idx)


def test_batched_lockstep_evaluation(params):
    pp, vp = params
    engine = BatchedCoVerEngine(pp, vp, PCFG, VCFG, CCFG, num_episodes=3,
                                seed=0)
    envs = [FakeWidowXEnv("widowx_carrot_on_plate", max_steps=8)
            for _ in range(3)]
    out = evaluate_batched(engine, envs, BridgeSimplerAdapter(), max_steps=8)
    assert len(out["success"]) == 3
    assert 0.0 <= out["success_rate"] <= 1.0
    assert all(s <= 8 for s in out["steps"])


def test_pipelined_matches_sequential(params):
    """Two-cohort pipelined evaluation == running each cohort alone."""
    from cover_vla_tpu.engine.batched_engine import (
        evaluate_batched_pipelined)
    pp, vp = params

    def fresh(seed):
        return BatchedCoVerEngine(pp, vp, PCFG, VCFG, CCFG, num_episodes=2,
                                  seed=seed)

    def envs():
        return [FakeWidowXEnv("widowx_carrot_on_plate", max_steps=8)
                for _ in range(2)]

    out_p = evaluate_batched_pipelined(
        fresh(0), fresh(1), envs(), envs(), BridgeSimplerAdapter(),
        max_steps=8, seeds_a=[0, 1], seeds_b=[2, 3])

    out_a = evaluate_batched(fresh(0), envs(), BridgeSimplerAdapter(),
                             max_steps=8, seeds=[0, 1])
    out_b = evaluate_batched(fresh(1), envs(), BridgeSimplerAdapter(),
                             max_steps=8, seeds=[2, 3])
    assert out_p["success"] == out_a["success"] + out_b["success"]
    assert out_p["steps"] == out_a["steps"] + out_b["steps"]


def test_evaluate_suite_batched_with_padding(params):
    """The suite-level batched evaluator (role_eval --eval.n_parallel):
    cohorts of n_parallel, final cohort padded with fresh seeds and the
    padding dropped; pipelined mode covers cohort pairs."""
    from cover_vla_tpu.eval.evaluator import EvalConfig, evaluate_suite_batched

    pp, vp = params
    cfg = EvalConfig(task_suite="simpler_carrot_on_plate",
                     num_trials_per_task=3, max_steps=8)
    out = evaluate_suite_batched(
        pp, vp, PCFG, VCFG, CCFG, cfg, n_parallel=2, seed=0)
    s = out["summary"]
    assert s["total_episodes"] == 3          # padding episode dropped
    assert "widowx_carrot_on_plate" in s["per_task"]
    assert s["per_task"]["widowx_carrot_on_plate"]["episodes"] == 3
    assert out["actions_per_sec"] > 0

    out_p = evaluate_suite_batched(
        pp, vp, PCFG, VCFG, CCFG, cfg, n_parallel=2, seed=0, pipelined=True)
    assert out_p["summary"]["total_episodes"] == 3


def test_done_episode_state_freezes(params):
    """mark_done freezes a finished episode's history ring and instruction
    switches while the cohort drains (per-episode record parity)."""
    pp, vp = params
    from cover_vla_tpu.engine.batched_engine import BatchedCoVerEngine
    eng = BatchedCoVerEngine(pp, vp, PCFG, VCFG, CCFG, num_episodes=2,
                             seed=0)
    eng.reset(["task a", "task b"])
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 256, 256, 3), dtype=np.uint8)
    props = rng.uniform(-0.1, 0.1, (2, 7)).astype(np.float32)
    eng.step(imgs, props)
    eng.mark_done(0)
    h0 = eng._history[0].copy()
    l0 = int(eng._history_len[0])
    t0 = eng.tasks[0]
    for _ in range(PCFG.chunk_size):
        eng.step(imgs, props)
    np.testing.assert_array_equal(eng._history[0], h0)
    assert int(eng._history_len[0]) == l0
    assert eng.tasks[0] == t0
    # the live episode's history kept advancing
    assert int(eng._history_len[1]) > l0 or eng._history_len[1] == CCFG.max_history
