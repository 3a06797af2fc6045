"""Benchmark registry, rephrase store, fake env, and full evaluator loop."""

import numpy as np
import jax
import pytest

from cover_vla_tpu.configs import (
    tiny_pi0_config, tiny_verifier_config, CoVerConfig)
from cover_vla_tpu.engine import CoVerEngine
from cover_vla_tpu.eval.benchmark import (
    get_benchmark, TASK_MAP, TASK_INSTRUCTIONS)
from cover_vla_tpu.eval.rephrase import load_rephrases
from cover_vla_tpu.eval.fake_env import FakeWidowXEnv, get_image_from_obs_dict
from cover_vla_tpu.eval.evaluator import CoVerEvaluator, EvalConfig, summarize
from cover_vla_tpu.models import pi0, verifier


def test_benchmark_registry_case_insensitive():
    b = get_benchmark("SIMPLER_WIDOWX")()
    assert b.n_tasks == 4
    assert b.get_task(2) == "widowx_stack_cube"
    ood = get_benchmark("simpler_ood")()
    assert ood.tasks == ["widowx_redbull_on_plate",
                        "widowx_zucchini_on_towel",
                        "widowx_tennis_ball_in_basket"]


def test_rephrase_store_covers_all_tasks():
    store = load_rephrases()
    assert len(store) == 7
    for suite in ("simpler_widowx", "simpler_ood"):
        for task in TASK_MAP[suite]:
            instr = TASK_INSTRUCTIONS[task]
            assert instr in store, instr
            assert len(store[instr]) >= 8  # enough for K=8 rephrases


def test_fake_env_scripted_success():
    env = FakeWidowXEnv("widowx_carrot_on_plate")
    obs, _ = env.reset(seed=3)
    assert obs["image"].shape == (256, 256, 3)
    assert obs["image"].dtype == np.uint8
    assert get_image_from_obs_dict(env, obs).shape == (256, 256, 3)
    # scripted policy: go to object, grab, carry to target, release
    for goal, grip in ((env._obj, 1.0), (env._obj, -1.0),
                       (env._target, -1.0), (env._target, 1.0)):
        for _ in range(20):
            delta = np.clip(goal - env._ee, -0.04, 0.04)
            obs, r, done, trunc, info = env.step(
                np.concatenate([delta, [0, 0, 0], [grip]]))
            if done:
                break
        if done:
            break
    assert done and info["episode_stats"]["success"]
    assert info["episode_stats"]["is_src_obj_grasped"]


def test_evaluator_end_to_end(tmp_path):
    pcfg, vcfg = tiny_pi0_config(), tiny_verifier_config()
    ccfg = CoVerConfig(n_samples=2, n_rephrases=2)
    engine = CoVerEngine(
        pi0.init_pi0(jax.random.PRNGKey(0), pcfg),
        verifier.init_verifier(jax.random.PRNGKey(1), vcfg, num_members=1),
        pcfg, vcfg, ccfg, rephrases=load_rephrases(), seed=0)
    cfg = EvalConfig(task_suite="simpler_carrot_on_plate",
                     num_trials_per_task=2, max_steps=8,
                     out_dir=str(tmp_path))
    ev = CoVerEvaluator(engine, cfg)
    out = ev.evaluate()
    s = out["summary"]
    assert s["total_episodes"] == 2
    assert "widowx_carrot_on_plate" in s["per_task"]
    ep = out["episodes"][0]
    assert len(ep.verifier_scores) == 2  # 8 steps / chunk 4
    assert all(isinstance(i, str) for i in ep.selected_instructions)
    # episode pickles written with success-encoded names
    pkls = list(tmp_path.glob("episode_*.pkl"))
    assert len(pkls) == 2
    assert all(("success" in p.name) or ("failure" in p.name) for p in pkls)


def test_summarize_aggregation():
    from cover_vla_tpu.eval.evaluator import EpisodeResult
    eps = [EpisodeResult("t", i, 0, i % 2 == 0, 10, {}, [], [], [], 0.1)
           for i in range(4)]
    s = summarize(eps)
    assert s["per_task"]["t"]["success_rate"] == 0.5
    assert s["overall_success_rate"] == 0.5


def test_libero_evaluator_suite_loop():
    """LIBERO suite loop on the fake env: settle steps, per-suite caps,
    policy reset per episode (libero_evaluator.py semantics)."""
    from cover_vla_tpu.eval.libero import (
        LIBERO_MAX_STEPS, LiberoEvaluator)

    class ScriptedPolicy:
        def __init__(self):
            self.resets = []

        def reset(self, task):
            self.resets.append(task)

        def select_action(self, image, state, task):
            assert image is not None and image.ndim == 3
            return np.asarray([0.02, 0.0, -0.01, 0, 0, 0, -1.0])

    pol = ScriptedPolicy()
    ev = LiberoEvaluator(pol, "libero_object", n_eval_episodes=2,
                         max_steps=12)
    out = ev.evaluate(n_tasks=2)
    assert out["suite"] == "libero_object"
    assert len(out["per_task"]) == 2
    assert 0.0 <= out["success_rate"] <= 1.0
    assert len(pol.resets) == 4  # 2 tasks x 2 episodes
    assert LIBERO_MAX_STEPS["libero_10"] == 520

    with pytest.raises(ValueError):
        LiberoEvaluator(pol, "not_a_suite")
