"""Closed-loop episode evaluator driving the CoVer engine.

Mirrors the reference evaluation drivers (eval_simpler,
run_simpler_eval_with_openpi.py:106-520, and SimplerEvaluator.evaluate_task,
INT-ACT/.../simpler_evaluator.py:69-255): per-task trial loop, wait-steps
for physics settling, per-episode record (verifier scores, selected
instructions, executed actions, frames), success aggregation and
episode_stats partial metrics, optional MP4/pickle sinks.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from cover_vla_tpu.engine import CoVerEngine
from cover_vla_tpu.eval.adapters import BridgeSimplerAdapter
from cover_vla_tpu.eval.benchmark import get_benchmark, TASK_INSTRUCTIONS
from cover_vla_tpu.eval.fake_env import get_image_from_obs_dict


@dataclass
class EpisodeResult:
    task: str
    trial: int
    seed: int
    success: bool
    num_steps: int
    episode_stats: Dict
    verifier_scores: List[float]
    selected_instructions: List[str]
    execute_actions: List[np.ndarray]
    wall_s: float
    frames: Optional[List[np.ndarray]] = None


@dataclass
class EvalConfig:
    task_suite: str = "simpler_widowx"
    num_trials_per_task: int = 10
    max_steps: int = 150
    num_steps_wait: int = 0          # physics settling steps (dummy actions)
    seed: int = 7
    seed_period: int = 50            # reference cycles seeds every 50 trials
    save_frames: bool = False
    out_dir: Optional[str] = None


class CoVerEvaluator:
    def __init__(self, engine: CoVerEngine, cfg: EvalConfig,
                 env_fn=None):
        self.engine = engine
        self.cfg = cfg
        bench = get_benchmark(cfg.task_suite)()
        self.tasks = bench.tasks
        self.env_fn = env_fn or bench.make
        self.adapter = BridgeSimplerAdapter()
        # google-robot (fractal) tasks use the EDR euler adapter with the
        # Octo-style sticky gripper (simpler.py:394-526)
        from cover_vla_tpu.eval.fractal_adapters import EDREulerSimplerAdapter
        self._fractal_adapter = EDREulerSimplerAdapter(stats=self.adapter.stats)

    def _task_adapter(self, task: str):
        return (self._fractal_adapter if task.startswith("google_robot")
                else self.adapter)

    def run_episode(self, env, task: str, trial: int, seed: int
                    ) -> EpisodeResult:
        t0 = time.time()
        adapter = self._task_adapter(task)
        is_fractal = adapter is self._fractal_adapter
        adapter.reset()
        obs, _ = env.reset(seed=seed)
        instruction = env.get_language_instruction() \
            if hasattr(env, "get_language_instruction") \
            else TASK_INSTRUCTIONS.get(task, task)
        self.engine.reset(instruction)

        frames = [] if self.cfg.save_frames else None
        success, t, stats = False, 0, {}
        dummy = np.zeros(7)
        while t < self.cfg.max_steps + self.cfg.num_steps_wait:
            if t < self.cfg.num_steps_wait:
                obs, _, done, trunc, info = env.step(dummy)
                t += 1
                continue
            raw_img = get_image_from_obs_dict(env, obs)
            if frames is not None:
                frames.append(raw_img)
            proprio = adapter.preprocess_proprio(
                {"agent": obs["agent"]})
            action = self.engine.step(raw_img, proprio.astype(np.float32))
            if is_fractal:
                # sticky-gripper postprocess on the winner's RAW [0,1]
                # gripper (simpler.py:427-459); the on-device binarise/vote
                # is the WidowX convention only
                action = np.asarray(action).copy()
                action[6] = adapter.postprocess_gripper(
                    self.engine.last_raw_gripper)
            obs, reward, done, trunc, info = env.step(action)
            stats = info.get("episode_stats", {})
            t += 1
            if done:
                success = True
                break
            if trunc:
                break

        recs = self.engine.records
        return EpisodeResult(
            task=task, trial=trial, seed=seed, success=success,
            num_steps=t - self.cfg.num_steps_wait, episode_stats=stats,
            verifier_scores=[r.max_score for r in recs],
            selected_instructions=[r.selected_instruction for r in recs],
            execute_actions=[r.execute_action for r in recs],
            wall_s=time.time() - t0, frames=frames)

    def evaluate(self) -> Dict:
        results: List[EpisodeResult] = []
        for task in self.tasks:
            env = self.env_fn(task)
            for trial in range(self.cfg.num_trials_per_task):
                seed = self.cfg.seed + (trial % self.cfg.seed_period)
                ep = self.run_episode(env, task, trial, seed)
                results.append(ep)
                if self.cfg.out_dir:
                    save_episode(ep, self.cfg.out_dir)

        summary = summarize(results)
        return {"summary": summary, "episodes": results}


def summarize(results: List[EpisodeResult]) -> Dict:
    by_task: Dict[str, List[EpisodeResult]] = {}
    for r in results:
        by_task.setdefault(r.task, []).append(r)
    per_task = {
        task: {
            "success_rate": float(np.mean([r.success for r in rs])),
            "episodes": len(rs),
            "mean_steps": float(np.mean([r.num_steps for r in rs])),
        }
        for task, rs in by_task.items()}
    return {
        "per_task": per_task,
        "overall_success_rate": float(np.mean([r.success for r in results]))
        if results else 0.0,
        "total_episodes": len(results),
    }


def save_episode(ep: EpisodeResult, out_dir: str) -> str:
    """Pickle episode record (+ MP4 if frames were kept), with the
    success-encoded filename convention the analyzer parses
    (eval_utils.py:333-391)."""
    os.makedirs(out_dir, exist_ok=True)
    stem = (f"episode_{ep.task}_trial{ep.trial}_seed{ep.seed}_"
            f"{'success' if ep.success else 'failure'}")
    payload = dataclasses.asdict(ep)
    frames = payload.pop("frames", None)
    with open(os.path.join(out_dir, stem + ".pkl"), "wb") as f:
        pickle.dump(payload, f)
    if frames:
        try:
            import imageio.v2 as imageio
            imageio.mimsave(os.path.join(out_dir, stem + ".mp4"),
                            frames, fps=5)
        except Exception:
            pass
    return stem
