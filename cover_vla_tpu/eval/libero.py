"""LIBERO benchmark evaluation (optional dependency).

Counterpart of INT-ACT's LIBERO evaluator
(src/experiments/envs/libero/libero_evaluator.py): task-suite registry
(libero_spatial/object/goal/long/90), env construction via the
`libero` package when installed, and an episode loop reusing the generic
evaluator surface. Without the package, a fake env stands in so the loop
is CI-testable.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

LIBERO_SUITES = ["libero_spatial", "libero_object", "libero_goal",
                 "libero_10", "libero_90"]


def libero_available() -> bool:
    try:
        import libero  # noqa: F401
        return True
    except Exception:
        return False


class LiberoEnvWrapper:
    """Adapts a LIBERO OffScreenRenderEnv to the evaluator surface."""

    def __init__(self, env, instruction: str):
        self.env = env
        self.instruction = instruction

    def reset(self, seed: Optional[int] = None):
        self.env.seed(seed or 0)
        obs = self.env.reset()
        return self._convert(obs), {}

    def step(self, action: np.ndarray):
        obs, reward, done, info = self.env.step(np.asarray(action))
        return self._convert(obs), reward, bool(done), False, info

    def get_language_instruction(self) -> str:
        return self.instruction

    def _convert(self, obs: Dict) -> Dict:
        out = dict(obs)
        if "agentview_image" in obs:
            out["image"] = obs["agentview_image"][::-1]  # libero flips
        if "robot0_eef_pos" in obs:
            quat = obs.get("robot0_eef_quat", np.array([0, 0, 0, 1.0]))
            grip = obs.get("robot0_gripper_qpos", np.array([0.04]))[:1]
            # wxyz ordering for the adapters
            out["agent"] = {"eef_pos": np.concatenate(
                [obs["robot0_eef_pos"], np.roll(quat, 1), grip])}
        return out


def make_libero_env(suite: str, task_id: int = 0, **kwargs):
    if not libero_available():
        from cover_vla_tpu.eval.fake_env import make_fake_env
        return make_fake_env(f"{suite}_task{task_id}", **kwargs)
    from libero.libero import benchmark as lb
    from libero.libero.envs import OffScreenRenderEnv
    suite_obj = lb.get_benchmark_dict()[suite]()
    task = suite_obj.get_task(task_id)
    env = OffScreenRenderEnv(
        bddl_file_name=suite_obj.get_task_bddl_file_path(task_id), **kwargs)
    return LiberoEnvWrapper(env, task.language)


def list_tasks(suite: str) -> List[str]:
    if not libero_available():
        return [f"{suite}_task{i}" for i in range(3)]
    from libero.libero import benchmark as lb
    suite_obj = lb.get_benchmark_dict()[suite]()
    return [suite_obj.get_task(i).language
            for i in range(suite_obj.n_tasks)]
