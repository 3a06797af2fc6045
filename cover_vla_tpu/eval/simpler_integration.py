"""Real SimplerEnv/ManiSkill2 integration (optional dependency).

When the `simpler_env` package (SIMPLER + ManiSkill2_real2sim + SAPIEN) is
installed, these helpers build the real benchmark environments; the
evaluator (eval/evaluator.py) drives them unchanged — it only needs
reset/step, `get_language_instruction`, and an RGB frame in the obs.

Environment names follow the reference registry
(CoVer_VLA/SimplerEnv/simpler_env/__init__.py:5-91), including the custom
OOD scenes (redbull/tennis/zucchini/dinosaur, unseen lighting, tablecloth).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from cover_vla_tpu.eval.benchmark import TASK_INSTRUCTIONS

# reference env-name -> ManiSkill2 env id mapping (simpler_env/__init__.py)
SIMPLER_ENV_IDS: Dict[str, str] = {
    "widowx_carrot_on_plate": "PutCarrotOnPlateInScene-v0",
    "widowx_put_eggplant_in_basket": "PutEggplantInBasketScene-v0",
    "widowx_spoon_on_towel": "PutSpoonOnTableClothInScene-v0",
    "widowx_stack_cube": "StackGreenCubeOnYellowCubeBakedTexInScene-v0",
    "widowx_redbull_on_plate": "PutRedbullOnPlateInScene-v0",
    "widowx_zucchini_on_towel": "PutZucchiniOnTableClothInScene-v0",
    "widowx_tennis_ball_in_basket": "PutTennisBallInBasketScene-v0",
    "widowx_toy_dinosaur_on_towel": "PutToyDinosaurOnTableClothInScene-v0",
    "widowx_carrot_on_plate_unseen_lighting":
        "PutCarrotOnPlateInSceneUnseenLighting-v0",
}


def simpler_available() -> bool:
    try:
        import simpler_env  # noqa: F401
        return True
    except Exception:
        return False


class SimplerEnvWrapper:
    """Adapts a real simpler_env gym env to the evaluator's surface."""

    def __init__(self, env, task_name: str):
        self.env = env
        self.task_name = task_name
        self.episode_stats: Dict = {}

    def reset(self, seed: Optional[int] = None):
        obs, info = self.env.reset(seed=seed)
        return self._convert_obs(obs), info

    def step(self, action: np.ndarray):
        obs, reward, done, trunc, info = self.env.step(np.asarray(action))
        self.episode_stats = info.get("episode_stats", {})
        return self._convert_obs(obs), reward, bool(done), bool(trunc), info

    def render(self):
        return self.env.render()

    def get_language_instruction(self) -> str:
        if hasattr(self.env, "get_language_instruction"):
            return self.env.get_language_instruction()
        return TASK_INSTRUCTIONS.get(self.task_name,
                                     self.task_name.replace("_", " "))

    def _convert_obs(self, obs: Dict) -> Dict:
        out = dict(obs)
        # WidowX: the 3rd-view camera RGB (the selector the vendored
        # snapshot is missing — SURVEY.md §2.6)
        cams = obs.get("image", obs.get("image_dict", {}))
        if isinstance(cams, dict):
            for name in ("3rd_view_camera", "overhead_camera", "base_camera"):
                if name in cams:
                    cam = cams[name]
                    out["image"] = np.asarray(
                        cam["rgb"] if isinstance(cam, dict) else cam)
                    break
        return out


def make_simpler_env(task_name: str, **kwargs):
    """Build the REAL simpler env when installed, else the fake env."""
    if simpler_available():
        import simpler_env
        env = simpler_env.make(task_name, **kwargs)
        return SimplerEnvWrapper(env, task_name)
    from cover_vla_tpu.eval.fake_env import make_fake_env
    return make_fake_env(task_name, **kwargs)
