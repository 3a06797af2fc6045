"""Benchmark registry: case-insensitive suite -> task list mapping.

Mirrors CoVer_VLA/inference/experiments/robot/simpler/simpler_benchmark.py
(register_benchmark/get_benchmark :6-14, task_map :19-59): `simpler_widowx`
is the 4-task ID suite, `simpler_ood` the 3-task OOD suite.
"""

from __future__ import annotations

from typing import Callable, Dict, List

BENCHMARK_MAPPING: Dict[str, type] = {}


def register_benchmark(cls):
    # register by class attribute (instantiating here would import env
    # factories at module-import time and create cycles)
    BENCHMARK_MAPPING[cls.name.lower()] = cls
    return cls


def get_benchmark(name: str):
    return BENCHMARK_MAPPING[name.lower()]


TASK_MAP: Dict[str, List[str]] = {
    "simpler_widowx": [
        "widowx_put_eggplant_in_basket",
        "widowx_spoon_on_towel",
        "widowx_stack_cube",
        "widowx_carrot_on_plate",
    ],
    "simpler_stack_cube": ["widowx_stack_cube"],
    "simpler_put_eggplant_in_basket": ["widowx_put_eggplant_in_basket"],
    "simpler_spoon_on_towel": ["widowx_spoon_on_towel"],
    "simpler_carrot_on_plate": ["widowx_carrot_on_plate"],
    "simpler_redbull_on_plate": ["widowx_redbull_on_plate"],
    "simpler_carrot_on_plate_unseen_lighting": [
        "widowx_carrot_on_plate_unseen_lighting"],
    "simpler_tennis_ball_in_basket": ["widowx_tennis_ball_in_basket"],
    "simpler_toy_dinosaur_on_towel": ["widowx_toy_dinosaur_on_towel"],
    "simpler_zucchini_on_towel": ["widowx_zucchini_on_towel"],
    "simpler_ood": [
        "widowx_redbull_on_plate",
        "widowx_zucchini_on_towel",
        "widowx_tennis_ball_in_basket",
    ],
}

# canonical language instruction per task (what env.get_language_instruction
# returns in SIMPLER for these scenes; keys of the rephrase store)
TASK_INSTRUCTIONS: Dict[str, str] = {
    "widowx_carrot_on_plate": "put carrot on plate",
    "widowx_carrot_on_plate_unseen_lighting": "put carrot on plate",
    "widowx_put_eggplant_in_basket": "put eggplant into yellow basket",
    "widowx_spoon_on_towel": "put the spoon on the towel",
    "widowx_stack_cube": "stack the green block on the yellow block",
    "widowx_redbull_on_plate": "put redbull can on plate",
    "widowx_zucchini_on_towel": "put the zucchini on the towel",
    "widowx_toy_dinosaur_on_towel": "put the toy dinosaur on the towel",
    "widowx_tennis_ball_in_basket": "put tennis ball into yellow basket",
}


class Benchmark:
    name: str = ""
    env_fn: Callable = None
    state_dim: int = 7

    def __init__(self):
        self.tasks = TASK_MAP.get(self.name, [])

    def get_task(self, i: int) -> str:
        return self.tasks[i]

    @property
    def n_tasks(self) -> int:
        return len(self.tasks)

    def make(self, task_name: str, **kwargs):
        return self.env_fn(task_name, **kwargs)


def _suite(suite_name: str):
    @register_benchmark
    class _S(Benchmark):
        name = suite_name

        def __init__(self):
            super().__init__()
            from cover_vla_tpu.eval.fake_env import make_fake_env
            self.env_fn = make_fake_env
    _S.__name__ = f"Benchmark_{suite_name}"
    return _S


for _name in TASK_MAP:
    _suite(_name)
