"""Open-X-Embodiment dataset registry: configs, standardization, mixes.

Counterpart of INT-ACT/src/data/oxe/ (dataset configs, per-dataset
standardization transforms, named mixture weights): each raw dataset
declares its observation/action layout and a `standardize` function mapping
raw trajectories into the canonical layout consumed by
cover_vla_tpu.data.pipeline (images [T,H,W,3] uint8, states [T,S] euler
proprio, actions [T,7] = [dxyz, drpy, gripper 0/1], task str).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from cover_vla_tpu.utils.geometry import quat2mat, mat2euler

Trajectory = Dict[str, np.ndarray]


@dataclass(frozen=True)
class OXEDatasetConfig:
    name: str
    image_key: str = "image"
    state_key: str = "state"
    action_key: str = "actions"
    language_key: str = "task"
    image_size: Tuple[int, int] = (256, 256)
    gripper_convention: str = "openness"   # "openness" (1=open) | "closedness"
    proprio_format: str = "euler"          # "euler" | "quat_wxyz" | "quat_xyzw"
    standardize: Optional[Callable[[Trajectory], Trajectory]] = None


def standardize_bridge(traj: Trajectory) -> Trajectory:
    """Bridge/WidowX: proprio [xyz, quat wxyz, gripper openness] -> euler in
    the top-down frame (BridgeSimplerAdapter.preprocess_proprio)."""
    default_rot = np.array([[0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]])
    states = np.asarray(traj["states"], np.float64)
    if states.shape[1] == 8:  # xyz + quat + gripper
        out = np.zeros((len(states), 7))
        for i, s in enumerate(states):
            rpy = mat2euler(quat2mat(s[3:7]) @ default_rot.T)
            out[i] = np.concatenate([s[:3], rpy, s[7:8]])
        states = out
    return {**traj, "states": states.astype(np.float32)}


def standardize_fractal(traj: Trajectory) -> Trajectory:
    """Fractal/EDR: xyzw quats + gripper closedness -> euler + openness."""
    states = np.asarray(traj["states"], np.float64)
    if states.shape[1] == 8:
        out = np.zeros((len(states), 7))
        for i, s in enumerate(states):
            quat_wxyz = np.roll(s[3:7], 1)
            rpy = mat2euler(quat2mat(quat_wxyz))
            out[i] = np.concatenate([s[:3], rpy, [1.0 - s[7]]])
        states = out
    return {**traj, "states": states.astype(np.float32)}


OXE_DATASET_CONFIGS: Dict[str, OXEDatasetConfig] = {
    "bridge_dataset": OXEDatasetConfig(
        name="bridge_dataset", standardize=standardize_bridge),
    "fractal20220817_data": OXEDatasetConfig(
        name="fractal20220817_data", gripper_convention="closedness",
        proprio_format="quat_xyzw", standardize=standardize_fractal),
}

# Named mixture weights (oxe mixes; bridge-only is what CoVer trains on)
OXE_NAMED_MIXES: Dict[str, List[Tuple[str, float]]] = {
    "bridge": [("bridge_dataset", 1.0)],
    "fractal": [("fractal20220817_data", 1.0)],
    "bridge_fractal": [("bridge_dataset", 0.5),
                       ("fractal20220817_data", 0.5)],
}


def make_mix(mix_name: str, trajectories_by_dataset: Dict[str, Sequence],
             chunk_size: int = 4, paraphrase=None):
    """Named mix -> (FrameDataset list, weights) for pipeline.interleave,
    applying each dataset's standardization."""
    from cover_vla_tpu.data.pipeline import FrameDataset
    datasets, weights = [], []
    for name, w in OXE_NAMED_MIXES[mix_name]:
        cfg = OXE_DATASET_CONFIGS[name]
        trajs = [cfg.standardize(t) if cfg.standardize else t
                 for t in trajectories_by_dataset.get(name, [])]
        if not trajs:
            continue
        datasets.append(FrameDataset(trajs, chunk_size=chunk_size,
                                     paraphrase=paraphrase))
        weights.append(w)
    return datasets, weights
