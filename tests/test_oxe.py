"""OXE registry: standardization transforms + named mixes + CLI extras."""

import numpy as np
import pytest

from cover_vla_tpu.data.oxe import (
    standardize_bridge, standardize_fractal, make_mix,
    OXE_NAMED_MIXES, OXE_DATASET_CONFIGS)
from cover_vla_tpu.utils import get_class_from_path
from cover_vla_tpu.utils.geometry import quat2mat, mat2euler


def _traj8(seed=0, t=5):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((t, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    states = np.concatenate(
        [rng.uniform(-1, 1, (t, 3)), q, rng.uniform(0, 1, (t, 1))], axis=1)
    return {
        "images": rng.integers(0, 255, (t, 16, 16, 3)).astype(np.uint8),
        "states": states,
        "actions": rng.standard_normal((t, 7)).astype(np.float32),
        "task": "x",
    }


def test_standardize_bridge_frame_conversion():
    traj = _traj8()
    out = standardize_bridge(traj)
    assert out["states"].shape == (5, 7)
    default_rot = np.array([[0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]])
    rpy = mat2euler(quat2mat(traj["states"][0, 3:7]) @ default_rot.T)
    np.testing.assert_allclose(out["states"][0, 3:6], rpy, atol=1e-6)
    np.testing.assert_allclose(out["states"][0, 6], traj["states"][0, 7],
                               atol=1e-6)


def test_standardize_fractal_closedness():
    traj = _traj8(1)
    out = standardize_fractal(traj)
    np.testing.assert_allclose(out["states"][:, 6],
                               1.0 - traj["states"][:, 7], atol=1e-6)


def test_make_mix():
    trajs = {"bridge_dataset": [standardize_bridge(_traj8(0))],
             "fractal20220817_data": [standardize_fractal(_traj8(1))]}
    # already-standardized 7-dim states pass through unchanged
    datasets, weights = make_mix("bridge_fractal", trajs, chunk_size=2)
    assert len(datasets) == 2 and weights == [0.5, 0.5]
    frames = list(datasets[0].frames())
    assert frames[0]["actions"].shape == (2, 7)
    assert set(OXE_NAMED_MIXES) >= {"bridge", "fractal", "bridge_fractal"}
    assert "bridge_dataset" in OXE_DATASET_CONFIGS


def test_get_class_from_path():
    cls = get_class_from_path("cover_vla_tpu.eval.adapters.BridgeSimplerAdapter")
    from cover_vla_tpu.eval.adapters import BridgeSimplerAdapter
    assert cls is BridgeSimplerAdapter


def test_rephrase_store_cli(tmp_path):
    from cover_vla_tpu.eval.lang_transform import main
    out = str(tmp_path / "store.json")
    main([out, "--n-per-task", "5"])
    from cover_vla_tpu.eval.rephrase import load_rephrases
    store = load_rephrases(out)
    assert len(store) >= 7
    assert all(len(v) >= 1 for v in store.values())
