"""Full OXE registry: 64 dataset configs, encoding-driven standardization,
RLDS spec derivation, and streaming mixes over on-disk shards."""

import os

import numpy as np
import pytest

from cover_vla_tpu.data import oxe, rlds
from cover_vla_tpu.data.oxe import (
    ActionEncoding, OXE_DATASET_CONFIGS, OXE_NAMED_MIXES, ProprioEncoding,
    rlds_spec_for, standardize, standardize_generic)
from cover_vla_tpu.data.pipeline import batcher, interleave


def test_registry_breadth_and_facts():
    assert len(OXE_DATASET_CONFIGS) == 65  # 64 reference rows + libero_90 (mix member)
    c = OXE_DATASET_CONFIGS["bridge_dataset"]
    assert c.image_key == "image_0"
    assert c.proprio == ProprioEncoding.POS_EULER
    c = OXE_DATASET_CONFIGS["fractal20220817_data"]
    assert c.proprio == ProprioEncoding.POS_QUAT
    assert c.gripper_convention == "closedness"
    c = OXE_DATASET_CONFIGS["taco_play"]
    assert (c.image_key, c.wrist_key) == ("rgb_static", "rgb_gripper")
    c = OXE_DATASET_CONFIGS["aloha_static_dataset"]
    assert c.proprio == ProprioEncoding.JOINT_BIMANUAL
    assert c.action == ActionEncoding.JOINT_POS_BIMANUAL
    assert OXE_DATASET_CONFIGS["berkeley_mvp_converted_externally_to_rlds"
                               ].action == ActionEncoding.JOINT_POS
    # all mix members exist in the registry
    for mix, members in OXE_NAMED_MIXES.items():
        for name, w in members:
            assert name in OXE_DATASET_CONFIGS, (mix, name)
            assert w > 0


def test_generic_standardization_quat_and_closedness():
    rng = np.random.default_rng(0)
    t = 5
    quat = rng.standard_normal((t, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    states = np.concatenate(
        [rng.standard_normal((t, 3)), quat, rng.uniform(0, 1, (t, 1))], 1)
    traj = {"images": np.zeros((t, 8, 8, 3), np.uint8),
            "states": states.astype(np.float32), "task": "pick"}
    out = standardize("kuka", traj)  # POS_QUAT, openness
    assert out["states"].shape == (t, 7)
    np.testing.assert_allclose(out["states"][:, :3], states[:, :3],
                               rtol=1e-5)
    np.testing.assert_allclose(out["states"][:, 6], states[:, 7], rtol=1e-5)

    # closedness gripper inversion on a generic POS_EULER dataset
    cfg = oxe.OXEDatasetConfig(name="x", gripper_convention="closedness")
    traj7 = {"images": np.zeros((t, 8, 8, 3), np.uint8),
             "states": np.concatenate(
                 [np.zeros((t, 6)), np.full((t, 1), 0.25)], 1
             ).astype(np.float32)}
    out = standardize_generic(traj7, cfg)
    np.testing.assert_allclose(out["states"][:, 6], 0.75)

    # NONE proprio -> zero placeholder of the right length
    out = standardize("roboturk", {"images": np.zeros((t, 8, 8, 3),
                                                      np.uint8)})
    assert out["states"].shape == (t, 7)
    assert (out["states"] == 0).all()


def test_rlds_spec_derivation():
    spec = rlds_spec_for("bridge_dataset")
    assert spec.image_key == "steps/observation/image_0"
    spec = rlds_spec_for("taco_play")
    assert spec.image_key == "steps/observation/rgb_static"
    assert spec.action_key == "steps/action"


def test_streaming_mix_over_shards(tmp_path):
    rng = np.random.default_rng(0)

    def episode(task, state_dim):
        t = 4
        return {"images": rng.integers(0, 255, (t, 16, 16, 3)
                                       ).astype(np.uint8),
                "states": rng.standard_normal((t, state_dim)
                                              ).astype(np.float32),
                "actions": rng.standard_normal((t, 7)).astype(np.float32),
                "task": task}

    dirs = {}
    for name, sdim in (("bridge_dataset", 8), ("fractal20220817_data", 8)):
        d = tmp_path / name
        os.makedirs(d)
        rlds.write_rlds_shard(str(d / "ep.tfrecord-00000-of-00001"),
                              [episode(f"{name} task", sdim)],
                              spec=rlds_spec_for(name))
        dirs[name] = str(d)

    datasets, weights = oxe.make_streaming_mix("bridge_fractal", dirs,
                                               chunk_size=2)
    assert len(datasets) == 2 and weights == [0.5, 0.5]
    frames = list(batcher(interleave(datasets, weights=weights,
                                     shuffle_buffer=4, seed=0), 2))
    assert len(frames) == 4  # 2 episodes x 4 steps / batch 2
    # standardization ran: states are 7-dim euler
    assert frames[0]["state"].shape == (2, 7)
    tasks = {t for b in frames for t in b["task"]}
    assert tasks == {"bridge_dataset task", "fractal20220817_data task"}


def test_closedness_inversion_scoped_to_gripper_layouts():
    """The closedness gripper flip applies only where index 6 IS a gripper
    (POS_EULER/POS_QUAT proprio), and also flips EEF_POS action grippers —
    never JOINT placeholder layouts."""
    import numpy as np
    from cover_vla_tpu.data.oxe import (
        OXEDatasetConfig, ProprioEncoding, ActionEncoding,
        standardize_generic)

    t = 3
    base = {
        "images": np.zeros((t, 8, 8, 3), np.uint8),
        "states": np.tile(np.asarray([[.1, .2, .3, 0, 0, 0, 1.0]],
                                     np.float64), (t, 1)),
        "actions": np.tile(np.asarray([[0, 0, 0, 0, 0, 0, 1.0]],
                                      np.float64), (t, 1)),
    }
    closed_euler = OXEDatasetConfig(
        name="x", image_key="image", proprio=ProprioEncoding.POS_EULER,
        action=ActionEncoding.EEF_POS, gripper_convention="closedness")
    out = standardize_generic(dict(base), closed_euler)
    assert np.allclose(out["states"][:, 6], 0.0)   # proprio flipped
    assert np.allclose(out["actions"][:, 6], 0.0)  # action flipped too

    joint = OXEDatasetConfig(
        name="y", image_key="image", proprio=ProprioEncoding.JOINT,
        action=ActionEncoding.JOINT_POS, gripper_convention="closedness")
    out = standardize_generic(dict(base), joint)
    assert np.allclose(out["states"][:, 6], 1.0)   # joint 6 untouched
    assert np.allclose(out["actions"][:, 6], 1.0)
