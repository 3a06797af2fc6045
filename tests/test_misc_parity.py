"""Normalizer layers, policy factory, simpler utils, metrics sinks."""

import json
import os

import numpy as np
import pytest

from cover_vla_tpu.data.normalize import Normalizer
from cover_vla_tpu.eval import simpler_utils
from cover_vla_tpu.utils.metrics_sink import make_sinks


def test_normalizer_roundtrip_modes():
    rng = np.random.default_rng(0)
    stats = {
        "state": {"mean": np.array([1.0, -1.0]), "std": np.array([2.0, 0.5])},
        "action": {"min": np.array([-2.0]), "max": np.array([2.0])},
    }
    norm = Normalizer(stats, {"state": "mean_std", "action": "min_max"})
    batch = {"state": rng.standard_normal((4, 2)),
             "action": rng.uniform(-2, 2, (4, 1)),
             "other": np.ones((4, 3))}
    n = norm.normalize(batch)
    np.testing.assert_array_equal(n["other"], batch["other"])  # identity
    back = norm.unnormalize(n)
    np.testing.assert_allclose(back["state"], batch["state"], atol=1e-6)
    np.testing.assert_allclose(back["action"], batch["action"], atol=1e-6)


def test_policy_factory():
    import jax
    from cover_vla_tpu.models.factory import make_policy
    p = make_policy("pi0fast", tiny=True)
    assert hasattr(p, "select_action") and hasattr(p, "reset")
    with pytest.raises(ValueError):
        make_policy("octo")


def test_simpler_utils():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
    out = simpler_utils.get_simpler_img(img, 224)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    crop = simpler_utils.get_simpler_img(img, 224, center_crop=True)
    assert crop.shape == (224, 224, 3)
    assert simpler_utils.get_simpler_dummy_action().tolist() == \
        [0, 0, 0, 0, 0, 0, 1.0]
    conv = simpler_utils.convert_maniskill(
        np.array([0.1, 0.2, 0.3, 0.0, 0.0, 0.5, 1.0]))
    np.testing.assert_allclose(conv[:3], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(conv[3:6], [0, 0, 0.5], atol=1e-8)
    g = simpler_utils.normalize_gripper_action(
        np.array([0, 0, 0, 0, 0, 0, 0.9]))
    assert g[-1] == 1.0
    assert simpler_utils.invert_gripper_action(g)[-1] == -1.0


def test_jsonl_sink(tmp_path):
    path = str(tmp_path / "m.jsonl")
    sink = make_sinks(jsonl_path=path)
    sink.log({"loss": np.float32(0.5)}, step=3)
    sink.log({"loss": 0.25}, step=4)
    sink.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 0.5 and lines[0]["_step"] == 3
    assert lines[1]["_step"] == 4


def test_aloha_gripper_transforms_parity_vs_reference():
    """eval/aloha.py == the reference's aloha gripper/joint shims
    (modeling_pi0.py:175-218, 411-436), using the actual reference module
    as the oracle."""
    import torch
    from cover_vla_tpu.eval import aloha
    from test_reference_parity import _load_reference_pi0

    try:
        _, mpi0 = _load_reference_pi0(fp32_oracle=False)
    except Exception as e:
        pytest.skip(f"reference modeling_pi0 not loadable: {e}")

    x = np.linspace(0.05, 0.95, 13).astype(np.float32)
    np.testing.assert_allclose(
        aloha.aloha_gripper_to_angular(x),
        mpi0.aloha_gripper_to_angular(torch.from_numpy(x)).numpy(),
        rtol=1e-6)
    np.testing.assert_allclose(
        aloha.aloha_gripper_from_angular(x),
        mpi0.aloha_gripper_from_angular(torch.from_numpy(x)).numpy(),
        rtol=1e-6)
    np.testing.assert_allclose(
        aloha.aloha_gripper_from_angular_inv(x),
        mpi0.aloha_gripper_from_angular_inv(torch.from_numpy(x)).numpy(),
        rtol=1e-6)
    # from_angular ∘ from_angular_inv == identity
    np.testing.assert_allclose(
        aloha.aloha_gripper_from_angular(
            aloha.aloha_gripper_from_angular_inv(x)), x, rtol=1e-5)

    # joint flips + gripper slots in the state/action codecs
    rng = np.random.default_rng(0)
    state = rng.uniform(0.1, 0.9, (2, 14)).astype(np.float32)
    dec = aloha.decode_state(state)
    for j in (1, 2, 8, 9):
        np.testing.assert_allclose(dec[:, j], -state[:, j])
    for j in (6, 13):
        np.testing.assert_allclose(
            dec[:, j], aloha.aloha_gripper_to_angular(state[:, j]))
    acts = rng.uniform(0.1, 0.9, (2, 4, 14)).astype(np.float32)
    enc = aloha.encode_actions(acts)
    inv = aloha.encode_actions_inv(enc)
    # encode then encode_inv restores the original (flips cancel, gripper
    # mapping inverts)
    np.testing.assert_allclose(inv, acts, rtol=1e-5, atol=1e-6)
