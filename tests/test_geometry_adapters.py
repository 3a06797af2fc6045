"""Geometry conversions vs scipy; host adapters vs reference semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from cover_vla_tpu.utils import geometry
from cover_vla_tpu.data.stats import DatasetStatistics
from cover_vla_tpu.eval.adapters import (
    BridgeSimplerAdapter, ActionEnsembler)

scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation


def test_euler_to_rotvec_matches_scipy():
    rng = np.random.default_rng(0)
    rpy = rng.uniform(-1.5, 1.5, (50, 3))
    expected = scipy_rot.from_euler("xyz", rpy).as_rotvec()
    got_np = np.stack([geometry.euler_to_rotvec_np(r) for r in rpy])
    got_jax = np.asarray(geometry.euler_to_rotvec(jnp.asarray(rpy)))
    np.testing.assert_allclose(got_np, expected, atol=1e-8)
    np.testing.assert_allclose(got_jax, expected, atol=1e-5)


def test_euler_to_rotvec_zero():
    np.testing.assert_allclose(
        np.asarray(geometry.euler_to_rotvec(jnp.zeros(3))), np.zeros(3))


def test_quat_mat_euler_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        m = geometry.quat2mat(q)
        expected = scipy_rot.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(m, expected, atol=1e-10)
        rpy = geometry.mat2euler(m)
        np.testing.assert_allclose(geometry.euler2mat(rpy), m, atol=1e-8)


def test_euler2axangle_matches_scipy():
    rng = np.random.default_rng(2)
    for _ in range(20):
        rpy = rng.uniform(-1.5, 1.5, 3)
        axis, angle = geometry.euler2axangle(*rpy)
        rv = scipy_rot.from_euler("xyz", rpy).as_rotvec()
        np.testing.assert_allclose(axis * angle, rv, atol=1e-8)


def test_bridge_adapter_postprocess_formats():
    adapter = BridgeSimplerAdapter()
    stats = adapter.stats
    # normalized actions in [-1, 1], gripper raw in [0, 1]
    actions = np.array([[0.5, -0.5, 0.0, 0.2, -0.2, 0.1, 0.9],
                        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.1]])
    ex = adapter.postprocess(actions)
    ve = adapter.postprocess_verifier(actions)
    # gripper: execution ±1, verifier {0, 1}
    assert ex[0, 6] == 1.0 and ex[1, 6] == -1.0
    assert ve[0, 6] == 1.0 and ve[1, 6] == 0.0
    # body: bound-denormalised identically in both formats
    expected_body = (actions[:, :6] + 1) / 2 * \
        (stats.action.p99[:6] - stats.action.p01[:6]) + stats.action.p01[:6]
    np.testing.assert_allclose(ve[:, :6], expected_body, atol=1e-9)
    np.testing.assert_allclose(ex[:, :3], expected_body[:, :3], atol=1e-9)
    # rotation: axis-angle of the euler body
    rv = scipy_rot.from_euler("xyz", expected_body[0, 3:6]).as_rotvec()
    np.testing.assert_allclose(ex[0, 3:6], rv, atol=1e-8)


def test_bridge_adapter_preprocess_proprio():
    adapter = BridgeSimplerAdapter()
    rng = np.random.default_rng(3)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    obs = {"agent": {"eef_pos": np.concatenate([[0.1, 0.2, 0.3], q, [0.8]])}}
    p = adapter.preprocess_proprio(obs)
    assert p.shape == (7,)
    rm = geometry.quat2mat(q) @ adapter.DEFAULT_ROT.T
    np.testing.assert_allclose(geometry.euler2mat(p[3:6]), rm, atol=1e-8)
    np.testing.assert_allclose(p[:3], [0.1, 0.2, 0.3])
    assert p[6] == 0.8


def test_adapter_preprocess_shapes():
    adapter = BridgeSimplerAdapter()
    rng = np.random.default_rng(4)
    q = np.array([1.0, 0, 0, 0])
    obs = {
        "observation.images.top": rng.integers(0, 255, (256, 256, 3),
                                               dtype=np.uint8),
        "observation.state": {"agent": {"eef_pos": np.concatenate(
            [[0.1, 0.2, 0.3], q, [0.5]])}},
        "task": "put the carrot on the plate",
    }
    out = adapter.preprocess(obs)
    assert out["observation.images.top"].shape == (1, 224, 224, 3)
    img = out["observation.images.top"]
    assert img.min() >= -1.0 and img.max() <= 1.0
    assert out["observation.state"].shape == (1, 7)
    assert np.abs(out["observation.state"]).max() <= 1.0


def test_action_ensembler_weighting():
    ens = ActionEnsembler(pred_horizon=3, ensemble_temp=-0.8)
    c0 = np.tile(np.array([[1.0]]), (3, 1))
    c1 = np.tile(np.array([[2.0]]), (3, 1))
    assert ens.ensemble(c0)[0] == 1.0  # only one prediction
    out = ens.ensemble(c1)
    w = np.exp(-0.8 * np.arange(2))
    w = w / w.sum()
    # newest prediction first: 2.0 * w0 + 1.0 * w1
    np.testing.assert_allclose(out[0], 2.0 * w[0] + 1.0 * w[1])
