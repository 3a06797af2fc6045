"""Cross-validation: the engine's ON-DEVICE action decoding must equal the
host adapter oracle (BridgeSimplerAdapter) on identical normalized actions.

This pins the fused verified_step's denormalise -> euler->axis-angle ->
gripper math to the host implementation that is itself scipy/reference-
verified — closing the loop between the two decoding paths.
"""

import numpy as np
import jax.numpy as jnp

from cover_vla_tpu.data.stats import DatasetStatistics
from cover_vla_tpu.eval.adapters import BridgeSimplerAdapter
from cover_vla_tpu.utils.geometry import euler_to_rotvec


def test_on_device_formats_match_host_adapter():
    stats = DatasetStatistics.from_json()
    adapter = BridgeSimplerAdapter(stats=stats)
    rng = np.random.default_rng(0)
    actions = np.clip(rng.standard_normal((32, 7)) * 0.6, -1.2, 1.2)
    actions[:, 6] = rng.uniform(0, 1, 32)  # raw gripper in [0,1]

    # host oracle
    exec_host = adapter.postprocess(actions)
    verif_host = adapter.postprocess_verifier(actions)

    # on-device math (the exact expressions in engine/verified_step step 4)
    a_p01 = jnp.asarray(stats.action.p01, jnp.float32)
    a_p99 = jnp.asarray(stats.action.p99, jnp.float32)
    a = jnp.asarray(actions, jnp.float32)
    body = (a[..., :6] + 1) / 2 * (a_p99[:6] - a_p01[:6]) + a_p01[:6]
    grip = a[..., 6:]
    exec_grip = 2.0 * (grip > 0.5) - 1.0
    verif_grip = (grip >= 0.5).astype(jnp.float32)
    rotvec = euler_to_rotvec(body[..., 3:6])
    exec_dev = np.concatenate([np.asarray(body[..., :3]), np.asarray(rotvec),
                               np.asarray(exec_grip)], axis=-1)
    verif_dev = np.concatenate([np.asarray(body), np.asarray(verif_grip)],
                               axis=-1)

    np.testing.assert_allclose(exec_dev, exec_host, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(verif_dev, verif_host, rtol=1e-4, atol=1e-5)


def test_gripper_edge_cases_match():
    """Boundary raw-gripper values: host and device must agree at 0.5."""
    stats = DatasetStatistics.from_json()
    adapter = BridgeSimplerAdapter(stats=stats)
    for g in (0.0, 0.4999, 0.5, 0.5001, 1.0):
        a = np.zeros((1, 7))
        a[0, 6] = g
        host_exec = adapter.postprocess(a)[0, 6]
        host_verif = adapter.postprocess_verifier(a)[0, 6]
        dev_exec = 2.0 * (g > 0.5) - 1.0
        dev_verif = 1.0 if g >= 0.5 else 0.0
        assert host_exec == dev_exec, g
        assert host_verif == dev_verif, g
