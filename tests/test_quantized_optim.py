"""8-bit AdamW: trajectory tracks fp32 AdamW; state is int8; sticky-gripper
fractal adapters."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cover_vla_tpu.training.quantized_optim import adamw_8bit, Adam8bitState


def _rosenbrockish(p):
    return jnp.sum((p["a"] - 1.0) ** 2) + jnp.sum((p["b"]["c"] + 2.0) ** 2)


def test_adamw8bit_converges_and_tracks_fp32():
    params = {"a": jnp.zeros((300,)), "b": {"c": jnp.zeros((64, 5))}}
    lr = 0.05
    tx8 = adamw_8bit(lambda _: lr, weight_decay=0.0)
    tx32 = optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.0)

    s8, s32 = tx8.init(params), tx32.init(params)
    p8 = p32 = params
    for _ in range(150):
        g8 = jax.grad(_rosenbrockish)(p8)
        u8, s8 = tx8.update(g8, s8, p8)
        p8 = optax.apply_updates(p8, u8)
        g32 = jax.grad(_rosenbrockish)(p32)
        u32, s32 = tx32.update(g32, s32, p32)
        p32 = optax.apply_updates(p32, u32)

    assert float(_rosenbrockish(p8)) < 1e-2
    # both converge to the same optimum
    np.testing.assert_allclose(np.asarray(p8["a"]), 1.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(p8["b"]["c"]), -2.0, atol=0.05)
    # moments are genuinely int8
    assert s8.mu["a"].values.dtype == jnp.int8
    assert s8.nu["b"]["c"].values.dtype == jnp.int8


def test_adamw8bit_jits():
    params = {"w": jnp.ones((130,))}
    tx = adamw_8bit(lambda _: 0.01)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda q: jnp.sum(q["w"] ** 2))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    p, s = step(params, state)
    p, s = step(p, s)
    assert float(jnp.abs(p["w"]).max()) < 1.0


def test_fractal_sticky_gripper():
    from cover_vla_tpu.eval.fractal_adapters import EDRSimplerAdapter
    ad = EDRSimplerAdapter()
    ad.sticky_gripper_num_repeat = 3
    # command a close (action=1.0 -> relative -1.0): sticks for 3 steps
    outs = [ad.postprocess_gripper(1.0) for _ in range(3)]
    assert outs == [-1.0, -1.0, -1.0]
    # after max repeats the sticky state resets
    assert ad.sticky_action_is_on is False
    # neutral command after reset produces ~0
    assert abs(ad.postprocess_gripper(0.5)) < 0.51

    eef = np.concatenate([[0.1, 0.2, 0.3], [1.0, 0, 0, 0], [0.75]])
    p = ad.preprocess_proprio({"agent": {"eef_pos": eef}})
    np.testing.assert_allclose(p[3:7], [0, 0, 0, 1.0])  # wxyz -> xyzw
    np.testing.assert_allclose(p[7], 0.25)              # closedness


def test_mock_robot_devices():
    from cover_vla_tpu.robot import make_mock_robot
    robot = make_mock_robot()
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        robot.observe()
    robot.connect()
    obs = robot.observe()
    assert obs["images"]["top"].shape == (256, 256, 3)
    robot.act(np.ones(7))
    p1 = robot.observe()["positions"]
    p2 = robot.observe()["positions"]
    assert (p2 > p1).all() and (p2 <= 1.0).all()  # servo approaches target
    robot.disconnect()


def test_libero_fallback_env():
    from cover_vla_tpu.eval.libero import make_libero_env, list_tasks
    env = make_libero_env("libero_spatial", 0)
    obs, _ = env.reset(seed=0)
    assert "image" in obs
    assert len(list_tasks("libero_spatial")) >= 1
