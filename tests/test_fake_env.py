"""FakeWidowXEnv rendering contract.

The committed verification-scaling artifacts (policy/verifier/backbone
pkls) were trained on exact ID frame bytes; any drift in the default
rendering silently invalidates them. The round-5 geometry/distractor OOD
axes must therefore be strictly additive: default appearance == the
pre-round-5 square-blob rendering, byte for byte.
"""

import hashlib

import numpy as np

from cover_vla_tpu.eval.fake_env import (
    FakeWidowXEnv, TASK_APPEARANCES, _DEFAULT_APPEARANCE)

# md5 of render() after reset(seed=123) recorded BEFORE the round-5
# geometry axis landed (ID tasks share the default appearance).
_ID_FRAME_MD5 = "4998b21694b170d9be3b49cbae1732ca"


def test_id_frames_byte_stable():
    for task in ("widowx_carrot_on_plate", "widowx_eggplant_in_basket",
                 "widowx_spoon_on_towel", "widowx_stack_cube"):
        env = FakeWidowXEnv(task)
        env.reset(seed=123)
        assert hashlib.md5(env.render().tobytes()).hexdigest() \
            == _ID_FRAME_MD5, f"ID rendering drifted for {task}"


def test_ood_layout_matches_id_under_same_seed():
    """OOD variants change pixels only: object/target positions (and thus
    success geometry) must be identical to the ID episode for a seed, so
    OOD cells isolate the VISUAL shift."""
    e_id = FakeWidowXEnv("widowx_carrot_on_plate")
    for task in TASK_APPEARANCES:
        e_ood = FakeWidowXEnv(task)
        for seed in (0, 7, 1234):
            e_id.reset(seed=seed)
            e_ood.reset(seed=seed)
            np.testing.assert_allclose(e_id._obj, e_ood._obj)
            np.testing.assert_allclose(e_id._target, e_ood._target)


def test_ood_tasks_render_novel_geometry():
    """Each round-5 OOD task must differ from the ID rendering and carry
    its distractor (scene clutter axis)."""
    for task in ("widowx_redbull_on_plate", "widowx_zucchini_on_towel",
                 "widowx_tennis_ball_in_basket"):
        env = FakeWidowXEnv(task)
        env.reset(seed=123)
        frame = env.render()
        assert hashlib.md5(frame.tobytes()).hexdigest() != _ID_FRAME_MD5
        ap = env.appearance
        assert ap["distractors"], task
        # distractor blob actually rendered: its color appears in-frame
        d = ap["distractors"][0]
        assert (frame.reshape(-1, 3) == np.array(d["color"])).all(1).any()
        # distractors never overlap the pick object or the receptacle
        for pos, dd in env._distractors:
            assert np.linalg.norm(pos - env._obj[:2]) > 0.05
            assert np.linalg.norm(pos - env._target[:2]) > 0.06


def test_shapes_render_distinctly():
    """The geometry axis is real: each shape produces a distinct mask."""
    frames = {}
    for shape in ("square", "circle", "ellipse_v", "ellipse_h",
                  "triangle"):
        env = FakeWidowXEnv("widowx_carrot_on_plate",
                            appearance={"obj_shape": shape})
        env.reset(seed=5)
        frames[shape] = env.render().tobytes()
    assert len(set(frames.values())) == len(frames)
    # ring receptacle is hollow: background shows through its centre
    env = FakeWidowXEnv("widowx_carrot_on_plate",
                        appearance={"target_shape": "ring",
                                    "target_r": 20})
    env.reset(seed=5)
    f = env.render()
    cy = int(128 + env._target[1] * 400)
    cx = int(128 + env._target[0] * 400)
    assert (f[cy, cx] == _DEFAULT_APPEARANCE["bg"]).all() or \
        (f[cy, cx] != np.array(_DEFAULT_APPEARANCE["target_color"])).any()
