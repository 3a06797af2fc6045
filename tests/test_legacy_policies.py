"""Legacy baseline wrappers: RT-1 SavedModel integration (exercised against
a generated TF SavedModel with the reference signature) and the Octo-style
image-history wrapper."""

import numpy as np
import pytest

from cover_vla_tpu.serving.legacy_policies import (
    OctoPolicyWrapper, RT1SavedModelPolicy, _hash_sentence_embedding)


def _make_rt1_savedmodel(path):
    tf = pytest.importorskip("tensorflow")

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 256, 320, 3], tf.uint8, name="image"),
            tf.TensorSpec([1, 512], tf.float32,
                          name="natural_language_embedding")])
        def __call__(self, image, natural_language_embedding):
            # deterministic function of inputs so the wrapper's plumbing is
            # observable: mean pixel + embedding norm drive the action
            m = tf.reduce_mean(tf.cast(image, tf.float32)) / 255.0
            e = tf.reduce_mean(natural_language_embedding)
            wv = tf.stack([m, e, m - e])[None] * 2.0 - 0.5
            return {
                "world_vector": tf.clip_by_value(wv, -1.0, 1.0),
                "rotation_delta": tf.clip_by_value(-wv, -1.0, 1.0),
                "gripper_closedness_action": tf.reshape(m * 2 - 1, [1, 1]),
                "terminate_episode": tf.zeros([1, 3]),
            }

    m = M()
    tf.saved_model.save(m, path, signatures=m.__call__)
    return path


def test_rt1_savedmodel_policy(tmp_path):
    pytest.importorskip("tensorflow")
    path = _make_rt1_savedmodel(str(tmp_path / "rt1"))
    pol = RT1SavedModelPolicy(path)
    pol.reset("pick coke can")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    raw = pol.step(img)
    assert set(raw) >= {"world_vector", "rotation_delta",
                        "gripper_closedness_action"}
    # metric bounds after rescale (rt1_model.py:72-90)
    assert (np.abs(raw["world_vector"]) <= 0.05 + 1e-6).all()
    assert (np.abs(raw["rotation_delta"]) <= 0.25 + 1e-6).all()

    flat = pol.select_action(img)
    assert flat.shape == (7,)
    assert flat[6] in (-1.0, 1.0)
    # deterministic given (image, task)
    np.testing.assert_array_equal(flat, pol.select_action(img))
    # task changes the language embedding and thus the action
    pol.reset("open the drawer")
    assert np.abs(flat - pol.select_action(img)).max() > 0


def test_hash_sentence_embedding_properties():
    a = _hash_sentence_embedding("pick coke can")
    b = _hash_sentence_embedding("Pick Coke Can ")  # normalised
    c = _hash_sentence_embedding("open drawer")
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0
    np.testing.assert_allclose(np.linalg.norm(a), 1.0, rtol=1e-5)


def test_octo_wrapper_history_and_queue():
    calls = []

    def fake_sample_actions(images, pad_mask, task, seed):
        calls.append((images.shape, pad_mask.copy(), task))
        return np.tile(np.arange(4, dtype=np.float32)[:, None], (1, 7))

    pol = OctoPolicyWrapper(fake_sample_actions, image_size=64, horizon=2,
                            pred_action_horizon=4, exec_horizon=2)
    pol.reset("put spoon on towel")
    rng = np.random.default_rng(0)
    f = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)

    a0 = pol.select_action(f)
    assert calls[0][0] == (1, 2, 64, 64, 3)
    # first step: only one real frame in the 2-frame window
    np.testing.assert_array_equal(calls[0][1], [[False, True]])
    assert a0[0] == 0.0
    a1 = pol.select_action(f)            # from the exec queue, no new call
    assert len(calls) == 1 and a1[0] == 1.0
    pol.select_action(f)                 # queue empty -> new prediction
    assert len(calls) == 2
    np.testing.assert_array_equal(calls[1][1], [[True, True]])


def test_octo_wrapper_ensembling():
    def fake_sample_actions(images, pad_mask, task, seed):
        return np.ones((4, 7), np.float32)

    pol = OctoPolicyWrapper(fake_sample_actions, image_size=32,
                            action_ensemble_temp=-0.8)
    pol.reset("x")
    f = np.zeros((64, 64, 3), np.uint8)
    a = pol.select_action(f)
    assert a.shape == (7,)
    np.testing.assert_allclose(a, 1.0)  # all predictions identical
