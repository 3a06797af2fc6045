"""Data pipeline: chunking/pad masks, interleave, stats, augmentation,
verifier training step, retrieval harness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cover_vla_tpu.configs import tiny_pi0_config, tiny_verifier_config
from cover_vla_tpu.data import pipeline
from cover_vla_tpu.data.augment import augment_frame, color_jitter
from cover_vla_tpu.data.tokenizer import HashTokenizer
from cover_vla_tpu.training import train_verifier
from cover_vla_tpu.training.optim import linear_warmup, make_adamw
from cover_vla_tpu.eval.verifier_retrieval import retrieval_test, display_results


def _traj(t=6, task="pick it up", seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 255, (t, 32, 32, 3)).astype(np.uint8),
        "states": rng.standard_normal((t, 7)).astype(np.float32),
        "actions": rng.standard_normal((t, 7)).astype(np.float32),
        "task": task,
    }


def test_chunk_trajectory_pad_semantics():
    traj = _traj(t=5)
    out = pipeline.chunk_trajectory(traj, chunk_size=4)
    assert out["actions"].shape == (5, 4, 7)
    assert out["action_is_pad"].shape == (5, 4)
    # frame 0: no padding; frame 4: steps 1..3 padded with the last action
    assert not out["action_is_pad"][0].any()
    assert out["action_is_pad"][4].tolist() == [False, True, True, True]
    np.testing.assert_array_equal(out["actions"][4, 1], traj["actions"][4])
    np.testing.assert_array_equal(out["actions"][2, 1], traj["actions"][3])


def test_interleave_and_batch():
    ds1 = pipeline.FrameDataset([_traj(4, "a", 0)], chunk_size=2)
    ds2 = pipeline.FrameDataset([_traj(6, "b", 1)], chunk_size=2)
    frames = list(pipeline.interleave([ds1, ds2], weights=[1, 3],
                                      shuffle_buffer=4, seed=0))
    assert len(frames) == 10
    tasks = {f["task"] for f in frames}
    assert tasks == {"a", "b"}
    batches = list(pipeline.batcher(iter(frames), 4))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 32, 32, 3)


def test_paraphrase_augment():
    aug = pipeline.ParaphraseAugment({"a": ["x", "y"]}, prob=1.0)
    rng = np.random.default_rng(0)
    assert aug("a", rng) in ("x", "y")
    assert aug("unknown", rng) == "unknown"
    aug0 = pipeline.ParaphraseAugment({"a": ["x"]}, prob=0.0)
    assert aug0("a", rng) == "a"


def test_compute_statistics_schema():
    stats = pipeline.compute_statistics([_traj(50, seed=i) for i in range(3)])
    assert stats["num_transitions"] == 150
    assert stats["num_trajectories"] == 3
    for fieldname in ("action", "proprio"):
        for k in ("mean", "std", "p01", "p99", "min", "max"):
            assert len(stats[fieldname][k]) == 7
    assert np.all(np.asarray(stats["action"]["p01"])
                  <= np.asarray(stats["action"]["p99"]))


def test_make_pi0_batch_shapes():
    cfg = tiny_pi0_config()
    ds = pipeline.FrameDataset([_traj(6)], chunk_size=cfg.chunk_size)
    batch_frames = next(pipeline.batcher(ds.frames(), 4))
    tok = HashTokenizer(cfg.paligemma.vocab_size)
    batch = pipeline.make_pi0_batch(batch_frames, tok, cfg)
    assert batch["images"].shape == (4, 1, 32, 32, 3)
    assert batch["state"].shape == (4, cfg.max_state_dim)
    assert batch["actions"].shape == (4, cfg.chunk_size, cfg.max_action_dim)
    assert batch["lang_tokens"].shape == (4, cfg.tokenizer_max_length)
    assert batch["images"].min() >= -1 and batch["images"].max() <= 1


def test_augment_frame_bounds_and_determinism():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (40, 40, 3)), jnp.uint8)
    out1 = augment_frame(jax.random.PRNGKey(0), img, (24, 24))
    out2 = augment_frame(jax.random.PRNGKey(0), img, (24, 24))
    assert out1.shape == (24, 24, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert float(out1.min()) >= -1 and float(out1.max()) <= 1
    out3 = augment_frame(jax.random.PRNGKey(1), img, (24, 24))
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-3


def test_color_jitter_identity_ranges():
    img = jnp.full((8, 8, 3), 0.5)
    out = color_jitter(jax.random.PRNGKey(0), img, 0, 0, 0, 0)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_verifier_train_step_reduces_loss():
    cfg = tiny_verifier_config()
    tx = make_adamw(linear_warmup(3e-3, 2))
    backbone, state = train_verifier.init_train_state(
        jax.random.PRNGKey(0), cfg, tx, num_members=2)
    step = train_verifier.make_train_step(cfg, tx, member_idx=0)

    rng = np.random.default_rng(0)
    b = 6
    batch = {
        "images": jnp.asarray(rng.uniform(-1, 1, (b, cfg.vision.image_size,
                                                  cfg.vision.image_size, 3)),
                              jnp.float32),
        "text_tokens": jnp.asarray(rng.integers(
            0, cfg.text.vocab_size, (b, cfg.text.context_length))),
        "action_histories": jnp.asarray(
            rng.uniform(-1, 1, (b, cfg.history_length, cfg.action_dim)),
            jnp.float32),
    }
    losses = []
    member1_before = jax.tree_util.tree_map(lambda x: np.asarray(x[1]),
                                            state.members)
    for _ in range(12):
        state, metrics = step(state, backbone, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert 0.0 <= float(metrics["top1_i2a"]) <= 1.0
    # only member 0 trained; member 1 untouched
    member1_after = jax.tree_util.tree_map(lambda x: np.asarray(x[1]),
                                           state.members)
    for a, b_ in zip(jax.tree_util.tree_leaves(member1_before),
                     jax.tree_util.tree_leaves(member1_after)):
        np.testing.assert_array_equal(a, b_)


def test_retrieval_harness():
    cfg = tiny_verifier_config()
    from cover_vla_tpu.models import verifier
    params = verifier.init_verifier(jax.random.PRNGKey(0), cfg, 1)
    rng = np.random.default_rng(1)
    n = 6
    res = retrieval_test(
        params, cfg,
        rng.uniform(-1, 1, (n, cfg.vision.image_size,
                            cfg.vision.image_size, 3)).astype(np.float32),
        rng.integers(0, cfg.text.vocab_size,
                     (n, cfg.text.context_length)),
        rng.uniform(-1, 1, (n, cfg.history_length,
                            cfg.action_dim)).astype(np.float32),
        pool_size=4)
    assert res["num_samples"] == n
    assert 0.0 <= res["top1_accuracy"] <= 1.0
    assert "top-1 accuracy" in display_results(res)


def test_prefetch_preserves_order_and_propagates_errors():
    from cover_vla_tpu.data.pipeline import prefetch

    assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("input pipeline failure")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)
