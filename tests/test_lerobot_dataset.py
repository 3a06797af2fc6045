"""LeRobotDataset v2.x reader/writer (`data/lerobot.py`) — the reference's
dataset stack (lerobot_custom/lerobot/common/datasets/lerobot_dataset.py):
format round-trip, delta_timestamps windows with clamped pad masks
(lerobot_dataset.py:665-678), video/PNG camera decoding, and the bridge
into the pi0 input pipeline."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
pytest.importorskip("pyarrow")

from cover_vla_tpu.data.lerobot import (  # noqa: E402
    LeRobotDataset, LeRobotWriter, check_delta_timestamps,
    get_delta_indices)

FEATURES = {
    "observation.images.cam": {"dtype": "video", "shape": [32, 32, 3],
                               "names": ["h", "w", "c"]},
    "observation.state": {"dtype": "float32", "shape": [7], "names": None},
    "action": {"dtype": "float32", "shape": [7], "names": None},
}


def _frames(n, seed):
    rng = np.random.default_rng(seed)
    # flat-colour frames survive mp4v lossy encoding recognisably
    shades = rng.integers(30, 220, (n, 3))
    imgs = np.zeros((n, 32, 32, 3), np.uint8) + \
        shades[:, None, None, :].astype(np.uint8)
    return {
        "observation.images.cam": imgs,
        "observation.state": rng.standard_normal((n, 7)).astype(np.float32),
        "action": rng.standard_normal((n, 7)).astype(np.float32),
    }


def _write(root, use_videos=True):
    feats = dict(FEATURES)
    if not use_videos:
        feats = {k: ({**v, "dtype": "image"}
                     if v["dtype"] == "video" else v)
                 for k, v in feats.items()}
    w = LeRobotWriter(root=str(root), fps=10.0, features=feats,
                      use_videos=use_videos)
    eps = [_frames(6, 0), _frames(4, 1)]
    w.add_episode(eps[0], task="pick the fork")
    w.add_episode(eps[1], task="stack the cups")
    w.finalize()
    return eps


@pytest.fixture(scope="module", params=["video", "image"])
def dataset(request, tmp_path_factory):
    root = tmp_path_factory.mktemp(f"lerobot_{request.param}")
    use_videos = request.param == "video"
    try:
        eps = _write(root, use_videos=use_videos)
    except RuntimeError as e:
        pytest.skip(str(e))  # cv2 without an mp4 encoder
    return root, eps, use_videos


def test_metadata_and_flat_items(dataset):
    root, eps, _ = dataset
    ds = LeRobotDataset(str(root))
    assert len(ds) == 10
    assert ds.meta.fps == 10.0
    assert ds.meta.camera_keys == ["observation.images.cam"]

    item = ds[7]  # episode 1, local frame 1
    assert item["task"] == "stack the cups"
    np.testing.assert_allclose(item["observation.state"],
                               eps[1]["observation.state"][1])
    np.testing.assert_allclose(item["action"], eps[1]["action"][1])
    img = item["observation.images.cam"]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    # lossy codec: the flat colour must survive within a loose budget
    ref = eps[1]["observation.images.cam"][1]
    assert np.abs(img.astype(int).mean((0, 1))
                  - ref.astype(int).mean((0, 1))).max() < 25


def test_delta_timestamps_windows_and_pad(dataset):
    root, eps, _ = dataset
    ds = LeRobotDataset(str(root), delta_timestamps={
        "action": [0.0, 0.1, 0.2, 0.3],        # 4-step action chunk
        "observation.state": [-0.1, 0.0],      # 1 step of history
    })
    # frame 4 of episode 0 (length 6): action window hits the clamp
    item = ds[4]
    np.testing.assert_allclose(
        item["action"], eps[0]["action"][[4, 5, 5, 5]])
    np.testing.assert_array_equal(item["action_is_pad"],
                                  [False, False, True, True])
    np.testing.assert_allclose(
        item["observation.state"], eps[0]["observation.state"][[3, 4]])
    np.testing.assert_array_equal(item["observation.state_is_pad"],
                                  [False, False])
    # episode starts clamp backwards
    first = ds[6]  # episode 1 local 0
    np.testing.assert_array_equal(first["observation.state_is_pad"],
                                  [True, False])
    np.testing.assert_allclose(
        first["observation.state"], eps[1]["observation.state"][[0, 0]])


def test_delta_timestamp_validation():
    check_delta_timestamps({"action": [0.0, 0.1]}, 10.0, 1e-4)
    with pytest.raises(ValueError):
        check_delta_timestamps({"action": [0.07]}, 10.0, 1e-4)
    assert get_delta_indices({"a": [-0.1, 0.0, 0.2]}, 10.0) == \
        {"a": [-1, 0, 2]}


def test_episode_selection(dataset):
    root, eps, _ = dataset
    ds = LeRobotDataset(str(root), episodes=[1])
    assert len(ds) == 4
    assert ds[0]["task"] == "stack the cups"
    np.testing.assert_allclose(ds[0]["action"], eps[1]["action"][0])


def test_trajectory_bridge_into_pi0_pipeline(dataset):
    """LeRobot episodes feed the existing chunking + batch assembly
    (pipeline.StreamingFrameDataset -> make_pi0_batch)."""
    from cover_vla_tpu.configs import tiny_pi0_config
    from cover_vla_tpu.data.pipeline import (
        StreamingFrameDataset, batcher, make_pi0_batch)
    from cover_vla_tpu.data.tokenizer import HashTokenizer

    root, eps, _ = dataset
    ds = LeRobotDataset(str(root))
    trajs = list(ds.trajectories())
    assert len(trajs) == 2 and trajs[0]["images"].shape == (6, 32, 32, 3)
    assert trajs[1]["task"] == "stack the cups"

    cfg = tiny_pi0_config()
    stream = StreamingFrameDataset(source=ds, chunk_size=4)
    batch = next(batcher(stream.frames(seed=0), batch_size=5))
    out = make_pi0_batch(batch, HashTokenizer(cfg.paligemma.vocab_size),
                         cfg)
    assert out["images"].shape[0] == 5
    assert out["actions"].shape == (5, 4, cfg.max_action_dim)
    assert out["actions_is_pad"].shape == (5, 4)
