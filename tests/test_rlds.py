"""RLDS TFRecord reader/writer: self-roundtrip + cross-validation against
TensorFlow's own TFRecord writer and reader (format oracle), and the
FrameDataset/make_pi0_batch integration."""

import io
import os

import numpy as np
import pytest

from cover_vla_tpu.data import rlds
from cover_vla_tpu.data.pipeline import FrameDataset, batcher, interleave


def _episodes(n=3, t=5, hw=24):
    rng = np.random.default_rng(0)
    eps = []
    for i in range(n):
        eps.append({
            "images": rng.integers(0, 255, (t, hw, hw, 3)).astype(np.uint8),
            "states": rng.standard_normal((t, 7)).astype(np.float32),
            "actions": rng.standard_normal((t, 7)).astype(np.float32),
            "task": f"put the carrot on plate {i}",
        })
    return eps


def _assert_episodes_equal(a, b, lossless_images=True):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        if lossless_images:
            np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_allclose(x["states"], y["states"], rtol=1e-6)
        np.testing.assert_allclose(x["actions"], y["actions"], rtol=1e-6)
        assert x["task"] == y["task"]


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert rlds.crc32c(b"") == 0
    assert rlds.crc32c(b"123456789") == 0xE3069283
    assert rlds.crc32c(bytes(32)) == 0x8A9136AA


def test_roundtrip_own_writer_reader(tmp_path):
    eps = _episodes()
    path = str(tmp_path / "ds.tfrecord-00000-of-00001")
    rlds.write_rlds_shard(path, eps, image_format="png")
    back = rlds.RldsShardDataset(str(tmp_path), verify_crc=True).episodes()
    _assert_episodes_equal(eps, back)


def test_reader_parses_tensorflow_written_shard(tmp_path):
    tf = pytest.importorskip("tensorflow")
    eps = _episodes()
    path = str(tmp_path / "tfds.tfrecord-00000-of-00001")
    spec = rlds.RldsSpec()
    with tf.io.TFRecordWriter(path) as w:
        for ep in eps:
            imgs = [tf.io.encode_png(f).numpy() for f in ep["images"]]
            feats = {
                spec.image_key: tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=imgs)),
                spec.state_key: tf.train.Feature(
                    float_list=tf.train.FloatList(
                        value=ep["states"].ravel())),
                spec.action_key: tf.train.Feature(
                    float_list=tf.train.FloatList(
                        value=ep["actions"].ravel())),
                spec.instruction_key: tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[ep["task"].encode()] * len(imgs))),
            }
            w.write(tf.train.Example(
                features=tf.train.Features(feature=feats)
            ).SerializeToString())
    back = rlds.RldsShardDataset(path, verify_crc=True).episodes()
    _assert_episodes_equal(eps, back)


def test_tensorflow_parses_our_shard(tmp_path):
    tf = pytest.importorskip("tensorflow")
    eps = _episodes(n=2)
    path = str(tmp_path / "ours.tfrecord-00000-of-00001")
    rlds.write_rlds_shard(path, eps, image_format="png")
    spec = rlds.RldsSpec()
    feature_desc = {
        spec.image_key: tf.io.VarLenFeature(tf.string),
        spec.state_key: tf.io.VarLenFeature(tf.float32),
        spec.action_key: tf.io.VarLenFeature(tf.float32),
        spec.instruction_key: tf.io.VarLenFeature(tf.string),
    }
    got = []
    for rec in tf.data.TFRecordDataset(path):
        ex = tf.io.parse_single_example(rec, feature_desc)
        imgs = [tf.io.decode_png(v).numpy()
                for v in tf.sparse.to_dense(ex[spec.image_key]).numpy()]
        t = len(imgs)
        got.append({
            "images": np.stack(imgs),
            "states": tf.sparse.to_dense(
                ex[spec.state_key]).numpy().reshape(t, -1),
            "actions": tf.sparse.to_dense(
                ex[spec.action_key]).numpy().reshape(t, -1),
            "task": tf.sparse.to_dense(
                ex[spec.instruction_key]).numpy()[0].decode(),
        })
    _assert_episodes_equal(eps, got)


def test_example_codec_int64_and_negative_values():
    ex = rlds.encode_example({
        "ints": np.asarray([0, 1, -1, 2 ** 40, -(2 ** 40)]),
        "floats": np.asarray([0.5, -2.25], np.float32),
        "strs": [b"a", b"bc"],
    })
    back = rlds.parse_example(ex)
    np.testing.assert_array_equal(
        back["ints"], [0, 1, -1, 2 ** 40, -(2 ** 40)])
    np.testing.assert_allclose(back["floats"], [0.5, -2.25])
    assert back["strs"] == [b"a", b"bc"]


def test_raw_image_format_roundtrip(tmp_path):
    eps = _episodes(n=1, t=3, hw=16)
    path = str(tmp_path / "raw.tfrecord-00000-of-00001")
    spec = rlds.RldsSpec(raw_image_hw=(16, 16))
    rlds.write_rlds_shard(path, eps, spec=spec, image_format="raw")
    back = rlds.RldsShardDataset(path, spec=spec).episodes()
    _assert_episodes_equal(eps, back)


def test_run_train_role_rlds_augment_val(tmp_path):
    """End-to-end: --role train --train.data_format rlds with on-device
    augmentation, paraphrase table, validation + metrics JSONL
    (VERDICT next-round items 4 and 5)."""
    import json
    from cover_vla_tpu import run as run_mod
    from cover_vla_tpu.eval.rephrase import save_rephrases

    eps = _episodes(n=2, t=6, hw=32)
    for ep in eps:
        ep["task"] = "pick up the cube"
    ds_dir = tmp_path / "rlds"
    os.makedirs(ds_dir)
    rlds.write_rlds_shard(str(ds_dir / "fix.tfrecord-00000-of-00001"), eps)
    reph_path = str(tmp_path / "reph.json")
    save_rephrases({"pick up the cube": ["grab the cube", "lift the cube"]},
                   reph_path)
    ck_dir = tmp_path / "ck"
    run_mod.main([
        "--role", "train", "--train.tiny", "true",
        "--train.data_format", "rlds",
        "--train.dataset_dir", str(ds_dir),
        "--train.augment", "true",
        "--train.paraphrase_json", reph_path,
        "--train.val_every", "2",
        "--train.num_steps", "3", "--train.batch_size", "2",
        "--train.shuffle_buffer", "4",
        "--train.checkpoint_dir", str(ck_dir),
        "--train.save_every", "1000"])
    from cover_vla_tpu.convert import checkpoints
    assert checkpoints.latest_checkpoint(str(ck_dir)) is not None
    recs = [json.loads(line)
            for line in open(ck_dir / "metrics.jsonl")]
    assert any("loss" in r for r in recs)
    val = [r for r in recs if "val/mae" in r]
    assert val and "val/acc@0.1" in val[0]


def test_streaming_into_frame_pipeline(tmp_path):
    """RLDS shards -> FrameDataset chunking -> batches (the role_train
    composition, INT-ACT src/agent/dataset.py:11-94 semantics)."""
    eps = _episodes(n=2, t=6)
    path = str(tmp_path / "ds.tfrecord-00000-of-00001")
    rlds.write_rlds_shard(path, eps)
    trajs = rlds.RldsShardDataset(str(tmp_path)).episodes()
    ds = FrameDataset(trajs, chunk_size=4)
    batches = list(batcher(interleave([ds], seed=0, shuffle_buffer=8), 4))
    assert len(batches) == 3  # 12 frames / 4
    b = batches[0]
    assert b["image"].shape == (4, 24, 24, 3)
    assert b["actions"].shape == (4, 4, 7)
    assert b["action_is_pad"].shape == (4, 4)
    assert all(t.startswith("put the carrot") for t in b["task"])
