"""Bridge-verifier dataset format, pi0 validation metrics, multihost utils."""

import json
import os

import numpy as np
import jax
import pytest

from cover_vla_tpu.data.bridge_verifier_dataset import (
    BridgeVerifierDataset, save_normalized_dataset)
from cover_vla_tpu.data.tokenizer import HashTokenizer
from cover_vla_tpu.training.validation import action_accuracy, validate_pi0
from cover_vla_tpu.configs import tiny_pi0_config, tiny_verifier_config
from cover_vla_tpu.models import pi0
from cover_vla_tpu.parallel.distributed import aggregate_metrics, barrier


def test_bridge_verifier_dataset_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path
    samples = []
    for i in range(5):
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        np.save(img_dir / f"img{i}.npy", img)
        samples.append({
            "image": f"img{i}.npy",
            "instruction": f"task {i % 2}",
            "action_history": rng.uniform(-1, 1, (6, 7)),
        })
    path = str(tmp_path / "ds.json")
    save_normalized_dataset(path, samples)

    ds = BridgeVerifierDataset(path, image_root=str(img_dir),
                               history_length=10, image_size=64)
    assert len(ds) == 5
    tok = HashTokenizer(512, add_bos=False)
    item = ds.get(0, tok, context_length=16)
    assert item["action_history"].shape == (10, 7)
    assert (item["action_history"][:4] == -5.0).all()  # top padding
    assert item["instruction"] == "task 0"

    batches = list(ds.batches(2, tok, context_length=16, seed=0))
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["images"].min() >= -1 and b["images"].max() <= 1
    assert b["action_histories"].shape == (2, 10, 7)
    assert b["text_tokens"].shape == (2, 16)


def test_action_accuracy():
    pred = np.asarray([[0.0, 0.04], [0.2, 0.0]])
    gt = np.zeros((2, 2))
    acc = action_accuracy(pred, gt)
    assert acc["acc@0.01"] == 0.5
    assert acc["acc@0.05"] == 0.75
    assert acc["acc@0.1"] == 0.75
    np.testing.assert_allclose(acc["mae"], 0.06)


def test_validate_pi0_deterministic():
    cfg = tiny_pi0_config()
    params = pi0.init_pi0(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, s = 2, cfg.vision.image_size
    batch = {
        "images": rng.uniform(-1, 1, (b, 1, s, s, 3)).astype(np.float32),
        "img_masks": np.ones((b, 1), bool),
        "lang_tokens": rng.integers(0, cfg.paligemma.vocab_size,
                                    (b, cfg.tokenizer_max_length)
                                    ).astype(np.int32),
        "lang_masks": np.ones((b, cfg.tokenizer_max_length), bool),
        "state": rng.standard_normal((b, cfg.max_state_dim)).astype(np.float32),
        "actions": rng.standard_normal(
            (b, cfg.chunk_size, cfg.max_action_dim)).astype(np.float32),
    }
    m1 = validate_pi0(params, cfg, batch)
    m2 = validate_pi0(params, cfg, batch)
    assert m1 == m2
    assert 0.0 <= m1["acc@0.1"] <= 1.0


def test_multihost_helpers_single_process():
    out = aggregate_metrics({"loss": np.float32(1.5), "acc": 0.5})
    assert out == {"loss": 1.5, "acc": 0.5}
    barrier("test")  # no-op single host... must not raise


def test_init_multihost_env_parsing():
    """resolve_multihost_env: arg/env precedence, single-process no-op,
    and the half-configured-launch guard (a COORDINATOR_ADDRESS typo must
    raise, not silently fall back to world size 1)."""
    import pytest
    from cover_vla_tpu.parallel.distributed import (
        init_multihost, resolve_multihost_env)

    # single-process: nothing configured -> None; init is a no-op False
    assert resolve_multihost_env(env={}) is None
    assert init_multihost() is False

    # full env config
    env = {"COORDINATOR_ADDRESS": "10.0.0.1:1234",
           "NUM_PROCESSES": "4", "PROCESS_ID": "2"}
    assert resolve_multihost_env(env=env) == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4, "process_id": 2}

    # explicit args beat env vars
    got = resolve_multihost_env("other:1", num_processes=8, process_id=0,
                                env=env)
    assert got == {"coordinator_address": "other:1",
                   "num_processes": 8, "process_id": 0}

    # coordinator without world-size info defaults to 1/0
    got = resolve_multihost_env(env={"COORDINATOR_ADDRESS": "a:1"})
    assert got == {"coordinator_address": "a:1",
                   "num_processes": 1, "process_id": 0}

    # half-configured launch (world size but no coordinator) must raise
    with pytest.raises(ValueError):
        resolve_multihost_env(env={"NUM_PROCESSES": "4"})
    with pytest.raises(ValueError):
        resolve_multihost_env(env={"PROCESS_ID": "1"})
