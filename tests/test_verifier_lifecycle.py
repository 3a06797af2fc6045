"""Verifier ensemble lifecycle: vmapped all-member training, merged-ensemble
export/round-trip in the reference schema, best-checkpoint + resume, and
streaming JSON load (VERDICT next-round item 6)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cover_vla_tpu.configs import tiny_verifier_config
from cover_vla_tpu.data.bridge_verifier_dataset import (
    BridgeVerifierDataset, save_normalized_dataset)
from cover_vla_tpu.data.tokenizer import make_verifier_tokenizer
from cover_vla_tpu.models import verifier
from cover_vla_tpu.training import train_verifier

CFG = tiny_verifier_config()


def _dataset(tmp_path, n=8, hw=64):
    rng = np.random.default_rng(0)
    samples = []
    for i in range(n):
        img = rng.integers(0, 255, (hw, hw, 3)).astype(np.uint8)
        np.save(tmp_path / f"img{i}.npy", img)
        samples.append({
            "image": f"img{i}.npy",
            "instruction": f"put the {['carrot', 'spoon'][i % 2]} on plate",
            "action_history": rng.uniform(-1, 1, (6, 7)),
        })
    path = str(tmp_path / "ds.json")
    save_normalized_dataset(path, samples)
    return path


def _batch(ds, tok, n):
    b = next(ds.batches(n, tok, CFG.text.context_length, seed=0))
    b.pop("instructions")
    return b


def test_ensemble_step_trains_all_members(tmp_path):
    path = _dataset(tmp_path)
    ds = BridgeVerifierDataset(path, history_length=CFG.history_length,
                               image_size=CFG.vision.image_size)
    tok = make_verifier_tokenizer(CFG.text.vocab_size)
    tx = optax.adam(1e-3)
    backbone, state = train_verifier.init_train_state(
        jax.random.PRNGKey(0), CFG, tx, num_members=3)
    step = train_verifier.make_ensemble_train_step(CFG, tx)
    before = jax.tree_util.tree_map(np.asarray, state.members)
    batch = _batch(ds, tok, 4)
    losses = []
    for _ in range(4):
        state, metrics = step(state, backbone, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits the fixed batch
    assert metrics["member_loss"].shape == (3,)
    # every member's heads moved, and members remain distinct
    proj = np.asarray(state.members["input_projection"]["kernel"])
    before_proj = before["input_projection"]["kernel"]
    for m in range(3):
        assert np.abs(proj[m] - before_proj[m]).max() > 0
    assert np.abs(proj[0] - proj[1]).max() > 1e-4


def test_merged_export_roundtrip_exact():
    """export -> reference .pt schema -> convert back == identity."""
    torch = pytest.importorskip("torch")
    from cover_vla_tpu.convert.verifier_to_torch import (
        export_ensemble_components, save_merged_ensemble)
    from cover_vla_tpu.convert.verifier_from_torch import (
        convert_ensemble_components)

    params = verifier.init_verifier(jax.random.PRNGKey(1), CFG,
                                    num_members=2)
    comps = export_ensemble_components(params["members"], CFG)
    assert len(comps) == 2
    assert comps[0]["action_padding_value"] == CFG.action_padding_value
    back = convert_ensemble_components(comps, CFG)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params["members"]),
            jax.tree_util.tree_leaves_with_path(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32),
                                      err_msg=str(pa))


def test_merged_pt_file_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from cover_vla_tpu.convert.verifier_to_torch import save_merged_ensemble
    from cover_vla_tpu.convert.verifier_from_torch import (
        convert_merged_checkpoint)

    params = verifier.init_verifier(jax.random.PRNGKey(2), CFG,
                                    num_members=2)
    path = str(tmp_path / "merged.pt")
    save_merged_ensemble(path, params["members"], CFG)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert isinstance(raw["ensemble_components"], list)
    back = convert_merged_checkpoint(path, CFG)
    got = jax.tree_util.tree_leaves(back["members"])
    want = jax.tree_util.tree_leaves(params["members"])
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_streaming_json_load_equals_full(tmp_path):
    path = _dataset(tmp_path)
    full = BridgeVerifierDataset(path, image_size=CFG.vision.image_size)
    stream = BridgeVerifierDataset(path, image_size=CFG.vision.image_size,
                                   streaming=True)
    assert stream.samples == full.samples
    assert stream.instructions == full.instructions
    assert stream.action_histories == full.action_histories


def test_split_deterministic(tmp_path):
    path = _dataset(tmp_path)
    ds = BridgeVerifierDataset(path, image_size=CFG.vision.image_size)
    tr1, va1 = ds.split(0.25, seed=3)
    tr2, va2 = ds.split(0.25, seed=3)
    assert va1.samples == va2.samples
    assert len(va1) == 2 and len(tr1) == 6
    assert {id(s) for s in tr1.samples}.isdisjoint(
        id(s) for s in va1.samples)


def test_cli_verifier_lifecycle(tmp_path):
    """train K members -> best checkpoint + merged export -> resume."""
    pytest.importorskip("torch")
    from cover_vla_tpu import run as run_mod
    from cover_vla_tpu.convert import checkpoints
    from cover_vla_tpu.convert.verifier_from_torch import (
        convert_merged_checkpoint)

    path = _dataset(tmp_path)
    ck = tmp_path / "ck"
    args = ["--role", "train_verifier", "--train.tiny", "true",
            "--train.dataset_dir", path,
            "--train.num_members", "2",
            "--train.batch_size", "3",
            "--train.val_every", "2", "--train.val_fraction", "0.25",
            "--train.checkpoint_dir", str(ck),
            "--train.save_every", "1000", "--train.keep_last", "2"]
    run_mod.main(args + ["--train.num_steps", "3"])
    assert checkpoints.latest_checkpoint(str(ck)) is not None
    assert os.path.isdir(ck / "best")
    merged = ck / "merged_ensemble.pt"
    assert merged.exists()
    back = convert_merged_checkpoint(str(merged), CFG)
    assert jax.tree_util.tree_leaves(
        back["members"])[0].shape[0] == 2  # member axis
    recs = [json.loads(l) for l in open(ck / "metrics.jsonl")]
    assert any("val/top1_i2a" in r for r in recs)

    # resume continues from the saved step
    run_mod.main(args + ["--train.num_steps", "5", "--train.resume", "true"])
    latest = checkpoints.latest_checkpoint(str(ck))
    assert int(latest.rsplit("_", 1)[-1]) == 5


def test_ensemble_train_step_ddp_mesh(tmp_path):
    """DDP-equivalent mesh step: batch sharded, per-device LOCAL InfoNCE,
    gradient pmean — members update identically on every device and the
    replicated state matches the optimizer math (finetune...py:424-438)."""
    from cover_vla_tpu.parallel.mesh import make_mesh
    import optax

    path = _dataset(tmp_path, n=16)
    ds = BridgeVerifierDataset(path, history_length=CFG.history_length,
                               image_size=CFG.vision.image_size)
    tok = make_verifier_tokenizer(CFG.text.vocab_size)
    mesh = make_mesh(dp=8, fsdp=1)
    tx = optax.adam(1e-3)
    backbone, state = train_verifier.init_train_state(
        jax.random.PRNGKey(0), CFG, tx, num_members=2)
    step = train_verifier.make_ensemble_train_step(CFG, tx, mesh=mesh)
    batch = _batch(ds, tok, 16)  # 2 samples per device
    before = np.asarray(state.members["input_projection"]["kernel"])
    with mesh:
        sharded = train_verifier.shard_verifier_batch(batch, mesh)
        state, metrics = step(state, backbone, sharded)
        state, metrics = step(state, backbone, sharded)
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["member_loss"].shape == (2,)
    after = np.asarray(state.members["input_projection"]["kernel"])
    assert np.abs(after - before).max() > 0
    # replicated output state (grads were pmean'd)
    leaves = jax.tree_util.tree_leaves(state.members)
    assert all(len(l.sharding.device_set) == 8 for l in leaves)
