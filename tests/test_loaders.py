"""Path-dispatching checkpoint loaders + the convert-once `.jaxcache`
(`convert/loaders.py` — the serving `switch_model` ingestion path and the
full-size checkpoint-iteration speed fix: torch->JAX restructuring runs
once per source file, keyed on mtime+size; the cache is a flat
`params.blob` written from host arrays — no device round trip — and
reloaded as memmap views + ONE batched device_put, convert/blob.py).

Reference semantics: base_evaluator.py:119-126 (per-checkpoint
iteration), policy_wrapper.py:91-113 (format sniffing on load)."""

import os

import numpy as np
import jax
import pytest

from cover_vla_tpu.configs import tiny_pi0_config, tiny_verifier_config
from cover_vla_tpu.convert import checkpoints, loaders
from cover_vla_tpu.models import pi0, verifier


def _leaf(params):
    return np.asarray(jax.tree_util.tree_leaves(params)[0])


def test_cached_convert_roundtrip_and_invalidation(tmp_path):
    """First load converts and writes `<src>.jaxcache/`; the second load
    restores from it WITHOUT calling the converter; mutating the source
    file (mtime/size key) forces a reconvert."""
    src = str(tmp_path / "model.safetensors")
    with open(src, "w") as f:
        f.write("v1")
    calls = []

    def convert_fn():
        calls.append(1)
        return {"w": np.full((3,), float(len(calls)), np.float32)}

    out1 = loaders._cached_convert(src, convert_fn, cache=True)
    assert len(calls) == 1 and os.path.isdir(src + ".jaxcache")

    out2 = loaders._cached_convert(src, convert_fn, cache=True)
    assert len(calls) == 1, "second load must hit the cache"
    np.testing.assert_array_equal(np.asarray(out2["w"]),
                                  np.asarray(out1["w"]))

    with open(src, "w") as f:     # size change -> key mismatch
        f.write("v2 longer")
    out3 = loaders._cached_convert(src, convert_fn, cache=True)
    assert len(calls) == 2, "source change must invalidate the cache"
    assert float(np.asarray(out3["w"])[0]) == 2.0

    # cache=False never touches the converter cache
    loaders._cached_convert(src, convert_fn, cache=False)
    assert len(calls) == 3


def test_blob_roundtrip_bf16_nested(tmp_path):
    """blob.save_tree/load_tree: nested dicts, bf16/fp32/int leaves,
    0-d scalars, non-contiguous (transposed) arrays — bytes exact."""
    import jax.numpy as jnp
    from cover_vla_tpu.convert import blob

    rng = np.random.default_rng(0)
    tree = {
        "a": {"w": rng.standard_normal((4, 6)).astype(np.float32).T,
              "scale": np.float32(3.25).reshape(())},
        "b": {"emb": rng.standard_normal((8, 2)).astype(jnp.bfloat16),
              "ids": np.arange(5, dtype=np.int32)},
    }
    path = str(tmp_path / "p.blob")
    blob.save_tree(path, tree)
    out = blob.load_tree(path)
    flat_in = jax.tree_util.tree_leaves_with_path(tree)
    flat_out = jax.tree_util.tree_leaves_with_path(out)
    assert [k for k, _ in flat_in] == [k for k, _ in flat_out]
    for (_, x), (_, y) in zip(flat_in, flat_out):
        assert x.dtype == y.dtype and x.shape == y.shape
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # mmap=False path returns identical data
    out2 = blob.load_tree(path, mmap=False)
    np.testing.assert_array_equal(np.asarray(out2["b"]["emb"]),
                                  np.asarray(tree["b"]["emb"]))


def test_hostmode_convert_matches_device_convert():
    """A converter run under hostmode.host_arrays() yields numpy-only
    leaves identical (dtype+bytes) to the normal device conversion —
    the invariant the blob cache rests on."""
    import jax.numpy as jnp
    pytest.importorskip("torch")
    from cover_vla_tpu.convert import hostmode, pi0_from_torch

    # tiny state dict in the exact lerobot layout (shared fixture)
    from tests.test_convert_parity import make_tiny_pi0_state_dict
    cfg = tiny_pi0_config()
    sd = make_tiny_pi0_state_dict(cfg)
    dev = pi0_from_torch.convert_pi0(sd, cfg)
    with hostmode.host_arrays():
        host = pi0_from_torch.convert_pi0(sd, cfg)
    dleaves = jax.tree_util.tree_leaves_with_path(dev)
    hleaves = jax.tree_util.tree_leaves_with_path(host)
    assert [k for k, _ in dleaves] == [k for k, _ in hleaves]
    for (_, d), (_, h) in zip(dleaves, hleaves):
        assert isinstance(h, np.ndarray) and not isinstance(h, jnp.ndarray)
        assert d.dtype == h.dtype and d.shape == h.shape
        np.testing.assert_array_equal(np.asarray(d), np.asarray(h))


def test_cached_convert_recovers_from_legacy_orbax_cache(tmp_path):
    """A `.jaxcache` in the old orbax-dir format (no params.blob) must be
    treated as stale: the loader reconverts and rewrites the blob."""
    src = str(tmp_path / "model.safetensors")
    with open(src, "w") as f:
        f.write("v1")
    cache_dir = src + ".jaxcache"
    os.makedirs(os.path.join(cache_dir, "params"))  # orbax-style dir
    import json
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump(loaders._cache_key(src), f)

    calls = []

    def convert_fn():
        calls.append(1)
        return {"w": np.ones((2,), np.float32)}

    out = loaders._cached_convert(src, convert_fn, cache=True)
    assert len(calls) == 1   # legacy cache did not satisfy the load
    np.testing.assert_array_equal(np.asarray(out["w"]), [1, 1])
    assert os.path.exists(os.path.join(cache_dir, "params.blob"))
    loaders._cached_convert(src, convert_fn, cache=True)
    assert len(calls) == 1   # rewritten blob now serves


def test_load_policy_params_orbax_dir(tmp_path):
    cfg = tiny_pi0_config()
    p = pi0.init_pi0(jax.random.PRNGKey(0), cfg)
    ck = checkpoints.save_params(str(tmp_path / "ck"), p)
    loaded = loaders.load_policy_params(ck, cfg)
    np.testing.assert_array_equal(_leaf(loaded), _leaf(p))

    with pytest.raises(FileNotFoundError):
        loaders.load_policy_params(str(tmp_path / "weights.npz"), cfg)


def test_load_verifier_merged_pt_caches_and_needs_backbone(tmp_path):
    """Heads-only merged ensembles reuse the supplied frozen backbone
    (efficient_ensemble_merged.py:36-53 schema); without one the load
    must fail loudly. The second load comes from the .jaxcache."""
    torch = pytest.importorskip("torch")  # noqa: F841 (merged .pt format)
    from cover_vla_tpu.convert.verifier_to_torch import save_merged_ensemble

    vcfg = tiny_verifier_config()
    vp = verifier.init_verifier(jax.random.PRNGKey(1), vcfg, num_members=2)
    path = str(tmp_path / "merged.pt")
    save_merged_ensemble(path, vp["members"], vcfg)

    with pytest.raises(ValueError):
        loaders.load_verifier_params(path, vcfg, backbone_params=None)

    out = loaders.load_verifier_params(path, vcfg,
                                       backbone_params=vp["backbone"])
    assert "backbone" in out and os.path.isdir(path + ".jaxcache")
    # cache-hit path serves the same heads
    out2 = loaders.load_verifier_params(path, vcfg,
                                        backbone_params=vp["backbone"])
    np.testing.assert_array_equal(_leaf(out2["members"]),
                                  _leaf(out["members"]))
