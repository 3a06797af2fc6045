"""Pallas flash prefix-LM attention kernel vs the XLA reference path
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cover_vla_tpu.ops.pallas_attention import pallas_prefix_gqa
from cover_vla_tpu.ops.attention import gqa_attention


@pytest.mark.parametrize("b,s,hq,hkv,d", [(1, 130, 8, 1, 128),
                                          (2, 200, 8, 2, 128)])
def test_pallas_matches_xla(b, s, hq, hkv, d):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, s, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    pad = np.ones((b, s), bool)
    pad[-1, s - 37:] = False
    mask = pad[:, None, :] & pad[:, :, None]

    ref = np.asarray(gqa_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(mask))).astype(np.float32)
    got = np.asarray(pallas_prefix_gqa(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        interpret=True)).astype(np.float32)
    valid = np.repeat(pad[:, :, None], hq * d, axis=2)
    # bf16 input quantisation bounds the divergence
    assert np.abs(ref - got)[valid].max() < 1.5e-2


def test_pallas_prefill_flag():
    """gemma.prefill(attn_impl='pallas') runs and approximates the XLA path."""
    from cover_vla_tpu.configs import tiny_pi0_config, replace
    from cover_vla_tpu.models import pi0
    cfg = tiny_pi0_config()
    params = pi0.init_pi0(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    s = cfg.vision.image_size
    images = jnp.asarray(rng.uniform(-1, 1, (1, 1, s, s, 3)), jnp.float32)
    im = jnp.ones((1, 1), bool)
    toks = jnp.asarray(rng.integers(0, cfg.paligemma.vocab_size, (1, 8)))
    masks = jnp.ones((1, 8), bool)
    state = jnp.zeros((1, cfg.max_state_dim), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(
        (1, 1, cfg.chunk_size, cfg.max_action_dim)), jnp.float32)

    outs = {}
    for impl in ("xla", "pallas"):
        # interpret-mode pallas on CPU
        import cover_vla_tpu.ops.pallas_attention as pa
        orig = pa.pallas_prefix_gqa
        if impl == "pallas":
            pa.pallas_prefix_gqa = lambda q, k, v, m: orig(q, k, v, m,
                                                           interpret=True)
        try:
            # pin the decode backend to xla: this test exercises the
            # PREFILL flag only (decode_attn_impl would otherwise inherit)
            c = replace(cfg, attention_impl=impl, decode_attn_impl="xla")
            cache = pi0.compute_prefix_cache(params, c, images, im, toks,
                                             masks)
            outs[impl] = np.asarray(pi0.denoise_from_cache(
                params, c, state, cache, noise))
        finally:
            pa.pallas_prefix_gqa = orig
    np.testing.assert_allclose(outs["xla"], outs["pallas"], rtol=0.1,
                               atol=0.05)


def test_pallas_mha_dense_matches_xla_interpret():
    """Dense flash MHA (interpret mode on CPU) == the eager einsum path at
    bf16 tolerance, including non-multiple-of-block sequence lengths and
    the per-call backend plumbing."""
    from cover_vla_tpu.ops import attention as att
    from cover_vla_tpu.ops.pallas_attention import pallas_mha_dense

    rng = np.random.default_rng(0)
    for (b, s, h, d) in [(2, 37, 4, 16), (1, 300, 2, 32)]:
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        ref = np.asarray(att.mha_attention(q, k, v), np.float32)
        got = np.asarray(pallas_mha_dense(q, k, v, interpret=True),
                         np.float32)
        np.testing.assert_allclose(got, ref, atol=2e-2)

    # backend is per-call only (config-plumbed; no process-global toggle)
    with pytest.raises(AssertionError):
        att.mha_attention(q, k, v, backend="bogus")


def test_pallas_shared_prefix_gqa_matches_xla_interpret():
    """Flash shared-prefix decode kernel (interpret on CPU) == the XLA
    joint-softmax path at bf16 tolerance, incl. ragged prefix padding and
    the intra-candidate suffix mask."""
    from cover_vla_tpu.models.gemma import _shared_prefix_gqa
    from cover_vla_tpu.ops.masks import make_att_2d_masks, suffix_att_masks
    from cover_vla_tpu.ops.pallas_attention import pallas_shared_prefix_gqa

    rng = np.random.default_rng(1)
    b, n, s, hq, hkv, d, p = 2, 3, 5, 4, 1, 16, 11
    q = jnp.asarray(rng.standard_normal((b, n, s, hq, d)), jnp.bfloat16)
    ks = jnp.asarray(rng.standard_normal((b, n, s, hkv, d)), jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((b, n, s, hkv, d)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((b, p, hkv, d)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((b, p, hkv, d)), jnp.bfloat16)
    prefix_pad = np.ones((b, p), bool)
    prefix_pad[1, 8:] = False
    att = suffix_att_masks(b, s - 1)
    smask = make_att_2d_masks(np.ones((b, s), bool), np.asarray(att))

    ref = np.asarray(_shared_prefix_gqa(
        q, ks, vs, kp, vp, jnp.asarray(prefix_pad), jnp.asarray(smask)),
        np.float32)
    got = np.asarray(pallas_shared_prefix_gqa(
        q, ks, vs, kp, vp, jnp.asarray(prefix_pad), jnp.asarray(smask),
        interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_fast_config_engine_coexists_with_exact(monkeypatch):
    """Config-plumbed backend selection: a fast_pi0_config/
    fast_verifier_config verified step (flash kernels + fast-math scores)
    coexists in one process with the exact-config step — no module-global
    mutation — and selects the same winner on the same inputs."""
    from cover_vla_tpu.configs import (
        tiny_pi0_config, tiny_verifier_config, CoVerConfig,
        fast_pi0_config, fast_verifier_config)
    from cover_vla_tpu.data.stats import DatasetStatistics
    from cover_vla_tpu.engine import make_verified_step
    from cover_vla_tpu.models import pi0, verifier
    import cover_vla_tpu.ops.pallas_attention as pa

    # interpret-mode pallas on CPU
    for name in ("pallas_mha_dense", "pallas_shared_prefix_gqa"):
        orig = getattr(pa, name)
        monkeypatch.setattr(
            pa, name,
            lambda *a, _orig=orig, **kw: _orig(*a, interpret=True, **kw))

    pcfg, vcfg = tiny_pi0_config(), tiny_verifier_config()
    ccfg = CoVerConfig(n_samples=2, n_rephrases=2)
    stats = DatasetStatistics.from_json()
    pp = pi0.init_pi0(jax.random.PRNGKey(0), pcfg)
    vp = verifier.init_verifier(jax.random.PRNGKey(1), vcfg, num_members=2)

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    proprio = rng.uniform(-0.1, 0.1, 7).astype(np.float32)
    k, t = ccfg.n_rephrases, pcfg.tokenizer_max_length
    lt = rng.integers(0, pcfg.paligemma.vocab_size, (k, t)).astype(np.int32)
    lm = np.ones((k, t), bool)
    vt = rng.integers(0, vcfg.text.vocab_size,
                      vcfg.text.context_length).astype(np.int32)
    hist = np.zeros((ccfg.max_history, 7), np.float32)

    fp, fv = fast_pi0_config(pcfg), fast_verifier_config(vcfg)
    assert fp.decode_attn_impl == "pallas" and fp.fast_math
    assert fv.vision.attn_impl == "pallas"
    step_exact = make_verified_step(pcfg, vcfg, ccfg, stats)
    step_fast = make_verified_step(fp, fv, ccfg, stats)
    args = (pp, vp, jax.random.PRNGKey(3), raw, proprio, lt, lm, vt,
            hist, np.int32(0))
    re_, rf = step_exact(*args), step_fast(*args)
    assert int(re_.winner_idx) == int(rf.winner_idx)
    np.testing.assert_allclose(np.asarray(rf.exec_chunk),
                               np.asarray(re_.exec_chunk),
                               rtol=0.1, atol=0.05)
