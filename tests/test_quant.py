"""int8 (w8a8) serving path (`ops/quant.py` + `gemma._mm` dispatch).

The quantized mode is params-driven: `quantize_pi0_policy` transforms a
loaded tree and every existing jitted program (prefill, shared-prefix
decode, fused forward) runs off it unchanged. No reference counterpart —
a TPU-native serving capability beyond parity (v5e int8 MXU path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cover_vla_tpu.configs import tiny_pi0_config
from cover_vla_tpu.models import gemma, pi0
from cover_vla_tpu.ops import quant


def test_int8_matmul_exact_grid_points():
    """On inputs that are exactly representable (integers within ±127 of
    the scale grid), the int8 path reproduces the fp32 product exactly —
    the MXU's int32 accumulation adds no error."""
    rng = np.random.default_rng(0)
    w_int = rng.integers(-127, 128, (16, 8)).astype(np.float32)
    x_int = rng.integers(-127, 128, (4, 16)).astype(np.float32)
    wq, ws = quant.quantize_weight(jnp.asarray(w_int))
    # per-column scale = absmax/127; rescale x/w to land on grid points
    xq, xs = quant.quant_act(jnp.asarray(x_int))
    out = quant.int8_matmul(xq, xs, wq, ws, out_dtype=jnp.float32)
    # reference: dequantized operands in fp32
    x_deq = np.asarray(xq, np.float32) * np.asarray(xs)
    w_deq = np.asarray(quant.dequantize_weight(wq, ws, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), x_deq @ w_deq,
                               rtol=1e-5, atol=1e-3)


def test_weight_quant_error_bound():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 64, 48)).astype(np.float32) * 0.05
    stats = quant.quant_error_stats(w)
    # per-channel symmetric int8 on gaussian weights: ~0.2-0.5% RMS
    assert stats["rel_rms_err"] < 0.01


def test_quantize_gemma_stack_and_dispatch_shapes():
    cfg = tiny_pi0_config().expert
    params = gemma.init_gemma(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_gemma_stack(params)
    assert qparams["layers"]["q"].dtype == jnp.int8
    assert qparams["layers"]["q_scale"].dtype == jnp.float32
    assert quant.is_quantized(qparams["layers"])
    assert not quant.is_quantized(params["layers"])
    # dequantized weights sit on the original values within grid error
    deq = quant.dequantize_weight(qparams["layers"]["gate"],
                                  qparams["layers"]["gate_scale"],
                                  jnp.float32)
    orig = np.asarray(params["layers"]["gate"], np.float32)
    err = np.abs(np.asarray(deq) - orig).max()
    assert err <= np.abs(orig).max() / 127.0 + 1e-6


def test_quantized_sample_actions_close_to_bf16():
    """End-to-end pi0 best-of-N decode off a quantized tree: same program,
    params-driven dispatch; actions stay close to the bf16 path and the
    candidate ORDERING (what selection consumes) is preserved for the
    dominant dimensions."""
    cfg = tiny_pi0_config()
    params = jax.jit(lambda k: pi0.init_pi0(k, cfg))(jax.random.PRNGKey(0))
    qparams = quant.quantize_pi0_policy(params)
    assert qparams["paligemma"]["layers"]["q"].dtype == jnp.int8
    assert qparams["vision"]["blocks"]["attn"]["q"]["kernel"].dtype \
        == jnp.int8
    qp_novis = quant.quantize_pi0_policy(params, vision=False)
    assert qp_novis["vision"] is params["vision"]  # tower untouched

    rng = np.random.default_rng(3)
    v, w = cfg.vision, cfg.paligemma
    imgs = jnp.asarray(rng.uniform(-1, 1,
                                   (1, 1, v.image_size, v.image_size, 3)),
                       jnp.float32)
    toks = jnp.asarray(rng.integers(0, w.vocab_size,
                                    (1, cfg.tokenizer_max_length)))
    masks = jnp.ones((1, cfg.tokenizer_max_length), bool)
    state = jnp.zeros((1, cfg.max_state_dim), jnp.float32)

    def run(p):
        return np.asarray(pi0.sample_actions(
            p, cfg, jax.random.PRNGKey(7), imgs, jnp.ones((1, 1), bool),
            toks, masks, state, num_candidates=4), np.float32)

    a_bf = run(params)
    a_q = run(qparams)
    assert a_q.shape == a_bf.shape and np.isfinite(a_q).all()
    # same noise stream -> deviations are pure quantization error; bound
    # relative to the action scale (tiny random model, 10 Euler steps)
    rms = np.sqrt((a_bf ** 2).mean()) + 1e-9
    rel = np.abs(a_q - a_bf).max() / rms
    assert rel < 0.15, f"int8 deviation too large: rel {rel:.3f}"


def test_quantize_vit_stack_and_verifier_scores():
    """int8 ViT backbone through the verifier: scores stay close to bf16
    and the candidate ORDERING — what selection consumes — is preserved
    on well-separated candidates."""
    from cover_vla_tpu.configs import tiny_verifier_config
    from cover_vla_tpu.models import verifier
    vcfg = tiny_verifier_config()
    params = jax.jit(lambda k: verifier.init_verifier(k, vcfg,
                                                      num_members=2))(
        jax.random.PRNGKey(0))
    qparams = quant.quantize_verifier(params)
    blk = qparams["backbone"]["vision"]["blocks"]
    assert blk["attn"]["q"]["kernel"].dtype == jnp.int8
    assert blk["attn"]["q"]["scale"].dtype == jnp.float32
    assert qparams["backbone"]["text"] is params["backbone"]["text"]

    rng = np.random.default_rng(0)
    v = vcfg.vision
    img = jnp.asarray(rng.uniform(-1, 1, (1, v.image_size, v.image_size, 3)),
                      jnp.float32)
    toks = jnp.asarray(rng.integers(0, 50, (1, vcfg.text.context_length)))
    N = 4
    acts = jnp.asarray(rng.uniform(-1, 1, (N, vcfg.history_length,
                                           vcfg.action_dim)), jnp.float32)

    def scores(p):
        return np.asarray(verifier.score_actions(p, vcfg, img, toks, acts),
                          np.float32)

    s_bf, s_q = scores(params), scores(qparams)
    assert s_q.shape == s_bf.shape and np.isfinite(s_q).all()
    span = s_bf.max() - s_bf.min() + 1e-9
    assert np.abs(s_q - s_bf).max() / span < 0.25


def test_quantized_vit_forward_close():
    from cover_vla_tpu.configs import tiny_verifier_config
    from cover_vla_tpu.models import siglip
    cfg = tiny_verifier_config().vision
    params = siglip.init_vit(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_vit_stack(params)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(-1, 1, (2, cfg.image_size,
                                          cfg.image_size, 3)), jnp.float32)
    out = siglip.vit_forward(params, cfg, img)
    out_q = siglip.vit_forward(qparams, cfg, img)
    t = np.asarray(out.tokens, np.float32)
    tq = np.asarray(out_q.tokens, np.float32)
    rms = float(np.sqrt(t.var())) + 1e-9
    assert np.isfinite(tq).all()
    assert np.abs(tq - t).max() / rms < 0.25


def test_quantized_fused_forward_runs():
    """The training-style fused forward also dispatches off a quantized
    tree (serving-side scoring paths reuse it)."""
    cfg = tiny_pi0_config()
    pg = gemma.init_gemma(jax.random.PRNGKey(1), cfg.paligemma)
    ex = gemma.init_gemma(jax.random.PRNGKey(2), cfg.expert,
                          param_dtype=jnp.bfloat16)
    qpg = quant.quantize_gemma_stack(pg)
    B, P, S = 2, 6, 3
    rng = np.random.default_rng(0)
    pe = jnp.asarray(rng.standard_normal((B, P, cfg.paligemma.width)),
                     jnp.float32)
    se = jnp.asarray(rng.standard_normal((B, S, cfg.expert.width)),
                     jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(P + S), (B, P + S))
    mask = jnp.ones((B, P + S, P + S), bool)
    hp, hs = gemma.fused_forward(qpg, ex, cfg.paligemma, cfg.expert,
                                 pe, se, pos, mask)
    hp_bf, _ = gemma.fused_forward(pg, ex, cfg.paligemma, cfg.expert,
                                   pe, se, pos, mask)
    assert hp.shape == (B, P, cfg.paligemma.width)
    assert np.isfinite(np.asarray(hp, np.float32)).all()
    rms = float(np.sqrt(np.asarray(hp_bf, np.float32).var())) + 1e-9
    dev = np.abs(np.asarray(hp, np.float32)
                 - np.asarray(hp_bf, np.float32)).max()
    assert dev / rms < 0.2


def test_wrapper_quantize_survives_switch_model(tmp_path):
    """A wrapper built with quantize='int8' serves off the int8 tree and
    RE-APPLIES the transform on switch_model, so checkpoint iteration
    (base_evaluator.py:119-126) keeps the serving mode."""
    from cover_vla_tpu.convert import checkpoints
    from cover_vla_tpu.serving.policy_wrapper import Pi0PolicyWrapper
    cfg = tiny_pi0_config()
    p1 = pi0.init_pi0(jax.random.PRNGKey(0), cfg)
    p2 = pi0.init_pi0(jax.random.PRNGKey(9), cfg)
    ck2 = checkpoints.save_params(str(tmp_path / "ck2"), p2)

    w = Pi0PolicyWrapper(p1, cfg, quantize="int8")
    assert w.params["paligemma"]["layers"]["q"].dtype == jnp.int8
    w.switch_model(ck2)
    assert w.params["paligemma"]["layers"]["q"].dtype == jnp.int8
    # int8-quantized p2, not p1: the scales must have switched away from
    # p1's (exact equality vs in-memory p2 doesn't hold — the checkpoint
    # round-trip casts dtypes before quantization)
    s_after = np.asarray(
        w.params["vision"]["blocks"]["attn"]["q"]["scale"], np.float32)
    s_p1 = np.asarray(quant.quantize_pi0_policy(p1)
                      ["vision"]["blocks"]["attn"]["q"]["scale"], np.float32)
    assert np.abs(s_after - s_p1).max() > 1e-6

    rng = np.random.default_rng(0)
    eef = np.array([0.1, 0.0, 0.2, 1.0, 0.0, 0.0, 0.0, 0.6], np.float64)
    out = w.infer({
        "image": rng.integers(0, 255, (256, 256, 3), dtype=np.uint8),
        "state": {"agent": {"eef_pos": eef}},
        "task": "pick up the block"})
    assert np.isfinite(np.asarray(out["actions"])).all()
