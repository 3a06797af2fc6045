"""Unit tests for the ops layer: masks, rope, norms, attention, image resize.

Where torch is available we test bit-level parity of the resize and rope
against the torch semantics the reference relies on."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cover_vla_tpu.ops import (
    make_att_2d_masks, rms_norm, layer_norm, apply_rope,
    gqa_attention, mha_attention, resize_bilinear_torch, resize_with_pad,
    sinusoidal_time_embedding, sample_beta, resize_lanczos4)

torch = pytest.importorskip("torch")


def test_make_att_2d_masks_prefix_lm():
    # [0 0 0 1 1 1]: bidirectional prefix, causal tail (big_vision docstring)
    att = jnp.asarray([[0, 0, 0, 1, 1, 1]], dtype=jnp.int32)
    pad = jnp.ones((1, 6), dtype=bool)
    m = np.asarray(make_att_2d_masks(pad, att))[0]
    # prefix tokens see the whole prefix but not the tail
    assert m[0].tolist() == [True, True, True, False, False, False]
    # tail is causal over prefix + itself
    assert m[3].tolist() == [True, True, True, True, False, False]
    assert m[5].tolist() == [True] * 6


def test_make_att_2d_masks_respects_padding():
    att = jnp.zeros((1, 4), dtype=jnp.int32)
    pad = jnp.asarray([[True, True, False, False]])
    m = np.asarray(make_att_2d_masks(pad, att))[0]
    assert not m[:, 2:].any() and not m[2:, :].any()
    assert m[:2, :2].all()


def test_suffix_att_mask_semantics():
    # state starts a block; actions form a second bidirectional block
    from cover_vla_tpu.ops import suffix_att_masks
    att = suffix_att_masks(1, 4)
    pad = jnp.ones((1, 5), dtype=bool)
    m = np.asarray(make_att_2d_masks(pad, att))[0]
    assert m[0].tolist() == [True, False, False, False, False]  # state: itself
    for i in range(1, 5):  # each action sees state + all actions
        assert m[i].tolist() == [True] * 5


def test_rope_matches_torch_reference_formula():
    """Parity with apply_rope (paligemma_with_expert.py:34-57)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 3, 16)).astype(np.float32)
    pos = rng.integers(0, 100, size=(2, 7))

    tx = torch.from_numpy(x)
    tpos = torch.from_numpy(pos)
    d_half = 8
    freq_exponents = (2.0 / 16) * torch.arange(d_half, dtype=torch.float32)
    timescale = 10_000.0 ** freq_exponents
    radians = (tpos[..., None].to(torch.float32) / timescale[None, None, :])[..., None, :]
    sin, cos = torch.sin(radians), torch.cos(radians)
    x1, x2 = tx.split(d_half, dim=-1)
    expected = torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    got = apply_rope(jnp.asarray(x), jnp.asarray(pos))
    # fp32 sin/pow argument-reduction differs slightly between XLA and torch
    # for large radians; semantics agree to ~1e-4.
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               rtol=2e-3, atol=5e-4)


def test_rms_norm_matches_gemma():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, 8)).astype(np.float32)
    w = rng.standard_normal(8).astype(np.float32) * 0.1
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    var = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
    expected = x / np.sqrt(var + 1e-6) * (1 + w)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 6, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    expected = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b),
        eps=1e-6).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_gqa_attention_matches_naive():
    """GQA with 1 KV head == per-head softmax attention with broadcast K/V."""
    rng = np.random.default_rng(3)
    b, sq, hq, d = 2, 6, 4, 8
    q = rng.standard_normal((b, sq, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, sq, 1, d)).astype(np.float32)
    v = rng.standard_normal((b, sq, 1, d)).astype(np.float32)
    mask = rng.random((b, sq, sq)) > 0.3
    mask[:, :, 0] = True  # avoid fully-masked rows

    got = np.asarray(gqa_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(mask)))

    kb = np.broadcast_to(k, (b, sq, hq, d))
    vb = np.broadcast_to(v, (b, sq, hq, d))
    scores = np.einsum("bqhd,bkhd->bhqk", q, kb) / np.sqrt(d)
    scores = np.where(mask[:, None], scores, -1e30)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bkhd->bqhd", probs, vb).reshape(b, sq, hq * d)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_matches_torch():
    """Parity with F.interpolate(mode='bilinear', align_corners=False)."""
    rng = np.random.default_rng(4)
    img = rng.random((2, 256, 256, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_torch(jnp.asarray(img), 224, 224))
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    expected = torch.nn.functional.interpolate(
        t, size=(224, 224), mode="bilinear", align_corners=False)
    expected = expected.permute(0, 2, 3, 1).numpy()
    # separable-matmul formulation accumulates in a different order than
    # torch's per-pixel lerp; fp32 agreement is ~3e-5
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_resize_with_pad_aspect_ratio():
    """Non-square input gets top/left padding (modeling_pi0.py:131-150)."""
    img = jnp.ones((1, 128, 256, 3), dtype=jnp.float32)
    out = resize_with_pad(img, 224, 224, pad_value=0.0)
    assert out.shape == (1, 224, 224, 3)
    # resized to 112x224, padded 112 rows on top
    assert float(jnp.abs(out[0, :112]).max()) == 0.0
    assert float(out[0, 112:].min()) > 0.9


def test_resize_lanczos4_identity_and_dc():
    img = jnp.asarray(np.random.default_rng(5).random((1, 64, 64, 3)),
                      dtype=jnp.float32)
    same = resize_lanczos4(img, 64, 64)
    np.testing.assert_allclose(np.asarray(same), np.asarray(img), atol=1e-5)
    # constant image stays constant under any resize (kernel normalised)
    const = jnp.full((1, 64, 64, 1), 0.5, dtype=jnp.float32)
    out = resize_lanczos4(const, 48, 48)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_sinusoidal_time_embedding_matches_reference_formula():
    time = jnp.asarray([0.0, 0.5, 1.0], dtype=jnp.float32)
    dim = 32
    got = np.asarray(sinusoidal_time_embedding(time, dim, 4e-3, 4.0))
    fraction = np.linspace(0.0, 1.0, dim // 2)
    period = 4e-3 * (4.0 / 4e-3) ** fraction
    scaling = 1.0 / period * 2 * np.pi
    sin_input = scaling[None, :] * np.asarray(time)[:, None]
    expected = np.concatenate([np.sin(sin_input), np.cos(sin_input)], axis=1)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_sample_beta_moments():
    """The reference's sample_beta (modeling_pi0.py:92-95) is the
    u1^(1/a)/(u1^(1/a)+u2^(1/b)) construction, which is NOT a true
    Beta(a,b); match its empirical distribution, not Beta moments."""
    key = jax.random.PRNGKey(0)
    s = np.asarray(sample_beta(key, 1.5, 1.0, 50_000))
    assert 0.0 <= s.min() and s.max() <= 1.0
    rng = np.random.default_rng(0)
    g1 = rng.random(500_000) ** (1 / 1.5)
    g2 = rng.random(500_000)
    ref = g1 / (g1 + g2)
    np.testing.assert_allclose(s.mean(), ref.mean(), atol=0.01)
    np.testing.assert_allclose(s.std(), ref.std(), atol=0.01)


def test_resize_bicubic_matches_pil():
    """Verifier-path bicubic == PIL Image.resize(BICUBIC) incl. PIL's
    rounded/clipped uint8 intermediate between the separable passes."""
    from PIL import Image
    from cover_vla_tpu.ops import resize_bicubic_pil
    rng = np.random.default_rng(7)
    for (src, dst) in [(64, 96), (64, 48)]:
        img = rng.integers(0, 255, (src, src, 3)).astype(np.uint8)
        ref = np.asarray(Image.fromarray(img).resize((dst, dst),
                                                     Image.BICUBIC),
                         dtype=np.float32)
        got = np.asarray(resize_bicubic_pil(
            jnp.asarray(img, jnp.float32)[None], dst, dst))[0]
        diff = np.abs(got - ref)
        # PIL quantises kernel weights to fixed point; <=2/255 on a few px
        assert diff.max() <= 2.0
        assert (diff > 1).mean() < 1e-3


def test_fast_math_toggle():
    from cover_vla_tpu.ops import attention as att
    try:
        att.set_fast_math(True)
        assert att.score_precision() == jax.lax.Precision.DEFAULT
        # attention still numerically close to the parity path
        rng = np.random.default_rng(9)
        q = jnp.asarray(rng.standard_normal((1, 4, 2, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 4, 1, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 4, 1, 8)), jnp.float32)
        m = jnp.ones((1, 4, 4), bool)
        fast = np.asarray(gqa_attention(q, k, v, m))
        att.set_fast_math(False)
        exact = np.asarray(gqa_attention(q, k, v, m))
        np.testing.assert_allclose(fast, exact, rtol=1e-2, atol=1e-2)
    finally:
        att.set_fast_math(False)


def test_lanczos4_uint8_bitexact_cv2():
    """Our fixed-point LANCZOS4 == cv2.resize(uint8, INTER_LANCZOS4)
    bit-for-bit, host and device paths (VERDICT weak #4 oracle)."""
    cv2 = pytest.importorskip("cv2")
    from cover_vla_tpu.ops.image import (
        resize_lanczos4_uint8, resize_lanczos4_uint8_device)
    rng = np.random.default_rng(0)
    cases = [(256, 256, 224, 224), (480, 640, 224, 224),
             (100, 80, 224, 224), (64, 64, 128, 128), (37, 53, 224, 224)]
    for h, w, oh, ow in cases:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LANCZOS4)
        np.testing.assert_array_equal(
            resize_lanczos4_uint8(img, oh, ow), ref, err_msg=f"host {h}x{w}")
        np.testing.assert_array_equal(
            np.asarray(resize_lanczos4_uint8_device(jnp.asarray(img),
                                                    oh, ow)),
            ref, err_msg=f"device {h}x{w}")
    # smooth content too (saturation path unexercised by pure noise)
    yy, xx = np.mgrid[0:300, 0:400]
    img = ((np.sin(yy / 9) + np.cos(xx / 13)) * 60 + 120).astype(np.uint8)
    img = img[..., None].repeat(3, -1)
    ref = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LANCZOS4)
    np.testing.assert_array_equal(resize_lanczos4_uint8(img, 224, 224), ref)


def test_lanczos4_float_matches_cv2_float():
    """Float-path resize_lanczos4 vs cv2's float32 LANCZOS4 (the geometry /
    kernel oracle; small fp accumulation differences only)."""
    cv2 = pytest.importorskip("cv2")
    from cover_vla_tpu.ops.image import resize_lanczos4
    rng = np.random.default_rng(1)
    for h, w, oh, ow in [(256, 256, 224, 224), (480, 640, 224, 224),
                         (64, 64, 128, 128)]:
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        ours = np.asarray(resize_lanczos4(img[None], oh, ow))[0]
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LANCZOS4)
        np.testing.assert_allclose(ours, ref, atol=0.05)


def test_bilinear_tf_antialias_oracle():
    """resize_bilinear_tf_antialias == tf.image.resize(BILINEAR,
    antialias=True) — the reference's verifier 256px prep
    (eval_utils.py:272-281)."""
    tf = pytest.importorskip("tensorflow")
    from cover_vla_tpu.ops.image import resize_bilinear_tf_antialias
    rng = np.random.default_rng(2)
    for h, w, oh, ow in [(480, 640, 256, 256), (512, 512, 256, 256),
                         (128, 128, 256, 256), (300, 200, 256, 256)]:
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear_tf_antialias(img[None], oh, ow))[0]
        ref = tf.image.resize(img, (oh, ow), method="bilinear",
                              antialias=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)


def test_verifier_image_chain_matches_reference_host_chain():
    """Device _verifier_image == host composition of the reference chain:
    tf bilinear-antialias 256 -> truncating uint8 cast -> PIL bicubic ->
    (x/255 - .5)/.5 (process_raw_image_to_jpg + open_clip transform)."""
    tf = pytest.importorskip("tensorflow")
    from PIL import Image
    from cover_vla_tpu.engine.verified_step import _verifier_image
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (480, 640, 3)).astype(np.uint8)
    size = 64  # tiny verifier input size

    r256 = tf.image.resize(raw.astype(np.float32), (256, 256),
                           method="bilinear", antialias=True)
    r256 = tf.cast(r256, tf.uint8).numpy()
    pil = Image.fromarray(r256).resize((size, size), Image.BICUBIC)
    ref = ((np.asarray(pil).astype(np.float32) / 255.0) - 0.5) / 0.5

    ours = np.asarray(_verifier_image(jnp.asarray(raw), size))[0]
    assert np.abs(ours - ref).max() < 0.02  # off-by-one uint8 at pass edges
    assert np.abs(ours - ref).mean() < 2e-3
