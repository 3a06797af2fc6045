"""pi0 model tests on a tiny config.

The load-bearing checks:
  * the shared-prefix KV decode path produces the SAME velocities as the
    fused (no-cache) training forward — validating cache, masks, positions;
  * candidates are isolated: decoding N candidates jointly == decoding each
    candidate alone.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cover_vla_tpu.configs import tiny_pi0_config
from cover_vla_tpu.models import pi0
from cover_vla_tpu.ops.masks import make_att_2d_masks, suffix_att_masks
from cover_vla_tpu.models import gemma


CFG = tiny_pi0_config()


@pytest.fixture(scope="module")
def params():
    return pi0.init_pi0(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b = 2
    images = jnp.asarray(
        rng.uniform(-1, 1, (b, 1, CFG.vision.image_size, CFG.vision.image_size, 3)),
        dtype=jnp.float32)
    img_masks = jnp.ones((b, 1), dtype=bool)
    lang_tokens = jnp.asarray(
        rng.integers(0, CFG.paligemma.vocab_size, (b, CFG.tokenizer_max_length)))
    lang_masks = jnp.asarray(
        np.concatenate([np.ones((b, 5), bool),
                        np.zeros((b, CFG.tokenizer_max_length - 5), bool)], axis=1))
    state = jnp.asarray(rng.standard_normal((b, CFG.max_state_dim)),
                        dtype=jnp.float32)
    return images, img_masks, lang_tokens, lang_masks, state


def test_sample_actions_shapes_and_determinism(params, batch):
    images, img_masks, lang_tokens, lang_masks, state = batch
    key = jax.random.PRNGKey(1)
    a1 = pi0.sample_actions(params, CFG, key, images, img_masks, lang_tokens,
                            lang_masks, state, num_candidates=3)
    a2 = pi0.sample_actions(params, CFG, key, images, img_masks, lang_tokens,
                            lang_masks, state, num_candidates=3)
    assert a1.shape == (2, 3, CFG.chunk_size, CFG.max_action_dim)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.isfinite(np.asarray(a1)).all()


def test_noise_std_changes_candidates(params, batch):
    images, img_masks, lang_tokens, lang_masks, state = batch
    key = jax.random.PRNGKey(2)
    a1 = pi0.sample_actions(params, CFG, key, images, img_masks, lang_tokens,
                            lang_masks, state, num_candidates=2, noise_std=1.0)
    a2 = pi0.sample_actions(params, CFG, key, images, img_masks, lang_tokens,
                            lang_masks, state, num_candidates=2, noise_std=0.0)
    # zero noise -> both candidates identical; nonzero -> distinct
    np.testing.assert_allclose(np.asarray(a2[:, 0]), np.asarray(a2[:, 1]),
                               atol=1e-6)
    assert np.abs(np.asarray(a1[:, 0]) - np.asarray(a1[:, 1])).max() > 1e-4


def test_decode_matches_fused_forward(params, batch):
    """denoise_step (cached shared-prefix path) == fused training forward."""
    images, img_masks, lang_tokens, lang_masks, state = batch
    b = state.shape[0]
    rng = np.random.default_rng(3)
    x_t = jnp.asarray(rng.standard_normal(
        (b, CFG.chunk_size, CFG.max_action_dim)), dtype=jnp.float32)
    t = jnp.asarray(0.7, dtype=jnp.float32)

    # Path 1: fused forward (no cache), like the training pass
    prefix = pi0.embed_prefix(params, CFG, images, img_masks, lang_tokens,
                              lang_masks)
    suffix_embs = pi0.embed_suffix(params, CFG, state, x_t,
                                   jnp.full((b,), 0.7, jnp.float32))
    suf_att = suffix_att_masks(b, CFG.chunk_size)
    suf_pad = jnp.ones((b, suffix_embs.shape[1]), dtype=bool)
    pad = jnp.concatenate([prefix.pad_masks, suf_pad], axis=1)
    att = jnp.concatenate([prefix.att_masks, suf_att], axis=1)
    mask2d = make_att_2d_masks(pad, att)
    positions = jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1
    _, suffix_out = gemma.fused_forward(
        params["paligemma"], params["expert"], CFG.paligemma, CFG.expert,
        prefix.embs, suffix_embs, positions, mask2d)
    v_fused = pi0._linear(params["action_out_proj"],
                          suffix_out[:, -CFG.chunk_size:].astype(jnp.float32))

    # Path 2: prefill + shared-prefix decode (N=1)
    cache = pi0.compute_prefix_cache(params, CFG, images, img_masks,
                                     lang_tokens, lang_masks)
    suffix_mask, dec_positions = pi0._suffix_geometry(CFG, cache.pad_masks)
    v_dec = pi0.denoise_step(params, CFG, state, cache, x_t[:, None], t,
                             suffix_mask, dec_positions)[:, 0]

    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_dec),
                               rtol=2e-2, atol=2e-2)


def test_candidate_isolation(params, batch):
    """Joint N-candidate decode == each candidate decoded alone."""
    images, img_masks, lang_tokens, lang_masks, state = batch
    b, n = state.shape[0], 3
    rng = np.random.default_rng(4)
    noise = jnp.asarray(rng.standard_normal(
        (b, n, CFG.chunk_size, CFG.max_action_dim)), dtype=jnp.float32)

    cache = pi0.compute_prefix_cache(params, CFG, images, img_masks,
                                     lang_tokens, lang_masks)
    joint = pi0.denoise_from_cache(params, CFG, state, cache, noise)
    for i in range(n):
        solo = pi0.denoise_from_cache(params, CFG, state, cache,
                                      noise[:, i:i + 1])
        np.testing.assert_allclose(np.asarray(joint[:, i]),
                                   np.asarray(solo[:, 0]),
                                   rtol=1e-3, atol=1e-3)


def test_flow_matching_loss_shape_and_finite(params, batch):
    images, img_masks, lang_tokens, lang_masks, state = batch
    b = state.shape[0]
    actions = jnp.asarray(
        np.random.default_rng(5).standard_normal(
            (b, CFG.chunk_size, CFG.max_action_dim)), dtype=jnp.float32)
    losses = pi0.flow_matching_loss(params, CFG, jax.random.PRNGKey(3),
                                    images, img_masks, lang_tokens, lang_masks,
                                    state, actions)
    assert losses.shape == (b, CFG.chunk_size, CFG.max_action_dim)
    assert np.isfinite(np.asarray(losses)).all()


def test_lang_padding_does_not_leak(params, batch):
    """Changing token ids under the padding mask must not change actions."""
    images, img_masks, lang_tokens, lang_masks, state = batch
    noise = jnp.asarray(np.random.default_rng(6).standard_normal(
        (2, 1, CFG.chunk_size, CFG.max_action_dim)), dtype=jnp.float32)

    def run(tokens):
        cache = pi0.compute_prefix_cache(params, CFG, images, img_masks,
                                         tokens, lang_masks)
        return pi0.denoise_from_cache(params, CFG, state, cache, noise)

    a1 = run(lang_tokens)
    corrupted = lang_tokens.at[:, 5:].set(7)  # padded region only
    a2 = run(corrupted)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
