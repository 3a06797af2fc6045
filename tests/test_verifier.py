"""Verifier model tests on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cover_vla_tpu.configs import tiny_verifier_config
from cover_vla_tpu.models import verifier


CFG = tiny_verifier_config()


@pytest.fixture(scope="module")
def params():
    return verifier.init_verifier(jax.random.PRNGKey(0), CFG, num_members=2)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (1, CFG.vision.image_size,
                                            CFG.vision.image_size, 3)),
                        dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, CFG.text.vocab_size,
                                      (1, CFG.text.context_length)))
    histories = jnp.asarray(rng.uniform(-1, 1, (5, CFG.history_length,
                                                CFG.action_dim)),
                            dtype=jnp.float32)
    return image, tokens, histories


def test_score_actions_shape_and_range(params, inputs):
    image, tokens, histories = inputs
    scores = verifier.score_actions(params, CFG, image, tokens, histories)
    assert scores.shape == (5,)
    s = np.asarray(scores)
    assert np.isfinite(s).all()
    assert (np.abs(s) <= 1.0 + 1e-5).all()  # cosine similarities


def test_ensemble_mean_fuse(params, inputs):
    """Fused embedding == renormalised mean of individual member embeddings."""
    image, tokens, histories = inputs
    feats = verifier.extract_features(params, CFG, image, tokens)
    fused_it, fused_ac = verifier.ensemble_embed(params, CFG, feats, histories)

    members = [jax.tree_util.tree_map(lambda x: x[i], params["members"])
               for i in range(2)]
    it = np.mean([np.asarray(verifier.member_image_text_embed(m, CFG, feats))
                  for m in members], axis=0)
    ac = np.mean([np.asarray(verifier.member_action_embed(m, CFG, histories))
                  for m in members], axis=0)
    it = it / np.linalg.norm(it, axis=-1, keepdims=True)
    ac = ac / np.linalg.norm(ac, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(fused_it), it, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused_ac), ac, rtol=1e-4, atol=1e-5)


def test_padding_invariance(params, inputs):
    """Top-padding with -5.0 must not change the trajectory embedding."""
    image, tokens, _ = inputs
    rng = np.random.default_rng(1)
    short = rng.uniform(-1, 1, (3, 6, CFG.action_dim)).astype(np.float32)
    padded = verifier.pad_action_histories(list(short),
                                           history_len=CFG.history_length)
    assert padded.shape == (3, CFG.history_length, CFG.action_dim)
    assert (padded[:, :CFG.history_length - 6] == -5.0).all()

    member = jax.tree_util.tree_map(lambda x: x[0], params["members"])
    emb_padded = verifier.member_action_embed(member, CFG, jnp.asarray(padded))

    # Same histories padded with a DIFFERENT amount of -5 rows -> same result
    padded2 = verifier.pad_action_histories(
        [np.vstack([np.full((2, CFG.action_dim), -5.0, np.float32), s])
         for s in short], history_len=CFG.history_length)
    emb_padded2 = verifier.member_action_embed(member, CFG, jnp.asarray(padded2))
    np.testing.assert_allclose(np.asarray(emb_padded), np.asarray(emb_padded2),
                               rtol=1e-4, atol=1e-5)


def test_contrastive_logits_symmetry(params, inputs):
    _, _, _ = inputs
    rng = np.random.default_rng(2)
    b = 4
    images = jnp.asarray(rng.uniform(-1, 1, (b, CFG.vision.image_size,
                                             CFG.vision.image_size, 3)),
                         dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, CFG.text.vocab_size,
                                      (b, CFG.text.context_length)))
    hist = jnp.asarray(rng.uniform(-1, 1, (b, CFG.history_length,
                                           CFG.action_dim)), dtype=jnp.float32)
    img_logits, act_logits = verifier.contrastive_logits(
        params, CFG, images, tokens, hist)
    assert img_logits.shape == (b, b)
    np.testing.assert_allclose(np.asarray(img_logits),
                               np.asarray(act_logits).T, atol=1e-6)
