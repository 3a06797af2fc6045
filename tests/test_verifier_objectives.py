"""Unit tests for the from-scratch verifier training objectives
(training/train_verifier.py round-3 additions): joint full-tree step,
explicit-negative ranking, listwise slate ranking, and quality
regression. Each must decrease its own loss on a fixed synthetic batch
and keep the whole param tree finite."""

import numpy as np
import jax
import optax
import pytest

from cover_vla_tpu.configs import tiny_verifier_config
from cover_vla_tpu.training import train_verifier

VCFG = tiny_verifier_config()


def _batch(rng, b=6, n=4):
    h = VCFG.history_length
    return {
        "images": rng.uniform(-1, 1, (b, VCFG.vision.image_size,
                                      VCFG.vision.image_size, 3)
                              ).astype(np.float32),
        "text_tokens": rng.integers(0, VCFG.text.vocab_size,
                                    (b, VCFG.text.context_length)
                                    ).astype(np.int32),
        "cand_trajs": rng.uniform(-0.5, 0.5, (b, n, h, 7)
                                  ).astype(np.float32),
        "qualities": rng.uniform(-1, 1, (b, n)).astype(np.float32),
        "pos_traj": rng.uniform(-0.5, 0.5, (b, h, 7)).astype(np.float32),
        "neg_trajs": rng.uniform(-0.5, 0.5, (b, 3, h, 7)
                                 ).astype(np.float32),
        "action_histories": rng.uniform(-0.5, 0.5, (b, h, 7)
                                        ).astype(np.float32),
    }


def _finite(tree):
    return all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("maker,keys", [
    (train_verifier.make_full_train_step,
     ("images", "text_tokens", "action_histories")),
    (train_verifier.make_ranking_train_step,
     ("images", "text_tokens", "pos_traj", "neg_trajs")),
    (train_verifier.make_listwise_train_step,
     ("images", "text_tokens", "cand_trajs", "qualities")),
    (train_verifier.make_regression_train_step,
     ("images", "text_tokens", "cand_trajs", "qualities")),
])
def test_objective_loss_decreases(maker, keys):
    tx = optax.adam(3e-3)
    state = train_verifier.init_full_train_state(
        jax.random.PRNGKey(0), VCFG, tx, num_members=2)
    step = maker(VCFG, tx)
    rng = np.random.default_rng(0)
    batch = {k: v for k, v in _batch(rng).items() if k in keys}

    first = None
    for _ in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first, (first, float(metrics["loss"]))
    assert _finite(state.params)


def test_regression_scores_match_engine_scoring():
    """The regression objective trains the exact quantity the engine
    computes: per-member scaled-cosine scores. Cross-check one member's
    training-time scores against verifier.member_* composition."""
    import jax.numpy as jnp
    from cover_vla_tpu.models import verifier

    params = verifier.init_verifier(jax.random.PRNGKey(1), VCFG,
                                    num_members=1)
    rng = np.random.default_rng(1)
    b = _batch(rng, b=3, n=2)
    feats = verifier.extract_features(params, VCFG, jnp.asarray(b["images"]),
                                      jnp.asarray(b["text_tokens"]))
    member = jax.tree_util.tree_map(lambda x: x[0], params["members"])
    loss, metrics = train_verifier.quality_regression_loss(
        member, VCFG, feats, jnp.asarray(b["cand_trajs"]),
        jnp.asarray(b["qualities"]))
    assert np.isfinite(float(loss))
    # engine scores are RAW cosine (the reference thresholds raw cosine
    # at 0.1, efficient_ensemble_merged.py:414-447); the training
    # objectives scale by exp(logit_scale), a positive constant, so the
    # per-state ranking the engine argmaxes over is identical
    it = verifier.member_image_text_embed(member, VCFG, feats)
    ac = verifier.member_action_embed(
        member, VCFG, jnp.asarray(b["cand_trajs"][:, 0]))
    manual_cos = float(jnp.sum(it[0] * ac[0]))
    eng = np.asarray(verifier.score_actions(
        params, VCFG, jnp.asarray(b["images"][:1]),
        jnp.asarray(b["text_tokens"][:1]),
        jnp.asarray(b["cand_trajs"][0, :1])))
    np.testing.assert_allclose(eng[0], manual_cos, rtol=2e-4, atol=2e-4)
