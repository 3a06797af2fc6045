"""FAST tokenizer round trips + pi0-FAST generation/loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cover_vla_tpu.data.fast_tokenizer import (
    FastActionTokenizer, SimpleBPE, normalize_actions_minmax)
from cover_vla_tpu.models import pi0fast
from cover_vla_tpu.models.pi0fast import tiny_pi0fast_config


def test_fast_tokenizer_roundtrip_no_bpe():
    rng = np.random.default_rng(0)
    actions = np.clip(rng.standard_normal((3, 8, 7)) * 0.3, -1, 1)
    tok = FastActionTokenizer(scale=100.0)  # fine quantisation
    tokens = tok.encode(actions)
    decoded = tok.decode(tokens)
    np.testing.assert_allclose(decoded, actions, atol=0.02)


def test_fast_tokenizer_roundtrip_with_bpe():
    rng = np.random.default_rng(1)
    actions = np.clip(rng.standard_normal((8, 6, 7)) * 0.2, -1, 1)
    base = FastActionTokenizer(scale=20.0)
    corpus = [np.asarray(s) - 0 for s in base.encode(actions)]
    bpe = SimpleBPE(base_vocab=256).train([list(c) for c in corpus], 50)
    tok = FastActionTokenizer(scale=20.0, bpe=bpe)
    tokens = tok.encode(actions)
    # BPE compresses
    assert sum(map(len, tokens)) <= sum(map(len, base.encode(actions)))
    decoded = tok.decode(tokens)
    np.testing.assert_allclose(decoded, actions, atol=0.08)


def test_fast_relaxed_decoding_pads_and_truncates():
    tok = FastActionTokenizer(scale=10.0, time_horizon=4, action_dim=2)
    # too short -> zero-padded; too long -> truncated; both decode
    short = tok.decode([[130, 130]], time_horizon=4, action_dim=2)
    long = tok.decode([list(np.full(20, 128))], time_horizon=4, action_dim=2)
    assert short.shape == (1, 4, 2) and long.shape == (1, 4, 2)
    assert np.isfinite(short).all() and np.isfinite(long).all()


def test_normalize_minmax():
    rng = np.random.default_rng(2)
    a = rng.uniform(-3, 5, (2, 4, 3))
    n = normalize_actions_minmax(a)
    assert n.min() >= -1 - 1e-6 and n.max() <= 1 + 1e-6


def test_token_mapping_involution():
    cfg = tiny_pi0fast_config()
    t = np.arange(10)
    pg = pi0fast.act_tokens_to_paligemma(t, cfg)
    back = pi0fast.paligemma_to_act_tokens(pg, cfg)
    np.testing.assert_array_equal(back, t)


def test_build_prompts_discretisation():
    state = np.asarray([[0.0, -1.0, 0.999]])
    prompts = pi0fast.build_prompts(state, ["Pick_Up the cube"])
    assert prompts[0].startswith("Task: pick up the cube, State: ")
    assert prompts[0].endswith(";\n")
    disc = pi0fast.discretize_state(state)
    # matches torch.bucketize(right=False) - 1 semantics
    assert disc[0, 0] == 128 and disc[0, 1] == 0 and disc[0, 2] == 255


def test_generate_and_loss():
    cfg = tiny_pi0fast_config()
    params = pi0fast.init_pi0fast(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    b = 2
    s = cfg.vision.image_size
    images = jnp.asarray(rng.uniform(-1, 1, (b, 1, s, s, 3)), jnp.float32)
    img_masks = jnp.ones((b, 1), bool)
    toks = jnp.asarray(rng.integers(3, cfg.paligemma.vocab_size, (b, 12)))
    masks = jnp.asarray(np.concatenate(
        [np.ones((b, 9), bool), np.zeros((b, 3), bool)], 1))

    out = pi0fast.generate_action_tokens(params, cfg, images, img_masks,
                                         toks, masks)
    assert out.shape == (b, cfg.max_decoding_steps)
    assert out.dtype == jnp.int32
    # deterministic greedy decode
    out2 = pi0fast.generate_action_tokens(params, cfg, images, img_masks,
                                          toks, masks)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # right-padding invariance: corrupting padded prompt ids changes nothing
    toks_corrupt = toks.at[:, 9:].set(7)
    out3 = pi0fast.generate_action_tokens(params, cfg, images, img_masks,
                                          toks_corrupt, masks)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out3))

    suffix = jnp.asarray(np.concatenate(
        [np.zeros((b, 6), bool), np.ones((b, 6), bool)], 1))
    loss = pi0fast.token_ce_loss(params, cfg, images, img_masks, toks,
                                 masks, suffix)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_policy_select_action_queue():
    cfg = tiny_pi0fast_config()
    params = pi0fast.init_pi0fast(jax.random.PRNGKey(0), cfg)
    policy = pi0fast.Pi0FastPolicy(params, cfg)
    rng = np.random.default_rng(4)
    s = cfg.vision.image_size
    images = rng.uniform(-1, 1, (1, 1, s, s, 3)).astype(np.float32)
    state = rng.uniform(-1, 1, (1, 7)).astype(np.float32)
    a0 = policy.select_action(images, state, ["pick the cube"])
    assert a0.shape == (1, 7)
    # queue pops without re-running generation
    a1 = policy.select_action(images, state, ["pick the cube"])
    assert a1.shape == (1, 7)
    assert len(policy._queue) == cfg.n_action_steps - 2


def test_fast_batch_prep_and_ce_training_step(tmp_path):
    """make_fast_batch builds [prompt | FAST action tokens | eos] sequences
    with a causal suffix mask, and the CE train step reduces the loss
    (reference trains pi0fast through the same trainer,
    modeling_pi0fast.py:685-752)."""
    from cover_vla_tpu.data.tokenizer import HashTokenizer
    from cover_vla_tpu.models.pi0fast import (
        tiny_pi0fast_config, paligemma_to_act_tokens)
    from cover_vla_tpu.training import train_pi0fast
    from cover_vla_tpu.training.optim import warmup_cosine
    from cover_vla_tpu.training.train_pi0 import make_optimizer

    cfg = tiny_pi0fast_config()
    tok = HashTokenizer(cfg.paligemma.vocab_size)
    rng = np.random.default_rng(0)
    b, s = 4, cfg.vision.image_size
    frames = {
        "image": rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8),
        "state": rng.uniform(-1, 1, (b, 7)).astype(np.float32),
        "actions": rng.uniform(-0.5, 0.5, (b, cfg.chunk_size, 7)
                               ).astype(np.float32),
        "task": ["put the carrot on the plate"] * b,
    }
    batch = train_pi0fast.make_fast_batch(frames, tok, cfg)
    assert batch["tokens"].shape == (b, cfg.max_input_seq_len)
    assert batch["suffix_mask"].dtype == bool
    # suffix tokens decode back into the FAST action-token range
    for i in range(b):
        suf = batch["tokens"][i][batch["suffix_mask"][i]]
        assert suf[-1] == cfg.eos_token_id
        fast_toks = paligemma_to_act_tokens(suf[:-1].astype(np.int64), cfg)
        assert (fast_toks >= 0).all()
        # prompt and suffix spans are disjoint and contiguous
        pm, sm = batch["pad_mask"][i], batch["suffix_mask"][i]
        assert not (sm & ~pm).any()

    tx = make_optimizer(warmup_cosine(1e-3, 2, 30))
    state = train_pi0fast.init_train_state(jax.random.PRNGKey(0), cfg, tx)
    step = train_pi0fast.make_train_step(cfg, tx)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
