"""Magma token-bin decode + SpatialVLA postprocess math
(reference: INT-ACT/src/experiments/policies/policy_wrapper.py:225-293,
 INT-ACT/src/experiments/env_adapters/simpler.py:229-340)."""

import numpy as np
import pytest

from cover_vla_tpu.data.stats import DatasetStatistics, FieldStats
from cover_vla_tpu.serving.alt_policies import (
    MagmaPolicyWrapper, SpatialVLAPolicyWrapper, euler_action_to_exec,
    magma_bin_centers, magma_decode_tokens, masked_denormalize_bound)

VOCAB = 50_000


def _stats(p01, p99):
    p01, p99 = np.asarray(p01, float), np.asarray(p99, float)
    return DatasetStatistics(
        action=FieldStats(mean=(p01 + p99) / 2, std=np.ones_like(p01),
                          p01=p01, p99=p99, minimum=p01, maximum=p99),
        proprio=FieldStats(mean=np.zeros(7), std=np.ones(7),
                           p01=-np.ones(7), p99=np.ones(7),
                           minimum=-np.ones(7), maximum=np.ones(7)),
        num_transitions=1, num_trajectories=1)


def test_magma_bin_centers_hand_computed():
    c = magma_bin_centers(256)
    assert len(c) == 255
    # bins = linspace(-1, 1, 256) with spacing 2/255; center i is the
    # midpoint of edges i and i+1
    np.testing.assert_allclose(c[0], -1.0 + 1.0 / 255)
    np.testing.assert_allclose(c[-1], 1.0 - 1.0 / 255)
    np.testing.assert_allclose(c[127], 0.0, atol=1e-12)  # middle bin
    np.testing.assert_allclose(np.diff(c), 2.0 / 255)


def test_magma_decode_tokens_hand_computed():
    # token id was emitted as vocab_size - k; decode indexes centers[k - 1]
    ids = np.asarray([VOCAB - 1, VOCAB - 2, VOCAB - 128, VOCAB - 254,
                      VOCAB - 255, VOCAB, VOCAB - 10_000])
    got = magma_decode_tokens(ids, VOCAB)
    c = magma_bin_centers(256)
    np.testing.assert_allclose(got[0], c[0])
    np.testing.assert_allclose(got[1], c[1])
    np.testing.assert_allclose(got[2], c[127])
    np.testing.assert_allclose(got[3], c[253])
    np.testing.assert_allclose(got[4], c[254])
    # out-of-range ids clip into the table (policy_wrapper.py:259-263)
    np.testing.assert_allclose(got[5], c[0])      # k=0 -> clip low
    np.testing.assert_allclose(got[6], c[254])    # k huge -> clip high


def test_magma_decode_slices_generation_tail():
    # a full generation ends [..., 7 action ids, EOS]; decode takes [-8:-1]
    action_ids = VOCAB - np.asarray([10, 20, 30, 40, 50, 60, 70])
    gen = np.concatenate([np.arange(32), action_ids, [2]])  # 2 = EOS
    got = magma_decode_tokens(gen, VOCAB)
    np.testing.assert_allclose(got, magma_decode_tokens(action_ids, VOCAB))


def test_masked_denormalize_bound():
    stats = _stats(p01=[-2, -2, -2, -1, -1, -1, 0],
                   p99=[2, 2, 2, 1, 1, 1, 1])
    a = np.asarray([0.5, -0.5, 0.0, 1.0, -1.0, 0.0, 0.9])
    out = masked_denormalize_bound(a, stats)
    # default mask: all dims denormalised except the gripper
    np.testing.assert_allclose(out[:3], [1.0, -1.0, 0.0])
    np.testing.assert_allclose(out[3:6], [1.0, -1.0, 0.0])
    np.testing.assert_allclose(out[6], 0.9)  # identity via mask


def test_euler_action_to_exec_gripper_and_rotation():
    from cover_vla_tpu.utils.geometry import euler2axangle
    a = np.asarray([0.01, -0.02, 0.03, 0.1, -0.2, 0.3, 0.7])
    out = euler_action_to_exec(a)
    axis, angle = euler2axangle(0.1, -0.2, 0.3)
    np.testing.assert_allclose(out[:3], a[:3])
    np.testing.assert_allclose(out[3:6], axis * angle)
    assert out[6] == 1.0                      # 0.7 > 0.5 -> open (+1)
    assert euler_action_to_exec(
        np.r_[a[:6], 0.2])[6] == -1.0         # 0.2 <= 0.5 -> close (-1)


def test_magma_wrapper_end_to_end():
    stats = _stats(p01=[-0.05] * 6 + [0.0], p99=[0.05] * 6 + [1.0])
    c = magma_bin_centers(256)
    # choose ids for known centers: mid bin -> ~0 normalised
    ids = VOCAB - np.asarray([128] * 7)
    wrapper = MagmaPolicyWrapper(lambda obs: ids, vocab_size=VOCAB,
                                 stats=stats)
    out = wrapper.infer({})["actions"]
    assert out.shape == (7,)
    # body ~ 0 after denorm of the ~0 center; gripper center c[127] ~ 0
    # which is <= 0.5 -> closed (-1)
    np.testing.assert_allclose(out[:6], np.full(6, c[127] * 0.05),
                               atol=1e-6)
    assert out[6] == -1.0


def test_spatialvla_wrapper_ensembles_without_denorm():
    # the model output is already unnormalised; the first call's ensemble
    # is the chunk's first action verbatim
    chunk = np.asarray([[0.01, 0.02, 0.03, 0.0, 0.0, 0.0, 1.0],
                        [0.04, 0.05, 0.06, 0.0, 0.0, 0.0, 0.0]])
    wrapper = SpatialVLAPolicyWrapper(lambda obs: chunk, chunk_size=2)
    out = wrapper.infer({})["actions"]
    np.testing.assert_allclose(out[:3], chunk[0, :3])
    assert out[6] == 1.0
    # second call: exp-weighted blend of prediction steps (ActionEnsembler)
    out2 = wrapper.infer({})["actions"]
    w = np.exp(-0.8 * np.arange(2))
    w = w / w.sum()
    expect = w[0] * chunk[1] + w[1] * chunk[0]
    np.testing.assert_allclose(out2[:3], expect[:3], atol=1e-9)

    # queue mode (no ensembler): plays the chunk through unchanged
    wrapper_q = SpatialVLAPolicyWrapper(lambda obs: chunk, chunk_size=2,
                                        ensemble_temp=None)
    q0 = wrapper_q.infer({})["actions"]
    q1 = wrapper_q.infer({})["actions"]
    np.testing.assert_allclose(q0[:3], chunk[0, :3])
    np.testing.assert_allclose(q1[:3], chunk[1, :3])

    with pytest.raises(NotImplementedError):
        wrapper_q.switch_model("x")


def test_magma_wrapper_drives_a_real_hf_model_end_to_end():
    """The full HF seam with an ACTUAL transformers causal-LM: a tiny
    randomly-initialised GPT-2 generates constrained action-token ids via
    `model.generate` (the reference wrapper's exact call shape,
    policy_wrapper.py:187-223), `hf_causal_generate_fn` hands the raw ids
    through, and MagmaPolicyWrapper's decode/denorm/exec chain matches a
    hand computation from those same ids."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import GPT2Config, GPT2LMHeadModel

    from cover_vla_tpu.serving.alt_policies import hf_causal_generate_fn

    vocab = 600
    torch.manual_seed(0)
    model = GPT2LMHeadModel(GPT2Config(
        vocab_size=vocab, n_positions=64, n_embd=32, n_layer=2, n_head=2,
        eos_token_id=0, pad_token_id=0)).eval()

    def build_inputs(obs):
        # stand-in "processor": prompt ids derived from the instruction
        ids = [(7 * len(obs.get("instruction", ""))) % vocab + 1, 3, 5]
        return {"input_ids": torch.tensor([ids], dtype=torch.long)}

    # constrain generation to the 255-bin action-token id range
    lo, hi = vocab - 256, vocab
    gen = hf_causal_generate_fn(model, build_inputs, max_new_tokens=8,
                                allowed_token_range=(lo, hi))
    ids = gen({"instruction": "pick up the carrot"})
    assert ids.ndim == 1 and len(ids) == 3 + 8      # prompt + generated
    assert (ids[3:] >= lo).all() and (ids[3:] < hi).all()
    # deterministic: greedy decode of the same inputs reproduces the ids
    np.testing.assert_array_equal(gen({"instruction": "pick up the carrot"}),
                                  ids)

    stats = _stats(p01=[-0.2] * 7, p99=[0.2] * 7)
    wrapper = MagmaPolicyWrapper(gen, vocab_size=vocab, stats=stats)
    out = wrapper.infer({"instruction": "pick up the carrot"})["actions"]

    # hand computation from the generated ids (policy_wrapper.py:252-268)
    norm = magma_decode_tokens(ids, vocab)
    raw = masked_denormalize_bound(norm, stats)
    expect = euler_action_to_exec(raw, binarize_gripper=True)
    np.testing.assert_allclose(out, expect, rtol=0, atol=0)
    assert out.shape == (7,) and out[6] in (-1.0, 1.0)
