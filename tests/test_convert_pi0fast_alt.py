"""pi0-FAST converter + alternative policy wrappers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cover_vla_tpu.models import pi0fast
from cover_vla_tpu.models.pi0fast import tiny_pi0fast_config
from cover_vla_tpu.convert.pi0fast_from_torch import convert_pi0fast
from cover_vla_tpu.serving.alt_policies import (
    ScriptedPolicyWrapper, HFModelPolicyWrapper)


def test_convert_pi0fast_runs():
    cfg = tiny_pi0fast_config()
    torch.manual_seed(0)
    w, v = cfg.paligemma, cfg.vision
    sd = {}
    root = "model.pi0_paligemma."
    lm = root + "language_model.model"
    vt = root + "vision_tower.vision_model"

    def lin(name, o, i, bias=True):
        sd[name + ".weight"] = torch.randn(o, i).numpy() * 0.05
        if bias:
            sd[name + ".bias"] = torch.randn(o).numpy() * 0.02

    sd[lm + ".embed_tokens.weight"] = \
        torch.randn(w.vocab_size, w.width).numpy() * 0.02
    for i in range(w.depth):
        p = f"{lm}.layers.{i}"
        sd[p + ".input_layernorm.weight"] = np.zeros(w.width, np.float32)
        sd[p + ".post_attention_layernorm.weight"] = \
            np.zeros(w.width, np.float32)
        lin(p + ".self_attn.q_proj", w.num_heads * w.head_dim, w.width, False)
        lin(p + ".self_attn.k_proj", w.num_kv_heads * w.head_dim, w.width,
            False)
        lin(p + ".self_attn.v_proj", w.num_kv_heads * w.head_dim, w.width,
            False)
        lin(p + ".self_attn.o_proj", w.width, w.num_heads * w.head_dim, False)
        lin(p + ".mlp.gate_proj", w.mlp_dim, w.width, False)
        lin(p + ".mlp.up_proj", w.mlp_dim, w.width, False)
        lin(p + ".mlp.down_proj", w.width, w.mlp_dim, False)
    sd[lm + ".norm.weight"] = np.zeros(w.width, np.float32)

    sd[vt + ".embeddings.patch_embedding.weight"] = \
        torch.randn(v.width, 3, v.patch_size, v.patch_size).numpy() * 0.05
    sd[vt + ".embeddings.patch_embedding.bias"] = \
        torch.randn(v.width).numpy() * 0.02
    sd[vt + ".embeddings.position_embedding.weight"] = \
        torch.randn(v.num_patches, v.width).numpy() * 0.02
    for i in range(v.depth):
        p = f"{vt}.encoder.layers.{i}"
        for nm in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{nm}.weight"] = np.ones(v.width, np.float32)
            sd[f"{p}.{nm}.bias"] = np.zeros(v.width, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{p}.self_attn.{nm}", v.width, v.width)
        lin(f"{p}.mlp.fc1", v.mlp_dim, v.width)
        lin(f"{p}.mlp.fc2", v.width, v.mlp_dim)
    sd[vt + ".post_layernorm.weight"] = np.ones(v.width, np.float32)
    sd[vt + ".post_layernorm.bias"] = np.zeros(v.width, np.float32)
    lin(root + "multi_modal_projector.linear", w.width, v.width)

    params = convert_pi0fast(sd, cfg)
    rng = np.random.default_rng(0)
    s = v.image_size
    out = pi0fast.generate_action_tokens(
        params, cfg,
        jnp.asarray(rng.uniform(-1, 1, (1, 1, s, s, 3)), jnp.float32),
        jnp.ones((1, 1), bool),
        jnp.asarray(rng.integers(3, w.vocab_size, (1, 10))),
        jnp.ones((1, 10), bool))
    assert out.shape == (1, cfg.max_decoding_steps)


def test_scripted_policy_wrapper_rpc_surface():
    p = ScriptedPolicyWrapper()
    obs = {"agent": {"eef_pos": np.zeros(8)}}
    out = p.infer(obs)
    assert out["actions"].shape == (7,)
    p.reset()
    p.switch_model("anything")


def test_hf_model_wrapper_queue_and_ensemble():
    calls = {"n": 0}

    def generate(obs):
        calls["n"] += 1
        return None

    def decode(_):
        return np.tile(np.array([[0.1, 0, 0, 0, 0, 0, 0.9]]), (4, 1))

    w = HFModelPolicyWrapper(generate, decode, chunk_size=4)
    for _ in range(4):
        a = w.infer({})["actions"]
        assert a.shape == (7,)
    assert calls["n"] == 1  # one generation serves the whole chunk

    we = HFModelPolicyWrapper(generate, decode, chunk_size=4,
                              ensemble_temp=-0.8)
    a1 = we.infer({})["actions"]
    a2 = we.infer({})["actions"]
    assert a1.shape == a2.shape == (7,)
    assert calls["n"] == 3  # ensembling generates every step
