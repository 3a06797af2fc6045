"""End-to-end parity against the ACTUAL reference implementation.

Loads the reference's paligemma_with_expert.py (the numerics core of pi0)
directly from /root/reference via importlib with a stub for its
flex-attention import, builds a tiny PaliGemmaWithExpertModel, converts its
state dict with our converters, and asserts that our fused dual-transformer
forward (and the prefill+cached-decode path) reproduces the reference's
outputs. This is the strongest available evidence for action parity: the
oracle is the reference code itself, not a re-implementation.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import GemmaConfig
from cover_vla_tpu.models import gemma
from cover_vla_tpu.convert import pi0_from_torch

_REF = ("/root/reference/lerobot_custom/lerobot/common/policies/pi0/"
        "paligemma_with_expert.py")


def _load_reference_module():
    for name in ("lerobot", "lerobot.common", "lerobot.common.policies",
                 "lerobot.common.policies.pi0"):
        sys.modules.setdefault(name, types.ModuleType(name))
    fa = types.ModuleType("lerobot.common.policies.pi0.flex_attention")
    fa.flex_attention_forward = None
    sys.modules["lerobot.common.policies.pi0.flex_attention"] = fa
    spec = importlib.util.spec_from_file_location("ref_pwe", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def reference_setup():
    try:
        mod = _load_reference_module()
    except Exception as e:  # reference tree or deps unavailable
        pytest.skip(f"reference module not loadable: {e}")

    from transformers import PretrainedConfig
    from transformers.models.auto import CONFIG_MAPPING

    width, ewidth, depth, heads, kv, hd = 64, 32, 2, 4, 1, 16
    pg_cfg = CONFIG_MAPPING["paligemma"](
        _vocab_size=256, hidden_size=width, projection_dim=width,
        text_config={
            "hidden_activation": "gelu_pytorch_tanh", "hidden_size": width,
            "intermediate_size": 128, "model_type": "gemma",
            "num_attention_heads": heads, "num_hidden_layers": depth,
            "num_key_value_heads": kv, "head_dim": hd, "vocab_size": 256,
            "torch_dtype": "float32",
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 64,
            "model_type": "siglip_vision_model", "num_attention_heads": 4,
            "num_hidden_layers": 2, "patch_size": 14, "image_size": 28,
            "projection_dim": width, "torch_dtype": "float32",
            "vision_use_head": False,
        })
    ex_cfg = CONFIG_MAPPING["gemma"](
        hidden_size=ewidth, intermediate_size=64, num_hidden_layers=depth,
        num_attention_heads=heads, num_key_value_heads=kv, head_dim=hd,
        vocab_size=256, hidden_activation="gelu_pytorch_tanh",
        attention_bias=False, rms_norm_eps=1e-6, rope_theta=10000.0)

    cfg = mod.PaliGemmaWithExpertConfig.__new__(mod.PaliGemmaWithExpertConfig)
    PretrainedConfig.__init__(cfg)
    cfg.paligemma_config = pg_cfg
    cfg.gemma_expert_config = ex_cfg
    cfg.freeze_vision_encoder = True
    cfg.train_expert_only = False
    cfg.attention_implementation = "eager"
    cfg.paligemma_pretrained_path = None

    torch.manual_seed(0)
    ref = mod.PaliGemmaWithExpertModel(cfg)
    ref.train(False)  # note: the reference's train() override returns None

    our_pg = GemmaConfig(width=width, depth=depth, mlp_dim=128,
                         num_heads=heads, num_kv_heads=kv, head_dim=hd,
                         vocab_size=256)
    our_ex = GemmaConfig(width=ewidth, depth=depth, mlp_dim=64,
                         num_heads=heads, num_kv_heads=kv, head_dim=hd)

    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}

    # newer transformers: paligemma.language_model IS the GemmaModel; the
    # reference (written for 4.48) expects .language_model.model
    lm = ref.paligemma.language_model
    if not hasattr(lm, "model"):
        class _Shim(torch.nn.Module):
            def __init__(self, inner):
                super().__init__()
                self.model = inner
        # language_model is a read-only property delegating to
        # paligemma.model.language_model in newer transformers — patch there
        ref.paligemma.model.language_model = _Shim(lm)
    # locate the LM layer prefix in this transformers version
    lm_prefix = None
    for cand in ("paligemma.language_model.model",
                 "paligemma.model.language_model",
                 "paligemma.language_model"):
        if any(k.startswith(cand + ".layers.0.") for k in sd):
            lm_prefix = cand
            break
    assert lm_prefix, f"no LM prefix among {list(sd)[:5]}"
    pg_params = pi0_from_torch.convert_gemma(sd, our_pg, lm_prefix,
                                             embed=True, dtype=jnp.bfloat16)
    ex_params = pi0_from_torch.convert_gemma(sd, our_ex, "gemma_expert.model",
                                             embed=False, dtype=jnp.bfloat16)
    return mod, ref, our_pg, our_ex, pg_params, ex_params


def _mask_and_positions(pad, att):
    cumsum = np.cumsum(att, axis=1)
    att2d = cumsum[:, None, :] <= cumsum[:, :, None]
    pad2d = pad[:, None, :] & pad[:, :, None]
    mask = att2d & pad2d
    positions = np.cumsum(pad, axis=1) - 1
    return mask, positions


def test_fused_forward_matches_reference(reference_setup):
    mod, ref, our_pg, our_ex, pg_params, ex_params = reference_setup
    rng = np.random.default_rng(0)
    b, p_len, s_len = 2, 9, 5
    prefix = rng.standard_normal((b, p_len, our_pg.width)).astype(np.float32)
    suffix = rng.standard_normal((b, s_len, our_ex.width)).astype(np.float32)
    pad = np.ones((b, p_len + s_len), bool)
    pad[1, 7:p_len] = False  # ragged prefix padding
    att = np.concatenate([np.zeros((b, p_len), np.int64),
                          np.asarray([[1, 1, 0, 0, 0]] * b)], axis=1)
    mask, positions = _mask_and_positions(pad, att)

    with torch.no_grad():
        (ref_prefix, ref_suffix), _ = ref.forward(
            attention_mask=torch.from_numpy(mask),
            position_ids=torch.from_numpy(positions),
            past_key_values=None,
            inputs_embeds=[torch.from_numpy(prefix).to(torch.bfloat16),
                           torch.from_numpy(suffix).to(torch.bfloat16)],
            use_cache=False, fill_kv_cache=False)

    our_prefix, our_suffix = gemma.fused_forward(
        pg_params, ex_params, our_pg, our_ex,
        jnp.asarray(prefix), jnp.asarray(suffix),
        jnp.asarray(positions), jnp.asarray(mask))

    valid = pad[:, :p_len]
    np.testing.assert_allclose(
        np.asarray(our_prefix, np.float32)[valid],
        ref_prefix.float().numpy()[valid], rtol=0.08, atol=0.08)
    np.testing.assert_allclose(
        np.asarray(our_suffix, np.float32),
        ref_suffix.float().numpy(), rtol=0.08, atol=0.08)


def test_cached_decode_matches_reference(reference_setup):
    """prefill + cached expert decode == the reference's two-phase path
    (fill_kv_cache=True then suffix-only forward)."""
    mod, ref, our_pg, our_ex, pg_params, ex_params = reference_setup
    rng = np.random.default_rng(1)
    b, p_len, s_len = 1, 8, 5
    prefix = rng.standard_normal((b, p_len, our_pg.width)).astype(np.float32)
    suffix = rng.standard_normal((b, s_len, our_ex.width)).astype(np.float32)
    prefix_pad = np.ones((b, p_len), bool)
    att_p = np.zeros((b, p_len), np.int64)
    mask_p, pos_p = _mask_and_positions(prefix_pad, att_p)

    with torch.no_grad():
        _, kv = ref.forward(
            attention_mask=torch.from_numpy(mask_p),
            position_ids=torch.from_numpy(pos_p), past_key_values=None,
            inputs_embeds=[torch.from_numpy(prefix).to(torch.bfloat16), None],
            use_cache=True, fill_kv_cache=True)

        suffix_pad = np.ones((b, s_len), bool)
        att_s = np.asarray([[1, 1, 0, 0, 0]] * b)
        mask_s, _ = _mask_and_positions(suffix_pad, att_s)
        full_mask = np.concatenate(
            [np.broadcast_to(prefix_pad[:, None, :], (b, s_len, p_len)),
             mask_s], axis=2)
        pos_s = p_len + np.cumsum(suffix_pad, axis=1) - 1

    with torch.no_grad():
        outs, _ = ref.forward(
            attention_mask=torch.from_numpy(full_mask),
            position_ids=torch.from_numpy(pos_s), past_key_values=kv,
            inputs_embeds=[None, torch.from_numpy(suffix).to(torch.bfloat16)],
            use_cache=True, fill_kv_cache=False)
        ref_suffix = outs[1]

    _, cache = gemma.prefill(pg_params, our_pg, jnp.asarray(prefix),
                             jnp.asarray(pos_p), jnp.asarray(mask_p))
    ours = gemma.decode_shared_prefix(
        ex_params, our_ex, jnp.asarray(suffix)[:, None],
        jnp.asarray(pos_s), cache, jnp.asarray(prefix_pad),
        jnp.asarray(mask_s))[:, 0]

    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               ref_suffix.float().numpy(),
                               rtol=0.08, atol=0.08)
