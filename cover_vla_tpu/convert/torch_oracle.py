"""Load the REFERENCE torch pi0 implementation as a parity oracle.

Imports /root/reference/lerobot_custom/.../pi0/{paligemma_with_expert,
modeling_pi0}.py directly (lerobot-internal imports stubbed — no lerobot
install needed), assembles a `PI0FlowMatching` at any geometry, and loads a
lerobot-layout state dict into it. Used by the fp32 full-path parity tests
(tests/test_reference_parity.py) at tiny dims and by
scripts/full_size_ingest.py's `torch_oracle` stage at the REAL 3.24B dims:
one fp32 `sample_actions` with fixed noise on CPU, compared against the
JAX CPU path (BASELINE.md north star: fp32 action parity vs the reference
CPU path).

The reference model is intrinsically bf16 (modeling_pi0.py:534,579 hard-
cast hidden states; the constructor calls
to_bfloat16_like_physical_intelligence). `fp32_oracle=True` swaps the
module-level `torch` binding for a proxy whose `bfloat16` IS float32,
neutralising exactly those casts — a pure-fp32 run of the same graph.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from typing import Dict, Tuple

import numpy as np

REF_DIR = "/root/reference/lerobot_custom/lerobot/common/policies/pi0/"


class F32TorchProxy(types.ModuleType):
    """torch proxy whose `bfloat16` attribute is float32 (see module doc)."""

    def __init__(self):
        super().__init__("torch_f32_proxy")

    def __getattr__(self, name):
        import torch
        if name == "bfloat16":
            return torch.float32
        return getattr(torch, name)


def _stub_module(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_pi0_modules(fp32_oracle: bool) -> Tuple:
    """Import the reference paligemma_with_expert + modeling_pi0 modules
    with their lerobot-internal imports stubbed. Returns (pwe, mpi0)."""
    import torch
    from torch import nn

    for name in ("lerobot", "lerobot.common", "lerobot.common.policies",
                 "lerobot.common.policies.pi0", "lerobot.common.utils"):
        _stub_module(name)
    _stub_module("lerobot.common.constants", ACTION="action",
                 OBS_ROBOT="observation.state")

    class _Norm(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    _stub_module("lerobot.common.policies.normalize",
                 Normalize=_Norm, Unnormalize=_Norm)

    class _PTP(nn.Module):
        pass

    _stub_module("lerobot.common.policies.pretrained", PreTrainedPolicy=_PTP)
    _stub_module("lerobot.common.utils.utils",
                 get_safe_dtype=lambda dt, dev: dt)
    _stub_module("lerobot.common.policies.pi0.flex_attention",
                 flex_attention_forward=None)

    class _PI0Cfg:
        pass

    _stub_module("lerobot.common.policies.pi0.configuration_pi0",
                 PI0Config=_PI0Cfg)

    spec = importlib.util.spec_from_file_location(
        "lerobot.common.policies.pi0.paligemma_with_expert",
        REF_DIR + "paligemma_with_expert.py")
    pwe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pwe)
    sys.modules["lerobot.common.policies.pi0.paligemma_with_expert"] = pwe

    tag = "fp32" if fp32_oracle else "bf16"
    spec = importlib.util.spec_from_file_location(
        f"ref_modeling_pi0_{tag}", REF_DIR + "modeling_pi0.py")
    mpi0 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mpi0)

    if fp32_oracle:
        proxy = F32TorchProxy()
        pwe.torch = proxy
        mpi0.torch = proxy
        pwe.PaliGemmaWithExpertModel.to_bfloat16_like_physical_intelligence \
            = lambda self: None
    return pwe, mpi0


def build_reference_flow_matching(pcfg, pwe, mpi0):
    """Assemble the reference PI0FlowMatching at the geometry of a
    cover_vla_tpu Pi0Config (paligemma_with_expert.py:81-150 hard-codes
    the real one; here the HF configs are built from pcfg so the same
    code paths cover tiny test dims and the full 3.24B)."""
    import torch
    from torch import nn
    from transformers import PretrainedConfig
    from transformers.models.auto import CONFIG_MAPPING

    w, ex, v = pcfg.paligemma, pcfg.expert, pcfg.vision
    pg_cfg = CONFIG_MAPPING["paligemma"](
        _vocab_size=w.vocab_size, hidden_size=w.width,
        projection_dim=w.width,
        text_config={
            "hidden_activation": "gelu_pytorch_tanh", "hidden_size": w.width,
            "intermediate_size": w.mlp_dim, "model_type": "gemma",
            "num_attention_heads": w.num_heads,
            "num_hidden_layers": w.depth,
            "num_key_value_heads": w.num_kv_heads, "head_dim": w.head_dim,
            "vocab_size": w.vocab_size, "torch_dtype": "float32",
        },
        vision_config={
            "hidden_size": v.width, "intermediate_size": v.mlp_dim,
            "model_type": "siglip_vision_model",
            "num_attention_heads": v.num_heads,
            "num_hidden_layers": v.depth, "patch_size": v.patch_size,
            "image_size": v.image_size, "projection_dim": w.width,
            "torch_dtype": "float32", "vision_use_head": False,
        })
    ex_cfg = CONFIG_MAPPING["gemma"](
        hidden_size=ex.width, intermediate_size=ex.mlp_dim,
        num_hidden_layers=ex.depth, num_attention_heads=ex.num_heads,
        num_key_value_heads=ex.num_kv_heads, head_dim=ex.head_dim,
        vocab_size=w.vocab_size, hidden_activation="gelu_pytorch_tanh",
        attention_bias=False, rms_norm_eps=1e-6, rope_theta=10000.0)
    pwecfg = pwe.PaliGemmaWithExpertConfig.__new__(
        pwe.PaliGemmaWithExpertConfig)
    PretrainedConfig.__init__(pwecfg)
    pwecfg.paligemma_config = pg_cfg
    pwecfg.gemma_expert_config = ex_cfg
    pwecfg.freeze_vision_encoder = True
    pwecfg.train_expert_only = False
    pwecfg.attention_implementation = "eager"
    pwecfg.paligemma_pretrained_path = None

    backbone = pwe.PaliGemmaWithExpertModel(pwecfg)
    backbone.train(False)

    pw = pcfg.proj_width
    cfg_t = types.SimpleNamespace(
        chunk_size=pcfg.chunk_size, max_state_dim=pcfg.max_state_dim,
        max_action_dim=pcfg.max_action_dim, proj_width=pw,
        num_steps=pcfg.num_denoise_steps, use_cache=True)
    ref = mpi0.PI0FlowMatching.__new__(mpi0.PI0FlowMatching)
    nn.Module.__init__(ref)
    ref.config = cfg_t
    ref.paligemma_with_expert = backbone
    ref.state_proj = nn.Linear(pcfg.max_state_dim, pw)
    ref.action_in_proj = nn.Linear(pcfg.max_action_dim, pw)
    ref.action_out_proj = nn.Linear(pw, pcfg.max_action_dim)
    ref.action_time_mlp_in = nn.Linear(2 * pw, pw)
    ref.action_time_mlp_out = nn.Linear(pw, pw)
    ref.train(False)

    # newer transformers name the LM module tree without the inner `.model`
    # the reference (written for 4.48) walks — shim it for forward use
    lm = backbone.paligemma.language_model
    if not hasattr(lm, "model"):
        class _Shim(torch.nn.Module):
            def __init__(self, inner):
                super().__init__()
                self.model = inner
        backbone.paligemma.model.language_model = _Shim(lm)
    return ref


def load_lerobot_sd_into_reference(ref, sd: Dict[str, np.ndarray]) -> int:
    """Load a lerobot-layout state dict (keys 'model.*' as written by
    save_pretrained / our full_size_ingest generator) into the assembled
    reference module, adapting for transformers-version key renames.
    Returns the number of tensors loaded; raises if any model parameter
    is left uncovered."""
    import torch

    msd_keys = set(ref.state_dict().keys())
    remapped = {}
    for k, val in sd.items():
        if not k.startswith("model."):
            continue  # normalize buffers live on PI0Policy, not the model
        key = k[len("model."):]
        if key not in msd_keys:
            # Three sd layouts must land on the assembled module tree
            # (newer transformers + the `_Shim` restoring the inner
            # `.model` the reference walks):
            #   old lerobot   ...paligemma.language_model.model.layers...
            #   newer export  ...paligemma.model.language_model.layers...
            #   shimmed       ...paligemma.model.language_model.model.layers
            # Candidates are tried in order and accepted only on a hit.
            for old, new in (
                    (".paligemma.language_model.",
                     ".paligemma.model.language_model."),
                    (".paligemma.model.language_model.",
                     ".paligemma.model.language_model.model."),
                    (".paligemma.language_model.model.",
                     ".paligemma.model.language_model."),
                    (".paligemma.language_model.lm_head.",
                     ".paligemma.lm_head."),
                    (".paligemma.vision_tower.",
                     ".paligemma.model.vision_tower."),
                    (".paligemma.multi_modal_projector.",
                     ".paligemma.model.multi_modal_projector."),
            ):
                cand = key.replace(old, new)
                if cand in msd_keys:
                    key = cand
                    break
        if key in msd_keys:
            remapped[key] = torch.from_numpy(np.ascontiguousarray(val))
    missing, unexpected = ref.load_state_dict(remapped, strict=False)
    # every PARAMETER must be covered; rotary buffers etc. may be missing.
    # Real lerobot pi0 checkpoints omit heads the flow-matching graph never
    # touches (the expert is fed only projected state/action tokens and
    # read via hidden states — modeling_pi0.py:569-629,672-752): the
    # expert's embed_tokens/lm_head and the (tied) paligemma lm_head.
    param_keys = {n for n, _ in ref.named_parameters()}
    unused_by_flow_matching = {
        k for k in param_keys
        if k.endswith("lm_head.weight")
        or k.endswith("gemma_expert.model.embed_tokens.weight")}
    uncovered = param_keys - set(remapped) - unused_by_flow_matching
    if uncovered:
        raise ValueError(
            f"{len(uncovered)} reference parameters not covered by the "
            f"state dict, e.g. {sorted(uncovered)[:5]}")
    assert not unexpected, unexpected[:5]
    return len(remapped)
