"""Export trained verifier members to the reference's merged-ensemble .pt.

The inverse of convert/verifier_from_torch.convert_ensemble_components:
produces {"ensemble_components": [per-member module state dicts...]} in the
exact schema EfficientEnsembleMerged loads
(bridge_verifier/ensemble_eval/efficient_ensemble_merged.py:36-53,91-184),
so ensembles trained here round-trip through the torch stack and back.

Layouts: our Linear kernels are [in, out] -> torch [out, in]; attention
pooling uses nn.MultiheadAttention's kdim != embed_dim format
(separate q/k/v_proj_weight + packed in_proj_bias); the trajectory encoder
uses nn.TransformerEncoder's packed in_proj_weight.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np
import jax

from cover_vla_tpu.configs import VerifierConfig


def _np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), tree)


def _lin_t(p) -> Dict[str, np.ndarray]:
    return {"weight": np.asarray(p["kernel"]).T.astype(np.float32),
            "bias": np.asarray(p["bias"]).astype(np.float32)}


def _ln_t(p) -> Dict[str, np.ndarray]:
    return {"weight": np.asarray(p["scale"]).astype(np.float32),
            "bias": np.asarray(p["bias"]).astype(np.float32)}


def _export_attention_pooling(p, num_layers: int) -> Dict[str, np.ndarray]:
    """Our AttentionPooling params -> the torch module's state dict
    (model.py:76-112 layout)."""
    sd: Dict[str, np.ndarray] = {"query": np.asarray(p["query"], np.float32)}
    for i in range(num_layers):
        layer = jax.tree_util.tree_map(lambda x: np.asarray(x[i]),
                                       p["blocks"])
        pre = f"blocks.{i}."
        at = layer["attn"]
        sd[pre + "attention.q_proj_weight"] = at["q"]["kernel"].T
        sd[pre + "attention.k_proj_weight"] = at["k"]["kernel"].T
        sd[pre + "attention.v_proj_weight"] = at["v"]["kernel"].T
        sd[pre + "attention.in_proj_bias"] = np.concatenate(
            [at["q"]["bias"], at["k"]["bias"], at["v"]["bias"]])
        for k, v in _lin_t(at["o"]).items():
            sd[pre + "attention.out_proj." + k] = v
        for k, v in _ln_t(layer["q_ln"]).items():
            sd[pre + "q_layer_norm." + k] = v
        for k, v in _ln_t(layer["ln"]).items():
            sd[pre + "layer_norm." + k] = v
        for k, v in _lin_t(layer["mlp"]["fc1"]).items():
            sd[pre + "mlp.fc1." + k] = v
        for k, v in _lin_t(layer["mlp"]["fc2"]).items():
            sd[pre + "mlp.fc2." + k] = v
    for k, v in _ln_t(p["final_ln"]).items():
        sd["layer_norm." + k] = v
    return sd


def _export_traj_encoder(p, num_layers: int) -> Dict[str, np.ndarray]:
    """Our post-LN encoder params -> nn.TransformerEncoder state dict."""
    sd: Dict[str, np.ndarray] = {}
    for i in range(num_layers):
        layer = jax.tree_util.tree_map(lambda x: np.asarray(x[i]), p)
        pre = f"layers.{i}."
        at = layer["attn"]
        sd[pre + "self_attn.in_proj_weight"] = np.concatenate(
            [at["q"]["kernel"].T, at["k"]["kernel"].T, at["v"]["kernel"].T])
        sd[pre + "self_attn.in_proj_bias"] = np.concatenate(
            [at["q"]["bias"], at["k"]["bias"], at["v"]["bias"]])
        for k, v in _lin_t(at["o"]).items():
            sd[pre + "self_attn.out_proj." + k] = v
        for k, v in _ln_t(layer["ln1"]).items():
            sd[pre + "norm1." + k] = v
        for k, v in _ln_t(layer["ln2"]).items():
            sd[pre + "norm2." + k] = v
        for k, v in _lin_t(layer["fc1"]).items():
            sd[pre + "linear1." + k] = v
        for k, v in _lin_t(layer["fc2"]).items():
            sd[pre + "linear2." + k] = v
    return sd


def export_member(member, cfg: VerifierConfig) -> Dict[str, Any]:
    """One member's params -> one ensemble_components entry."""
    member = _np(member)
    return {
        "logit_scale": np.asarray(member["logit_scale"]).reshape(()),
        "action_padding_value": float(cfg.action_padding_value),
        "text_aware_visual_extraction": {
            "temperature": np.asarray(member["tave_temperature"]).reshape(()),
        },
        "text_pooling": _export_attention_pooling(
            member["text_pooling"], cfg.pooling_layers),
        "vision_poolings": _export_attention_pooling(
            member["vision_pooling"], cfg.pooling_layers),
        "input_projection": _lin_t(member["input_projection"]),
        "single_step_action_encoder": _lin_t(member["action_in"]),
        "trajectory_encoder": _export_traj_encoder(
            member["traj"], cfg.traj_layers),
    }


def export_ensemble_components(members, cfg: VerifierConfig
                               ) -> List[Dict[str, Any]]:
    """Vmapped members tree (leading member axis) -> components list."""
    num = len(jax.tree_util.tree_leaves(members)[0])
    return [
        export_member(
            jax.tree_util.tree_map(lambda x: x[m], members), cfg)
        for m in range(num)
    ]


def save_merged_ensemble(path: str, members, cfg: VerifierConfig,
                         metadata: Dict[str, Any] = None) -> None:
    """Write the merged .pt (torch tensors, reference loader compatible)."""
    import torch

    def to_torch(x):
        return torch.from_numpy(np.asarray(x)) if isinstance(
            x, np.ndarray) else x

    components = [
        jax.tree_util.tree_map(to_torch, c)
        for c in export_ensemble_components(members, cfg)
    ]
    payload: Dict[str, Any] = {"ensemble_components": components}
    if metadata:
        payload.update(metadata)
    torch.save(payload, path)
