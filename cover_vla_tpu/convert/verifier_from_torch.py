"""Convert the SigLIP2 verifier torch checkpoints -> cover_vla_tpu params.

Two source formats:
  * open_clip SigLIP2 backbone state dict (timm ViT trunk + custom text
    transformer) -> `convert_siglip2_backbone`.
  * the merged ensemble .pt (efficient_ensemble_merged.py:36-184):
    {"ensemble_components": [ {module_name: state_dict, ...,
     "action_padding_value": float} ], optional metadata} ->
    `convert_ensemble_components` / `convert_merged_checkpoint`.

torch Linear [out, in] -> [in, out]; packed qkv / in_proj tensors are split
into per-projection kernels; per-layer tensors stacked along [depth].
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import numpy as np
import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import VerifierConfig, VitConfig, SiglipTextConfig
from cover_vla_tpu.convert import hostmode

Array = np.ndarray
StateDict = Mapping[str, Array]


def _t(sd, key):
    return np.asarray(sd[key])


def _lin(sd, prefix):
    return {"kernel": _t(sd, prefix + ".weight").T.astype(np.float32),
            "bias": _t(sd, prefix + ".bias").astype(np.float32)}


def _ln(sd, prefix):
    return {"scale": _t(sd, prefix + ".weight").astype(np.float32),
            "bias": _t(sd, prefix + ".bias").astype(np.float32)}


def _stack(fn, depth):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs),
                                  *[fn(i) for i in range(depth)])


def _to_jnp(tree, dtype):
    # hostmode.asarray == jnp.asarray outside `hostmode.host_arrays()`
    # (the convert-once cache path writes host trees, loaders.py)
    return jax.tree_util.tree_map(
        lambda x: hostmode.asarray(x, dtype), tree)


def _precast(tree, dtype, ln_keys=("ln1", "ln2")):
    """Host-side numpy cast of a stacked block tree (weights -> `dtype`,
    layernorm leaves -> fp32) BEFORE device transfer: the numpy bf16 cast
    is ~10x faster than XLA's on this host class and halves transfer
    bytes (see pi0_from_torch._c)."""

    def cast(path, x):
        is_ln = any(getattr(k, "key", "") in ln_keys for k in path)
        want = np.dtype(jnp.float32 if is_ln else dtype)
        return hostmode.asarray(np.asarray(x).astype(want, copy=False))

    return jax.tree_util.tree_map_with_path(cast, tree)


# --------------------------------------------------------------------------
# Backbone
# --------------------------------------------------------------------------


def convert_timm_vit(sd: StateDict, cfg: VitConfig, prefix: str = "visual.trunk",
                     dtype=jnp.bfloat16) -> Dict[str, Any]:
    """timm ViT (qkv packed) -> our ViT params."""
    w = cfg.width

    def layer(i):
        p = f"{prefix}.blocks.{i}."
        qkv_w = _t(sd, p + "attn.qkv.weight")     # [3W, W]
        qkv_b = _t(sd, p + "attn.qkv.bias")
        return {
            "ln1": _ln(sd, p + "norm1"),
            "attn": {
                "q": {"kernel": qkv_w[:w].T, "bias": qkv_b[:w]},
                "k": {"kernel": qkv_w[w:2 * w].T, "bias": qkv_b[w:2 * w]},
                "v": {"kernel": qkv_w[2 * w:].T, "bias": qkv_b[2 * w:]},
                "o": _lin(sd, p + "attn.proj"),
            },
            "ln2": _ln(sd, p + "norm2"),
            "mlp": {"fc1": _lin(sd, p + "mlp.fc1"),
                    "fc2": _lin(sd, p + "mlp.fc2")},
        }

    conv_w = _t(sd, f"{prefix}.patch_embed.proj.weight")  # [W, C, k, k]
    pos = _t(sd, f"{prefix}.pos_embed")
    if pos.ndim == 3:
        pos = pos[0]

    blocks = _stack(layer, cfg.depth)

    npd = np.dtype(dtype)
    return {
        "patch_embed": {
            "kernel": hostmode.asarray(
                conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])
                .astype(npd, copy=False)),
            "bias": hostmode.asarray(
                _t(sd, f"{prefix}.patch_embed.proj.bias")
                .astype(npd, copy=False))},
        "pos_emb": hostmode.asarray(pos.astype(npd, copy=False)),
        "blocks": _precast(blocks, dtype),
        "final_ln": _to_jnp(_ln(sd, f"{prefix}.norm"), jnp.float32),
    }


def convert_openclip_text(sd: StateDict, cfg: SiglipTextConfig,
                          prefix: str = "text",
                          dtype=jnp.bfloat16) -> Dict[str, Any]:
    """open_clip custom TextTransformer (in_proj packed) -> our text tower."""
    w = cfg.width

    def layer(i):
        p = f"{prefix}.transformer.resblocks.{i}."
        in_w = _t(sd, p + "attn.in_proj_weight")
        in_b = _t(sd, p + "attn.in_proj_bias")
        return {
            "ln1": _ln(sd, p + "ln_1"),
            "attn": {
                "q": {"kernel": in_w[:w].T, "bias": in_b[:w]},
                "k": {"kernel": in_w[w:2 * w].T, "bias": in_b[w:2 * w]},
                "v": {"kernel": in_w[2 * w:].T, "bias": in_b[2 * w:]},
                "o": _lin(sd, p + "attn.out_proj"),
            },
            "ln2": _ln(sd, p + "ln_2"),
            "mlp": {"fc1": _lin(sd, p + "mlp.c_fc"),
                    "fc2": _lin(sd, p + "mlp.c_proj")},
        }

    blocks = _stack(layer, cfg.depth)

    npd = np.dtype(dtype)
    proj_w = _t(sd, f"{prefix}.text_projection.weight")
    return {
        "token_embed": hostmode.asarray(
            _t(sd, f"{prefix}.token_embedding.weight").astype(npd,
                                                              copy=False)),
        "pos_emb": hostmode.asarray(
            _t(sd, f"{prefix}.positional_embedding").astype(npd,
                                                            copy=False)),
        "blocks": _precast(blocks, dtype),
        "ln_final": _to_jnp(_ln(sd, f"{prefix}.ln_final"), jnp.float32),
        "text_projection": {
            "kernel": hostmode.asarray(proj_w.T, jnp.float32),
            "bias": hostmode.asarray(
                _t(sd, f"{prefix}.text_projection.bias"), jnp.float32)},
    }


def convert_siglip2_backbone(sd: StateDict, cfg: VerifierConfig,
                             dtype=jnp.bfloat16) -> Dict[str, Any]:
    return {"vision": convert_timm_vit(sd, cfg.vision, dtype=dtype),
            "text": convert_openclip_text(sd, cfg.text, dtype=dtype)}


# --------------------------------------------------------------------------
# Trainable heads (per ensemble member)
# --------------------------------------------------------------------------


def _convert_attention_pooling(sd: StateDict, cfg: VerifierConfig,
                               kv_dim: int) -> Dict[str, Any]:
    """AttentionPooling state dict (model.py:76-112) -> our params.

    nn.MultiheadAttention with kdim != embed_dim stores separate
    q/k/v_proj_weight plus a packed in_proj_bias.
    """
    inter = _t(sd, "query").shape[-1]

    def layer(i):
        p = f"blocks.{i}."
        ap = p + "attention."
        if ap + "q_proj_weight" in sd:
            qw = _t(sd, ap + "q_proj_weight")
            kw = _t(sd, ap + "k_proj_weight")
            vw = _t(sd, ap + "v_proj_weight")
        else:  # same-dim case: packed in_proj_weight
            in_w = _t(sd, ap + "in_proj_weight")
            qw, kw, vw = in_w[:inter], in_w[inter:2 * inter], in_w[2 * inter:]
        in_b = _t(sd, ap + "in_proj_bias")
        return {
            "q_ln": _ln(sd, p + "q_layer_norm"),
            "attn": {
                "q": {"kernel": qw.T.astype(np.float32), "bias": in_b[:inter]},
                "k": {"kernel": kw.T.astype(np.float32),
                      "bias": in_b[inter:2 * inter]},
                "v": {"kernel": vw.T.astype(np.float32),
                      "bias": in_b[2 * inter:]},
                "o": _lin(sd, ap + "out_proj"),
            },
            "ln": _ln(sd, p + "layer_norm"),
            "mlp": {"fc1": _lin(sd, p + "mlp.fc1"),
                    "fc2": _lin(sd, p + "mlp.fc2")},
        }

    return _to_jnp({
        "query": _t(sd, "query").reshape(-1, inter),
        "blocks": _stack(layer, cfg.pooling_layers),
        "final_ln": _ln(sd, "layer_norm"),
    }, jnp.float32)


def _convert_traj_encoder(sd: StateDict, cfg: VerifierConfig,
                          d: int) -> Dict[str, Any]:
    """nn.TransformerEncoder state dict -> our post-LN encoder params."""

    def layer(i):
        p = f"layers.{i}."
        in_w = _t(sd, p + "self_attn.in_proj_weight")
        in_b = _t(sd, p + "self_attn.in_proj_bias")
        return {
            "attn": {
                "q": {"kernel": in_w[:d].T, "bias": in_b[:d]},
                "k": {"kernel": in_w[d:2 * d].T, "bias": in_b[d:2 * d]},
                "v": {"kernel": in_w[2 * d:].T, "bias": in_b[2 * d:]},
                "o": _lin(sd, p + "self_attn.out_proj"),
            },
            "ln1": _ln(sd, p + "norm1"),
            "fc1": _lin(sd, p + "linear1"),
            "fc2": _lin(sd, p + "linear2"),
            "ln2": _ln(sd, p + "norm2"),
        }

    return _to_jnp(_stack(layer, cfg.traj_layers), jnp.float32)


def _lin_module(sd: StateDict) -> Dict[str, Any]:
    """A bare nn.Linear module state dict ({'weight','bias'})."""
    return {"kernel": hostmode.asarray(np.asarray(sd["weight"]).T,
                                       jnp.float32),
            "bias": hostmode.asarray(np.asarray(sd["bias"]), jnp.float32)}


def convert_member(component: Mapping[str, Any],
                   cfg: VerifierConfig) -> Dict[str, Any]:
    """One ensemble_components entry -> our member params."""
    d = cfg.vision_pooling_output_dim
    tave = component["text_aware_visual_extraction"]
    member = {
        "logit_scale": hostmode.asarray(
            np.asarray(component.get("logit_scale", cfg.logit_scale_init)
                       ).reshape(()), jnp.float32),
        "tave_temperature": hostmode.asarray(
            np.asarray(tave["temperature"]).reshape(()), jnp.float32),
        "text_pooling": _convert_attention_pooling(
            component["text_pooling"], cfg, cfg.text.embed_dim),
        "vision_pooling": _convert_attention_pooling(
            component["vision_poolings"], cfg, cfg.vision.width),
        "input_projection": _lin_module(component["input_projection"]),
        "action_in": _lin_module(component["single_step_action_encoder"]),
        "traj": _convert_traj_encoder(component["trajectory_encoder"], cfg, d),
    }
    return member


def convert_ensemble_components(components: List[Mapping[str, Any]],
                                cfg: VerifierConfig) -> Dict[str, Any]:
    members = [convert_member(c, cfg) for c in components]
    return jax.tree_util.tree_map(lambda *xs: hostmode.stack(xs), *members)


def convert_merged_checkpoint(path: str, cfg: VerifierConfig,
                              backbone_sd: StateDict = None,
                              dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Load a merged .pt and build full verifier params. The backbone state
    dict (open_clip SigLIP2) must be supplied separately when the .pt is
    weights-only (the usual published format)."""
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(tree):
        if hasattr(tree, "numpy"):
            return tree.detach().float().numpy()
        if isinstance(tree, Mapping):
            return {k: to_np(v) for k, v in tree.items()}
        return tree

    components = [to_np(c) for c in raw["ensemble_components"]]
    params: Dict[str, Any] = {
        "members": convert_ensemble_components(components, cfg)}
    if backbone_sd is not None:
        params["backbone"] = convert_siglip2_backbone(backbone_sd, cfg,
                                                      dtype=dtype)
    return params
