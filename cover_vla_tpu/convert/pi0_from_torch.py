"""Convert lerobot pi0 torch checkpoints -> cover_vla_tpu parameter trees.

Source format: the HF-hub / save_pretrained safetensors of
`PI0Policy` (lerobot_custom/.../pi0/modeling_pi0.py), with keys under
  model.paligemma_with_expert.paligemma.*   (PaliGemma-3B + SigLIP tower)
  model.paligemma_with_expert.gemma_expert.* (action expert)
  model.{state_proj,action_in_proj,action_out_proj,action_time_mlp_in,out}
  normalize_inputs / normalize_targets / unnormalize_outputs buffers.

Converters take a {name: np.ndarray} state dict (use `load_state_dict` to
read .safetensors / .pt files) so torch is only needed for file IO of .pt.

Layout notes:
  * torch Linear weights are [out, in] -> transposed to [in, out].
  * per-layer tensors are stacked along a leading [depth] axis (our layer
    scan layout).
  * conv patch embedding [W, C, kh, kw] -> [(kh kw C), W] matching
    ops.image.patchify's (row, col, channel) flattening.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp

from cover_vla_tpu.configs import Pi0Config, GemmaConfig, VitConfig
from cover_vla_tpu.convert import hostmode

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_state_dict(path: str) -> Dict[str, Array]:
    """Read a .safetensors or torch .pt/.bin file into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in raw.items()}


def _t(sd: StateDict, key: str) -> Array:
    return np.asarray(sd[key])


def _c(x: Array, dtype) -> Array:
    """Host-side dtype cast (numpy/ml_dtypes). On this class of host the
    numpy bf16 cast runs ~10x faster than XLA's, and pre-casting halves
    the bytes the subsequent stack copies and device transfer move (which
    on the axon platform ride a ~tunnel) — together this cuts the 3.24B
    convert+load severalfold."""
    return np.asarray(x).astype(np.dtype(dtype), copy=False)


def _j(x: Array, dtype) -> jnp.ndarray:
    """jnp.asarray with the cast done host-side (see _c). Under
    `hostmode.host_arrays()` the transfer is skipped and the host array
    returned as-is (convert-once cache path, loaders.py)."""
    return hostmode.asarray(_c(x, dtype))


def _linear(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"kernel": _t(sd, prefix + ".weight").T,
            "bias": _t(sd, prefix + ".bias")}


def _stack(fn, depth: int) -> Any:
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs),
                                  *[fn(i) for i in range(depth)])


# --------------------------------------------------------------------------
# Gemma decoder stack (HF naming: model.layers.N.*)
# --------------------------------------------------------------------------


def convert_gemma(sd: StateDict, cfg: GemmaConfig, prefix: str,
                  embed: bool, dtype=jnp.bfloat16) -> Dict[str, Any]:
    prefix = prefix + "." if prefix and not prefix.endswith(".") else prefix

    def layer(i: int) -> Dict[str, Array]:
        # weights pre-cast to `dtype` BEFORE the stack (see _c): the
        # transpose+cast fuse into one strided pass and the stack copies
        # half the bytes
        p = f"{prefix}layers.{i}."

        def w(name: str) -> Array:
            return _c(_t(sd, p + name).T, dtype)

        return {
            "input_ln": _c(_t(sd, p + "input_layernorm.weight"),
                           jnp.float32),
            "q": w("self_attn.q_proj.weight"),
            "k": w("self_attn.k_proj.weight"),
            "v": w("self_attn.v_proj.weight"),
            "o": w("self_attn.o_proj.weight"),
            "post_ln": _c(_t(sd, p + "post_attention_layernorm.weight"),
                          jnp.float32),
            "gate": w("mlp.gate_proj.weight"),
            "up": w("mlp.up_proj.weight"),
            "down": w("mlp.down_proj.weight"),
        }

    layers = _stack(layer, cfg.depth)
    out = {
        "layers": {k: hostmode.asarray(v) for k, v in layers.items()},
        "final_norm": _j(_t(sd, f"{prefix}norm.weight"), jnp.float32),
    }
    if embed:
        out["embed"] = _j(_t(sd, f"{prefix}embed_tokens.weight"), dtype)
    return out


# --------------------------------------------------------------------------
# SigLIP vision tower (HF naming: vision_model.*)
# --------------------------------------------------------------------------


def convert_siglip_vision(sd: StateDict, cfg: VitConfig, prefix: str,
                          dtype=jnp.bfloat16) -> Dict[str, Any]:
    p = prefix + ".embeddings."
    conv_w = _t(sd, p + "patch_embedding.weight")      # [W, C, kh, kw]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])

    def layer(i: int) -> Dict[str, Any]:
        # pre-cast per leaf (ln in fp32, weights in `dtype`) before the
        # stack — see _c
        q = f"{prefix}.encoder.layers.{i}."

        def lin(name: str) -> Dict[str, Array]:
            return {"kernel": _c(_t(sd, q + name + ".weight").T, dtype),
                    "bias": _c(_t(sd, q + name + ".bias"), dtype)}

        def ln(name: str) -> Dict[str, Array]:
            return {"scale": _c(_t(sd, q + name + ".weight"), jnp.float32),
                    "bias": _c(_t(sd, q + name + ".bias"), jnp.float32)}

        return {
            "ln1": ln("layer_norm1"),
            "attn": {"q": lin("self_attn.q_proj"),
                     "k": lin("self_attn.k_proj"),
                     "v": lin("self_attn.v_proj"),
                     "o": lin("self_attn.out_proj")},
            "ln2": ln("layer_norm2"),
            "mlp": {"fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")},
        }

    import jax
    layers = _stack(layer, cfg.depth)

    return {
        "patch_embed": {"kernel": _j(patch_kernel, dtype),
                        "bias": _j(_t(sd, p + "patch_embedding.bias"),
                                   dtype)},
        "pos_emb": _j(_t(sd, p + "position_embedding.weight"), dtype),
        "blocks": jax.tree_util.tree_map(hostmode.asarray, layers),
        "final_ln": {
            "scale": _j(_t(sd, prefix + ".post_layernorm.weight"),
                        jnp.float32),
            "bias": _j(_t(sd, prefix + ".post_layernorm.bias"),
                       jnp.float32)},
    }


# --------------------------------------------------------------------------
# Full pi0 policy
# --------------------------------------------------------------------------

_PI0_ROOT = "model.paligemma_with_expert."


def convert_pi0(sd: StateDict, cfg: Pi0Config,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Full PI0Policy state dict -> our parameter tree.

    Handles both the lerobot layout (model.paligemma_with_expert...) and a
    bare PaliGemmaWithExpertModel layout (auto-detected by key prefix).
    """
    keys = list(sd.keys())
    root = _PI0_ROOT if any(k.startswith(_PI0_ROOT) for k in keys) else ""
    pali = root + "paligemma."
    # transformers renamed language_model paths across versions
    lm_prefix = None
    for cand in (pali + "language_model.model", pali + "model.language_model",
                 pali + "language_model"):
        if any(k.startswith(cand + ".layers.0.") for k in keys):
            lm_prefix = cand
            break
    if lm_prefix is None:
        raise KeyError("could not locate PaliGemma language model layers")
    vt_prefix = None
    for cand in (pali + "vision_tower.vision_model",
                 pali + "model.vision_tower.vision_model"):
        if any(k.startswith(cand) for k in keys):
            vt_prefix = cand
            break
    mm_prefix = pali + ("multi_modal_projector"
                        if pali + "multi_modal_projector.linear.weight"
                        in sd or pali + "multi_modal_projector.weight" in sd
                        else "model.multi_modal_projector")
    mm_key = mm_prefix + (".linear" if mm_prefix + ".linear.weight" in sd
                          else "")

    def proj(name):
        return {"kernel": _j(_t(sd, f"model.{name}.weight").T, jnp.float32),
                "bias": _j(_t(sd, f"model.{name}.bias"), jnp.float32)}

    return {
        "vision": convert_siglip_vision(sd, cfg.vision, vt_prefix, dtype),
        "mm_proj": {"kernel": _j(_t(sd, mm_key + ".weight").T, jnp.float32),
                    "bias": _j(_t(sd, mm_key + ".bias"), jnp.float32)},
        "paligemma": convert_gemma(sd, cfg.paligemma, lm_prefix, embed=True,
                                   dtype=dtype),
        "expert": convert_gemma(
            sd, cfg.expert, root + "gemma_expert.model", embed=False,
            dtype=dtype),
        "state_proj": proj("state_proj"),
        "action_in_proj": proj("action_in_proj"),
        "action_out_proj": proj("action_out_proj"),
        "time_mlp_in": proj("action_time_mlp_in"),
        "time_mlp_out": proj("action_time_mlp_out"),
    }


def extract_norm_stats(sd: StateDict) -> Optional[Dict[str, Dict[str, Array]]]:
    """Pull the lerobot Normalize/Unnormalize buffers if present."""
    out: Dict[str, Dict[str, Array]] = {}
    pat = re.compile(
        r"(normalize_inputs|normalize_targets|unnormalize_outputs)"
        r"\.buffer_(.+)\.(mean|std|min|max)")
    for k, v in sd.items():
        m = pat.fullmatch(k)
        if m:
            out.setdefault(f"{m.group(1)}.{m.group(2)}", {})[m.group(3)] = \
                np.asarray(v)
    return out or None
