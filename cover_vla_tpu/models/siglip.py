"""SigLIP-family encoders: ViT vision tower + SigLIP2 text tower.

One ViT implementation serves both:
  * PaliGemma's so400m/14 vision tower (paligemma_with_expert.py:104-116,
    HF siglip_vision_model: pre-LN blocks, learned pos-emb, no CLS token,
    gelu_pytorch_tanh MLP, final post-LayerNorm, vision_use_head=False).
  * The verifier's SigLIP2 ViT-L/16-384 trunk. The verifier consumes the
    *attention-sublayer output of the last block* (ClearCLIP-style; the
    reference captures it with a forward hook on
    visual.trunk.blocks[-1].attn — finetune_trajectory_bridge_ddp.py:272-278).
    Here that tensor is simply returned (`last_attn_out`).

The text tower matches open_clip SigLIP2 custom-text: embedding + learned
positional embedding, bidirectional pre-LN transformer, ln_final, Linear
text_projection applied per token. The verifier uses the full token
sequence after ln_final+projection (finetune...py:318-330).

Layers are [depth]-stacked and scanned. Weights bf16; LayerNorm/softmax fp32.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import VitConfig, SiglipTextConfig
from cover_vla_tpu.ops.norms import layer_norm
from cover_vla_tpu.ops.attention import mha_attention
from cover_vla_tpu.ops.image import patchify

Params = Dict[str, Any]


def _dense_init(key, fan_in, *shape, dtype=jnp.bfloat16):
    scale = fan_in ** -0.5
    return (jax.random.normal(key, shape, dtype=jnp.float32) * scale
            ).astype(dtype)


def _init_block_stack(key, depth, width, mlp_dim, dtype=jnp.bfloat16) -> Params:
    keys = jax.random.split(key, 6)
    return {
        "ln1": {"scale": jnp.ones((depth, width), jnp.float32),
                "bias": jnp.zeros((depth, width), jnp.float32)},
        "attn": {
            "q": {"kernel": _dense_init(keys[0], width, depth, width, width, dtype=dtype),
                  "bias": jnp.zeros((depth, width), dtype)},
            "k": {"kernel": _dense_init(keys[1], width, depth, width, width, dtype=dtype),
                  "bias": jnp.zeros((depth, width), dtype)},
            "v": {"kernel": _dense_init(keys[2], width, depth, width, width, dtype=dtype),
                  "bias": jnp.zeros((depth, width), dtype)},
            "o": {"kernel": _dense_init(keys[3], width, depth, width, width, dtype=dtype),
                  "bias": jnp.zeros((depth, width), dtype)},
        },
        "ln2": {"scale": jnp.ones((depth, width), jnp.float32),
                "bias": jnp.zeros((depth, width), jnp.float32)},
        "mlp": {
            "fc1": {"kernel": _dense_init(keys[4], width, depth, width, mlp_dim, dtype=dtype),
                    "bias": jnp.zeros((depth, mlp_dim), dtype)},
            "fc2": {"kernel": _dense_init(keys[5], mlp_dim, depth, mlp_dim, width, dtype=dtype),
                    "bias": jnp.zeros((depth, width), dtype)},
        },
    }


class VitOutput(NamedTuple):
    tokens: jax.Array         # [B, T, W] after final post-LN
    last_attn_out: jax.Array  # [B, T, W] attn sublayer output of last block


def init_vit(key: jax.Array, cfg: VitConfig, *, dtype=jnp.bfloat16) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embed": {
            "kernel": _dense_init(k1, patch_dim, patch_dim, cfg.width, dtype=dtype),
            "bias": jnp.zeros((cfg.width,), dtype),
        },
        "pos_emb": (jax.random.normal(k2, (cfg.num_patches, cfg.width),
                                      jnp.float32) * 0.02).astype(dtype),
        "blocks": _init_block_stack(k3, cfg.depth, cfg.width, cfg.mlp_dim,
                                    dtype=dtype),
        "final_ln": {"scale": jnp.ones((cfg.width,), jnp.float32),
                     "bias": jnp.zeros((cfg.width,), jnp.float32)},
    }


def _dense_dtype(sub: Params):
    """Compute dtype for a {kernel, bias} matmul: bias dtype when the
    kernel is int8-quantized (ops/quant.quantize_vit_stack)."""
    d = sub["kernel"].dtype
    return sub["bias"].dtype if d == jnp.int8 else d


def _vmm(x: jax.Array, sub: Params, xq=None, xs=None) -> jax.Array:
    """x @ sub['kernel'] + sub['bias'], dispatching to the int8 path when
    the sub-dict carries `scale` (ops/quant._quantize_dense). Pass a
    pre-quantized (xq, xs) to share one activation quant across q/k/v."""
    s = sub.get("scale")
    if s is None:
        return x @ sub["kernel"] + sub["bias"]
    from cover_vla_tpu.ops import quant
    if xq is None:
        xq, xs = quant.quant_act(x)
    return (quant.int8_matmul(xq, xs, sub["kernel"], s,
                              out_dtype=sub["bias"].dtype) + sub["bias"])


def _block(layer: Params, h: jax.Array, num_heads: int, eps: float,
           mask: Optional[jax.Array] = None, gelu_approx: bool = True,
           attn_impl: str = "xla", fast_math: bool = False):
    """Pre-LN transformer block. Returns (h, attn_sublayer_output).

    gelu_approx: tanh-approximate GELU (HF gelu_pytorch_tanh — the
    PaliGemma SigLIP tower) vs exact erf GELU (timm/open_clip — the
    SigLIP2 verifier towers use nn.GELU)."""
    b, t, w = h.shape
    d = w // num_heads
    x = layer_norm(h, layer["ln1"]["scale"], layer["ln1"]["bias"], eps)
    x = x.astype(_dense_dtype(layer["attn"]["q"]))
    xq = xs = None
    if "scale" in layer["attn"]["q"]:  # quantize the normed input once
        from cover_vla_tpu.ops import quant
        xq, xs = quant.quant_act(x)
    q = _vmm(x, layer["attn"]["q"], xq, xs).reshape(b, t, num_heads, d)
    k = _vmm(x, layer["attn"]["k"], xq, xs).reshape(b, t, num_heads, d)
    v = _vmm(x, layer["attn"]["v"], xq, xs).reshape(b, t, num_heads, d)
    attn = mha_attention(q, k, v, mask=mask, backend=attn_impl,
                         fast_math=fast_math)
    attn_out = _vmm(attn.astype(_dense_dtype(layer["attn"]["o"])),
                    layer["attn"]["o"])
    h = h + attn_out
    y = layer_norm(h, layer["ln2"]["scale"], layer["ln2"]["bias"], eps)
    y = y.astype(_dense_dtype(layer["mlp"]["fc1"]))
    y = jax.nn.gelu(_vmm(y, layer["mlp"]["fc1"]), approximate=gelu_approx)
    y = _vmm(y, layer["mlp"]["fc2"])
    return h + y, attn_out


def vit_forward(params: Params, cfg: VitConfig, images: jax.Array) -> VitOutput:
    """images: [B, H, W, 3] in [-1, 1] float. Returns token features."""
    patches = patchify(images, cfg.patch_size).astype(
        params["patch_embed"]["kernel"].dtype)
    h = patches @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    h = h + params["pos_emb"][None]

    def body(carry, layer):
        h, _ = carry
        h, attn_out = _block(layer, h, cfg.num_heads, cfg.ln_eps,
                             gelu_approx=cfg.gelu_approx,
                             attn_impl=cfg.attn_impl,
                             fast_math=cfg.fast_math)
        return (h, attn_out), None

    (h, last_attn), _ = jax.lax.scan(body, (h, jnp.zeros_like(h)),
                                     params["blocks"])
    tokens = layer_norm(h, params["final_ln"]["scale"],
                        params["final_ln"]["bias"], cfg.ln_eps)
    return VitOutput(tokens=tokens, last_attn_out=last_attn)


# ---------------------------------------------------------------------------
# SigLIP2 text tower
# ---------------------------------------------------------------------------


class TextOutput(NamedTuple):
    seq_features: jax.Array   # [B, T, embed_dim] ln_final + projection per token
    pooled: jax.Array         # [B, embed_dim] last-token pool


def init_text_tower(key: jax.Array, cfg: SiglipTextConfig, *,
                    dtype=jnp.bfloat16) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "token_embed": (jax.random.normal(
            k1, (cfg.vocab_size, cfg.width), jnp.float32) * 0.02).astype(dtype),
        "pos_emb": (jax.random.normal(
            k2, (cfg.context_length, cfg.width), jnp.float32) * 0.01
        ).astype(dtype),
        "blocks": _init_block_stack(k3, cfg.depth, cfg.width, cfg.mlp_dim,
                                    dtype=dtype),
        "ln_final": {"scale": jnp.ones((cfg.width,), jnp.float32),
                     "bias": jnp.zeros((cfg.width,), jnp.float32)},
        "text_projection": {
            "kernel": _dense_init(k4, cfg.width, cfg.width, cfg.embed_dim,
                                  dtype=jnp.float32),
            "bias": jnp.zeros((cfg.embed_dim,), jnp.float32),
        },
    }


def text_forward(params: Params, cfg: SiglipTextConfig,
                 tokens: jax.Array) -> TextOutput:
    """tokens: int[B, T<=context_length]. Bidirectional (no causal mask)."""
    b, t = tokens.shape
    h = jnp.take(params["token_embed"], tokens, axis=0)
    h = h + params["pos_emb"][:t][None]

    def body(h, layer):
        h, _ = _block(layer, h, cfg.num_heads, cfg.ln_eps,
                      gelu_approx=cfg.gelu_approx,
                      attn_impl=cfg.attn_impl, fast_math=cfg.fast_math)
        return h, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    h = layer_norm(h, params["ln_final"]["scale"], params["ln_final"]["bias"],
                   cfg.ln_eps)
    seq = jnp.matmul(h.astype(jnp.float32),
                     params["text_projection"]["kernel"],
                     precision=jax.lax.Precision.HIGHEST) \
        + params["text_projection"]["bias"]
    return TextOutput(seq_features=seq, pooled=seq[:, -1])
