"""SigLIP2 contrastive trajectory verifier + ensemble, TPU-native.

Behavioural reference:
  bridge_verifier/ensemble_eval/model.py (CrossAttentionBlock,
  TextAwareVisualExtraction, AttentionPooling),
  finetune_trajectory_bridge_ddp.py:182-421 (VLA_SigLIP2_Bridge),
  efficient_ensemble_merged.py:188-456 (ensemble scoring).

TPU-first design decisions:
  * The frozen SigLIP2 backbone runs ONCE; per-member trainable heads are a
    vmapped leading axis (the reference loops over members sequentially —
    efficient_ensemble_merged.py:396-401).
  * The ClearCLIP-style patch features are the attention-sublayer output of
    the last ViT block, returned directly by our ViT instead of captured
    via forward hooks.
  * Scoring (fuse -> similarity -> group-mean language selection -> argmax)
    is a single jitted program (see engine/verified_step.py).

Exact semantics preserved: L2 norms in fp32; CrossAttentionBlock's residual
uses the POST-norm query (model.py:33-38); trajectory encoder is a post-LN
transformer (relu FFN, ff=2*d) with top-padded histories masked where
action[..., 0] == -5.0; ensemble fusion is mean-then-renorm; inference
scores are raw cosine similarities (no logit scale).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import VerifierConfig
from cover_vla_tpu.models import siglip
from cover_vla_tpu.ops.norms import layer_norm
from cover_vla_tpu.ops.attention import mha_attention

Params = Dict[str, Any]


def _l2norm(x: jax.Array, eps: float = 0.0) -> jax.Array:
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)


def _linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    bound = fan_in ** -0.5
    kk, kb = jax.random.split(key)
    return {"kernel": jax.random.uniform(kk, (fan_in, fan_out), dtype,
                                         minval=-bound, maxval=bound),
            "bias": jax.random.uniform(kb, (fan_out,), dtype,
                                       minval=-bound, maxval=bound)}


def _linear(p, x):
    # trainable heads are fp32 in the reference; keep true-fp32 matmuls
    return jnp.matmul(x, p["kernel"],
                      precision=jax.lax.Precision.HIGHEST) + p["bias"]


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _ln(p, x, eps=1e-5):
    return layer_norm(x, p["scale"], p["bias"], eps)


def sincos_position_embedding(seq_len: int, dim: int) -> np.ndarray:
    """model.py:40-47 — [S, dim] cat(sin, cos) over 10000^(2i/dim)."""
    pos = np.arange(seq_len, dtype=np.float32)
    inv_freq = 1.0 / (10_000 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    sinusoid = np.einsum("i,j->ij", pos, inv_freq)
    return np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)


# ---------------------------------------------------------------------------
# Attention pooling (cross-attention readout)
# ---------------------------------------------------------------------------


def init_attention_pooling(key, kv_dim: int, output_dim: int, num_heads: int,
                           num_layers: int, num_readouts: int) -> Params:
    inter = output_dim // num_readouts
    keys = jax.random.split(key, 8)

    def stack(init_fn, *subkeys):
        return jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves),
            *[init_fn(k) for k in subkeys])

    lkeys = jax.random.split(keys[0], num_layers)

    def layer_init(k):
        ks = jax.random.split(k, 6)
        return {
            "q_ln": _ln_init(inter),
            "attn": {"q": _linear_init(ks[0], inter, inter),
                     "k": _linear_init(ks[1], kv_dim, inter),
                     "v": _linear_init(ks[2], kv_dim, inter),
                     "o": _linear_init(ks[3], inter, inter)},
            "ln": _ln_init(inter),
            "mlp": {"fc1": _linear_init(ks[4], inter, output_dim),
                    "fc2": _linear_init(ks[5], output_dim, inter)},
        }

    return {
        "query": jax.random.normal(keys[1], (num_readouts, inter), jnp.float32),
        "blocks": stack(layer_init, *lkeys),
        "final_ln": _ln_init(inter),
    }


def attention_pooling(p: Params, x: jax.Array, num_heads: int) -> jax.Array:
    """x: [B, T, kv_dim] -> [B, output_dim] learned-readout pool.

    Mirrors AttentionPooling.forward (model.py:100-112) incl. the
    CrossAttentionBlock residual structure (q_ln -> attn -> +res -> ln ->
    mlp -> +res).
    """
    b = x.shape[0]
    r, inter = p["query"].shape
    d = inter // num_heads
    q = jnp.broadcast_to(p["query"][None], (b, r, inter))

    def block(q, layer):
        qn = _ln(layer["q_ln"], q)
        qh = _linear(layer["attn"]["q"], qn).reshape(b, r, num_heads, d)
        kh = _linear(layer["attn"]["k"], x).reshape(b, -1, num_heads, d)
        vh = _linear(layer["attn"]["v"], x).reshape(b, -1, num_heads, d)
        attn = mha_attention(qh, kh, vh)
        attn = _linear(layer["attn"]["o"], attn)
        qn = qn + attn                       # residual on the NORMED query
        qn = _ln(layer["ln"], qn)
        y = _linear(layer["mlp"]["fc1"], qn)
        y = jax.nn.gelu(y, approximate=False)
        y = _linear(layer["mlp"]["fc2"], y)
        return qn + y, None

    q, _ = jax.lax.scan(block, q, p["blocks"])
    q = _ln(p["final_ln"], q)
    return q.reshape(b, r * inter)


# ---------------------------------------------------------------------------
# Trajectory encoder (post-LN transformer, relu FFN)
# ---------------------------------------------------------------------------


def init_traj_encoder(key, dim: int, num_layers: int) -> Params:
    def layer_init(k):
        ks = jax.random.split(k, 6)
        return {
            "attn": {"q": _linear_init(ks[0], dim, dim),
                     "k": _linear_init(ks[1], dim, dim),
                     "v": _linear_init(ks[2], dim, dim),
                     "o": _linear_init(ks[3], dim, dim)},
            "ln1": _ln_init(dim),
            "fc1": _linear_init(ks[4], dim, 2 * dim),
            "fc2": _linear_init(ks[5], 2 * dim, dim),
            "ln2": _ln_init(dim),
        }

    lkeys = jax.random.split(key, num_layers)
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls),
                                  *[layer_init(k) for k in lkeys])


def traj_encoder(p: Params, x: jax.Array, pad_mask: jax.Array,
                 num_heads: int) -> jax.Array:
    """Post-LN encoder. x: [B, H, D]; pad_mask: bool[B, H] True = PADDED."""
    b, h, dim = x.shape
    d = dim // num_heads
    attend = ~pad_mask                       # True = valid key
    attn_mask = jnp.broadcast_to(attend[:, None, :], (b, h, h))

    def block(x, layer):
        qh = _linear(layer["attn"]["q"], x).reshape(b, h, num_heads, d)
        kh = _linear(layer["attn"]["k"], x).reshape(b, h, num_heads, d)
        vh = _linear(layer["attn"]["v"], x).reshape(b, h, num_heads, d)
        a = mha_attention(qh, kh, vh, mask=attn_mask)
        a = _linear(layer["attn"]["o"], a)
        x = _ln(layer["ln1"], x + a)
        y = _linear(layer["fc2"], jax.nn.relu(_linear(layer["fc1"], x)))
        x = _ln(layer["ln2"], x + y)
        return x, None

    x, _ = jax.lax.scan(block, x, p)
    return x


# ---------------------------------------------------------------------------
# Full verifier
# ---------------------------------------------------------------------------


def init_member(key: jax.Array, cfg: VerifierConfig) -> Params:
    keys = jax.random.split(key, 6)
    d = cfg.vision_pooling_output_dim
    return {
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
        "tave_temperature": jnp.asarray(cfg.tave_temperature_init, jnp.float32),
        "text_pooling": init_attention_pooling(
            keys[0], cfg.text.embed_dim, cfg.text_pooling_output_dim,
            cfg.pooling_heads, cfg.pooling_layers, cfg.num_readouts),
        "vision_pooling": init_attention_pooling(
            keys[1], cfg.vision.width, d,
            cfg.pooling_heads, cfg.pooling_layers, cfg.num_readouts),
        "input_projection": _linear_init(keys[2], cfg.fused_dim, d),
        "action_in": _linear_init(keys[3], cfg.action_dim, d),
        "traj": init_traj_encoder(keys[4], d, cfg.traj_layers),
    }


def init_verifier(key: jax.Array, cfg: VerifierConfig,
                  num_members: int = 1) -> Params:
    kb1, kb2, km = jax.random.split(key, 3)
    member_keys = jax.random.split(km, num_members)
    members = jax.vmap(lambda k: init_member(k, cfg))(member_keys)
    return {
        "backbone": {
            "vision": siglip.init_vit(kb1, cfg.vision),
            "text": siglip.init_text_tower(kb2, cfg.text),
        },
        "members": members,
    }


class SharedFeatures(NamedTuple):
    patch: jax.Array  # [B, P, W_v] fp32, L2-normalised per token
    text: jax.Array   # [B, T, E] fp32, L2-normalised per token


def extract_features(params: Params, cfg: VerifierConfig, images: jax.Array,
                     text_tokens: jax.Array) -> SharedFeatures:
    """Frozen-backbone features (finetune...py:297-355).

    images: [B, H, W, 3] in [-1, 1]; text_tokens: int[B, T].
    Patch features are the LAST block's attention-sublayer output
    (ClearCLIP); text features are ln_final + text_projection per token.
    """
    vit_out = siglip.vit_forward(params["backbone"]["vision"], cfg.vision,
                                 images)
    patch = _l2norm(vit_out.last_attn_out.astype(jnp.float32))
    text_out = siglip.text_forward(params["backbone"]["text"], cfg.text,
                                   text_tokens)
    text = _l2norm(text_out.seq_features.astype(jnp.float32))
    return SharedFeatures(patch=patch, text=text)


def text_aware_visual_extraction(member: Params, cfg: VerifierConfig,
                                 patch: jax.Array, text: jax.Array) -> jax.Array:
    """ClearCLIP text->patch attention (model.py:50-73)."""
    temp = jnp.clip(member["tave_temperature"], 0.0, 100.0)
    sim = jnp.einsum("bij,bkj->bik", text, patch,
                     precision=jax.lax.Precision.HIGHEST) / temp
    attn = jax.nn.softmax(sim, axis=-1)
    pos = jnp.asarray(sincos_position_embedding(patch.shape[1],
                                                patch.shape[2]))
    return jnp.einsum("bik,bkj->bij", attn, patch + pos[None],
                      precision=jax.lax.Precision.HIGHEST)


def member_image_text_embed(member: Params, cfg: VerifierConfig,
                            feats: SharedFeatures) -> jax.Array:
    """One member's fused image+text embedding [B, 512], L2-normalised."""
    tave = text_aware_visual_extraction(member, cfg, feats.patch, feats.text)
    vision_token = attention_pooling(member["vision_pooling"], tave,
                                     cfg.pooling_heads)
    text_token = attention_pooling(member["text_pooling"], feats.text,
                                   cfg.pooling_heads)
    combined = jnp.concatenate([text_token, vision_token], axis=-1)
    combined = _linear(member["input_projection"], combined)
    return _l2norm(combined)


def member_action_embed(member: Params, cfg: VerifierConfig,
                        action_histories: jax.Array) -> jax.Array:
    """One member's trajectory embedding [B, 512], L2-normalised.

    action_histories: [B, H, action_dim] fp32, top-padded with -5.0.
    """
    pad = action_histories[:, :, 0] == cfg.action_padding_value
    x = _linear(member["action_in"], action_histories.astype(jnp.float32))
    x = traj_encoder(member["traj"], x, pad, cfg.traj_heads)
    valid = (~pad)[..., None].astype(jnp.float32)
    pooled = (x * valid).sum(axis=1) / jnp.clip(valid.sum(axis=1), 1e-9)
    return _l2norm(pooled)


def ensemble_embed(params: Params, cfg: VerifierConfig,
                   feats: SharedFeatures,
                   action_histories: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Fused (mean over vmapped members, re-normalised) embeddings.

    Returns (image_text [B, 512], action [Ba, 512]).
    """
    it = jax.vmap(lambda m: member_image_text_embed(m, cfg, feats)
                  )(params["members"])
    ac = jax.vmap(lambda m: member_action_embed(m, cfg, action_histories)
                  )(params["members"])
    return _l2norm(it.mean(axis=0)), _l2norm(ac.mean(axis=0))


def image_text_embed(params: Params, cfg: VerifierConfig, images: jax.Array,
                     text_tokens: jax.Array) -> jax.Array:
    """Ensemble-fused image+text embeddings [B, 512], L2-normalised — the
    scene-familiarity signal for affinity calibration (the engine's
    phase-aware deference compares this against an ID prototype,
    verified_step.py step 7b)."""
    feats = extract_features(params, cfg, images, text_tokens)
    it = jax.vmap(lambda m: member_image_text_embed(m, cfg, feats)
                  )(params["members"])
    return _l2norm(it.mean(axis=0))


def score_actions(params: Params, cfg: VerifierConfig, image: jax.Array,
                  text_tokens: jax.Array,
                  action_histories: jax.Array) -> jax.Array:
    """Cosine similarity of ONE (image, instruction) against all candidate
    trajectories — the reference's row-0 semantics
    (efficient_ensemble_merged.py:414-425). Returns [num_actions] fp32.
    """
    feats = extract_features(params, cfg, image, text_tokens)
    fused_it, fused_ac = ensemble_embed(params, cfg, feats, action_histories)
    return jnp.matmul(fused_it, fused_ac.T,
                      precision=jax.lax.Precision.HIGHEST)[0]


def contrastive_logits(params: Params, cfg: VerifierConfig,
                       images: jax.Array, text_tokens: jax.Array,
                       action_histories: jax.Array,
                       member_idx: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Training-time symmetric logits for one member
    (finetune...py:416-419): scaled by exp(logit_scale)."""
    member = jax.tree_util.tree_map(lambda x: x[member_idx], params["members"])
    feats = extract_features(params, cfg, images, text_tokens)
    it = member_image_text_embed(member, cfg, feats)
    ac = member_action_embed(member, cfg, action_histories)
    scale = jnp.exp(member["logit_scale"])
    image_logits = scale * jnp.matmul(it, ac.T,
                                      precision=jax.lax.Precision.HIGHEST)
    return image_logits, image_logits.T


def pad_action_histories(histories, history_len: int = 10,
                         pad_value: float = -5.0) -> np.ndarray:
    """Host helper: top-pad variable-length histories to [N, H, D]
    (efficient_ensemble_merged.py:378-390)."""
    out = []
    for ah in histories:
        ah = np.asarray(ah, dtype=np.float32)
        if len(ah) < history_len:
            pad = np.full((history_len - len(ah), ah.shape[1]), pad_value,
                          dtype=np.float32)
            ah = np.vstack([pad, ah])
        out.append(ah[:history_len])
    return np.stack(out)
