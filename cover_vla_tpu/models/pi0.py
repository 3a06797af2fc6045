"""pi0 flow-matching VLA policy, TPU-native.

Behavioural reference: lerobot_custom/.../pi0/modeling_pi0.py:449-752.
Differences by design (TPU-first):
  * The 10-step Euler integration is a `lax.scan` over a precomputed time
    grid, entirely on-device.
  * `sample_actions` supports a candidate axis N with a *shared* prefix:
    the PaliGemma prefill runs once per batch row and all N candidates
    decode against the same HBM-resident KV cache (the reference replicates
    the identical prefix B=N*K times — run_simpler_eval_with_openpi.py:312).
  * Image/language embedding scalings mirror the reference's exact
    sequence: HF get_image_features divides the multi-modal-projector
    output by sqrt(width); the pi0 code then rounds through
    `compute_dtype` (hard bf16 cast, modeling_pi0.py:534) and multiplies
    sqrt(width) back in that dtype; language embeddings are scaled by
    sqrt(width) in embedding dtype (modeling_pi0.py:538-553).

Numerics: fp32 projections (state/action/time MLP, action_out_proj), bf16
transformer, fp32 RoPE/softmax — matching the reference dtype map
(paligemma_with_expert.py:216-227).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import Pi0Config
from cover_vla_tpu.models import gemma, siglip
from cover_vla_tpu.ops.masks import (make_att_2d_masks, suffix_att_masks)
from cover_vla_tpu.ops.sampling import (
    sinusoidal_time_embedding, sample_noise, sample_flow_time)

Params = Dict[str, Any]


def _linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    bound = fan_in ** -0.5
    kk, kb = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(kk, (fan_in, fan_out), dtype,
                                     minval=-bound, maxval=bound),
        "bias": jax.random.uniform(kb, (fan_out,), dtype,
                                   minval=-bound, maxval=bound),
    }


def _linear(p, x):
    # fp32 projections must run at true fp32 (reference keeps them float32)
    return jnp.matmul(x, p["kernel"],
                      precision=jax.lax.Precision.HIGHEST) + p["bias"]


def init_pi0(key: jax.Array, cfg: Pi0Config) -> Params:
    keys = jax.random.split(key, 9)
    w = cfg.proj_width
    return {
        "vision": siglip.init_vit(keys[0], cfg.vision),
        "mm_proj": _linear_init(keys[1], cfg.vision.width, cfg.paligemma.width,
                                dtype=jnp.float32),
        "paligemma": gemma.init_gemma(keys[2], cfg.paligemma),
        "expert": gemma.init_gemma(keys[3], cfg.expert),
        # fp32 projections (modeling_pi0.py:489-494)
        "state_proj": _linear_init(keys[4], cfg.max_state_dim, w),
        "action_in_proj": _linear_init(keys[5], cfg.max_action_dim, w),
        "action_out_proj": _linear_init(keys[6], w, cfg.max_action_dim),
        "time_mlp_in": _linear_init(keys[7], 2 * w, w),
        "time_mlp_out": _linear_init(keys[8], w, w),
    }


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


class Prefix(NamedTuple):
    embs: jax.Array       # [B, P, W_pg] bf16
    pad_masks: jax.Array  # bool[B, P]
    att_masks: jax.Array  # int[B, P]


def embed_prefix(params: Params, cfg: Pi0Config, images: jax.Array,
                 img_masks: jax.Array, lang_tokens: jax.Array,
                 lang_masks: jax.Array) -> Prefix:
    """images: [Bi, num_images, H, W, 3] in [-1,1]; img_masks: bool[B, num_images];
    lang_tokens: int[B, T]; lang_masks: bool[B, T].

    TPU-first prompt sharing: if Bi == 1 and the language batch B > 1 (K
    rephrased prompts over ONE observation — the CoVer loop), the vision
    tower runs once and its tokens are broadcast across the prompt rows
    (the reference replicates the image B times —
    run_simpler_eval_with_openpi.py:312).
    """
    cdt = jnp.dtype(cfg.compute_dtype)
    b = lang_tokens.shape[0]
    bi, n_img = images.shape[:2]
    flat = images.reshape((bi * n_img,) + images.shape[2:])
    vit_out = siglip.vit_forward(params["vision"], cfg.vision, flat)
    # Exact reference scale/cast sequence (see module doc): project, divide
    # by sqrt(W) (get_image_features), round through compute_dtype, multiply
    # sqrt(W) back in that dtype (modeling_pi0.py:534-540).
    w_sqrt = cfg.paligemma.width ** 0.5
    img_emb = _linear(params["mm_proj"],
                      vit_out.tokens.astype(jnp.float32)) / w_sqrt
    img_emb = img_emb.astype(cdt) * jnp.asarray(w_sqrt, cdt)
    img_emb = img_emb.reshape(bi, n_img * cfg.vision.num_patches, -1)
    if bi == 1 and b > 1:
        img_emb = jnp.broadcast_to(img_emb, (b,) + img_emb.shape[1:])
        img_masks = jnp.broadcast_to(img_masks, (b, n_img))

    lang_emb = gemma.embed_tokens(params["paligemma"], lang_tokens)
    lang_emb = lang_emb * jnp.asarray(cfg.paligemma.width ** 0.5,
                                      dtype=lang_emb.dtype)

    embs = jnp.concatenate([img_emb, lang_emb.astype(cdt)], axis=1)
    img_pad = jnp.repeat(img_masks, cfg.vision.num_patches, axis=1)
    pad = jnp.concatenate([img_pad, lang_masks], axis=1)
    att = jnp.zeros((b, embs.shape[1]), dtype=jnp.int32)
    return Prefix(embs, pad, att)


def embed_suffix(params: Params, cfg: Pi0Config, state: jax.Array,
                 noisy_actions: jax.Array, timestep: jax.Array) -> jax.Array:
    """Suffix token embeddings (modeling_pi0.py:569-629).

    state: [B, max_state_dim] fp32; noisy_actions: [..., chunk, max_action_dim]
    fp32 (may carry a candidate axis); timestep: broadcastable to the leading
    dims of noisy_actions. Returns [..., 1 + chunk, proj_width] fp32.
    """
    cdt = jnp.dtype(cfg.compute_dtype)
    lead = noisy_actions.shape[:-2]
    # state embedding rounds through compute_dtype (modeling_pi0.py:579);
    # the torch.cat with the fp32 action/time embeddings promotes it back
    state_emb = _linear(params["state_proj"], state.astype(jnp.float32))
    state_emb = state_emb.astype(cdt).astype(jnp.float32)
    state_emb = jnp.broadcast_to(
        state_emb.reshape(state.shape[0], *([1] * (len(lead) - 1)), 1, -1),
        lead + (1, cfg.proj_width))

    t_flat = jnp.broadcast_to(timestep, lead).reshape(-1)
    time_emb = sinusoidal_time_embedding(
        t_flat, cfg.proj_width, cfg.time_min_period, cfg.time_max_period)
    # the reference casts the time embedding to the state embedding's dtype
    # (modeling_pi0.py:600) before the fp32 action/time concat
    time_emb = time_emb.astype(cdt).astype(jnp.float32)
    time_emb = time_emb.reshape(lead + (1, cfg.proj_width))
    time_emb = jnp.broadcast_to(time_emb, lead + (cfg.chunk_size, cfg.proj_width))

    action_emb = _linear(params["action_in_proj"],
                         noisy_actions.astype(jnp.float32))
    x = jnp.concatenate([action_emb, time_emb], axis=-1)
    x = jax.nn.silu(_linear(params["time_mlp_in"], x))
    action_time_emb = _linear(params["time_mlp_out"], x)

    return jnp.concatenate([state_emb, action_time_emb], axis=-2)


# ---------------------------------------------------------------------------
# Training forward
# ---------------------------------------------------------------------------


def flow_matching_loss(params: Params, cfg: Pi0Config, key: jax.Array,
                       images, img_masks, lang_tokens, lang_masks,
                       state, actions,
                       noise: Optional[jax.Array] = None,
                       time: Optional[jax.Array] = None,
                       remat: bool = True) -> jax.Array:
    """Per-element MSE losses [B, chunk, max_action_dim] (modeling_pi0.py:631-670).

    remat: rematerialise transformer layers in the backward pass (activation
    memory ~1/depth at ~33% extra forward FLOPs) — the jax.checkpoint
    equivalent of the memory tricks the reference leans on (bf16 AMP +
    8-bit optimizer)."""
    b = actions.shape[0]
    k_noise, k_time = jax.random.split(key)
    if noise is None:
        noise = sample_noise(k_noise, actions.shape)
    if time is None:
        time = sample_flow_time(k_time, b)

    t = time[:, None, None]
    x_t = t * noise + (1 - t) * actions
    u_t = noise - actions

    prefix = embed_prefix(params, cfg, images, img_masks, lang_tokens, lang_masks)
    suffix_embs = embed_suffix(params, cfg, state, x_t, time)
    suf_att = suffix_att_masks(b, cfg.chunk_size)
    suf_pad = jnp.ones((b, suffix_embs.shape[1]), dtype=bool)

    pad = jnp.concatenate([prefix.pad_masks, suf_pad], axis=1)
    att = jnp.concatenate([prefix.att_masks, suf_att], axis=1)
    mask2d = make_att_2d_masks(pad, att)
    positions = jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1

    _, suffix_out = gemma.fused_forward(
        params["paligemma"], params["expert"], cfg.paligemma, cfg.expert,
        prefix.embs, suffix_embs, positions, mask2d, remat=remat)
    suffix_out = suffix_out[:, -cfg.chunk_size:].astype(jnp.float32)
    v_t = _linear(params["action_out_proj"], suffix_out)
    return jnp.square(u_t - v_t)


# ---------------------------------------------------------------------------
# Inference: shared prefill + Euler integration over N candidates
# ---------------------------------------------------------------------------


class PrefixCache(NamedTuple):
    cache: Params          # {"k","v"}: [L, B, P, Hkv, D]
    pad_masks: jax.Array   # bool[B, P]
    hidden: Optional[jax.Array] = None  # [B, P, W] if requested (pi0-FAST)


def compute_prefix_cache(params: Params, cfg: Pi0Config, images, img_masks,
                         lang_tokens, lang_masks,
                         return_hidden: bool = False) -> PrefixCache:
    prefix = embed_prefix(params, cfg, images, img_masks, lang_tokens, lang_masks)
    mask2d = make_att_2d_masks(prefix.pad_masks, prefix.att_masks)
    positions = jnp.cumsum(prefix.pad_masks.astype(jnp.int32), axis=1) - 1
    hidden, cache = gemma.prefill(params["paligemma"], cfg.paligemma,
                                  prefix.embs, positions, mask2d,
                                  return_hidden=return_hidden,
                                  attn_impl=cfg.attention_impl,
                                  fast_math=cfg.fast_math)
    return PrefixCache(cache=cache, pad_masks=prefix.pad_masks, hidden=hidden)


def _suffix_geometry(cfg: Pi0Config, prefix_pad: jax.Array):
    """Suffix attention mask + RoPE positions, identical for every Euler step."""
    b = prefix_pad.shape[0]
    s = cfg.suffix_len
    att = suffix_att_masks(b, cfg.chunk_size)
    pad = jnp.ones((b, s), dtype=bool)
    mask = make_att_2d_masks(pad, att)                     # [B, S, S]
    offset = jnp.sum(prefix_pad.astype(jnp.int32), axis=1)[:, None]
    positions = offset + jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1
    return mask, positions


def denoise_step(params: Params, cfg: Pi0Config, state: jax.Array,
                 prefix: PrefixCache, x_t: jax.Array, time: jax.Array,
                 suffix_mask: jax.Array, positions: jax.Array) -> jax.Array:
    """One velocity evaluation. x_t: [B, N, chunk, A]; time: scalar."""
    suffix_embs = embed_suffix(params, cfg, state, x_t, time)
    out = gemma.decode_shared_prefix(
        params["expert"], cfg.expert, suffix_embs, positions,
        prefix.cache, prefix.pad_masks, suffix_mask,
        attn_impl=cfg.decode_attn_impl or cfg.attention_impl,
        fast_math=cfg.fast_math)
    out = out[..., -cfg.chunk_size:, :].astype(jnp.float32)
    return _linear(params["action_out_proj"], out)


def sample_actions(params: Params, cfg: Pi0Config, key: jax.Array,
                   images, img_masks, lang_tokens, lang_masks, state,
                   num_candidates: int = 1, noise_std: float = 1.0,
                   noise: Optional[jax.Array] = None) -> jax.Array:
    """Sample N action-chunk candidates per batch row.

    Returns [B, N, chunk_size, max_action_dim] fp32. The prefill runs once
    per row; the Euler loop (num_denoise_steps, dt = -1/steps) is a scan.
    """
    b = state.shape[0]
    if noise is None:
        noise = sample_noise(
            key, (b, num_candidates, cfg.chunk_size, cfg.max_action_dim),
            noise_std)

    prefix = compute_prefix_cache(params, cfg, images, img_masks,
                                  lang_tokens, lang_masks)
    return denoise_from_cache(params, cfg, state, prefix, noise)


def denoise_from_cache(params: Params, cfg: Pi0Config, state: jax.Array,
                       prefix: PrefixCache, noise: jax.Array) -> jax.Array:
    """Integrate the flow from t=1 to 0 given a prefilled cache.

    noise: [B, N, chunk, A] fp32 starting point (x_1).
    """
    suffix_mask, positions = _suffix_geometry(cfg, prefix.pad_masks)
    dt = -1.0 / cfg.num_denoise_steps
    times = 1.0 + dt * jnp.arange(cfg.num_denoise_steps, dtype=jnp.float32)

    def step(x_t, t):
        v_t = denoise_step(params, cfg, state, prefix, x_t, t,
                           suffix_mask, positions)
        return x_t + dt * v_t, None

    x_0, _ = jax.lax.scan(step, noise, times)
    return x_0
