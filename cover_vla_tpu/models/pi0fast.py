"""pi0-FAST: autoregressive action-token VLA policy.

Behavioural reference: lerobot_custom/.../pi0fast/modeling_pi0fast.py.
The policy tokenizes the observation as
    [image tokens | "Task: {task}, State: {256-bin discretised state};\\n"]
(bidirectional prefix), then greedily decodes FAST action tokens with the
PaliGemma LM head (block-causal suffix), mapped into the tail of the
PaliGemma vocabulary as
    pg_token = vocab_size - 1 - fast_skip_tokens - fast_token
(modeling_pi0fast.py:545-548). Decoded tokens are inverted through the
DCT+BPE FAST tokenizer (cover_vla_tpu.data.fast_tokenizer).

TPU-first: the greedy decode runs as a lax.scan with a preallocated HBM KV
cache (gemma.ar_generate) instead of HF .generate; the prefix stays
right-padded (no shift_padding_side host pass — invalid slots are masked).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import (
    GemmaConfig, VitConfig, PALIGEMMA_LM, SIGLIP_SO400M)
from cover_vla_tpu.data.fast_tokenizer import (
    FastActionTokenizer, normalize_actions_minmax)
from cover_vla_tpu.data.tokenizer import Tokenizer, make_policy_tokenizer
from cover_vla_tpu.models import gemma, siglip
from cover_vla_tpu.ops.masks import make_att_2d_masks

Params = Dict[str, Any]


@dataclass(frozen=True)
class Pi0FastConfig:
    """configuration_pi0fast.py:16-90 defaults."""
    paligemma: GemmaConfig = PALIGEMMA_LM
    vision: VitConfig = SIGLIP_SO400M
    chunk_size: int = 10            # action horizon
    n_action_steps: int = 5
    max_action_dim: int = 32
    max_decoding_steps: int = 256
    fast_skip_tokens: int = 128
    max_input_seq_len: int = 256
    num_images: int = 1
    eos_token_id: int = 1
    pad_token_id: int = 0


def tiny_pi0fast_config() -> Pi0FastConfig:
    return Pi0FastConfig(
        paligemma=GemmaConfig(width=64, depth=2, mlp_dim=128, num_heads=4,
                              num_kv_heads=1, head_dim=16, vocab_size=1024),
        vision=VitConfig(width=32, depth=2, mlp_dim=64, num_heads=4,
                         patch_size=14, image_size=56),
        chunk_size=4, n_action_steps=4, max_decoding_steps=8,
        fast_skip_tokens=16, max_input_seq_len=48)


def init_pi0fast(key: jax.Array, cfg: Pi0FastConfig) -> Params:
    from cover_vla_tpu.models.pi0 import _linear_init
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vision": siglip.init_vit(k1, cfg.vision),
        "mm_proj": _linear_init(k2, cfg.vision.width, cfg.paligemma.width,
                                dtype=jnp.float32),
        "paligemma": gemma.init_gemma(k3, cfg.paligemma),
    }


# --------------------------------------------------------------------------
# token mapping + prompt construction (host)
# --------------------------------------------------------------------------


def act_tokens_to_paligemma(tokens: np.ndarray, cfg: Pi0FastConfig) -> np.ndarray:
    return cfg.paligemma.vocab_size - 1 - cfg.fast_skip_tokens - tokens


def paligemma_to_act_tokens(tokens: np.ndarray, cfg: Pi0FastConfig) -> np.ndarray:
    return cfg.paligemma.vocab_size - 1 - cfg.fast_skip_tokens - tokens


def discretize_state(state: np.ndarray, n_bins: int = 256) -> np.ndarray:
    """256-bin bucketize over [-1, 1) (modeling_pi0fast.py:572-575)."""
    bins = np.linspace(-1, 1, n_bins + 1)[:-1]
    return (np.digitize(state, bins) - 1)[..., :32]


def build_prompts(state: np.ndarray, tasks: Sequence[str]) -> List[str]:
    disc = discretize_state(np.asarray(state))
    out = []
    for task, d in zip(tasks, disc):
        cleaned = task.lower().strip().replace("_", " ")
        state_str = " ".join(str(int(v)) for v in d)
        out.append(f"Task: {cleaned}, State: {state_str};\n")
    return out


# --------------------------------------------------------------------------
# model forward (device)
# --------------------------------------------------------------------------


def embed_prefix(params: Params, cfg: Pi0FastConfig, images: jax.Array,
                 img_masks: jax.Array, tokens: jax.Array,
                 token_masks: jax.Array):
    """[image tokens | prompt(+action) tokens] embeddings + pad mask."""
    from cover_vla_tpu.models.pi0 import _linear
    b = tokens.shape[0]
    bi, n_img = images.shape[:2]
    flat = images.reshape((bi * n_img,) + images.shape[2:])
    vit_out = siglip.vit_forward(params["vision"], cfg.vision, flat)
    img_emb = _linear(params["mm_proj"],
                      vit_out.tokens.astype(jnp.float32)).astype(jnp.bfloat16)
    img_emb = img_emb.reshape(bi, n_img * cfg.vision.num_patches, -1)
    if bi == 1 and b > 1:
        img_emb = jnp.broadcast_to(img_emb, (b,) + img_emb.shape[1:])
        img_masks = jnp.broadcast_to(img_masks, (b, n_img))

    tok_emb = gemma.embed_tokens(params["paligemma"], tokens)
    tok_emb = tok_emb * jnp.asarray(cfg.paligemma.width ** 0.5, tok_emb.dtype)

    embs = jnp.concatenate([img_emb, tok_emb.astype(img_emb.dtype)], axis=1)
    img_pad = jnp.repeat(img_masks, cfg.vision.num_patches, axis=1)
    pad = jnp.concatenate([img_pad, token_masks], axis=1)
    return embs, pad


def generate_action_tokens(params: Params, cfg: Pi0FastConfig,
                           images: jax.Array, img_masks: jax.Array,
                           prompt_tokens: jax.Array,
                           prompt_masks: jax.Array) -> jax.Array:
    """Greedy decode: returns PaliGemma-vocab tokens [B, max_decoding_steps]
    (pad after EOS)."""
    embs, pad = embed_prefix(params, cfg, images, img_masks,
                             prompt_tokens, prompt_masks)
    return gemma.ar_generate(params["paligemma"], cfg.paligemma, embs, pad,
                             cfg.max_decoding_steps, cfg.eos_token_id,
                             cfg.pad_token_id)


def token_ce_loss(params: Params, cfg: Pi0FastConfig, images: jax.Array,
                  img_masks: jax.Array, tokens: jax.Array,
                  pad_mask: jax.Array, suffix_mask: jax.Array) -> jax.Array:
    """Teacher-forced CE on the action-token suffix (forward,
    modeling_pi0fast.py:685-752): prefix bidirectional, suffix causal,
    targets = next token, loss only where suffix & pad."""
    embs, pad = embed_prefix(params, cfg, images, img_masks, tokens, pad_mask)
    n_img_tokens = embs.shape[1] - tokens.shape[1]
    b = tokens.shape[0]
    att = jnp.concatenate(
        [jnp.zeros((b, n_img_tokens), jnp.int32),
         suffix_mask.astype(jnp.int32)], axis=1)
    mask2d = make_att_2d_masks(pad, att)
    positions = jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1
    hidden, _ = gemma.prefill(params["paligemma"], cfg.paligemma, embs,
                              positions, mask2d, return_hidden=True)
    text_hidden = hidden[:, n_img_tokens:]
    logits = gemma.lm_logits(params["paligemma"], cfg.paligemma,
                             text_hidden[:, :-1])
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    weight = (suffix_mask[:, 1:] & pad_mask[:, 1:]).astype(jnp.float32)
    return jnp.sum(nll * weight) / jnp.clip(jnp.sum(weight), 1.0)


# --------------------------------------------------------------------------
# host-side policy
# --------------------------------------------------------------------------


class Pi0FastPolicy:
    """Host wrapper: prompt building, generation, FAST detokenisation, and
    the n_action_steps queue (PI0FASTPolicy.select_action semantics)."""

    def __init__(self, params: Params, cfg: Pi0FastConfig,
                 text_tokenizer: Optional[Tokenizer] = None,
                 fast_tokenizer=None,  # FastActionTokenizer or a
                 # data.fast_tokenizer.HubFastProcessor loaded from the
                 # saved hub artifact (HubFastProcessor.from_artifact)
                 action_dim: int = 7):
        self.params = params
        self.cfg = cfg
        self.tok = text_tokenizer or make_policy_tokenizer(
            cfg.paligemma.vocab_size)
        self.fast = fast_tokenizer or FastActionTokenizer(
            time_horizon=cfg.chunk_size, action_dim=action_dim)
        self.action_dim = action_dim
        self._gen = jax.jit(lambda p, i, m, t, tm: generate_action_tokens(
            p, cfg, i, m, t, tm))
        self.reset()

    def reset(self):
        self._queue: List[np.ndarray] = []

    def select_action(self, images: np.ndarray, state: np.ndarray,
                      tasks: Sequence[str]) -> np.ndarray:
        """images: [B, n, H, W, 3] in [-1,1]; state: [B, <=32] normalised;
        returns [B, action_dim] (popping an internal chunk queue)."""
        if not self._queue:
            prompts = build_prompts(state, tasks)
            toks, masks = self.tok.encode_batch(prompts,
                                                self.cfg.max_input_seq_len)
            out_tokens = np.asarray(self._gen(
                self.params, jnp.asarray(images),
                jnp.ones((images.shape[0], images.shape[1]), bool),
                jnp.asarray(toks), jnp.asarray(masks)))
            actions = self.decode_tokens(out_tokens)
            self._queue = [actions[:, i]
                           for i in range(self.cfg.n_action_steps)]
        return self._queue.pop(0)

    def decode_tokens(self, pg_tokens: np.ndarray) -> np.ndarray:
        """PaliGemma tokens -> [B, chunk, action_dim] actions."""
        batch = []
        for row in pg_tokens:
            row = row[(row != self.cfg.pad_token_id)
                      & (row != self.cfg.eos_token_id)]
            fast = paligemma_to_act_tokens(row, self.cfg)
            fast = fast[(fast >= 0) & (fast < self.fast.vocab_size)]
            batch.append(fast.tolist())
        return self.fast.decode(batch, time_horizon=self.cfg.chunk_size,
                                action_dim=self.action_dim)
