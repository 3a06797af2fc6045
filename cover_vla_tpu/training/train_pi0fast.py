"""pi0-FAST training: teacher-forced CE over FAST action tokens.

The reference trains pi0fast through the same trainer as pi0 — the policy's
`forward` builds [prompt | state | FAST action tokens | eos] sequences and
computes next-token CE on the action suffix
(lerobot modeling_pi0fast.py:685-752). Here the host prepares the token
batch (prompt build + DCT/BPE action tokenization) and the device step is
the jitted `pi0fast.token_ce_loss` + optax update; the optimizer/mesh
plumbing is shared with train_pi0.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cover_vla_tpu.data.fast_tokenizer import (
    FastActionTokenizer, normalize_actions_minmax)
from cover_vla_tpu.models import pi0fast

Params = Dict[str, Any]


class FastTrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def make_fast_batch(frames: Dict, text_tokenizer,
                    cfg: pi0fast.Pi0FastConfig,
                    fast_tokenizer: Optional[FastActionTokenizer] = None
                    ) -> Dict[str, np.ndarray]:
    """Collated frames -> token_ce_loss batch.

    frames: image uint8[B,H,W,3] (or [B,n,H,W,3]), state [B,<=32],
    actions [B,chunk,D], task list[str]. The action chunk is min-max
    normalised per sample, DCT+BPE tokenized (fast_tokenizer_wrapper,
    modeling_pi0fast.py:550), mapped into the tail of the PaliGemma vocab,
    and appended to the prompt tokens; suffix_mask marks the causal
    action-token span the CE loss trains on."""
    fast = fast_tokenizer or FastActionTokenizer(
        time_horizon=cfg.chunk_size,
        action_dim=np.asarray(frames["actions"]).shape[-1])
    images = np.asarray(frames["image"], np.float32) / 255.0 * 2.0 - 1.0
    if images.ndim == 4:
        images = images[:, None]
    state = np.asarray(frames["state"], np.float32)
    actions = np.asarray(frames["actions"], np.float64)

    prompts = pi0fast.build_prompts(state, list(frames["task"]))
    ptoks, pmasks = text_tokenizer.encode_batch(prompts,
                                                cfg.max_input_seq_len)
    act_tok_lists = fast.encode(normalize_actions_minmax(actions))

    b, t = ptoks.shape
    tokens = np.full((b, t), cfg.pad_token_id, np.int32)
    pad_mask = np.zeros((b, t), bool)
    suffix_mask = np.zeros((b, t), bool)
    for i in range(b):
        p = ptoks[i][pmasks[i]].tolist()
        a = pi0fast.act_tokens_to_paligemma(
            np.asarray(act_tok_lists[i], np.int64), cfg).tolist()
        seq = (p + a + [cfg.eos_token_id])[:t]
        tokens[i, :len(seq)] = seq
        pad_mask[i, :len(seq)] = True
        suffix_mask[i, len(p):len(seq)] = True

    return {
        "images": images.astype(np.float32),
        "img_masks": np.ones((b, images.shape[1]), bool),
        "tokens": tokens,
        "pad_mask": pad_mask,
        "suffix_mask": suffix_mask,
    }


def loss_fn(params, cfg: pi0fast.Pi0FastConfig, batch
            ) -> Tuple[jax.Array, Dict]:
    loss = pi0fast.token_ce_loss(
        params, cfg, batch["images"], batch["img_masks"], batch["tokens"],
        batch["pad_mask"], batch["suffix_mask"])
    return loss, {"loss": loss}


def make_train_step(cfg: pi0fast.Pi0FastConfig,
                    tx: optax.GradientTransformation, mesh=None):
    def train_step(state: FastTrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg, batch), has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FastTrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(train_step)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cover_vla_tpu.training.train_pi0 import shard_batch  # noqa: F401
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.jit(train_step,
                   in_shardings=(rep, data),
                   out_shardings=(rep, rep))


def init_train_state(key, cfg: pi0fast.Pi0FastConfig, tx,
                     mesh=None) -> FastTrainState:
    params = jax.jit(lambda k: pi0fast.init_pi0fast(k, cfg))(key)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
    opt_state = jax.jit(tx.init)(params)
    return FastTrainState(params, opt_state, jnp.zeros((), jnp.int32))
