"""Convert lerobot pi0-FAST torch checkpoints -> cover_vla_tpu params.

Source: PI0FAST (lerobot_custom/.../pi0fast/modeling_pi0fast.py) —
`pi0_paligemma` is a plain PaliGemmaForConditionalGeneration; keys live
under model.pi0_paligemma.* (or pi0_paligemma.* for a bare module).
Reuses the Gemma/SigLIP converters from pi0_from_torch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from cover_vla_tpu.models.pi0fast import Pi0FastConfig
from cover_vla_tpu.convert.pi0_from_torch import (
    convert_gemma, convert_siglip_vision, _t)

StateDict = Mapping[str, np.ndarray]


def convert_pi0fast(sd: StateDict, cfg: Pi0FastConfig,
                    dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = list(sd.keys())
    root = ""
    for cand in ("model.pi0_paligemma.", "pi0_paligemma."):
        if any(k.startswith(cand) for k in keys):
            root = cand
            break

    lm_prefix = None
    for cand in (root + "language_model.model", root + "model.language_model",
                 root + "language_model"):
        if any(k.startswith(cand + ".layers.0.") for k in keys):
            lm_prefix = cand
            break
    if lm_prefix is None:
        raise KeyError("could not locate the PaliGemma language model")

    vt_prefix = None
    for cand in (root + "vision_tower.vision_model",
                 root + "model.vision_tower.vision_model"):
        if any(k.startswith(cand) for k in keys):
            vt_prefix = cand
            break

    mm_key = None
    for cand in (root + "multi_modal_projector.linear",
                 root + "multi_modal_projector",
                 root + "model.multi_modal_projector.linear",
                 root + "model.multi_modal_projector"):
        if cand + ".weight" in sd:
            mm_key = cand
            break

    return {
        "vision": convert_siglip_vision(sd, cfg.vision, vt_prefix, dtype),
        "mm_proj": {"kernel": jnp.asarray(_t(sd, mm_key + ".weight").T,
                                          jnp.float32),
                    "bias": jnp.asarray(_t(sd, mm_key + ".bias"),
                                        jnp.float32)},
        "paligemma": convert_gemma(sd, cfg.paligemma, lm_prefix, embed=True,
                                   dtype=dtype),
    }
