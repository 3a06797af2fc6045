"""Path-dispatching checkpoint loaders for serving/eval model switching.

The reference evaluator iterates checkpoints over RPC and the server's
`switch_model` verb loads whatever format the path points at
(INT-ACT/src/experiments/envs/base_evaluator.py:119-126,
policy_wrapper.py:91-113). Formats accepted here:

  policy:   * orbax param dir (our native `checkpoints.save_params`)
            * HF save_pretrained dir containing model.safetensors
              (lerobot pi0 layout, trainer.py:606-625)
            * a bare .safetensors / .pt / .bin state-dict file
  verifier: * orbax param dir
            * merged-ensemble .pt (`ensemble_components` schema,
              efficient_ensemble_merged.py:36-53)
"""

from __future__ import annotations

import os
from typing import Any, Dict

from cover_vla_tpu.configs import Pi0Config, VerifierConfig
from cover_vla_tpu.convert import checkpoints


def _is_orbax_dir(path: str) -> bool:
    # orbax PyTree checkpoints hold metadata files, never *.safetensors
    return os.path.isdir(path) and not os.path.exists(
        os.path.join(path, "model.safetensors"))


def load_policy_params(path: str, cfg: Pi0Config) -> Dict[str, Any]:
    """Load pi0 params from any supported checkpoint format (see module
    docstring). Raises FileNotFoundError / KeyError on bad paths/layouts —
    callers swap params only after a successful load (atomic switch)."""
    from cover_vla_tpu.convert.pi0_from_torch import (
        convert_pi0, load_state_dict)
    if os.path.isdir(path):
        st = os.path.join(path, "model.safetensors")
        if os.path.exists(st):
            return convert_pi0(load_state_dict(st), cfg)
        return checkpoints.load_params(path)
    if path.endswith((".safetensors", ".pt", ".bin")):
        return convert_pi0(load_state_dict(path), cfg)
    raise FileNotFoundError(f"unrecognised policy checkpoint: {path!r}")


def load_verifier_params(path: str, cfg: VerifierConfig,
                         backbone_params: Any = None) -> Dict[str, Any]:
    """Load verifier params. Merged .pt files carry heads only — reuse
    `backbone_params` (the currently loaded frozen SigLIP2) in that case."""
    if _is_orbax_dir(path):
        return checkpoints.load_params(path)
    if path.endswith(".pt"):
        from cover_vla_tpu.convert.verifier_from_torch import (
            convert_merged_checkpoint)
        params = convert_merged_checkpoint(path, cfg)
        if "backbone" not in params:
            if backbone_params is None:
                raise ValueError(
                    f"{path!r} is a heads-only merged ensemble and no "
                    "backbone params were supplied")
            params["backbone"] = backbone_params
        return params
    raise FileNotFoundError(f"unrecognised verifier checkpoint: {path!r}")
