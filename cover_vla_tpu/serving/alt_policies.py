"""Alternative policy-family wrappers (extension points).

The reference ships server-side wrappers for SpatialVLA, Magma (token-bin
decode), and Octo alongside the lerobot one
(INT-ACT/src/experiments/policies/policy_wrapper.py:187-371), each a thin
preprocess->model->postprocess shell over a HF/JAX model. Those models are
external checkpoints, not part of this framework; the wrappers here define
the same surface so a user can plug a model in, plus a working
`ScriptedPolicyWrapper` used for serving tests and fake-env demos.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

from cover_vla_tpu.eval.adapters import BridgeSimplerAdapter, ActionEnsembler


class ScriptedPolicyWrapper:
    """Deterministic proportional controller toward a target — a servable
    stand-in exercising the full RPC surface without a model."""

    def __init__(self, gain: float = 0.5):
        self.gain = gain
        self.adapter = BridgeSimplerAdapter()
        self.reset()

    def reset(self) -> None:
        self._target = np.array([0.05, 0.05, 0.02])

    def switch_model(self, path: str) -> None:
        pass

    def infer(self, obs: Dict[str, Any]) -> Dict[str, Any]:
        eef = np.asarray(obs["agent"]["eef_pos"])[:3] if "agent" in obs \
            else np.zeros(3)
        delta = np.clip(self.gain * (self._target - eef), -0.05, 0.05)
        return {"actions": np.concatenate([delta, [0, 0, 0], [1.0]])}


class HFModelPolicyWrapper:
    """Generic wrapper for an autoregressive HF-style policy (the
    SpatialVLA/Magma pattern): caller supplies `generate_fn(obs)->tokens`
    and `decode_fn(tokens)->actions [chunk, 7]`; this class adds the
    adapter postprocess, optional temporal ensembling, and the queue."""

    def __init__(self, generate_fn: Callable, decode_fn: Callable,
                 chunk_size: int = 4, ensemble_temp: Optional[float] = None,
                 adapter: Optional[BridgeSimplerAdapter] = None):
        self.generate_fn = generate_fn
        self.decode_fn = decode_fn
        self.chunk_size = chunk_size
        self.adapter = adapter or BridgeSimplerAdapter()
        self.ensembler = (ActionEnsembler(chunk_size, ensemble_temp)
                          if ensemble_temp is not None else None)
        self.reset()

    def reset(self) -> None:
        self._queue = []
        self.adapter.reset()
        if self.ensembler:
            self.ensembler.reset()

    def switch_model(self, path: str) -> None:
        raise NotImplementedError("bind a new generate_fn instead")

    def infer(self, obs: Dict[str, Any]) -> Dict[str, Any]:
        if self.ensembler is not None:
            chunk = self.decode_fn(self.generate_fn(obs))
            raw = self.ensembler.ensemble(np.asarray(chunk))
            return {"actions": self.adapter.postprocess(raw[None])[0]}
        if not self._queue:
            chunk = self.decode_fn(self.generate_fn(obs))
            self._queue = [a for a in self.adapter.postprocess(
                np.asarray(chunk))]
        return {"actions": self._queue.pop(0)}
