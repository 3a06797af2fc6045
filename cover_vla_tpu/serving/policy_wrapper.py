"""Policy wrappers served over the websocket RPC.

The server-side counterpart of the reference's policy wrappers
(INT-ACT/src/experiments/policies/policy_wrapper.py:18-170): preprocess obs
-> model -> postprocess, exposed via the BasePolicy verbs. Two wrappers:

  * `Pi0PolicyWrapper` — plain pi0 action-chunk inference with a host-side
    action queue (LeRobotPolicyWrapper.select_action semantics).
  * `CoVerPolicyWrapper` — the full verified engine behind the same verbs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cover_vla_tpu.configs import Pi0Config
from cover_vla_tpu.data.tokenizer import Tokenizer, make_policy_tokenizer
from cover_vla_tpu.engine import CoVerEngine
from cover_vla_tpu.eval.adapters import BridgeSimplerAdapter
from cover_vla_tpu.models import pi0


class Pi0PolicyWrapper:
    """obs {image uint8[H,W,3], state raw, task str} -> {actions [chunk, 7]}."""

    def __init__(self, params, cfg: Pi0Config,
                 tokenizer: Optional[Tokenizer] = None,
                 adapter: Optional[BridgeSimplerAdapter] = None,
                 noise_std: float = 1.0, seed: int = 0,
                 quantize: str = "none"):
        self.quantize = quantize
        self.params = self._maybe_quantize(params)
        self.cfg = cfg
        self.tok = tokenizer or make_policy_tokenizer(cfg.paligemma.vocab_size)
        # the default adapter must resize to the POLICY's input size
        # (tiny configs use 56, full-size 224)
        self.adapter = adapter or BridgeSimplerAdapter(
            image_size=(cfg.vision.image_size, cfg.vision.image_size))
        self.noise_std = noise_std
        self._key = jax.random.PRNGKey(seed)

        def _sample(params, key, images, img_masks, toks, masks, state):
            return pi0.sample_actions(params, cfg, key, images, img_masks,
                                      toks, masks, state, num_candidates=1,
                                      noise_std=noise_std)
        self._sample = jax.jit(_sample)
        self.reset()

    def _maybe_quantize(self, params):
        """Apply the serving-time int8 transform (ops/quant.py) when the
        wrapper was built with quantize != 'none' — re-applied on every
        switch_model so checkpoint iteration keeps the serving mode."""
        if getattr(self, "quantize", "none") in ("int8", "int8_full"):
            from cover_vla_tpu.ops import quant
            return jax.jit(quant.quantize_pi0_policy)(params)
        return params

    def reset(self) -> None:
        self._queue: List[np.ndarray] = []
        self.adapter.reset()

    def switch_model(self, path: str) -> None:
        """Swap the served checkpoint (base_evaluator.py:119-126 iteration,
        websocket_policy_server.py:75 verb). Any supported format (orbax
        dir, lerobot safetensors dir/file, torch .pt); params swap only
        after a successful load, then queues/adapter state reset."""
        from cover_vla_tpu.convert.loaders import load_policy_params
        self.params = self._maybe_quantize(
            load_policy_params(path, self.cfg))
        self.reset()

    def infer(self, obs: Dict[str, Any]) -> Dict[str, Any]:
        if not self._queue:
            pre = self.adapter.preprocess({
                "observation.images.top": np.asarray(obs["image"], np.uint8),
                "observation.state": obs["state"],
                "task": obs.get("task", ""),
            })
            toks, masks = self.tok.encode_batch(
                pre["task"], self.cfg.tokenizer_max_length)
            state = np.zeros((1, self.cfg.max_state_dim), np.float32)
            state[:, :pre["observation.state"].shape[1]] = \
                pre["observation.state"]
            self._key, sub = jax.random.split(self._key)
            actions = self._sample(
                self.params, sub,
                jnp.asarray(pre["observation.images.top"][:, None]),
                jnp.ones((1, 1), bool), toks, masks, state)
            raw_chunk = np.asarray(actions)[0, 0, :, :7]
            self._queue = [a for a in self.adapter.postprocess(raw_chunk)]
        return {"actions": np.asarray(self._queue.pop(0))}


class CoVerPolicyWrapper:
    """The verified engine behind the same RPC verbs. obs additionally may
    carry 'reset_task' to (re)bind the instruction."""

    def __init__(self, engine: CoVerEngine, quantize: str = "none"):
        self.engine = engine
        self.quantize = quantize
        self.adapter = BridgeSimplerAdapter()
        if quantize in ("int8", "int8_full"):
            from cover_vla_tpu.ops import quant
            engine.policy_params = jax.jit(
                quant.quantize_pi0_policy)(engine.policy_params)
            if quantize == "int8_full":
                engine.verifier_params = jax.jit(
                    quant.quantize_verifier)(engine.verifier_params)

    def reset(self) -> None:
        self.engine.reset(self.engine.original_task)

    def switch_model(self, path: str) -> None:
        """Swap the engine's POLICY checkpoint (the reference iterates
        policy checkpoints; the verifier stays fixed). A
        "verifier:<path>" prefix switches the verifier ensemble instead
        (merged .pt reuses the current frozen backbone). The jitted
        verified_step takes params as arguments, so no retrace happens."""
        eng = self.engine
        if path.startswith("verifier:"):
            from cover_vla_tpu.convert.loaders import load_verifier_params
            eng.verifier_params = load_verifier_params(
                path[len("verifier:"):], eng.vcfg,
                backbone_params=eng.verifier_params.get("backbone")
                if isinstance(eng.verifier_params, dict) else None)
        else:
            from cover_vla_tpu.convert.loaders import load_policy_params
            pp = load_policy_params(path, eng.pcfg)
            if getattr(self, "quantize", "none") in ("int8", "int8_full"):
                # keep the serving mode across checkpoint iteration (the
                # verifier-switch branch reuses the current — already
                # quantized — backbone, so only the policy needs re-quant)
                from cover_vla_tpu.ops import quant
                pp = jax.jit(quant.quantize_pi0_policy)(pp)
            eng.policy_params = pp
        self.reset()

    def infer(self, obs: Dict[str, Any]) -> Dict[str, Any]:
        if "reset_task" in obs:
            self.engine.reset(str(obs["reset_task"]))
        proprio = self.adapter.preprocess_proprio(
            {"agent": obs["agent"]}) if "agent" in obs else \
            np.asarray(obs["proprio"], np.float32)
        action = self.engine.step(np.asarray(obs["image"], np.uint8),
                                  np.asarray(proprio, np.float32))
        rec = self.engine.records[-1] if self.engine.records else None
        return {
            "actions": action,
            "score": rec.max_score if rec else None,
            "instruction": self.engine.task,
        }
