"""Episode-batched CoVer engine + lockstep multi-env evaluator.

The TPU-native equivalent of the reference's GPU-parallel evaluation mode
(SimplerMS3Evaluator with n_parallel_eval,
INT-ACT/src/experiments/envs/simplerMS3/simplerMS3_evaluator.py): E
environments advance in lockstep and ONE device dispatch per control step
serves all of them — amortising dispatch latency and filling the MXU with
E*K prefills and E*K*N candidate decodes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import jax

from cover_vla_tpu.configs import Pi0Config, VerifierConfig, CoVerConfig
from cover_vla_tpu.data.stats import DatasetStatistics
from cover_vla_tpu.data.tokenizer import (
    Tokenizer, make_policy_tokenizer, make_verifier_tokenizer)
from cover_vla_tpu.engine.verified_step import make_verified_step_batched


class BatchedCoVerEngine:
    """E lockstep episodes, one device call per chunk_size control ticks."""

    def __init__(self, policy_params, verifier_params,
                 pcfg: Pi0Config, vcfg: VerifierConfig, ccfg: CoVerConfig,
                 num_episodes: int,
                 stats: Optional[DatasetStatistics] = None,
                 policy_tokenizer: Optional[Tokenizer] = None,
                 verifier_tokenizer: Optional[Tokenizer] = None,
                 rephrases: Optional[Dict[str, List[str]]] = None,
                 seed: int = 0):
        self.policy_params = policy_params
        self.verifier_params = verifier_params
        self.pcfg, self.vcfg, self.ccfg = pcfg, vcfg, ccfg
        self.E = num_episodes
        self.stats = stats or DatasetStatistics.from_json()
        self.policy_tok = policy_tokenizer or make_policy_tokenizer(
            pcfg.paligemma.vocab_size)
        self.verifier_tok = verifier_tokenizer or make_verifier_tokenizer(
            vcfg.text.vocab_size)
        self.rephrases = rephrases or {}
        self._step_fn = make_verified_step_batched(pcfg, vcfg, ccfg,
                                                   self.stats)
        self._key = jax.random.PRNGKey(seed)
        self.reset([""] * num_episodes)

    def reset(self, tasks: Sequence[str]):
        assert len(tasks) == self.E
        self.tasks = list(tasks)
        self.original_tasks = list(tasks)
        self._tick = 0
        self._history = np.zeros((self.E, self.ccfg.max_history, 7),
                                 np.float32)
        self._history_len = np.zeros((self.E,), np.int32)
        self._exec_queue: List[np.ndarray] = []
        self._verif_queue: List[np.ndarray] = []
        self.last_scores = np.zeros((self.E,), np.float32)

    def _prompts(self, e: int) -> List[str]:
        k = self.ccfg.n_rephrases
        reph = self.rephrases.get(self.original_tasks[e], [])
        return ([self.tasks[e]] + list(reph))[:k] + \
            [self.tasks[e]] * max(0, k - 1 - len(reph))

    def step(self, raw_images: np.ndarray, proprios: np.ndarray) -> np.ndarray:
        """raw_images: uint8[E,H,W,3]; proprios: fp32[E,7] -> actions [E,7]."""
        chunk = self.pcfg.chunk_size
        if self._tick % chunk == 0:
            k, t = self.ccfg.n_rephrases, self.pcfg.tokenizer_max_length
            lang_tokens = np.zeros((self.E, k, t), np.int32)
            lang_masks = np.zeros((self.E, k, t), bool)
            vtoks = np.zeros((self.E, self.vcfg.text.context_length),
                             np.int32)
            for e in range(self.E):
                toks, masks = self.policy_tok.encode_batch(self._prompts(e), t)
                lang_tokens[e], lang_masks[e] = toks, masks
                vt, _ = self.verifier_tok.encode_batch(
                    [self.tasks[e]], self.vcfg.text.context_length)
                vtoks[e] = vt[0]

            self._key, sub = jax.random.split(self._key)
            keys = jax.random.split(sub, self.E)
            res = self._step_fn(
                self.policy_params, self.verifier_params, keys,
                np.ascontiguousarray(raw_images),
                np.asarray(proprios, np.float32),
                lang_tokens, lang_masks, vtoks,
                self._history, self._history_len)

            exec_chunks = np.asarray(res.exec_chunk)      # [E, chunk, 7]
            verif_chunks = np.asarray(res.verifier_chunk)
            groups = np.asarray(res.winner_group)
            stage2 = np.asarray(res.used_stage2)
            self.last_scores = np.asarray(res.max_score)
            for e in range(self.E):
                if stage2[e]:
                    self.tasks[e] = self._prompts(e)[int(groups[e])]
            self._exec_queue = [exec_chunks[:, i] for i in range(1, chunk)]
            self._verif_queue = [verif_chunks[:, i] for i in range(1, chunk)]
            self._push_history(verif_chunks[:, 0])
            actions = exec_chunks[:, 0]
        else:
            actions = self._exec_queue.pop(0)
            self._push_history(self._verif_queue.pop(0))
        self._tick += 1
        return actions

    def _push_history(self, verif_actions: np.ndarray):
        self._history = np.roll(self._history, -1, axis=1)
        self._history[:, -1] = verif_actions
        self._history_len = np.minimum(self._history_len + 1,
                                       self.ccfg.max_history)


def evaluate_batched(engine: BatchedCoVerEngine, envs: Sequence,
                     adapter, max_steps: int = 150,
                     seeds: Optional[Sequence[int]] = None) -> Dict:
    """Run E environments to completion in lockstep; finished envs keep
    receiving actions (ignored) until all are done or max_steps."""
    from cover_vla_tpu.eval.fake_env import get_image_from_obs_dict

    e_count = len(envs)
    seeds = seeds or list(range(e_count))
    obs = []
    tasks = []
    for env, seed in zip(envs, seeds):
        o, _ = env.reset(seed=seed)
        obs.append(o)
        tasks.append(env.get_language_instruction())
    engine.reset(tasks)

    done = np.zeros(e_count, bool)
    success = np.zeros(e_count, bool)
    steps = np.zeros(e_count, np.int32)
    for t in range(max_steps):
        imgs = np.stack([get_image_from_obs_dict(env, o)
                         for env, o in zip(envs, obs)])
        proprios = np.stack([
            adapter.preprocess_proprio({"agent": o["agent"]})
            for o in obs]).astype(np.float32)
        actions = engine.step(imgs, proprios)
        for e, env in enumerate(envs):
            if done[e]:
                continue
            o, r, d, trunc, info = env.step(actions[e])
            obs[e] = o
            steps[e] = t + 1
            if d:
                done[e] = success[e] = True
            elif trunc:
                done[e] = True
        if done.all():
            break

    return {
        "success": success.tolist(),
        "success_rate": float(success.mean()),
        "steps": steps.tolist(),
    }
