"""FAST-style action tokenization: DCT -> quantize -> (optional) BPE.

Self-contained reimplementation of the "physical-intelligence/fast"
action-token pipeline the reference loads from the HF hub
(modeling_pi0fast.py:403-407, 550, 753-809):

  encode:  normalize to [-1,1] -> DCT-II (norm='ortho', time axis) ->
           * scale -> round/clip to [min_token, max_token] -> flatten
           (row-major [T, D]) -> shift to symbols -> BPE merge
  decode:  BPE expand -> unshift -> truncate/zero-pad to T*D ("relaxed
           decoding") -> reshape [T, D] -> IDCT(x / scale).

The published FAST BPE vocabulary is a hub artifact; `SimpleBPE` provides a
trainable drop-in (train on your action corpus) and `bpe=None` degrades to
one token per DCT coefficient — both invertible through the same API.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.fft import dct, idct


class SimpleBPE:
    """Minimal byte-pair encoder over integer symbol sequences."""

    def __init__(self, base_vocab: int = 256):
        self.base_vocab = base_vocab
        self.merges: Dict[Tuple[int, int], int] = {}
        self.decomp: Dict[int, Tuple[int, int]] = {}

    @property
    def vocab_size(self) -> int:
        return self.base_vocab + len(self.merges)

    def train(self, corpus: Sequence[Sequence[int]], num_merges: int):
        seqs = [list(s) for s in corpus]
        for _ in range(num_merges):
            pairs = Counter()
            for s in seqs:
                pairs.update(zip(s[:-1], s[1:]))
            if not pairs:
                break
            (a, b), count = pairs.most_common(1)[0]
            if count < 2:
                break
            new_id = self.vocab_size
            self.merges[(a, b)] = new_id
            self.decomp[new_id] = (a, b)
            seqs = [self._merge(s, a, b, new_id) for s in seqs]
        return self

    @staticmethod
    def _merge(seq: List[int], a: int, b: int, new_id: int) -> List[int]:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(new_id)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    def encode(self, symbols: Sequence[int]) -> List[int]:
        seq = list(symbols)
        # apply merges in creation order (priority order)
        for (a, b), new_id in self.merges.items():
            seq = self._merge(seq, a, b, new_id)
        return seq

    def decode(self, tokens: Sequence[int]) -> List[int]:
        out: List[int] = []

        def expand(t: int):
            if t in self.decomp:
                a, b = self.decomp[t]
                expand(a)
                expand(b)
            else:
                out.append(t)

        for t in tokens:
            expand(t)
        return out


class FastActionTokenizer:
    """DCT+quantization action tokenizer with the FAST decode semantics."""

    def __init__(self, scale: float = 10.0, min_token: int = -128,
                 max_token: int = 127, bpe: Optional[SimpleBPE] = None,
                 time_horizon: Optional[int] = None,
                 action_dim: Optional[int] = None):
        self.scale = scale
        self.min_token = min_token
        self.max_token = max_token
        self.bpe = bpe
        self.time_horizon = time_horizon
        self.action_dim = action_dim

    @property
    def vocab_size(self) -> int:
        base = self.max_token - self.min_token + 1
        return self.bpe.vocab_size if self.bpe is not None else base

    def encode(self, actions: np.ndarray) -> List[List[int]]:
        """actions: [B, T, D] normalised to [-1, 1] -> per-sample tokens."""
        actions = np.asarray(actions, np.float64)
        b, t, d = actions.shape
        self.time_horizon, self.action_dim = t, d
        coeff = dct(actions, axis=1, norm="ortho") * self.scale
        ints = np.clip(np.round(coeff), self.min_token, self.max_token
                       ).astype(np.int64)
        out = []
        for i in range(b):
            symbols = (ints[i].reshape(-1) - self.min_token).tolist()
            out.append(self.bpe.encode(symbols) if self.bpe else symbols)
        return out

    def decode(self, tokens: Sequence[Sequence[int]],
               time_horizon: Optional[int] = None,
               action_dim: Optional[int] = None,
               relaxed: bool = True) -> np.ndarray:
        """Token lists -> [B, T, D] actions (relaxed truncate/pad like the
        reference decode_actions_with_fast)."""
        t = time_horizon or self.time_horizon
        d = action_dim or self.action_dim
        assert t is not None and d is not None, "horizon/dim unknown"
        out = []
        for tok in tokens:
            symbols = self.bpe.decode(tok) if self.bpe else list(tok)
            coeff = np.asarray(symbols, np.float64) + self.min_token
            expected = t * d
            if relaxed:
                if coeff.shape[0] > expected:
                    coeff = coeff[:expected]
                elif coeff.shape[0] < expected:
                    coeff = np.pad(coeff, (0, expected - coeff.shape[0]))
            try:
                grid = coeff.reshape(t, d)
            except ValueError:
                grid = np.zeros((t, d))
            out.append(idct(grid / self.scale, axis=0, norm="ortho"))
        return np.stack(out)


def normalize_actions_minmax(actions: np.ndarray) -> np.ndarray:
    """Per-sample min-max to [-1,1] (modeling_pi0fast.py:540-543)."""
    mins = actions.min(axis=(1, 2), keepdims=True)
    maxs = actions.max(axis=(1, 2), keepdims=True)
    return 2 * (actions - mins) / (maxs - mins + 1e-8) - 1
