"""VLM language transforms + offline rephrase generation.

Mirrors bridge_verifier/lang_transform_vlm.py (LangTransform, transform
types :18) and generate_simpler_rephrases_vlm.py (batch generation with
dedup + top-up rounds, BATCH_NUMBER). The reference calls the OpenAI API
with an image-conditioned prompt; this environment has zero egress, so the
VLM backend is pluggable:

  * `VLMBackend` protocol — wire up any client returning rephrase lists.
  * `TemplateBackend` — deterministic offline fallback composing rephrases
    from synonym tables (keeps the full generation pipeline runnable).
"""

from __future__ import annotations

import json
import random
import re
from typing import Dict, List, Optional, Protocol, Sequence

TRANSFORM_TYPES = ["synonym", "antonym", "negation", "verb_noun_shuffle",
                   "in_set", "out_set", "rephrase"]


class VLMBackend(Protocol):
    def rephrase(self, instruction: str, n: int,
                 image: Optional[bytes] = None) -> List[str]: ...


_SYNONYMS: Dict[str, List[str]] = {
    "put": ["place", "set", "lay", "position", "move"],
    "stack": ["pile", "place ... on top of"],
    "on": ["onto", "on top of", "upon"],
    "into": ["in", "inside"],
    "the": ["the", "that"],
    "carrot": ["carrot", "orange vegetable"],
    "plate": ["plate", "dish"],
    "towel": ["towel", "cloth", "fabric"],
    "basket": ["basket", "container", "bin"],
    "spoon": ["spoon", "utensil"],
    "eggplant": ["eggplant", "aubergine", "purple vegetable"],
    "zucchini": ["zucchini", "courgette", "green squash"],
    "block": ["block", "cube"],
    "ball": ["ball", "sphere"],
    "can": ["can", "tin"],
}

_ANTONYMS: Dict[str, str] = {
    "put": "remove", "on": "off", "into": "out of", "open": "close",
    "close": "open", "stack": "unstack", "pick": "drop",
}


class TemplateBackend:
    """Deterministic synonym-substitution rephraser (offline fallback)."""

    def __init__(self, seed: int = 0):
        self.rng = random.Random(seed)

    # framing variations applied when synonym substitution alone cannot
    # produce enough distinct candidates (e.g. "open top drawer")
    _FRAMES = ("please {}", "can you {}", "{} now", "go ahead and {}",
               "i need you to {}", "{} for me", "kindly {}",
               "your task is to {}")

    def rephrase(self, instruction: str, n: int,
                 image: Optional[bytes] = None) -> List[str]:
        words = instruction.lower().split()
        out, seen = [], {instruction.lower()}
        attempts = 0
        while len(out) < n and attempts < n * 30:
            attempts += 1
            cand = " ".join(
                self.rng.choice(_SYNONYMS[w]) if w in _SYNONYMS else w
                for w in words)
            if attempts > n * 10 or (cand in seen and attempts > n * 3):
                # synonym space exhausted: add framing variation
                cand = self.rng.choice(self._FRAMES).format(cand)
            if cand not in seen:
                seen.add(cand)
                out.append(cand)
        return out


class LangTransform:
    """Instruction transformations (lang_transform_vlm.py:14+)."""

    def __init__(self, backend: Optional[VLMBackend] = None, seed: int = 0):
        self.backend = backend or TemplateBackend(seed)
        self.rng = random.Random(seed)

    def transform(self, instruction: str, transform_type: str,
                  n: int = 1) -> List[str]:
        if transform_type not in TRANSFORM_TYPES:
            raise ValueError(f"unknown transform {transform_type!r}; "
                             f"one of {TRANSFORM_TYPES}")
        if transform_type in ("rephrase", "synonym"):
            return self.backend.rephrase(instruction, n)
        if transform_type == "antonym":
            words = [(_ANTONYMS.get(w, w)) for w in instruction.lower().split()]
            return [" ".join(words)][:n]
        if transform_type == "negation":
            return [f"do not {instruction.lower()}"][:n]
        if transform_type == "verb_noun_shuffle":
            words = instruction.lower().split()
            shuffled = words[:]
            self.rng.shuffle(shuffled)
            return [" ".join(shuffled)][:n]
        if transform_type == "in_set":
            return self.backend.rephrase(instruction, n)
        if transform_type == "out_set":
            return [f"{instruction.lower()} somewhere else"][:n]
        return []


def generate_rephrase_store(instructions: Sequence[str], n_per_task: int = 33,
                            backend: Optional[VLMBackend] = None,
                            seed: int = 0) -> Dict:
    """Batch rephrase generation with dedup + top-up rounds
    (generate_simpler_rephrases_vlm.py:18+, BATCH_NUMBER semantics).
    Returns the rephrase-store JSON schema."""
    lt = LangTransform(backend, seed)
    store = {"instructions": {}}
    for instr in instructions:
        reph: List[str] = []
        rounds = 0
        while len(reph) < n_per_task and rounds < 10:
            new = lt.transform(instr, "rephrase",
                               n=n_per_task - len(reph))
            reph.extend(r for r in new if r not in reph)
            rounds += 1
        store["instructions"][instr] = {
            "original": instr,
            "ert_rephrases": reph[:n_per_task],
            "rephrases_original": instr,
            "count": len(reph[:n_per_task]),
        }
    return store


def main(argv=None):
    """CLI: regenerate the rephrase store for the benchmark tasks
    (generate_simpler_rephrases_vlm.py equivalent, offline backend)."""
    import argparse
    from cover_vla_tpu.eval.benchmark import TASK_INSTRUCTIONS
    ap = argparse.ArgumentParser()
    ap.add_argument("out_path")
    ap.add_argument("--n-per-task", type=int, default=33)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    instructions = sorted(set(TASK_INSTRUCTIONS.values()))
    store = generate_rephrase_store(instructions, args.n_per_task,
                                    seed=args.seed)
    with open(args.out_path, "w") as f:
        json.dump(store, f, indent=2)
    print(f"wrote {len(instructions)} tasks -> {args.out_path}")


if __name__ == "__main__":
    main()
