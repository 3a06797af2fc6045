"""Checkpoint save/load (Orbax) + rotation/resume semantics.

Replaces the reference's three checkpoint families (SURVEY.md §5):
  * full train-state checkpoints (model+optimizer+scheduler+step — verifier
    finetune...py:1234-1252, INT-ACT trainer.py:596-721),
  * weights-only exports,
  * rotation keeping the last K (manage_checkpoints, finetune...py:511-545).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional

import jax


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> str:
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    _ckptr().save(path, params)
    return path


def load_params(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if target is not None:
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype), target)
        return _ckptr().restore(path, item=target,
                                restore_args=restore_args)
    return _ckptr().restore(path)


def save_train_state(root: str, step: int, state: Any,
                     keep_last: int = 3) -> str:
    """Save under root/step_<N>/ and rotate old checkpoints."""
    path = os.path.join(os.path.abspath(root), f"step_{step:08d}")
    save_params(path, state)
    rotate_checkpoints(root, keep_last)
    return path


def list_checkpoints(root: str) -> List[str]:
    if not os.path.isdir(root):
        return []
    entries = [d for d in os.listdir(root)
               if re.fullmatch(r"step_\d+", d)]
    return [os.path.join(root, d) for d in sorted(entries)]


def latest_checkpoint(root: str) -> Optional[str]:
    cks = list_checkpoints(root)
    return cks[-1] if cks else None


def rotate_checkpoints(root: str, keep_last: int) -> None:
    cks = list_checkpoints(root)
    for old in cks[:-keep_last] if keep_last > 0 else []:
        shutil.rmtree(old, ignore_errors=True)


def cleanup_empty_runs(runs_root: str) -> int:
    """Remove run directories that contain no checkpoints (the reference's
    empty-run cleanup, trainer.py:572-586). Returns the number removed."""
    removed = 0
    if not os.path.isdir(runs_root):
        return 0
    for d in os.listdir(runs_root):
        path = os.path.join(runs_root, d)
        if os.path.isdir(path) and not list_checkpoints(path) \
                and not os.listdir(path):
            shutil.rmtree(path, ignore_errors=True)
            removed += 1
    return removed


def restore_train_state(root: str, target: Any) -> tuple[Any, int]:
    """Resume from the latest checkpoint; returns (state, step)."""
    path = latest_checkpoint(root)
    if path is None:
        return target, 0
    step = int(os.path.basename(path).split("_")[1])
    return load_params(path, target=target), step
