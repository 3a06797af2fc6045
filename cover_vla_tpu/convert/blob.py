"""Flat single-file parameter blob: the convert-once cache format.

Why not orbax here: the cache is written right after a torch->JAX
conversion, whose leaves (under `hostmode.host_arrays()`) are host numpy
arrays — orbax's PyTreeCheckpointer serializes from *device* arrays
(d2h pull per leaf over the axon tunnel, 570 s for the 3.24B policy) and
restores with per-leaf dispatches (230 s). The blob instead:

  * writes host arrays sequentially at disk speed,
  * loads as zero-copy ``np.memmap`` views (no parse, no copy),
  * reaches the device in ONE batched ``jax.device_put`` of the whole
    tree — the reload cost is the tunnel/PCIe transfer floor, nothing
    else.

Layout: ``CVTBLOB1`` magic, u64 little-endian header length, JSON header
(list of {path, dtype, shape, offset, nbytes}; offsets are relative to
the 64-byte-aligned data base), then the raw leaf bytes. Trees are
nested dicts (the only container the param trees use).

Checkpoint-iteration context (the reference evaluator swaps checkpoints
between eval runs, INT-ACT base_evaluator.py:119-126): with this format
`switch_model` on a converted 3.24B policy is bounded by h2d bandwidth
alone — see INGEST_r04 `cached_reload_s` / `h2d_mib_s`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

import numpy as np

MAGIC = b"CVTBLOB1"
_ALIGN = 64


def _dtype_of(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes
        return np.dtype(getattr(ml_dtypes, name))


def _flatten(tree: Any) -> List[Tuple[List[str], np.ndarray]]:
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for kp, leaf in flat:
        path = []
        for k in kp:
            if not hasattr(k, "key"):
                raise TypeError(
                    f"blob trees must be nested dicts; got key {k!r}")
            path.append(str(k.key))
        out.append((path, np.asarray(leaf)))
    return out


def _unflatten(entries: List[Tuple[List[str], np.ndarray]]) -> Any:
    root: Dict[str, Any] = {}
    for path, arr in entries:
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = arr
    return root


def save_tree(path: str, tree: Any) -> str:
    """Write a nested-dict tree of (host) arrays to one blob file."""
    leaves = _flatten(tree)
    meta = []
    off = 0
    for p, arr in leaves:
        off = (off + _ALIGN - 1) & ~(_ALIGN - 1)
        meta.append({"path": p, "dtype": arr.dtype.name,
                     "shape": list(arr.shape), "offset": off,
                     "nbytes": int(arr.nbytes)})
        off += arr.nbytes
    header = json.dumps({"entries": meta}).encode()
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        pad = (-f.tell()) % _ALIGN
        f.write(b"\0" * pad)
        base = f.tell()
        for e, (p, arr) in zip(meta, leaves):
            f.seek(base + e["offset"])
            flat = np.ascontiguousarray(arr).reshape(-1)  # 0-d safe
            f.write(flat.view(np.uint8).data)
    os.replace(tmp, path)
    return path


def load_tree(path: str, mmap: bool = True) -> Any:
    """Read a blob back as a nested dict of numpy arrays (memmap views by
    default — zero-copy until consumed, e.g. by jax.device_put)."""
    with open(path, "rb") as f:
        if f.read(8) != MAGIC:
            raise ValueError(f"{path!r} is not a CVTBLOB1 file")
        hlen = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(hlen))["entries"]
        pos = f.tell()
    base = (pos + _ALIGN - 1) & ~(_ALIGN - 1)
    if mmap:
        raw = np.memmap(path, dtype=np.uint8, mode="r")
    else:
        raw = np.fromfile(path, dtype=np.uint8)
    entries = []
    for e in meta:
        start = base + e["offset"]
        arr = raw[start:start + e["nbytes"]].view(_dtype_of(e["dtype"]))
        entries.append((e["path"], arr.reshape(e["shape"])))
    return _unflatten(entries)
