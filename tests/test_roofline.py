"""scripts/roofline.py — exclusive-time attribution from a profiler
trace (the op-granularity substantiation of bench MFU, docs/roofline.md).

Synthetic chrome-trace fixture: a device 'XLA Ops' lane with a parent
`while` containing fusions — the parent's time must be carried by its
children (no double count), and per-category flops/bytes must aggregate.
"""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import roofline  # noqa: E402


def _write_trace(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def _meta(pid, name, tid=None, kind="process_name"):
    ev = {"ph": "M", "pid": pid, "name": kind, "args": {"name": name}}
    if tid is not None:
        ev["tid"] = tid
    return ev


def _op(ts, dur, name, category, flops=0, nbytes=0, pid=3, tid=3):
    return {"ph": "X", "pid": pid, "tid": tid, "ts": ts, "dur": dur,
            "name": name,
            "args": {"hlo_category": category, "model_flops": str(flops),
                     "raw_bytes_accessed": str(nbytes)}}


def test_leaf_rollup_excludes_parents(tmp_path):
    trace = str(tmp_path / "plugins" / "profile" / "run" /
                "vm.trace.json.gz")
    events = [
        _meta(3, "/device:TPU:0"),
        _meta(3, "XLA Ops", tid=3, kind="thread_name"),
        _meta(3, "XLA Modules", tid=2, kind="thread_name"),
        # module-lane event must be ignored (not the Ops lane)
        _op(0.0, 100.0, "jit_step", "?", pid=3, tid=2),
        # parent while [0, 50) with two leaf fusions inside
        _op(0.0, 50.0, "while.1", "?"),
        _op(5.0, 20.0, "fusion.1", "convolution fusion",
            flops=2_000_000, nbytes=1000),
        _op(30.0, 10.0, "fusion.2", "convolution fusion",
            flops=1_000_000, nbytes=500),
        # top-level leaf
        _op(60.0, 4.0, "copy.1", "data formatting", nbytes=4096),
    ]
    _write_trace(trace, events)

    ops, _ = roofline.load_ops(str(tmp_path))
    names = {e["name"] for e in ops}
    assert "jit_step" not in names and "while.1" in names

    cat = roofline.leaf_rollup(ops)
    conv_us, conv_fl, conv_by, conv_n = cat["convolution fusion"]
    assert conv_us == 30.0          # 20 + 10, parent while.1 skipped
    assert conv_fl == 3_000_000 and conv_by == 1500 and conv_n == 2
    assert "?" not in cat           # the while carried no leaf time
    fmt_us, _, fmt_by, _ = cat["data formatting"]
    assert fmt_us == 4.0 and fmt_by == 4096
    # achieved rates derive: 3 MFLOP / 30 us = 0.1 TFLOP/s
    assert abs(conv_fl / (conv_us / 1e6) / 1e12 - 0.1) < 1e-9
