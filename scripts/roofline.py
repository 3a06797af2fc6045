"""Roofline breakdown of a bench profiler trace.

Parses the jax.profiler chrome trace that `bench.py` records (the
`BENCH_TRACE_DIR`, default /tmp/bench_trace), attributes exclusive
device time to HLO categories on the XLA Ops lane, and prints a
per-category table: ms/step, share, achieved TFLOP/s (from the ops'
`model_flops`) and achieved GiB/s (from `raw_bytes_accessed`) against
the chip's peaks — i.e. how far each part of the verified step is from
the hardware's speed of light.

The reference stack has no counterpart (its tracing is homemade timers,
INT-ACT/src/utils/monitor.py:17-44); this substantiates the bench's MFU
claims at op granularity. See docs/roofline.md for the committed
round-4 analysis.

Usage:
  python bench.py                      # records /tmp/bench_trace
  python scripts/roofline.py [--trace-dir /tmp/bench_trace] \
      [--steps 4] [--peak-tflops 197] [--peak-gibs 763]
"""

from __future__ import annotations

import argparse
import bisect
import collections
import glob
import gzip
import json
import os


def load_ops(trace_dir: str):
    """Complete events on the device's 'XLA Ops' lane of the newest trace."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir!r}")
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    proc = {e["pid"]: e.get("args", {}).get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    threads = {(e["pid"], e.get("tid")): e.get("args", {}).get("name", "")
               for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"}
    dev_pids = {p for p, n in proc.items()
                if "tpu" in n.lower() or "device" in n.lower()}
    lanes = collections.Counter()
    for e in events:
        key = (e.get("pid"), e.get("tid"))
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and e.get("dur") and "op" in threads.get(key, "").lower()):
            lanes[key] += 1
    if not lanes:
        raise RuntimeError("no XLA Ops lane found in the trace")
    lane = max(lanes, key=lanes.get)
    return [e for e in events
            if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) == lane
            and e.get("dur")], paths[-1]


def leaf_rollup(ops):
    """Aggregate EXCLUSIVE (leaf) device time per hlo_category.

    Trace events nest (a `while` op contains its body's fusions); summing
    all events double-counts. An event with any event starting strictly
    inside it is a parent and is skipped — leaves carry the real time.
    """
    ops = sorted(ops, key=lambda e: (e["ts"], -e["dur"]))
    starts = [e["ts"] for e in ops]
    cat = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for e in ops:
        ts, dur = e["ts"], e["dur"]
        i = bisect.bisect_right(starts, ts)
        if i < len(starts) and starts[i] < ts + dur - 1e-9:
            continue  # parent: children carry its time
        a = e.get("args", {})
        c = cat[a.get("hlo_category", "?")]
        c[0] += dur                                     # us
        c[1] += float(a.get("model_flops", 0) or 0)     # flops
        c[2] += float(a.get("raw_bytes_accessed", 0) or 0)
        c[3] += 1
    return cat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace-dir", default=os.environ.get(
        "BENCH_TRACE_DIR", "/tmp/bench_trace"))
    ap.add_argument("--steps", type=int, default=4,
                    help="dispatches recorded in the trace "
                         "(bench.py traces 4 pipelined steps)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip bf16 peak (v5e: 197)")
    ap.add_argument("--peak-gibs", type=float, default=763.0,
                    help="chip HBM bandwidth peak (v5e: 819 GB/s)")
    args = ap.parse_args()

    ops, path = load_ops(args.trace_dir)
    cat = leaf_rollup(ops)
    total_us = sum(v[0] for v in cat.values())
    print(f"# {path}")
    print(f"# device busy {total_us / args.steps / 1e3:.1f} ms/step "
          f"({args.steps} steps)")
    hdr = (f"{'hlo category':28s} {'ms/step':>8s} {'share':>6s} "
           f"{'TFLOP/s':>8s} {'%MXU':>6s} {'GiB/s':>8s} {'%HBM':>6s}")
    print(hdr)
    rows = []
    for name, (us, fl, by, n) in sorted(cat.items(),
                                        key=lambda kv: -kv[1][0]):
        s = us / 1e6
        tf = fl / s / 1e12 if s else 0.0
        gib = by / s / 2**30 if s else 0.0
        rows.append({"category": name, "ms_per_step": us / args.steps / 1e3,
                     "share": us / total_us, "tflops": tf,
                     "mxu_frac": tf / args.peak_tflops,
                     "gibs": gib, "hbm_frac": gib / args.peak_gibs,
                     "ops": n})
        if us / total_us < 0.001:
            continue
        print(f"{name:28s} {us / args.steps / 1e3:8.2f} "
              f"{us / total_us * 100:5.1f}% {tf:8.1f} "
              f"{tf / args.peak_tflops * 100:5.1f}% {gib:8.1f} "
              f"{gib / args.peak_gibs * 100:5.1f}%")
    print(json.dumps({"device_ms_per_step": round(
        total_us / args.steps / 1e3, 1), "categories": rows[:8]}))


if __name__ == "__main__":
    main()
