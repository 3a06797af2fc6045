"""Offline results analysis: success-rate aggregation from episode records.

Counterpart of bashes/analyze_success_rate.py (2,549 LoC in the reference):
parses the success-encoded episode filenames / pickles written by
eval.evaluator.save_episode, aggregates per task / per seed-period, and
renders text tables (+ optional matplotlib bar charts).
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

_FNAME_RE = re.compile(
    r"episode_(?P<task>.+)_trial(?P<trial>\d+)_seed(?P<seed>\d+)_"
    r"(?P<outcome>success|failure)\.pkl")


def extract_success_from_filename(path: str) -> Optional[Dict]:
    m = _FNAME_RE.fullmatch(os.path.basename(path))
    if not m:
        return None
    return {"task": m.group("task"), "trial": int(m.group("trial")),
            "seed": int(m.group("seed")),
            "success": m.group("outcome") == "success"}


def load_episodes(out_dir: str) -> List[Dict]:
    eps = []
    for path in sorted(glob.glob(os.path.join(out_dir, "episode_*.pkl"))):
        meta = extract_success_from_filename(path)
        if meta is None:
            continue
        try:
            with open(path, "rb") as f:
                meta["record"] = pickle.load(f)
        except Exception:
            meta["record"] = None
        eps.append(meta)
    return eps


def aggregate(episodes: List[Dict], seed_period: int = 50) -> Dict:
    """Per-task and per-seed-period success rates (the reference groups
    trials into 50-episode periods to report mean±std across periods)."""
    by_task: Dict[str, List[Dict]] = defaultdict(list)
    for ep in episodes:
        by_task[ep["task"]].append(ep)

    out = {"per_task": {}, "overall": None}
    all_success = []
    for task, eps in sorted(by_task.items()):
        succ = np.asarray([e["success"] for e in eps], dtype=float)
        all_success.extend(succ)
        periods = [succ[i:i + seed_period]
                   for i in range(0, len(succ), seed_period)]
        period_rates = [p.mean() for p in periods if len(p)]
        out["per_task"][task] = {
            "episodes": len(eps),
            "success_rate": float(succ.mean()),
            "period_mean": float(np.mean(period_rates)),
            "period_std": float(np.std(period_rates)),
            "mean_verifier_score": _mean_score(eps),
        }
    out["overall"] = float(np.mean(all_success)) if all_success else 0.0
    return out


def _mean_score(eps: List[Dict]) -> Optional[float]:
    scores = []
    for e in eps:
        rec = e.get("record") or {}
        scores.extend(s for s in rec.get("verifier_scores", [])
                      if s is not None)
    return float(np.mean(scores)) if scores else None


def render_table(agg: Dict) -> str:
    lines = [f"{'task':42s} {'eps':>5s} {'success':>8s} {'±':>6s}"]
    for task, row in agg["per_task"].items():
        lines.append(f"{task:42s} {row['episodes']:5d} "
                     f"{row['success_rate'] * 100:7.1f}% "
                     f"{row['period_std'] * 100:5.1f}")
    lines.append(f"{'OVERALL':42s} {'':5s} {agg['overall'] * 100:7.1f}%")
    return "\n".join(lines)


def plot_success_rates(agg: Dict, path: str) -> Optional[str]:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    tasks = list(agg["per_task"])
    rates = [agg["per_task"][t]["success_rate"] * 100 for t in tasks]
    errs = [agg["per_task"][t]["period_std"] * 100 for t in tasks]
    fig, ax = plt.subplots(figsize=(max(6, len(tasks) * 1.2), 4))
    ax.bar(range(len(tasks)), rates, yerr=errs, capsize=3)
    ax.set_xticks(range(len(tasks)))
    ax.set_xticklabels([t.replace("widowx_", "") for t in tasks],
                       rotation=30, ha="right")
    ax.set_ylabel("success rate (%)")
    ax.set_ylim(0, 100)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed-period", type=int, default=50)
    ap.add_argument("--plot", type=str, default=None)
    args = ap.parse_args(argv)
    agg = aggregate(load_episodes(args.out_dir), args.seed_period)
    print(render_table(agg))
    if args.plot:
        plot_success_rates(agg, args.plot)


if __name__ == "__main__":
    main()
