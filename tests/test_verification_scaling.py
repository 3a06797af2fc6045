"""Verification-scaling regression: the trained tiny verifier must turn
candidate count into success rate on the fake env.

The CI-sized version of the committed experiment
(scripts/verification_scaling.py, docs/verification_scaling.md — the
repo's analog of the reference's headline table README.md:136-155): with
the committed behaviour-cloned policy + contrastively-trained verifier
fixtures, verifier selection at N=16 must beat random selection (the
plain-pi0 baseline) on the same seeds. Everything is seeded, so the gap is
deterministic; the Wilson CIs are reported for context.
"""

import os
import pickle

import numpy as np
import pytest

ART_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments", "verification_scaling")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ART_DIR, "policy_params.pkl")),
    reason="verification_scaling fixtures not generated "
           "(scripts/verification_scaling.py)")


def _load(name):
    with open(os.path.join(ART_DIR, name), "rb") as f:
        return pickle.load(f)


@pytest.fixture(scope="module")
def trained():
    return (_load("policy_params.pkl"), _load("verifier_params.pkl"),
            _load("stats.pkl"))


def test_verifier_beats_random_at_n16(trained):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(ART_DIR), "..",
                                    "scripts"))
    from verification_scaling import experiment_configs, run_cell, wilson_ci

    policy_params, verifier_params, stats = trained
    pcfg, vcfg = experiment_configs()

    trials, n_parallel = 30, 10
    ver = run_cell(policy_params, verifier_params, pcfg, vcfg, stats,
                   "verifier", 16, trials, n_parallel, seed=7)
    rnd = run_cell(policy_params, verifier_params, pcfg, vcfg, stats,
                   "random", 16, trials, n_parallel, seed=7)

    msg = (f"verifier {ver['successes']}/{ver['episodes']} "
           f"CI {ver['ci95']} vs random {rnd['successes']}/"
           f"{rnd['episodes']} CI {rnd['ci95']}")
    assert ver["success_rate"] > rnd["success_rate"], msg
    # the committed 100-episode experiment shows a large gap; at 30
    # episodes demand a conservative margin so CI noise can't pass a
    # broken verifier
    assert ver["success_rate"] - rnd["success_rate"] >= 0.15, msg
    lo, _ = wilson_ci(ver["successes"], ver["episodes"])
    assert lo > 0, msg
