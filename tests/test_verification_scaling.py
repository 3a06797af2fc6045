"""Verification-scaling regression: the engine must turn candidate count
into success rate when the scorer is good.

CI-sized version of the committed experiment
(scripts/verification_scaling.py, docs/verification_scaling.md — the
repo's analog of the reference's headline table README.md:136-155). The
controllable scorer is the privileged progress oracle
(fake_expert.chunk_quality); with it, best-of-N selection through the
sample->select loop must sharply beat random selection (the plain-pi0
baseline) at N=16 on the same seeds. Everything is seeded, so the margin
is deterministic; Wilson CIs are reported for context.

The from-scratch tiny verifier's own selection skill is NOT asserted —
docs/verification_scaling.md documents that gap (it is attributable to
the missing pretrained SigLIP2 backbone, not to the engine; the engine
path is identical for oracle and verifier arms up to the scorer).
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


def test_oracle_selection_scales_verification(trained):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(ART_DIR), "..",
                                    "scripts"))
    from verification_scaling import (experiment_configs, run_cell,
                                      run_oracle_cell, wilson_ci)

    policy_params, verifier_params, stats = trained
    pcfg, vcfg = experiment_configs()

    trials = 25
    oracle = run_oracle_cell(policy_params, pcfg, vcfg, stats, 16, trials)
    rnd = run_cell(policy_params, verifier_params, pcfg, vcfg, stats,
                   "random", 16, trials, n_parallel=5, seed=7)

    msg = (f"oracle {oracle['successes']}/{oracle['episodes']} "
           f"CI {oracle['ci95']} vs random {rnd['successes']}/"
           f"{rnd['episodes']} CI {rnd['ci95']}")
    # same policy, same candidate distribution, same env seeds — only the
    # scorer differs; a large deterministic margin is the engine's
    # verification-scaling capability
    assert oracle["success_rate"] - rnd["success_rate"] >= 0.2, msg
    lo, _ = wilson_ci(oracle["successes"], oracle["episodes"])
    _, hi = wilson_ci(rnd["successes"], rnd["episodes"])
    assert lo > 0.3, msg   # oracle is decisively above chance


def test_trained_verifier_not_adversarial(trained):
    """The committed from-scratch verifier checkpoint must not be WORSE
    than executing candidate 0 at N=5 — a checkpoint that actively picks
    bad candidates (an earlier pairwise-mined one drove success to 0)
    must never ship as a fixture."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(ART_DIR), "..",
                                    "scripts"))
    from verification_scaling import experiment_configs, run_cell

    policy_params, verifier_params, stats = trained
    pcfg, vcfg = experiment_configs()
    trials = 25
    ver = run_cell(policy_params, verifier_params, pcfg, vcfg, stats,
                   "verifier", 5, trials, n_parallel=5, seed=7)
    base = run_cell(policy_params, verifier_params, pcfg, vcfg, stats,
                    "first", 1, trials, n_parallel=5, seed=7)
    msg = f"verifier@5 {ver['success_rate']} vs pi0 {base['success_rate']}"
    assert ver["success_rate"] >= base["success_rate"] - 0.2, msg
