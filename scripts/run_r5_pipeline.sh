#!/bin/bash
# Round-5 verification-scaling rebuild: rephrase-augmented policy,
# DR+shape backbone, grounded-instruction DR verifier, DAgger rounds.
# Builds into a SCRATCH dir (VS_ART_DIR) so the committed artifacts stay
# valid until the quality gates pass. Stages are strictly sequential —
# one JAX process at a time (CLAUDE.md: the axon tunnel is exclusive).
# Heavy TRAINING stages ride the TPU (scanned multi-step dispatches);
# engine rollouts and eval stay on CPU (dispatch-bound tiny models).
#
# Usage: bash scripts/run_r5_pipeline.sh phase1|dagger|evalgrid
set -euo pipefail
cd "$(dirname "$0")/.."
export VS_ART_DIR=${VS_ART_DIR:-/root/repo/experiments/vs_r5}
mkdir -p "$VS_ART_DIR"
P="python -u scripts/verification_scaling.py"
D="python -u scripts/ood_diagnostics.py"

phase1() {
  $P demos
  $P --platform tpu train_policy               # --rephrases defaults ON
  $P --platform tpu pretrain_backbone          # synthetic DR incl. shapes
  $P rankdata --episodes 1500 --out rankdata.npz
  $P rankdata --episodes 1500 --domain-rand --id-frac 0.15 \
     --out rankdata_dr.npz
  $P --platform tpu train_verifier --data rankdata.npz rankdata_dr.npz \
     --out verifier_params.pkl
  # quality gates: per-task selection gain + noun grounding + backbone
  $D regret --verifiers verifier_params.pkl --episodes 20
  $D lang --verifiers verifier_params.pkl --data rankdata_dr.npz
  $D probe --verifiers verifier_params.pkl
}

# DAgger rounds: recollect under the deployed verifier's own selection
# (ID + DR), retrain on everything; per-round quick eval cells
dagger() {
  $P rankdata --episodes 1000 --out rankdata2.npz \
     --dagger-params "$VS_ART_DIR/verifier_params.pkl" --dagger-frac 0.5
  $P rankdata --episodes 1000 --domain-rand --id-frac 0.15 \
     --out rankdata2_dr.npz \
     --dagger-params "$VS_ART_DIR/verifier_params.pkl" --dagger-frac 0.5
  $P --platform tpu train_verifier \
     --data rankdata.npz rankdata_dr.npz rankdata2.npz rankdata2_dr.npz \
     --out verifier_r1.pkl
  $D regret --verifiers verifier_params.pkl verifier_r1.pkl --episodes 20
}

# full committed grid: ID cells + oracle + OOD + rephrase-axis cells
evalgrid() {
  $P eval --trials 100 --n-parallel 10 \
     --verifier-params "${VERIFIER:-verifier_params.pkl}"
  $P report
}

"$@"
