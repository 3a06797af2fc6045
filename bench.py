"""Benchmark: verified actions/sec/chip on the real TPU.

Runs the full-size fused CoVer pipeline (pi0 PaliGemma-3B + Gemma expert,
SigLIP2 ViT-L/16-384 verifier x3 ensemble members) at N=16 candidates and
measures end-to-end verified-control throughput: raw uint8 frame + prompts
in, selected execution-format action chunk out, one jitted program.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is against the BASELINE.json north star of 10 verified
actions/sec/chip at N=16 (the reference publishes no latency numbers).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from cover_vla_tpu.configs import (
        Pi0Config, VerifierConfig, CoVerConfig)
    from cover_vla_tpu.data.stats import DatasetStatistics
    from cover_vla_tpu.models import pi0, verifier
    from cover_vla_tpu.engine import make_verified_step

    pcfg = Pi0Config()
    vcfg = VerifierConfig()
    # N=16 candidates under the current instruction (BASELINE.json config 3/4)
    ccfg = CoVerConfig(n_samples=16, n_rephrases=1)
    stats = DatasetStatistics.from_json()

    t0 = time.time()
    policy_params = jax.jit(lambda k: pi0.init_pi0(k, pcfg))(
        jax.random.PRNGKey(0))
    verifier_params = jax.jit(
        lambda k: verifier.init_verifier(k, vcfg, num_members=3))(
        jax.random.PRNGKey(1))
    jax.block_until_ready((policy_params, verifier_params))
    init_s = time.time() - t0
    print(f"# init {init_s:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    step = make_verified_step(pcfg, vcfg, ccfg, stats)

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    proprio = rng.uniform(-0.1, 0.1, 7).astype(np.float32)
    k = ccfg.n_rephrases
    lang_tokens = rng.integers(0, 1000, (k, pcfg.tokenizer_max_length)
                               ).astype(np.int32)
    lang_masks = np.zeros((k, pcfg.tokenizer_max_length), bool)
    lang_masks[:, :12] = True
    vtoks = rng.integers(0, 1000, vcfg.text.context_length).astype(np.int32)
    history = np.zeros((ccfg.max_history, 7), np.float32)

    def call(seed, hist_len):
        return step(policy_params, verifier_params, jax.random.PRNGKey(seed),
                    raw, proprio, lang_tokens, lang_masks, vtoks, history,
                    np.int32(hist_len))

    # compile + warmup
    t0 = time.time()
    jax.block_until_ready(call(0, 0))
    compile_s = time.time() - t0
    jax.block_until_ready(call(1, 6))
    print(f"# compile {compile_s:.1f}s", file=sys.stderr)

    lat = []
    for i in range(10):
        t0 = time.time()
        jax.block_until_ready(call(i + 2, 6))
        lat.append(time.time() - t0)
    lat = np.asarray(lat)
    p50 = float(np.median(lat))
    # each verified step yields chunk_size executable (verified) actions
    actions_per_sec = pcfg.chunk_size / p50

    print(json.dumps({
        "metric": "verified_actions_per_sec_chip_N16",
        "value": round(actions_per_sec, 2),
        "unit": "actions/s",
        "vs_baseline": round(actions_per_sec / 10.0, 2),
        "p50_step_latency_ms": round(p50 * 1e3, 1),
        "p90_step_latency_ms": round(float(np.percentile(lat, 90)) * 1e3, 1),
        "candidates": ccfg.batch_size,
        "chunk_size": pcfg.chunk_size,
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
