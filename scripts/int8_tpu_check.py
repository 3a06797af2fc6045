"""One-off: full-size int8 vs bf16 verified-step throughput on the real TPU.

Measures the pipelined E=16 batched verified step (the bench headline
program) off the bf16 tree and off quantize_pi0_policy's int8 tree, plus
action deviation on one step with a shared noise stream. Feeds the
decision whether bench.py ships an int8 extra metric.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cover_vla_tpu.configs import (Pi0Config, VerifierConfig,
                                       CoVerConfig, fast_pi0_config,
                                       fast_verifier_config)
    from cover_vla_tpu.data.stats import DatasetStatistics
    from cover_vla_tpu.models import pi0, verifier
    from cover_vla_tpu.engine import make_verified_step_batched
    from cover_vla_tpu.ops import quant

    pcfg, vcfg = Pi0Config(), VerifierConfig()
    ccfg = CoVerConfig(n_samples=16, n_rephrases=1)
    stats = DatasetStatistics.from_json()
    E = 16

    t0 = time.time()
    pp = jax.jit(lambda k: pi0.init_pi0(k, pcfg))(jax.random.PRNGKey(0))
    vp = jax.jit(lambda k: verifier.init_verifier(k, vcfg, num_members=3))(
        jax.random.PRNGKey(1))
    jax.block_until_ready((pp, vp))
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    qpp = jax.jit(quant.quantize_pi0_policy)(pp)
    qvp = jax.jit(quant.quantize_verifier)(vp)
    jax.block_until_ready((qpp, qvp))
    print(f"quantize {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    k = ccfg.n_rephrases
    rawE = np.stack([rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)] * E)
    propE = np.stack([rng.uniform(-0.1, 0.1, 7).astype(np.float32)] * E)
    lt1 = rng.integers(0, 1000, (k, pcfg.tokenizer_max_length)).astype(np.int32)
    lm1 = np.zeros((k, pcfg.tokenizer_max_length), bool)
    lm1[:, :12] = True
    ltE, lmE = np.stack([lt1] * E), np.stack([lm1] * E)
    vtE = np.stack([rng.integers(0, 1000,
                                 vcfg.text.context_length).astype(np.int32)] * E)
    histE = np.stack([np.zeros((ccfg.max_history, 7), np.float32)] * E)
    hlenE = np.full((E,), 6, np.int32)

    stepE = make_verified_step_batched(fast_pi0_config(pcfg),
                                       fast_verifier_config(vcfg),
                                       ccfg, stats)

    def call(params, vparams, i):
        keys = jax.random.split(jax.random.PRNGKey(i), E)
        return stepE(params, vparams, keys, rawE, propE, ltE, lmE, vtE,
                     histE, hlenE)

    out = {}
    for tag, params, vparams in (("bf16", pp, vp), ("int8", qpp, vp),
                                 ("int8_full", qpp, qvp)):
        t0 = time.time()
        o0 = call(params, vparams, 0)
        jax.block_until_ready(o0)
        out[tag + "_compile_s"] = round(time.time() - t0, 1)
        reps = []
        for r in range(3):
            t0 = time.time()
            outs = [call(params, vparams, 100 + 50 * r + i)
                    for i in range(10)]
            jax.block_until_ready(outs)
            reps.append((time.time() - t0) / 10)
        step_s = float(np.median(reps))
        out[tag + "_pipelined_step_ms"] = round(step_s * 1e3, 1)
        out[tag + "_actions_per_sec"] = round(E * pcfg.chunk_size / step_s, 2)
        out[tag + "_spread"] = round((max(reps) - min(reps)) / step_s, 4)

    a_bf = np.asarray(call(pp, vp, 7)[0], np.float32)
    a_q = np.asarray(call(qpp, vp, 7)[0], np.float32)
    a_qf = np.asarray(call(qpp, qvp, 7)[0], np.float32)
    rms = float(np.sqrt((a_bf ** 2).mean())) + 1e-9
    out["action_rel_max_dev"] = round(float(np.abs(a_q - a_bf).max()) / rms, 5)
    out["action_rel_max_dev_full"] = round(
        float(np.abs(a_qf - a_bf).max()) / rms, 5)
    out["speedup"] = round(out["int8_actions_per_sec"]
                           / out["bf16_actions_per_sec"], 3)
    out["speedup_full"] = round(out["int8_full_actions_per_sec"]
                                / out["bf16_actions_per_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
