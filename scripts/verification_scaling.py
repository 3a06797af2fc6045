"""Verification-scaling experiment: does verifier selection turn candidate
count N into success rate?

The repo's analog of the reference's headline table (README.md:136-155 —
"Scaling Verification Can Be More Effective than Scaling Policy
Learning"): on the scriptable fake env, a tiny pi0 behaviour-cloned from a
noisy scripted expert samples N candidate chunks per control step, and the
success rate is measured for three selection modes through the REAL
batched engine (engine/batched_engine.py + engine/verified_step.py):

  * verifier  — contrastively-trained tiny SigLIP2-style ensemble picks
                the candidate (the CoVer loop),
  * random    — a uniformly random candidate executes (statistically the
                plain-pi0 baseline: candidates are iid),
  * first     — candidate 0 always executes (pi0 baseline, shared noise
                stream with the verifier arm).

Stages (each resumable from the previous one's artifacts):
  demos          scripted-expert demonstrations + fitted statistics
  train_policy   flow-matching behaviour cloning (training.train_pi0)
  train_verifier contrastive InfoNCE ensemble (training.train_verifier)
  eval           success-rate grid over N x selection via
                 eval.evaluator.evaluate_suite_batched (+ analyze.py
                 aggregation of the per-episode pickles)
  report         markdown + JSON artifacts

Run everything:  JAX_PLATFORMS=cpu python scripts/verification_scaling.py all
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ART_DIR = os.path.join(REPO, "experiments", "verification_scaling")
TASK = "widowx_carrot_on_plate"
MAX_ENV_STEPS = 60


# ---------------------------------------------------------------------------
# Experiment-scale configs: tiny enough to train on CPU, big enough for the
# vision towers to actually localise the blobs.
# ---------------------------------------------------------------------------


def experiment_configs():
    from cover_vla_tpu.configs import (
        Pi0Config, GemmaConfig, VitConfig, VerifierConfig, SiglipTextConfig)
    pcfg = Pi0Config(
        paligemma=GemmaConfig(width=64, depth=2, mlp_dim=128, num_heads=4,
                              num_kv_heads=1, head_dim=16, vocab_size=1024),
        expert=GemmaConfig(width=64, depth=2, mlp_dim=128, num_heads=4,
                           num_kv_heads=1, head_dim=16, vocab_size=0),
        vision=VitConfig(width=64, depth=2, mlp_dim=128, num_heads=4,
                         patch_size=14, image_size=112),
        chunk_size=4, n_action_steps=4, max_state_dim=32, max_action_dim=32,
        proj_width=64, num_denoise_steps=5, tokenizer_max_length=8)
    vcfg = VerifierConfig(
        vision=VitConfig(width=64, depth=2, mlp_dim=128, num_heads=4,
                         patch_size=16, image_size=128, gelu_approx=False),
        text=SiglipTextConfig(width=32, depth=2, mlp_dim=64, num_heads=4,
                              vocab_size=512, context_length=16,
                              embed_dim=64),  # == vision.width (TAVE attends
        #                                       text tokens over patches)
        text_pooling_output_dim=32, vision_pooling_output_dim=32,
        pooling_heads=4, pooling_layers=2, traj_layers=2, traj_heads=4)
    return pcfg, vcfg


def _save_tree(path, tree):
    import jax
    with open(path, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(
            lambda x: np.asarray(x), tree), f)


def _load_tree(path):
    with open(path, "rb") as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# Stage: demos
# ---------------------------------------------------------------------------


def cmd_demos(args):
    from cover_vla_tpu.eval import fake_expert
    t0 = time.time()
    demos = fake_expert.collect_demos(
        n_episodes=args.n_demos, max_steps=MAX_ENV_STEPS, seed=0,
        action_noise=args.demo_noise, task_name=TASK)
    stats = fake_expert.fit_statistics(demos)
    os.makedirs(ART_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(ART_DIR, "demos.npz"),
                        **{k: v for k, v in demos.items()
                           if isinstance(v, np.ndarray)})
    with open(os.path.join(ART_DIR, "stats.pkl"), "wb") as f:
        pickle.dump(stats, f)
    print(f"demos: {len(demos['actions'])} steps / "
          f"{demos['n_episodes']} episodes, expert success "
          f"{demos['expert_success_rate']:.2f} ({time.time() - t0:.0f}s)")


def _load_demos():
    d = dict(np.load(os.path.join(ART_DIR, "demos.npz")))
    d["n_episodes"] = int(d["episode"].max()) + 1
    with open(os.path.join(ART_DIR, "stats.pkl"), "rb") as f:
        stats = pickle.load(f)
    return d, stats


# ---------------------------------------------------------------------------
# Stage: train_policy
# ---------------------------------------------------------------------------


def _policy_preprocess_fn(pcfg):
    """Jitted raw-uint8 -> policy-image batch preprocessing, the engine's
    exact on-device chain (verified_step._policy_image)."""
    import jax
    import jax.numpy as jnp
    from cover_vla_tpu.ops.image import resize_lanczos4_uint8_device

    def one(raw):
        x = resize_lanczos4_uint8_device(
            raw, pcfg.vision.image_size,
            pcfg.vision.image_size).astype(jnp.float32)
        return (x / 255.0 - 0.5) / 0.5

    return jax.jit(jax.vmap(one))


def cmd_train_policy(args):
    import jax
    import optax
    from cover_vla_tpu.eval import fake_expert
    from cover_vla_tpu.data.tokenizer import make_policy_tokenizer
    from cover_vla_tpu.training import train_pi0

    pcfg, _ = experiment_configs()
    demos, stats = _load_demos()
    ds = fake_expert.build_policy_dataset(demos, stats, pcfg.chunk_size)
    n = len(ds["state"])
    print(f"policy dataset: {n} chunks")

    tok = make_policy_tokenizer(pcfg.paligemma.vocab_size)
    from cover_vla_tpu.eval.benchmark import TASK_INSTRUCTIONS
    instr = TASK_INSTRUCTIONS.get(TASK, TASK.replace("_", " "))
    lt, lm = tok.encode_batch([instr], pcfg.tokenizer_max_length)

    prep = _policy_preprocess_fn(pcfg)
    warm = min(50, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warm, max(args.steps, warm + 1))
    tx = optax.adamw(sched, weight_decay=1e-5)
    state = train_pi0.init_train_state(jax.random.PRNGKey(0), pcfg, tx)
    step_fn = train_pi0.make_train_step(pcfg, tx)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for it in range(args.steps):
        idx = rng.integers(0, n, args.batch)
        imgs = prep(ds["frames"][idx])[:, None]        # [B,1,H,W,3]
        batch = {
            "images": imgs,
            "img_masks": np.ones((args.batch, 1), bool),
            "lang_tokens": np.broadcast_to(lt, (args.batch,) + lt.shape[1:]),
            "lang_masks": np.broadcast_to(lm, (args.batch,) + lm.shape[1:]),
            "state": ds["state"][idx],
            "actions": ds["actions"][idx],
        }
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub, batch)
        if it % 100 == 0 or it == args.steps - 1:
            print(f"  policy step {it}: loss={float(metrics['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)")
    _save_tree(os.path.join(ART_DIR, "policy_params.pkl"), state.params)
    print("saved policy_params.pkl")


# ---------------------------------------------------------------------------
# Stage: rankdata — policy-sampled candidates labeled by privileged progress
# ---------------------------------------------------------------------------


def cmd_rankdata(args):
    """Roll the TRAINED policy on the env; at every chunk boundary sample
    n_candidates chunks, label each with the true progress a copy of the
    env makes executing it (fake_expert.chunk_quality), and record
    (frame, history, candidate trajectories, qualities). This is the
    verifier's training signal: rank candidates the way the engine will
    have to at deployment. The executed chunk is a RANDOM candidate, so
    states stay on the no-verifier policy distribution."""
    import jax
    from cover_vla_tpu.eval import fake_expert
    from cover_vla_tpu.eval.fake_env import FakeWidowXEnv
    from cover_vla_tpu.eval.adapters import BridgeSimplerAdapter
    from cover_vla_tpu.models import pi0
    from cover_vla_tpu.data.tokenizer import make_policy_tokenizer
    from cover_vla_tpu.eval.benchmark import TASK_INSTRUCTIONS

    pcfg, vcfg = experiment_configs()
    _, stats = _load_demos()
    pp = _load_tree(os.path.join(ART_DIR, "policy_params.pkl"))
    ptok = make_policy_tokenizer(pcfg.paligemma.vocab_size)
    instr = TASK_INSTRUCTIONS.get(TASK, TASK.replace("_", " "))
    lt, lm = ptok.encode_batch([instr], pcfg.tokenizer_max_length)
    adapter = BridgeSimplerAdapter()
    prep = _policy_preprocess_fn(pcfg)

    a_p01 = stats.action.p01[:6]
    a_p99 = stats.action.p99[:6]
    N, chunk = args.n_candidates, pcfg.chunk_size
    H = vcfg.history_length
    max_hist = H - chunk

    sample = jax.jit(lambda key, img, state: pi0.sample_actions(
        pp, pcfg, key, img, np.ones((1, 1), bool), lt, lm, state,
        num_candidates=N, noise_std=args.noise_std))

    frames, trajs, quals = [], [], []
    rng = np.random.default_rng(123)
    t0 = time.time()
    for ep in range(args.episodes):
        env = FakeWidowXEnv(TASK, max_steps=MAX_ENV_STEPS)
        obs, _ = env.reset(seed=50_000 + ep)
        history = np.full((0, 7), 0.0, np.float32)
        t = 0
        while t < MAX_ENV_STEPS:
            frame = obs["image"]
            proprio = adapter.preprocess_proprio(
                {"agent": obs["agent"]}).astype(np.float32)
            img = prep(frame[None])[:, None]
            state = np.zeros((1, pcfg.max_state_dim), np.float32)
            state[0, :7] = fake_expert.normalize_proprio(proprio, stats)
            key = jax.random.PRNGKey(900_000 + 1000 * ep + t)
            acts = np.asarray(sample(key, img, state)).reshape(
                N, chunk, pcfg.max_action_dim)[..., :7]
            body = (acts[..., :6] + 1) / 2 * (a_p99 - a_p01) + a_p01
            grip = acts[..., 6:]
            exec_chunks = np.concatenate(
                [body[..., :3], body[..., 3:6],
                 2.0 * (grip > 0.5) - 1.0], -1)
            verif_chunks = np.concatenate(
                [body, (grip >= 0.5).astype(np.float32)], -1)

            q = np.asarray([fake_expert.chunk_quality(env, exec_chunks[i])
                            for i in range(N)], np.float32)
            # assemble the engine's trajectory layout for every candidate
            n_past = min(len(history), max_hist)
            base = np.full((H, 7), vcfg.action_padding_value, np.float32)
            if n_past:
                base[max_hist - n_past:max_hist] = history[-n_past:]
            cand_trajs = np.broadcast_to(
                base, (N, H, 7)).copy()
            cand_trajs[:, max_hist:] = verif_chunks
            frames.append(frame)
            trajs.append(cand_trajs)
            quals.append(q)

            # execute a RANDOM candidate to stay on-distribution
            pick = int(rng.integers(0, N))
            done = trunc = False
            for s in range(chunk):
                obs, _, done, trunc, _ = env.step(exec_chunks[pick, s])
                history = np.concatenate(
                    [history, verif_chunks[pick, s][None]])
                t += 1
                if done or trunc:
                    break
            if done or trunc:
                break
        if ep % 10 == 0:
            print(f"  rankdata ep {ep}: {len(frames)} states "
                  f"({time.time() - t0:.0f}s)")
    np.savez_compressed(
        os.path.join(ART_DIR, "rankdata.npz"),
        frames=np.stack(frames), trajs=np.stack(trajs),
        quals=np.stack(quals))
    q = np.stack(quals)
    print(f"rankdata: {len(frames)} states x {N} candidates; quality "
          f"spread per state p50={np.median(q.max(1) - q.min(1)):.3f}")


# ---------------------------------------------------------------------------
# Stage: train_verifier
# ---------------------------------------------------------------------------


def _verifier_preprocess_fn(vcfg):
    """Jitted raw-uint8 -> verifier-image batch preprocessing matching
    verified_step._verifier_image (frames are already 256x256)."""
    import jax
    import jax.numpy as jnp
    from cover_vla_tpu.ops.image import resize_bicubic_pil

    def batch(raw):
        x = raw.astype(jnp.float32)
        x = resize_bicubic_pil(x, vcfg.vision.image_size,
                               vcfg.vision.image_size)
        return ((x / 255.0) - 0.5) / 0.5

    return jax.jit(batch)


def cmd_train_verifier(args):
    import jax
    import optax
    from cover_vla_tpu.data.tokenizer import make_verifier_tokenizer
    from cover_vla_tpu.training import train_verifier
    from cover_vla_tpu.eval.benchmark import TASK_INSTRUCTIONS

    pcfg, vcfg = experiment_configs()
    rd = np.load(os.path.join(ART_DIR, "rankdata.npz"))
    frames, trajs, quals = rd["frames"], rd["trajs"], rd["quals"]
    # keep states whose candidates actually differ in outcome — ranking is
    # undefined where every candidate makes identical progress
    spread = quals.max(1) - quals.min(1)
    keep = np.nonzero(spread > args.min_spread)[0]
    n = len(keep)
    print(f"verifier rankdata: {n}/{len(frames)} states with quality "
          f"spread > {args.min_spread}")

    tok = make_verifier_tokenizer(vcfg.text.vocab_size)
    instr = TASK_INSTRUCTIONS.get(TASK, TASK.replace("_", " "))
    vt, _ = tok.encode_batch([instr], vcfg.text.context_length)

    prep = _verifier_preprocess_fn(vcfg)
    warm = min(50, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warm, max(args.steps, warm + 1))
    tx = optax.adamw(sched, weight_decay=1e-5)
    # backbone UNFROZEN: there are no pretrained SigLIP2 weights in this
    # synthetic domain, and a frozen random tower collapses all frames to
    # near-identical features. The objective is the LISTWISE ranking loss
    # over the policy's own sampled candidate slates labeled by
    # privileged env progress — the decision the engine makes at every
    # control step. (Pairwise pos-vs-worst mining taught a shortcut:
    # the mined negatives were dominated by early gripper releases, so
    # the verifier suppressed opening anywhere and never released.)
    state = train_verifier.init_full_train_state(
        jax.random.PRNGKey(2), vcfg, tx, num_members=args.members)
    if args.objective == "listwise":
        step_fn = train_verifier.make_listwise_train_step(vcfg, tx,
                                                          tau=args.tau)
    else:  # dense oracle distillation — the default; see train_verifier
        step_fn = train_verifier.make_regression_train_step(vcfg, tx,
                                                            q_scale=1.0)

    # stratified batches: half from high-stakes states (a candidate flips
    # the episode outcome — grasp/release transitions, spread > 5) so the
    # rare release-phase decision is not drowned out by approach states
    # held-out split for decision-quality validation (selection regret on
    # states the verifier never trained on), stratified batches for the
    # rare high-stakes (grasp/release) states
    rng = np.random.default_rng(1)
    perm = rng.permutation(keep)
    val = perm[:max(32, len(perm) // 10)]
    train = perm[len(val):]
    hi = train[spread[train] > 5.0]
    lo = train[spread[train] <= 5.0]
    print(f"  strata: {len(hi)} high-stakes / {len(lo)} routine; "
          f"{len(val)} held-out")

    import jax as _jax
    from cover_vla_tpu.models import verifier as _verifier

    # one compiled scoring program reused by every validation checkpoint
    # (a fresh jit(lambda) per call would retrace every 200 steps)
    score_fn = _jax.jit(lambda p, img, tt, tr: _verifier.score_actions(
        p, vcfg, img, tt, tr))

    def val_regret(params):
        """Selection regret on held-out states, scored EXACTLY as the
        engine scores (verifier.score_actions: member embeddings fused by
        mean + renorm, then one dot) — a score-averaging proxy ranked
        checkpoints that inverted at engine time."""
        regs, accs = [], []
        for i in val[:128]:
            img = prep(frames[i][None].astype(np.float32))
            sc = np.asarray(score_fn(params, img, vt, trajs[i]))
            pick = int(sc.argmax())
            q = quals[i]
            regs.append(q.max() - q[pick])
            accs.append(pick == int(q.argmax()))
        return float(np.mean(regs)), float(np.mean(accs))

    best = (1e9, None)
    t0 = time.time()
    for it in range(args.steps):
        if len(hi) and len(lo):
            idx = np.concatenate([
                hi[rng.integers(0, len(hi), args.batch // 2)],
                lo[rng.integers(0, len(lo), args.batch - args.batch // 2)]])
        else:
            idx = train[rng.integers(0, len(train), args.batch)]
        f_b = frames[idx].copy()
        t_b = trajs[idx].copy()
        if args.augment:
            # label-preserving augmentation: chunk quality depends only on
            # the RELATIVE blob geometry (the verifier never sees proprio),
            # so whole-frame shifts keep labels, and axis flips keep them
            # if the trajectory's matching delta axis is negated too
            # (image column <-> world x, row <-> world y; fake_env._frame)
            pad_rows = np.all(t_b == -5.0, axis=-1)     # [B, K*N? no: B,N,H]
            for b in range(len(f_b)):
                dy, dx = rng.integers(-24, 25, 2)
                f_b[b] = np.roll(f_b[b], (dy, dx), axis=(0, 1))
                if rng.random() < 0.5:                  # horizontal flip
                    f_b[b] = f_b[b][:, ::-1]
                    t_b[b, ..., 0] *= -1.0
                if rng.random() < 0.5:                  # vertical flip
                    f_b[b] = f_b[b][::-1]
                    t_b[b, ..., 1] *= -1.0
            t_b[pad_rows] = -5.0                        # restore padding
        q = quals[idx]
        if args.objective == "regression":
            # per-slate standardization: between-state quality variance
            # would otherwise dominate the MSE (the net can score well by
            # predicting each STATE's mean quality and ignoring the
            # candidates); only within-slate ordering matters to the
            # engine's argmax
            q = (q - q.mean(1, keepdims=True)) / (q.std(1, keepdims=True)
                                                  + 0.1)
        batch = {
            "images": prep(f_b),
            "text_tokens": np.broadcast_to(vt, (len(idx),) + vt.shape[1:]),
            "cand_trajs": t_b,
            "qualities": q,
        }
        state, metrics = step_fn(state, batch)
        if it % 200 == 0 or it == args.steps - 1:
            vr, va = val_regret(state.params)
            if vr < best[0]:
                best = (vr, _jax.tree_util.tree_map(np.asarray,
                                                    state.params))
            print(f"  verifier step {it}: "
                  f"loss={float(metrics['loss']):.4f} "
                  f"rank_acc={float(metrics['rank_acc']):.3f} "
                  f"val_regret={vr:.3f} val_top1={va:.3f} "
                  f"({time.time() - t0:.0f}s)")
    _save_tree(os.path.join(ART_DIR, "verifier_params.pkl"),
               best[1] if best[1] is not None else state.params)
    print(f"saved verifier_params.pkl (best val_regret={best[0]:.3f})")


# ---------------------------------------------------------------------------
# Stage: eval — the success-rate grid
# ---------------------------------------------------------------------------


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson score interval for a binomial proportion."""
    if n == 0:
        return (0.0, 0.0)
    p = k / n
    denom = 1 + z * z / n
    centre = (p + z * z / (2 * n)) / denom
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, centre - half), min(1.0, centre + half))


def oracle_score_factory(envs):
    """Privileged progress oracle as an injected-score scorer: each
    candidate's score is the true potential gain a copy of the live env
    makes executing it (fake_expert.chunk_quality). Bound per cohort by
    evaluate_suite_batched; the engine's propose/select programs do
    everything else — sampling, denormalisation, selection — so this arm
    differs from the verifier arm ONLY in the score vector."""
    from cover_vla_tpu.eval.fake_expert import chunk_quality

    def score_fn(exec_chunks: np.ndarray) -> np.ndarray:  # [E, KN, chunk, 7]
        e_n, kn = exec_chunks.shape[:2]
        return np.asarray(
            [[chunk_quality(envs[e], exec_chunks[e, i]) for i in range(kn)]
             for e in range(e_n)], np.float32)

    return score_fn


def run_cell(policy_params, verifier_params, pcfg, vcfg, stats,
             mode: str, n_samples: int, trials: int, n_parallel: int,
             seed: int, out_dir=None):
    from cover_vla_tpu.configs import CoVerConfig
    from cover_vla_tpu.eval.evaluator import (
        EvalConfig, evaluate_suite_batched)
    from cover_vla_tpu.eval.fake_env import make_fake_env
    from cover_vla_tpu.data.tokenizer import (
        make_policy_tokenizer, make_verifier_tokenizer)

    if out_dir:
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)  # stale episode pkls
    if mode == "oracle":
        # the verifier-quality CEILING: engine-native injected scores from
        # the privileged progress oracle, pure grouped argmax (threshold
        # +inf disables the stage-1 gate — raw potential gains are not on
        # the cosine scale it was tuned for) and no gripper vote (the
        # oracle's gripper choice IS the evaluated quantity)
        ccfg = CoVerConfig(
            n_samples=n_samples, n_rephrases=1, noise_std=1.0,
            selection="injected", gripper_vote=False,
            rescore_threshold=float("inf"),
            max_history=vcfg.history_length - pcfg.chunk_size)
        score_fn_factory = oracle_score_factory
    else:
        ccfg = CoVerConfig(
            n_samples=n_samples, n_rephrases=1, noise_std=1.0,
            selection=mode, gripper_vote=(mode == "verifier"),
            max_history=vcfg.history_length - pcfg.chunk_size)
        score_fn_factory = None
    ecfg = EvalConfig(task_suite=TASK, num_trials_per_task=trials,
                      max_steps=MAX_ENV_STEPS, seed=1000, seed_period=10_000)
    out = evaluate_suite_batched(
        policy_params, verifier_params, pcfg, vcfg, ccfg, ecfg,
        n_parallel=n_parallel,
        env_fn=lambda t: make_fake_env(t, max_steps=MAX_ENV_STEPS),
        stats=stats, seed=seed,
        policy_tokenizer=make_policy_tokenizer(pcfg.paligemma.vocab_size),
        verifier_tokenizer=make_verifier_tokenizer(vcfg.text.vocab_size),
        out_dir=out_dir, score_fn_factory=score_fn_factory)
    task_stats = out["summary"]["per_task"][TASK]
    succ = [e["success"] for e in task_stats["per_episode"]]
    k, n = int(np.sum(succ)), len(succ)
    lo, hi = wilson_ci(k, n)
    return {"mode": mode, "n_samples": n_samples, "successes": k,
            "episodes": n, "success_rate": k / n,
            "ci95": [round(lo, 4), round(hi, 4)],
            "mean_steps": task_stats["mean_steps"],
            "actions_per_sec": round(out["actions_per_sec"], 1)}


GRID = [("first", 1), ("random", 5), ("random", 16), ("random", 40),
        ("verifier", 1), ("verifier", 5), ("verifier", 16),
        ("verifier", 40)]


def cmd_eval(args):
    pcfg, vcfg = experiment_configs()
    _, stats = _load_demos()
    policy_params = _load_tree(os.path.join(ART_DIR, "policy_params.pkl"))
    verifier_params = _load_tree(
        os.path.join(ART_DIR, "verifier_params.pkl"))

    cells = []
    if args.merge and os.path.exists(os.path.join(ART_DIR, "results.json")):
        with open(os.path.join(ART_DIR, "results.json")) as f:
            cells = [c for c in json.load(f)["grid"]
                     if args.modes and c["mode"] not in args.modes]
    for mode, n_samples in GRID:
        if args.modes and mode not in args.modes:
            continue
        t0 = time.time()
        out_dir = os.path.join(ART_DIR, "episodes",
                               f"{mode}_N{n_samples}")
        cell = run_cell(policy_params, verifier_params, pcfg, vcfg, stats,
                        mode, n_samples, trials=args.trials,
                        n_parallel=args.n_parallel, seed=7,
                        out_dir=out_dir)
        cell["wall_s"] = round(time.time() - t0, 1)
        cells.append(cell)
        print(f"  {mode:9s} N={n_samples:3d}: "
              f"{cell['success_rate']:.2f} "
              f"[{cell['ci95'][0]:.2f},{cell['ci95'][1]:.2f}] "
              f"({cell['episodes']} eps, {cell['wall_s']}s)")

    # cross-check one cell's numbers through the offline analyzer — only
    # when the verifier N=16 cell was evaluated IN THIS INVOCATION (its
    # episode dir is gitignored and may be stale/absent under --modes)
    v16_dir = os.path.join(ART_DIR, "episodes", "verifier_N16")
    if ((not args.modes or "verifier" in args.modes)
            and os.path.isdir(v16_dir)):
        from cover_vla_tpu.eval import analyze
        agg = analyze.aggregate(analyze.load_episodes(v16_dir))
        v16 = next(c for c in cells
                   if c["mode"] == "verifier" and c["n_samples"] == 16)
        assert abs(agg["per_task"][TASK]["success_rate"]
                   - v16["success_rate"]) < 1e-9, "analyzer disagreement"

    if args.with_oracle and (not args.modes or 'oracle' in args.modes):
        for n_samples in (5, 16, 40):
            t0 = time.time()
            cell = run_cell(policy_params, verifier_params, pcfg, vcfg,
                            stats, "oracle", n_samples, trials=args.trials,
                            n_parallel=args.n_parallel, seed=7,
                            out_dir=os.path.join(ART_DIR, "episodes",
                                                 f"oracle_N{n_samples}"))
            cell["wall_s"] = round(time.time() - t0, 1)
            cells.append(cell)
            print(f"  {'oracle':9s} N={n_samples:3d}: "
                  f"{cell['success_rate']:.2f} "
                  f"[{cell['ci95'][0]:.2f},{cell['ci95'][1]:.2f}] "
                  f"({cell['episodes']} eps, {cell['wall_s']}s)")

    with open(os.path.join(ART_DIR, "results.json"), "w") as f:
        json.dump({"grid": cells, "task": TASK,
                   "trials_per_cell": args.trials}, f, indent=1)
    print("saved results.json (analyzer cross-check ok)")


# ---------------------------------------------------------------------------
# Stage: report
# ---------------------------------------------------------------------------


def cmd_report(args):
    with open(os.path.join(ART_DIR, "results.json")) as f:
        res = json.load(f)
    cells = {(c["mode"], c["n_samples"]): c for c in res["grid"]}
    ns = sorted({c["n_samples"] for c in res["grid"] if c["mode"] != "first"})

    def fmt(c):
        if c is None:
            return "—"
        return (f"{100 * c['success_rate']:.0f}% "
                f"[{100 * c['ci95'][0]:.0f}, {100 * c['ci95'][1]:.0f}]")

    lines = [
        "# Verification scaling on the fake-env benchmark",
        "",
        "The repo's analog of the reference's headline table"
        " (`/root/reference/README.md:136-155`): a tiny pi0"
        " behaviour-cloned from a noisy scripted expert, a tiny"
        " contrastively-trained verifier ensemble, and the real batched"
        " CoVer engine, on the scriptable `FakeWidowXEnv`"
        f" (task `{res['task']}`, {res['trials_per_cell']} episodes/cell,"
        " 95% Wilson CIs).",
        "",
        "Selection modes (`CoVerConfig.selection`): **verifier** = the"
        " CoVer loop (two-stage verified selection + gripper vote);"
        " **random** = a uniformly random candidate executes (statistically"
        " identical to plain pi0 — candidates are iid); **first** ="
        " candidate 0 (plain pi0, shares the verifier arm's noise stream);"
        " **oracle** = privileged selection by true env progress"
        " (`fake_expert.chunk_quality`) — the ceiling a perfect scorer"
        " would reach through the same sample->select loop.",
        "",
        "| selection | " + " | ".join(f"N={n}" for n in ns) + " |",
        "|---|" + "---|" * len(ns),
    ]
    for mode in ("first", "random", "verifier", "oracle"):
        row = [fmt(cells.get((mode, n)) or
                   (cells.get((mode, 1)) if mode == "first" else None))
               for n in ns]
        lines.append(f"| {mode} | " + " | ".join(row) + " |")
    f1 = cells.get(("first", 1))
    if f1:
        lines += ["", f"pi0 baseline (N=1): {fmt(f1)}."]
    v16, r16 = cells.get(("verifier", 16)), cells.get(("random", 16))
    if v16 and r16:
        lines += ["",
                  f"At N=16 the verifier arm reaches "
                  f"{100 * v16['success_rate']:.0f}% vs "
                  f"{100 * r16['success_rate']:.0f}% for random selection "
                  f"({v16['successes']}/{v16['episodes']} vs "
                  f"{r16['successes']}/{r16['episodes']}).",
                  "",
                  "Reproduce: `JAX_PLATFORMS=cpu python "
                  "scripts/verification_scaling.py all` "
                  "(stages: demos, train_policy, train_verifier, eval, "
                  "report). CI regression: "
                  "`tests/test_verification_scaling.py`."]
    md = "\n".join(lines) + "\n"
    path = os.path.join(REPO, "docs", "verification_scaling.md")
    with open(path, "w") as f:
        f.write(md)
    print(md)
    print(f"wrote {path}")


def _force_cpu():
    """CPU-only experiment. jax is PRE-imported by sitecustomize with
    JAX_PLATFORMS=axon (remote TPU tunnel); the env var alone does not
    stick — BOTH the assignment and config.update are required
    (CLAUDE.md), otherwise every engine dispatch silently rides the
    exclusive tunnel and concurrent runs deadlock it."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    _force_cpu()
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("demos")
    d.add_argument("--n-demos", type=int, default=300)
    d.add_argument("--demo-noise", type=float, default=0.008)
    d.set_defaults(fn=cmd_demos)

    p = sub.add_parser("train_policy")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.set_defaults(fn=cmd_train_policy)

    rk = sub.add_parser("rankdata")
    rk.add_argument("--episodes", type=int, default=60)
    rk.add_argument("--n-candidates", type=int, default=16)
    rk.add_argument("--noise-std", type=float, default=1.0)
    rk.set_defaults(fn=cmd_rankdata)

    v = sub.add_parser("train_verifier")
    v.add_argument("--steps", type=int, default=4000)
    v.add_argument("--batch", type=int, default=24)
    v.add_argument("--lr", type=float, default=1e-3)
    v.add_argument("--members", type=int, default=2)
    v.add_argument("--tau", type=float, default=1.0)
    v.add_argument("--objective", default="regression",
                   choices=["regression", "listwise"])
    v.add_argument("--min-spread", type=float, default=0.02)
    v.add_argument("--augment", action=argparse.BooleanOptionalAction,
                   default=True)
    v.set_defaults(fn=cmd_train_verifier)

    e = sub.add_parser("eval")
    e.add_argument("--trials", type=int, default=100)
    e.add_argument("--n-parallel", type=int, default=10)
    e.add_argument("--with-oracle", action=argparse.BooleanOptionalAction,
                   default=True)
    e.add_argument("--modes", nargs="*", default=None,
                   help="restrict to these selection modes")
    e.add_argument("--merge", action="store_true",
                   help="merge with existing results.json cells")
    e.set_defaults(fn=cmd_eval)

    r = sub.add_parser("report")
    r.set_defaults(fn=cmd_report)

    a = sub.add_parser("all")
    a.set_defaults(fn=None)
    args = ap.parse_args()

    if args.cmd == "all":
        # re-parse each stage's own subcommand so every argparse default
        # (merge/modes/trials/...) applies — a hand-built Namespace once
        # crashed cmd_eval hours into the pipeline by omitting `merge`
        for argv in (["demos"],
                     ["train_policy"],
                     ["rankdata"],
                     ["train_verifier"],
                     ["eval"],
                     ["report"]):
            stage_args = ap.parse_args(argv)
            stage_args.fn(stage_args)
    else:
        args.fn(args)


if __name__ == "__main__":
    main()
