"""OOD failure-mode diagnostics for the verification-scaling verifier.

Separates the two candidate culprits behind the round-4 OOD flatness
(VERDICT r4 missing-item 1):

  probe   Is the BACKBONE the problem? Fit one linear localisation probe
          (frozen features -> blob positions) on domain-randomized
          synthetic frames, then report per-domain MAE on: ID frames,
          each OOD task's frames, and fresh DR frames. A backbone that
          localises ID but not OOD scenes caps any head.

  regret  Are the HEADS the problem? Collect engine-native candidate
          slates (the exact propose path deployment uses) on the ID task
          and each OOD task, label every candidate with the privileged
          chunk_quality oracle, and report selection regret + top-1 for
          each verifier checkpoint. High OOD regret with a healthy probe
          indicts the ranking heads.

Usage:  JAX_PLATFORMS=cpu python scripts/ood_diagnostics.py probe|regret|all
           [--verifiers verifier_params.pkl verifier_dr_params.pkl]
           [--episodes 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from verification_scaling import (  # noqa: E402
    ART_DIR, MAX_ENV_STEPS, TASK, _load_demos, _load_tree,
    _random_appearance, _synth_localisation_frames, _verifier_preprocess_fn,
    experiment_configs)

OOD_TASKS = ("widowx_redbull_on_plate", "widowx_zucchini_on_towel",
             "widowx_tennis_ball_in_basket")


def _domain_frames(n_per: int = 192, seed: int = 31):
    """Labelled frames per domain: ID, each OOD task, fresh DR."""
    from cover_vla_tpu.eval.fake_env import FakeWidowXEnv
    rng = np.random.default_rng(seed)
    domains = {}

    def one(task, appearance=None):
        env = FakeWidowXEnv(task, appearance=appearance)
        env.reset(seed=int(rng.integers(1 << 31)))
        env._ee = rng.uniform([-0.16, -0.16, 0.0], [0.16, 0.16, 0.2])
        if rng.random() < 0.35:
            env._grasped = True
            env._obj = env._ee.copy()
            env._gripper = 0.1
        return env.render(), np.concatenate(
            [env._ee[:2], env._obj[:2], env._target[:2],
             [float(env._grasped)]]).astype(np.float32)

    def roll(task, appearance_fn=lambda: None):
        pairs = [one(task, appearance_fn()) for _ in range(n_per)]
        return (np.stack([p[0] for p in pairs]),
                np.stack([p[1] for p in pairs]))

    domains["id"] = roll(TASK)
    for t in OOD_TASKS:
        domains[t.replace("widowx_", "")] = roll(t)
    domains["dr_fresh"] = roll(TASK, lambda: _random_appearance(rng))
    return domains


def cmd_probe(args):
    import jax
    import jax.numpy as jnp
    import optax
    from cover_vla_tpu.models import siglip

    _, vcfg = experiment_configs()
    prep = _verifier_preprocess_fn(vcfg)

    towers = {}
    pv = os.path.join(ART_DIR, "pretrained_vision.pkl")
    if os.path.exists(pv):
        towers["pretrained_vision"] = _load_tree(pv)
    for name in args.verifiers:
        path = os.path.join(ART_DIR, name)
        if os.path.exists(path):
            towers[name] = _load_tree(path)["backbone"]["vision"]

    # probe training set: DR synthetic frames (the breadth distribution)
    frames, positions, _ = _synth_localisation_frames(args.probe_frames,
                                                      seed=11, id_frac=0.25)
    targets = np.concatenate([positions[:, 0:2], positions[:, 3:5],
                              positions[:, 6:8]], 1).astype(np.float32) / 0.1
    domains = _domain_frames(args.frames_per_domain)
    report = {}
    for name, vision in towers.items():
        t0 = time.time()

        def feats_of(raw, _vision=vision):
            out = []
            for i in range(0, len(raw), 64):
                x = prep(raw[i:i + 64])
                f = siglip.vit_forward(_vision, vcfg.vision, x).last_attn_out
                out.append(np.asarray(f, np.float32).reshape(len(x), -1))
            return np.concatenate(out)

        ftr = feats_of(frames)
        # ridge via SGD on-device (closed form would need a 16k x 16k solve)
        d = ftr.shape[1]
        head = {"k": jnp.zeros((d, targets.shape[1]), jnp.float32),
                "b": jnp.zeros((targets.shape[1],), jnp.float32)}
        tx = optax.adam(1e-3)
        opt = tx.init(head)

        @jax.jit
        def step(head, opt, f, y):
            def loss(h):
                return jnp.mean((f @ h["k"] + h["b"] - y) ** 2) \
                    + 1e-5 * jnp.sum(h["k"] ** 2)
            g = jax.grad(loss)(head)
            up, opt = tx.update(g, opt, head)
            return optax.apply_updates(head, up), opt

        rng = np.random.default_rng(0)
        dev_f, dev_y = jax.device_put(ftr), jax.device_put(targets)
        for it in range(args.probe_steps):
            idx = rng.integers(0, len(ftr), 128)
            head, opt = step(head, opt, dev_f[idx], dev_y[idx])
        k, b = np.asarray(head["k"]), np.asarray(head["b"])

        row = {}
        for dom, (df, dp) in domains.items():
            dy = np.concatenate([dp[:, 0:2], dp[:, 2:4], dp[:, 4:6]],
                                1) / 0.1
            pred = feats_of(df) @ k + b
            err = np.abs(pred - dy) * 0.1          # world units
            row[dom] = {"mae": round(float(err.mean()), 4),
                        "mae_obj": round(float(err[:, 2:4].mean()), 4),
                        "mae_target": round(float(err[:, 4:6].mean()), 4)}
        report[name] = row
        print(f"probe[{name}] ({time.time() - t0:.0f}s): " + "  ".join(
            f"{dom}={r['mae']:.3f}(obj {r['mae_obj']:.3f})"
            for dom, r in row.items()))
    _write(args, "probe", report)


def _collect_slates(task: str, episodes: int, n_parallel: int,
                    n_candidates: int, seed: int):
    """Engine-native candidate slates with privileged quality labels —
    cmd_rankdata's collection loop pointed at an arbitrary task."""
    from cover_vla_tpu.configs import CoVerConfig
    from cover_vla_tpu.engine.batched_engine import (
        BatchedCoVerEngine, evaluate_batched)
    from cover_vla_tpu.eval.fake_env import FakeWidowXEnv
    from cover_vla_tpu.eval.fake_expert import chunk_quality
    from cover_vla_tpu.eval.adapters import BridgeSimplerAdapter
    from cover_vla_tpu.data.tokenizer import (
        make_policy_tokenizer, make_verifier_tokenizer)

    pcfg, vcfg = experiment_configs()
    _, stats = _load_demos()
    pp = _load_tree(os.path.join(ART_DIR, "policy_params.pkl"))
    E = n_parallel
    ccfg = CoVerConfig(
        n_samples=n_candidates, n_rephrases=1, noise_std=1.0,
        selection="injected", gripper_vote=False,
        rescore_threshold=float("inf"),
        max_history=vcfg.history_length - pcfg.chunk_size)
    engine = BatchedCoVerEngine(
        pp, None, pcfg, vcfg, ccfg, num_episodes=E, stats=stats,
        policy_tokenizer=make_policy_tokenizer(pcfg.paligemma.vocab_size),
        verifier_tokenizer=make_verifier_tokenizer(vcfg.text.vocab_size),
        seed=seed)

    frames, trajs, quals, grasped = [], [], [], []
    rng = np.random.default_rng(seed)

    def factory(envs):
        def score_fn(exec_chunks, proposal):
            live = ~engine.done
            kn = exec_chunks.shape[1]
            tr = np.asarray(proposal.trajectories)
            for e, env in enumerate(envs):
                if not live[e]:
                    continue
                q = np.array([chunk_quality(env, exec_chunks[e, i])
                              for i in range(kn)], np.float32)
                frames.append(env.render())
                trajs.append(tr[e])
                quals.append(q)
                grasped.append(bool(env._grasped))
            return rng.random((len(envs), kn)).astype(np.float32)
        return score_fn

    engine.score_fn_factory = factory
    adapter = BridgeSimplerAdapter()
    done = 0
    while done < episodes:
        envs = [FakeWidowXEnv(task, max_steps=MAX_ENV_STEPS)
                for _ in range(E)]
        evaluate_batched(engine, envs, adapter,
                         max_steps=MAX_ENV_STEPS,
                         seeds=[70_000 + done + j for j in range(E)])
        done += E
    return (np.stack(frames), np.stack(trajs), np.stack(quals),
            np.array(grasped))


def cmd_regret(args):
    import jax
    import jax.numpy as jnp
    from cover_vla_tpu.models import verifier as _verifier
    from cover_vla_tpu.data.tokenizer import make_verifier_tokenizer
    from cover_vla_tpu.eval.benchmark import TASK_INSTRUCTIONS

    pcfg, vcfg = experiment_configs()
    prep = _verifier_preprocess_fn(vcfg)
    vtok = make_verifier_tokenizer(vcfg.text.vocab_size)

    checkpoints = {}
    for name in args.verifiers:
        path = os.path.join(ART_DIR, name)
        if os.path.exists(path):
            checkpoints[name] = _load_tree(path)

    report = {}
    for task in (TASK,) + OOD_TASKS:
        t0 = time.time()
        frames, trajs, quals, grasped = _collect_slates(
            task, args.episodes, args.n_parallel, args.n_candidates,
            seed=97)
        short = task.replace("widowx_", "")
        instr = TASK_INSTRUCTIONS.get(task, task.replace("_", " "))
        vt, _ = vtok.encode_batch([instr], vcfg.text.context_length)
        imgs = np.asarray(prep(frames))
        spread = quals.max(1) - quals.min(1)
        keep = spread > 0.02
        report[short] = {"slates": int(keep.sum()),
                         "collect_s": round(time.time() - t0, 1)}
        for name, params in checkpoints.items():
            score = jax.jit(lambda img, tr, _p=params: jax.vmap(
                lambda i, t: _verifier.score_actions(
                    _p, vcfg, i[None], vt, t))(img, tr))
            sc = np.asarray(score(imgs[keep], trajs[keep]))
            picks = sc.argmax(1)
            q = quals[keep]
            picked = np.take_along_axis(q, picks[:, None], 1)[:, 0]
            rnd = q.mean(1)
            gk = grasped[keep]
            row = {
                "regret": round(float((q.max(1) - picked).mean()), 3),
                "top1": round(float((picks == q.argmax(1)).mean()), 3),
                "vs_random_gain": round(float((picked - rnd).mean()), 3),
            }
            # phase-conditioned: carry/release decisions (grasped) are
            # where self-induced rollouts stall if the scorer inverts
            for phase, m in (("approach", ~gk), ("carry", gk)):
                if m.any():
                    row[f"gain_{phase}"] = round(
                        float((picked[m] - rnd[m]).mean()), 3)
            report[short][name] = row
        best_minus_rand = float((quals[keep].max(1)
                                 - quals[keep].mean(1)).mean())
        report[short]["oracle_headroom"] = round(best_minus_rand, 3)
        print(f"regret[{short}] " + json.dumps(report[short]))
    _write(args, "regret", report)


def cmd_lang(args):
    """Language-sensitivity of a verifier on GROUNDED rankdata slates:
    selection gain under (a) the recorded shape-noun instruction, (b) the
    instruction with the object noun swapped to a different shape's noun,
    (c) the ID task instruction. A grounded verifier shows (a) > (b): the
    noun steers which blob the score tracks — the repo's analog of the
    reference's wrong-instruction rejection."""
    import jax
    from cover_vla_tpu.models import verifier as _verifier
    from cover_vla_tpu.data.tokenizer import make_verifier_tokenizer
    from cover_vla_tpu.eval.benchmark import TASK_INSTRUCTIONS
    from verification_scaling import _SHAPE_NOUNS

    pcfg, vcfg = experiment_configs()
    prep = _verifier_preprocess_fn(vcfg)
    vtok = make_verifier_tokenizer(vcfg.text.vocab_size)
    rd = np.load(os.path.join(ART_DIR, args.data))
    if "instrs" not in rd:
        print(f"{args.data} carries no grounded instructions; re-collect "
              "with rankdata --domain-rand")
        return
    instrs = np.asarray(rd["instrs"])
    id_instr = TASK_INSTRUCTIONS.get(TASK, TASK.replace("_", " "))
    gmask = instrs != id_instr
    quals = rd["quals"]
    spread = quals.max(1) - quals.min(1)
    keep = np.nonzero(gmask & (spread > 0.02))[0]
    rng = np.random.default_rng(5)
    if len(keep) > args.max_slates:
        keep = rng.choice(keep, args.max_slates, replace=False)
    print(f"lang: {len(keep)} grounded slates from {args.data}")

    noun_to_shape = {n: s for s, ns in _SHAPE_NOUNS.items() for n in ns}
    all_nouns = sorted(noun_to_shape)

    def swap_noun(s: str) -> str:
        words = s.split()
        for i, w in enumerate(words):
            shape = noun_to_shape.get(w)
            if shape is not None:
                others = [n for n in all_nouns
                          if noun_to_shape[n] != shape]
                words[i] = others[rng.integers(len(others))]
                return " ".join(words)
        return s

    variants = {
        "grounded": [str(s) for s in instrs[keep]],
        "wrong_noun": [swap_noun(str(s)) for s in instrs[keep]],
        "id_instruction": [id_instr] * len(keep),
    }
    imgs = np.asarray(prep(rd["frames"][keep]))
    trajs = rd["trajs"][keep].astype(np.float32)
    q = quals[keep]
    report = {"slates": int(len(keep)), "data": args.data}
    for name in args.verifiers:
        path = os.path.join(ART_DIR, name)
        if not os.path.exists(path):
            continue
        params = _load_tree(path)
        score = jax.jit(lambda img, vt1, tr: jax.vmap(
            lambda i, v, t: _verifier.score_actions(
                params, vcfg, i[None], v[None], t))(img, vt1, tr))
        row = {}
        for key, texts in variants.items():
            vt, _ = vtok.encode_batch(texts, vcfg.text.context_length)
            sc = np.asarray(score(imgs, vt, trajs))
            picked = np.take_along_axis(q, sc.argmax(1)[:, None], 1)[:, 0]
            row[key] = {
                "vs_random_gain": round(float((picked - q.mean(1)).mean()),
                                        3),
                "top1": round(float((sc.argmax(1) == q.argmax(1)).mean()),
                              3),
            }
        row["noun_sensitivity"] = round(
            row["grounded"]["vs_random_gain"]
            - row["wrong_noun"]["vs_random_gain"], 3)
        report[name] = row
        print(f"lang[{name}] " + json.dumps(row))
    _write(args, "lang", report)


def _write(args, key, payload):
    path = os.path.join(ART_DIR, "ood_diagnostics.json")
    blob = {}
    if os.path.exists(path):
        with open(path) as f:
            blob = json.load(f)
    blob[key] = payload
    with open(path, "w") as f:
        json.dump(blob, f, indent=1)
    print(f"wrote {path} [{key}]")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cmd", choices=["probe", "regret", "lang", "all"])
    ap.add_argument("--verifiers", nargs="*",
                    default=["verifier_params.pkl",
                             "verifier_dr_params.pkl"])
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--n-parallel", type=int, default=10)
    ap.add_argument("--n-candidates", type=int, default=16)
    ap.add_argument("--probe-frames", type=int, default=2048)
    ap.add_argument("--probe-steps", type=int, default=3000)
    ap.add_argument("--frames-per-domain", type=int, default=192)
    ap.add_argument("--data", default="rankdata_dr.npz",
                    help="grounded rankdata npz for the lang diagnostic")
    ap.add_argument("--max-slates", type=int, default=512)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    cache = os.path.expanduser("~/.cache/jax_comp_cache_cpu")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if args.cmd in ("probe", "all"):
        cmd_probe(args)
    if args.cmd in ("regret", "all"):
        cmd_regret(args)
    if args.cmd in ("lang", "all"):
        cmd_lang(args)


if __name__ == "__main__":
    main()
