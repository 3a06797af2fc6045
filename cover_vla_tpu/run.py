"""Unified CLI entry point (INT-ACT src/agent/run.py equivalent).

Roles:
  train            — pi0 finetuning on a trajectory dataset (npz dir)
  train_pi0fast    — pi0-FAST finetuning (CE over FAST action tokens)
  train_verifier   — verifier contrastive training
  serve_policy     — websocket policy server (pi0 or CoVer engine)
  eval             — closed-loop CoVer evaluation on a benchmark suite
  bench            — the perf benchmark (same as bench.py)

Usage: python -m cover_vla_tpu.run --role train --config cfg.yaml \
       --train.batch_size 32
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass(frozen=True)
class TrainCfg:
    batch_size: int = 32
    num_steps: int = 1000
    lr: float = 5e-5
    warmup_steps: int = 100
    grad_accum: int = 1
    optimizer: str = "adamw"    # adamw | adamw_8bit (quantised moments)
    train_expert_only: bool = True   # freeze VLM+vision; grads/moments only
                                     # for the expert + projections
    dp: int = 0                 # 0 = auto (all devices on fsdp)
    fsdp: int = 0
    checkpoint_dir: str = "checkpoints"
    save_every: int = 500
    keep_last: int = 3
    resume: bool = False
    dataset_dir: str = ""       # dir of .npz trajectories / rlds shards
    data_format: str = "npz"    # npz | rlds (TFDS/OXE TFRecord shards)
    shuffle_buffer: int = 1000  # interleave shuffle buffer (rlds_dataset.py)
    augment: bool = False       # on-device random_resized_crop + color jitter
    paraphrase_json: str = ""   # rephrase store for ParaphraseAugment
    paraphrase_prob: float = 0.5
    val_every: int = 0          # 0 = no validation (trainer.py:347-383)
    val_batches: int = 4        # held-out batches rolled per validation
    val_fraction: float = 0.1   # held-out fraction (verifier training)
    num_members: int = 3        # verifier ensemble size
    metrics_jsonl: str = ""     # default: <checkpoint_dir>/metrics.jsonl
    wandb_project: str = ""
    tiny: bool = False          # tiny model (CI)
    seed: int = 42


@dataclass(frozen=True)
class ServeCfg:
    host: str = "0.0.0.0"
    port: int = 8000
    mode: str = "pi0"           # pi0 | cover
    checkpoint: str = ""
    verifier_checkpoint: str = ""   # cover mode
    n_samples: int = 5              # cover mode: candidates per prompt
    n_rephrases: int = 8
    tiny: bool = False
    # serving a real checkpoint without real tokenizer artifacts emits
    # garbage — refuse unless explicitly allowed
    allow_hash_tokenizer: bool = False
    tokenizer: str = ""             # policy tokenizer path override
    # serving-time int8 (w8a8) quantization — same modes as EvalCfg
    quantize: str = "none"


@dataclass(frozen=True)
class EvalCfg:
    task_suite: str = "simpler_widowx"
    num_trials_per_task: int = 10
    max_steps: int = 150
    n_samples: int = 5
    n_rephrases: int = 8
    # candidate selection: verifier (CoVer loop) | random | first — the
    # ablation arms of the reference's headline table (README.md:136-155)
    selection: str = "verifier"
    # >1 routes through the lockstep-batched engine (the reference's
    # n_parallel_eval, configuration_pipeline.py:125); throughput then
    # matches bench's batched numbers instead of the single-episode path
    n_parallel: int = 1
    # two-cohort pipelined dispatch (2*n_parallel episodes in flight)
    pipelined: bool = False
    out_dir: str = "eval_out"
    policy_checkpoint: str = ""
    verifier_checkpoint: str = ""
    # dataset-statistics JSON for BOTH the engine normalization and the env
    # adapter ("" = vendored bridge stats). google_robot suites REQUIRE an
    # explicit (fractal) path — Bridge bounds would silently mis-normalize
    dataset_statistics: str = ""
    tokenizer: str = ""             # policy tokenizer path override
    verifier_tokenizer: str = ""
    allow_hash_tokenizer: bool = False
    # serving-time int8 (w8a8) quantization (ops/quant.py; ~1.2x on the
    # v5e MXU): none | int8 (policy Gemma stacks + vision tower) |
    # int8_full (also the verifier's SigLIP2 backbone)
    quantize: str = "none"
    tiny: bool = False
    seed: int = 7


@dataclass(frozen=True)
class RunCfg:
    role: str = "eval"
    train: TrainCfg = TrainCfg()
    serve: ServeCfg = ServeCfg()
    eval: EvalCfg = EvalCfg()


def _load_trajectories(dataset_dir: str):
    """Each .npz holds one trajectory: images/states/actions (+task str)."""
    trajs = []
    for fn in sorted(os.listdir(dataset_dir)):
        if fn.endswith(".npz"):
            z = np.load(os.path.join(dataset_dir, fn), allow_pickle=True)
            trajs.append({
                "images": z["images"], "states": z["states"],
                "actions": z["actions"],
                "task": str(z["task"]) if "task" in z else "",
            })
    if not trajs:
        raise FileNotFoundError(f"no .npz trajectories in {dataset_dir}")
    return trajs


def role_train(cfg: RunCfg):
    import jax
    import jax.numpy as jnp
    from cover_vla_tpu.configs import Pi0Config, tiny_pi0_config
    from cover_vla_tpu.data.pipeline import (
        FrameDataset, StreamingFrameDataset, ParaphraseAugment, interleave,
        batcher, make_pi0_batch, prefetch)
    from cover_vla_tpu.data.tokenizer import make_policy_tokenizer
    from cover_vla_tpu.parallel.mesh import make_mesh
    from cover_vla_tpu.parallel.distributed import aggregate_metrics
    from cover_vla_tpu.training import train_pi0
    from cover_vla_tpu.training.optim import warmup_cosine
    from cover_vla_tpu.training.validation import validate_pi0
    from cover_vla_tpu.convert import checkpoints
    from cover_vla_tpu.utils.metrics_sink import make_sinks
    from cover_vla_tpu.utils.monitor import setup_logger, Timer

    log = setup_logger("train")
    t = cfg.train
    mcfg = tiny_pi0_config() if t.tiny else Pi0Config()
    tok = make_policy_tokenizer(mcfg.paligemma.vocab_size)

    paraphrase = None
    if t.paraphrase_json:
        from cover_vla_tpu.eval.rephrase import load_rephrases
        paraphrase = ParaphraseAugment(load_rephrases(t.paraphrase_json),
                                       prob=t.paraphrase_prob)
    if t.data_format == "rlds":
        from cover_vla_tpu.data.rlds import RldsShardDataset
        ds = StreamingFrameDataset(RldsShardDataset(t.dataset_dir),
                                   chunk_size=mcfg.chunk_size,
                                   paraphrase=paraphrase)
    else:
        trajs = _load_trajectories(t.dataset_dir)
        ds = FrameDataset(trajs, chunk_size=mcfg.chunk_size,
                          paraphrase=paraphrase)

    s = mcfg.vision.image_size
    if t.augment:
        # on-device random_resized_crop + color jitter
        # (obs_transforms.py frame transforms), raw uint8 in
        from cover_vla_tpu.data import augment as aug

        @jax.jit
        def image_fn(key, imgs):
            keys = jax.random.split(key, imgs.shape[0])
            return jax.vmap(
                lambda k, im: aug.augment_frame(k, im, (s, s)))(keys, imgs)
    else:
        from cover_vla_tpu.ops.image import resize_bilinear_torch

        @jax.jit
        def image_fn(key, imgs):
            x = imgs.astype(jnp.float32) / 255.0 * 2.0 - 1.0
            if imgs.shape[1:3] != (s, s):
                x = resize_bilinear_torch(x, s, s)  # batched [B,H,W,C]
            return x

    def device_batch(frame_batch, key):
        batch = make_pi0_batch(frame_batch, tok, mcfg)
        batch["images"] = np.asarray(
            image_fn(key, np.asarray(frame_batch["image"])))[:, None]
        return batch

    sinks = make_sinks(
        jsonl_path=t.metrics_jsonl or os.path.join(t.checkpoint_dir,
                                                   "metrics.jsonl"),
        wandb_project=t.wandb_project or None)

    n = len(jax.devices())
    # the batch is sharded over every mesh device; fall back to single-device
    # execution when the batch cannot be divided evenly
    mesh = make_mesh(dp=t.dp or None, fsdp=t.fsdp or None) \
        if n > 1 and t.batch_size % n == 0 else None
    tx = train_pi0.make_optimizer(
        warmup_cosine(t.lr, t.warmup_steps, t.num_steps),
        optimizer=t.optimizer, accumulate_steps=t.grad_accum)
    with (mesh or _nullcontext()):
        if t.train_expert_only:
            # partitioned step: no grad buffers/moments for frozen weights —
            # on a mesh the full params AND the trainable-only optimizer
            # state are FSDP-sharded (reference freeze semantics,
            # paligemma_with_expert.py:196-209, hold at any mesh shape)
            state, mask = train_pi0.init_partitioned_train_state(
                jax.random.PRNGKey(t.seed), mcfg, tx, mesh=mesh)
            step_fn = train_pi0.make_partitioned_train_step(mcfg, tx, mask)
        else:
            state = train_pi0.init_train_state(
                jax.random.PRNGKey(t.seed), mcfg, tx, mesh=mesh)
            step_fn = train_pi0.make_train_step(mcfg, tx, mesh=mesh)
        start = 0
        if t.resume:
            state, start = checkpoints.restore_train_state(
                t.checkpoint_dir, state)
            log.info("resumed from step %d", start)

        timer = Timer()
        frames = prefetch(batcher(interleave([ds], seed=t.seed,
                                              shuffle_buffer=t.shuffle_buffer),
                                  t.batch_size))
        val_set = []
        if t.val_every:
            # hold out a STREAM of batches as the validation set; each
            # validation rolls select_action over all of them and averages
            # (trainer.py:347-383 validates a rolling stream, not one batch)
            for vb in range(max(1, t.val_batches)):
                val_set.append(device_batch(
                    next(frames), jax.random.PRNGKey(t.seed - 1 - vb)))
        for i, frame_batch in enumerate(frames):
            if start + i >= t.num_steps:
                break
            step_key = jax.random.PRNGKey(t.seed + start + i)
            batch = device_batch(frame_batch, jax.random.fold_in(step_key, 1))
            if mesh is not None:
                batch = train_pi0.shard_batch(batch, mesh)
            state, metrics = step_fn(state, step_key, batch)
            if (start + i) % 10 == 0:
                m = aggregate_metrics({k: float(v)
                                       for k, v in metrics.items()})
                sinks.log(m, step=start + i)
                log.info("step %d loss %.4f (%.2fs)", start + i,
                         m["loss"], timer.elapsed())
            if t.val_every and (start + i + 1) % t.val_every == 0:
                vms = [validate_pi0(state.params, mcfg, vb, seed=vi)
                       for vi, vb in enumerate(val_set)]
                val = {k: float(np.mean([m[k] for m in vms]))
                       for k in vms[0]}
                val = aggregate_metrics(val)
                sinks.log({f"val/{k}": v for k, v in val.items()},
                          step=start + i + 1)
                log.info("step %d val %s", start + i + 1, val)
            if (start + i + 1) % t.save_every == 0:
                checkpoints.save_train_state(
                    t.checkpoint_dir, start + i + 1, state,
                    keep_last=t.keep_last)
    checkpoints.save_train_state(t.checkpoint_dir, t.num_steps, state,
                                 keep_last=t.keep_last)
    sinks.close()
    log.info("done")


def role_train_pi0fast(cfg: RunCfg):
    """pi0-FAST finetuning: teacher-forced CE over FAST action tokens
    (the reference trains pi0fast through the same trainer entry,
    modeling_pi0fast.py:685-752). Shares the npz/rlds frame pipeline and
    checkpoint plumbing with role_train."""
    import jax
    import jax.numpy as jnp
    from cover_vla_tpu.models.pi0fast import (
        Pi0FastConfig, tiny_pi0fast_config)
    from cover_vla_tpu.data.pipeline import (
        FrameDataset, StreamingFrameDataset, interleave, batcher, prefetch)
    from cover_vla_tpu.data.tokenizer import make_policy_tokenizer
    from cover_vla_tpu.data.fast_tokenizer import FastActionTokenizer
    from cover_vla_tpu.parallel.distributed import aggregate_metrics
    from cover_vla_tpu.training import train_pi0fast
    from cover_vla_tpu.training.train_pi0 import make_optimizer, shard_batch
    from cover_vla_tpu.training.optim import warmup_cosine
    from cover_vla_tpu.convert import checkpoints
    from cover_vla_tpu.utils.metrics_sink import make_sinks
    from cover_vla_tpu.utils.monitor import setup_logger, Timer
    from cover_vla_tpu.ops.image import resize_bilinear_torch

    log = setup_logger("train_pi0fast")
    t = cfg.train
    mcfg = tiny_pi0fast_config() if t.tiny else Pi0FastConfig()
    tok = make_policy_tokenizer(mcfg.paligemma.vocab_size)

    if t.data_format == "rlds":
        from cover_vla_tpu.data.rlds import RldsShardDataset
        ds = StreamingFrameDataset(RldsShardDataset(t.dataset_dir),
                                   chunk_size=mcfg.chunk_size)
    else:
        ds = FrameDataset(_load_trajectories(t.dataset_dir),
                          chunk_size=mcfg.chunk_size)

    s = mcfg.vision.image_size

    @jax.jit
    def image_fn(imgs):
        x = imgs.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        if imgs.shape[1:3] != (s, s):
            x = resize_bilinear_torch(x, s, s)  # batched [B,H,W,C]
        return x

    fast = FastActionTokenizer(time_horizon=mcfg.chunk_size, action_dim=7)
    sinks = make_sinks(
        jsonl_path=t.metrics_jsonl or os.path.join(t.checkpoint_dir,
                                                   "metrics.jsonl"),
        wandb_project=t.wandb_project or None)

    n = len(jax.devices())
    mesh = None
    if n > 1 and t.batch_size % n == 0:
        from cover_vla_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=t.dp or None, fsdp=t.fsdp or None)
    tx = make_optimizer(warmup_cosine(t.lr, t.warmup_steps, t.num_steps),
                        optimizer=t.optimizer,
                        accumulate_steps=t.grad_accum)
    with (mesh or _nullcontext()):
        state = train_pi0fast.init_train_state(
            jax.random.PRNGKey(t.seed), mcfg, tx, mesh=mesh)
        step_fn = train_pi0fast.make_train_step(mcfg, tx, mesh=mesh)
        start = 0
        if t.resume:
            state, start = checkpoints.restore_train_state(
                t.checkpoint_dir, state)
            log.info("resumed from step %d", start)
        timer = Timer()
        frames = prefetch(batcher(interleave([ds], seed=t.seed,
                                             shuffle_buffer=t.shuffle_buffer),
                                  t.batch_size))
        for i, frame_batch in enumerate(frames):
            if start + i >= t.num_steps:
                break
            batch = train_pi0fast.make_fast_batch(frame_batch, tok, mcfg,
                                                  fast_tokenizer=fast)
            batch["images"] = np.asarray(
                image_fn(np.asarray(frame_batch["image"])))[:, None]
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = step_fn(state, batch)
            if (start + i) % 10 == 0:
                m = aggregate_metrics({k: float(v)
                                       for k, v in metrics.items()})
                sinks.log(m, step=start + i)
                log.info("step %d loss %.4f (%.2fs)", start + i,
                         m["loss"], timer.elapsed())
            if (start + i + 1) % t.save_every == 0:
                checkpoints.save_train_state(
                    t.checkpoint_dir, start + i + 1, state,
                    keep_last=t.keep_last)
    checkpoints.save_train_state(t.checkpoint_dir, t.num_steps, state,
                                 keep_last=t.keep_last)
    sinks.close()
    log.info("done")


def role_train_verifier(cfg: RunCfg):
    """Verifier ensemble training from a normalized Bridge-verifier JSON
    (train.dataset_dir points at the dataset json's directory or file).

    Full lifecycle (finetune_trajectory_bridge_ddp.py:511-671 semantics):
    trains ALL --train.num_members members in one vmapped step, validates
    retrieval top-1 on a held-out split, keeps the best checkpoint plus the
    last keep_last (manage_checkpoints), resumes from the optimizer state,
    and exports the merged ensemble in the reference .pt schema."""
    import jax
    from cover_vla_tpu.configs import VerifierConfig, tiny_verifier_config
    from cover_vla_tpu.data.bridge_verifier_dataset import BridgeVerifierDataset
    from cover_vla_tpu.data.tokenizer import make_verifier_tokenizer
    from cover_vla_tpu.parallel.distributed import aggregate_metrics
    from cover_vla_tpu.training import train_verifier
    from cover_vla_tpu.training.optim import linear_warmup, make_adamw
    from cover_vla_tpu.convert import checkpoints
    from cover_vla_tpu.utils.metrics_sink import make_sinks
    from cover_vla_tpu.utils.monitor import setup_logger

    log = setup_logger("train_verifier")
    t = cfg.train
    vcfg = tiny_verifier_config() if t.tiny else VerifierConfig()
    json_path = t.dataset_dir if t.dataset_dir.endswith(".json") else \
        os.path.join(t.dataset_dir, "dataset.json")
    ds = BridgeVerifierDataset(json_path, history_length=vcfg.history_length,
                               image_size=vcfg.vision.image_size)
    tok = make_verifier_tokenizer(vcfg.text.vocab_size)

    val_batch = None
    if t.val_every:
        ds, val_ds = ds.split(t.val_fraction, seed=t.seed)
        val_batch = next(val_ds.batches(
            min(t.batch_size, len(val_ds)), tok, vcfg.text.context_length,
            seed=0))
        val_batch.pop("instructions")

    tx = make_adamw(linear_warmup(t.lr, t.warmup_steps))
    backbone, state = train_verifier.init_train_state(
        jax.random.PRNGKey(t.seed), vcfg, tx, num_members=t.num_members)
    # DDP-equivalent mesh (sharded batch, local InfoNCE, grad pmean) when
    # the batch divides over the devices
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and t.batch_size % n_dev == 0:
        from cover_vla_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=n_dev, fsdp=1)
    step_fn = train_verifier.make_ensemble_train_step(vcfg, tx, mesh=mesh)
    sinks = make_sinks(
        jsonl_path=t.metrics_jsonl or os.path.join(t.checkpoint_dir,
                                                   "metrics.jsonl"),
        wandb_project=t.wandb_project or None)

    start = 0
    if t.resume:
        payload = {"members": state.members, "opt_state": state.opt_state,
                   "backbone": backbone}
        payload, start = checkpoints.restore_train_state(
            t.checkpoint_dir, payload)
        state = train_verifier.VerifierTrainState(
            payload["members"], payload["opt_state"], state.step)
        backbone = payload["backbone"]
        log.info("resumed from step %d", start)

    def save(step_i):
        checkpoints.save_train_state(
            t.checkpoint_dir, step_i,
            {"members": state.members, "opt_state": state.opt_state,
             "backbone": backbone}, keep_last=t.keep_last)

    best_top1 = -1.0
    i = start
    while i < t.num_steps:
        for batch in ds.batches(t.batch_size, tok,
                                vcfg.text.context_length, seed=t.seed + i):
            batch.pop("instructions")
            if mesh is not None:
                batch = train_verifier.shard_verifier_batch(batch, mesh)
            state, metrics = step_fn(state, backbone, batch)
            if i % 10 == 0:
                m = aggregate_metrics(
                    {k: float(v) for k, v in metrics.items()
                     if getattr(v, "ndim", 0) == 0})
                sinks.log(m, step=i)
                log.info("step %d loss %.4f top1 %.3f", i, m["loss"],
                         m["top1_i2a"])
            i += 1
            if t.val_every and val_batch is not None \
                    and i % t.val_every == 0:
                val = train_verifier.ensemble_eval_metrics(
                    state.members, vcfg, backbone, val_batch)
                val = aggregate_metrics(
                    {k: float(v) for k, v in val.items()})
                sinks.log({f"val/{k}": v for k, v in val.items()}, step=i)
                log.info("step %d val top1 %.3f", i, val["top1_i2a"])
                save(i)
                if val["top1_i2a"] > best_top1:
                    best_top1 = val["top1_i2a"]
                    checkpoints.save_params(
                        os.path.join(t.checkpoint_dir, "best"),
                        {"members": state.members, "backbone": backbone})
            if i >= t.num_steps:
                break
    save(t.num_steps)
    # merged-ensemble export in the reference schema
    # (efficient_ensemble_merged.py:36-53); round-trips through
    # convert.verifier_from_torch.convert_merged_checkpoint
    try:
        from cover_vla_tpu.convert.verifier_to_torch import (
            save_merged_ensemble)
        save_merged_ensemble(
            os.path.join(t.checkpoint_dir, "merged_ensemble.pt"),
            state.members, vcfg)
        log.info("exported merged ensemble (%d members)", t.num_members)
    except ImportError:
        log.warning("torch unavailable: merged-ensemble export skipped")
    sinks.close()
    log.info("done")


def build_server(cfg: RunCfg):
    import jax
    from cover_vla_tpu.configs import Pi0Config, tiny_pi0_config
    from cover_vla_tpu.data.tokenizer import make_policy_tokenizer
    from cover_vla_tpu.models import pi0
    from cover_vla_tpu.serving import (
        WebsocketPolicyServer, Pi0PolicyWrapper)
    from cover_vla_tpu.convert.loaders import (
        load_policy_params, load_verifier_params)

    s = cfg.serve
    if s.quantize not in ("none", "int8", "int8_full"):
        raise SystemExit(f"--serve.quantize {s.quantize!r}: "
                         "expected none | int8 | int8_full")
    mcfg = tiny_pi0_config() if s.tiny else Pi0Config()
    tok = make_policy_tokenizer(
        mcfg.paligemma.vocab_size,
        **({"hf_path": s.tokenizer} if s.tokenizer else {}),
        strict=bool(s.checkpoint) and not s.allow_hash_tokenizer)
    if s.checkpoint:
        params = load_policy_params(s.checkpoint, mcfg)
    else:
        params = jax.jit(lambda k: pi0.init_pi0(k, mcfg))(
            jax.random.PRNGKey(0))
    if s.mode == "cover":
        # the fused sample->score->select engine behind the same RPC verbs
        from cover_vla_tpu.configs import (
            CoVerConfig, VerifierConfig, tiny_verifier_config)
        from cover_vla_tpu.engine import CoVerEngine
        from cover_vla_tpu.eval.rephrase import load_rephrases
        from cover_vla_tpu.models import verifier
        from cover_vla_tpu.serving.policy_wrapper import CoVerPolicyWrapper
        vcfg = tiny_verifier_config() if s.tiny else VerifierConfig()
        vp = load_verifier_params(s.verifier_checkpoint, vcfg) \
            if s.verifier_checkpoint else jax.jit(
                lambda k: verifier.init_verifier(k, vcfg, 3))(
                jax.random.PRNGKey(1))
        engine = CoVerEngine(params, vp, mcfg, vcfg,
                             CoVerConfig(n_samples=s.n_samples,
                                         n_rephrases=s.n_rephrases),
                             policy_tokenizer=tok,
                             rephrases=load_rephrases())
        policy = CoVerPolicyWrapper(engine, quantize=s.quantize)
    else:
        policy = Pi0PolicyWrapper(params, mcfg, tokenizer=tok,
                                  quantize=s.quantize)
    return WebsocketPolicyServer(policy, s.host, s.port,
                                 metadata={"model": s.mode})


def role_serve(cfg: RunCfg):
    server = build_server(cfg)
    s = cfg.serve
    print(f"serving {s.mode} on ws://{s.host}:{s.port}")
    server.serve_forever()


def role_eval(cfg: RunCfg):
    import jax
    from cover_vla_tpu.configs import (
        Pi0Config, VerifierConfig, CoVerConfig, tiny_pi0_config,
        tiny_verifier_config)
    from cover_vla_tpu.data.stats import DatasetStatistics
    from cover_vla_tpu.data.tokenizer import (
        make_policy_tokenizer, make_verifier_tokenizer)
    from cover_vla_tpu.models import pi0, verifier
    from cover_vla_tpu.engine import CoVerEngine
    from cover_vla_tpu.eval.evaluator import (
        CoVerEvaluator, EvalConfig, evaluate_suite_batched)
    from cover_vla_tpu.eval.rephrase import load_rephrases
    from cover_vla_tpu.convert.loaders import (
        load_policy_params, load_verifier_params)

    e = cfg.eval
    pcfg = tiny_pi0_config() if e.tiny else Pi0Config()
    vcfg = tiny_verifier_config() if e.tiny else VerifierConfig()
    ccfg = CoVerConfig(n_samples=e.n_samples, n_rephrases=e.n_rephrases,
                       selection=e.selection,
                       gripper_vote=(e.selection == "verifier"))
    # real checkpoints demand real tokenizers unless explicitly overridden
    strict = bool(e.policy_checkpoint) and not e.allow_hash_tokenizer
    ptok = make_policy_tokenizer(
        pcfg.paligemma.vocab_size,
        **({"hf_path": e.tokenizer} if e.tokenizer else {}), strict=strict)
    vtok = make_verifier_tokenizer(
        vcfg.text.vocab_size, hf_path=e.verifier_tokenizer or None,
        strict=bool(e.verifier_checkpoint) and not e.allow_hash_tokenizer)
    is_google = e.task_suite.startswith("simpler_google")
    if is_google and not e.dataset_statistics:
        raise SystemExit(
            "google_robot suites require --eval.dataset_statistics "
            "(fractal statistics); the vendored Bridge bounds would "
            "silently mis-normalize fractal-trained checkpoints")
    stats = DatasetStatistics.from_json(e.dataset_statistics) \
        if e.dataset_statistics else DatasetStatistics.from_json()
    pp = load_policy_params(e.policy_checkpoint, pcfg) \
        if e.policy_checkpoint \
        else jax.jit(lambda k: pi0.init_pi0(k, pcfg))(jax.random.PRNGKey(0))
    vp = load_verifier_params(e.verifier_checkpoint, vcfg) \
        if e.verifier_checkpoint else jax.jit(
            lambda k: verifier.init_verifier(k, vcfg, 3))(jax.random.PRNGKey(1))
    if e.quantize not in ("none", "int8", "int8_full"):
        raise SystemExit(f"--eval.quantize {e.quantize!r}: "
                         "expected none | int8 | int8_full")
    if e.quantize != "none":
        from cover_vla_tpu.ops import quant
        pp = jax.jit(quant.quantize_pi0_policy)(pp)
        if e.quantize == "int8_full":
            vp = jax.jit(quant.quantize_verifier)(vp)
    ecfg = EvalConfig(
        task_suite=e.task_suite, num_trials_per_task=e.num_trials_per_task,
        max_steps=e.max_steps, out_dir=e.out_dir, seed=e.seed)
    if e.n_parallel > 1:
        out = evaluate_suite_batched(
            pp, vp, pcfg, vcfg, ccfg, ecfg, n_parallel=e.n_parallel,
            stats=stats, rephrases=load_rephrases(), pipelined=e.pipelined,
            seed=e.seed, policy_tokenizer=ptok, verifier_tokenizer=vtok)
        print(json.dumps({**out["summary"],
                          "actions_per_sec": round(out["actions_per_sec"], 2),
                          "wall_s": round(out["wall_s"], 2)}, indent=2))
        return
    engine = CoVerEngine(pp, vp, pcfg, vcfg, ccfg, stats=stats,
                         policy_tokenizer=ptok, verifier_tokenizer=vtok,
                         rephrases=load_rephrases(), seed=e.seed)
    ev = CoVerEvaluator(engine, ecfg,
                        stats=None if is_google else stats,
                        fractal_stats=stats if is_google else None)
    out = ev.evaluate()
    print(json.dumps(out["summary"], indent=2))


def role_bench(cfg: RunCfg):
    """The perf benchmark (same program as the repo-root bench.py)."""
    import importlib.util
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("cover_vla_bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def main(argv=None):
    from cover_vla_tpu.utils.cli import parse
    from cover_vla_tpu.parallel.distributed import init_multihost
    from cover_vla_tpu.utils.monitor import enable_persistent_compile_cache
    cfg = parse(RunCfg, argv)
    # multihost entry (SURVEY.md §5: jax.distributed.initialize replaces
    # torchrun's NCCL init): no-op unless COORDINATOR_ADDRESS/NUM_PROCESSES/
    # PROCESS_ID are set, raises on a half-configured launch environment
    init_multihost()
    # persistent XLA compile cache for every role: checkpoint iteration
    # (serve_policy switch_model, repeated eval processes) skips the
    # full-size recompile across processes
    enable_persistent_compile_cache()
    role = {
        "train": role_train,
        "train_pi0fast": role_train_pi0fast,
        "train_verifier": role_train_verifier,
        "serve_policy": role_serve,
        "eval": role_eval,
        "bench": role_bench,
    }.get(cfg.role)
    if role is None:
        raise SystemExit(
            f"unknown role {cfg.role!r} "
            f"(train|train_pi0fast|train_verifier|serve_policy|eval|bench)")
    role(cfg)


if __name__ == "__main__":
    main()
