"""Full-size (3.3B) checkpoint ingestion dry-run.

Proves the torch->TPU conversion + memory path end-to-end at REAL model
dims, with random weights standing in for the unfetchable published
checkpoints:

  1. `generate` — writes a random full-size torch state dict in the EXACT
     lerobot save_pretrained safetensors layout
     (model.paligemma_with_expert..., reference modeling_pi0.py /
     trainer.py:606-625), a merged verifier ensemble .pt in the exact
     EfficientEnsembleMerged schema
     (bridge_verifier/ensemble_eval/efficient_ensemble_merged.py:36-53),
     and an open_clip SigLIP2 backbone state dict. Pure torch/numpy — the
     member-head state dicts come from REAL torch modules
     (nn.MultiheadAttention / nn.TransformerEncoder / nn.Linear), so the
     layout is the module's own, not a hand transcription.
  2. `run` — converts via convert.pi0_from_torch / verifier_from_torch,
     loads onto the current JAX platform (TPU or CPU), runs ONE full-size
     verified_step at N=16 plus a deterministic single-candidate
     sample_actions + verifier score, and records load time / HBM
     footprint / step latency into a JSON report. Run once with
     JAX_PLATFORMS unset (TPU) and once with JAX_PLATFORMS=cpu — never
     both in one process (remote-tunnel constraint).
  3. `compare` — cross-checks the deterministic outputs of two `run`
     invocations (CPU fp32-accumulate vs TPU MXU bf16) and appends
     deviation stats to the report.

Usage:
  python scripts/full_size_ingest.py generate --dir /tmp/full_ingest
  python scripts/full_size_ingest.py run --dir /tmp/full_ingest --tag tpu
  JAX_PLATFORMS=cpu python scripts/full_size_ingest.py run \
      --dir /tmp/full_ingest --tag cpu
  python scripts/full_size_ingest.py compare --dir /tmp/full_ingest \
      --a tpu --b cpu --report INGEST_r03.json
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


# ---------------------------------------------------------------------------
# generate: full-size torch state dicts in the reference layouts
# ---------------------------------------------------------------------------


def _gen_pi0_lerobot(out_path: str, seed: int = 0) -> dict:
    """Random full-size PI0Policy state dict, exact lerobot safetensors
    layout (keys as in modeling_pi0.py's module tree; see
    tests/test_convert_parity.py for the tiny-dims version)."""
    import torch
    from cover_vla_tpu.configs import Pi0Config

    cfg = Pi0Config()
    g = np.random.Generator(np.random.SFC64(seed))
    sd = {}

    def rnd(*shape, std=0.02):
        return torch.from_numpy(
            g.standard_normal(shape, dtype=np.float32) * np.float32(std))

    def lin(name, o, i, bias=True):
        sd[name + ".weight"] = rnd(o, i)
        if bias:
            sd[name + ".bias"] = rnd(o, std=0.01)

    lm = "model.paligemma_with_expert.paligemma.language_model.model"
    vt = "model.paligemma_with_expert.paligemma.vision_tower.vision_model"
    ex = "model.paligemma_with_expert.gemma_expert.model"

    w = cfg.paligemma
    sd[lm + ".embed_tokens.weight"] = rnd(w.vocab_size, w.width)
    for mdl, pre in ((cfg.paligemma, lm), (cfg.expert, ex)):
        for i in range(mdl.depth):
            p = f"{pre}.layers.{i}"
            sd[p + ".input_layernorm.weight"] = torch.zeros(mdl.width)
            sd[p + ".post_attention_layernorm.weight"] = \
                torch.zeros(mdl.width)
            lin(p + ".self_attn.q_proj", mdl.num_heads * mdl.head_dim,
                mdl.width, bias=False)
            lin(p + ".self_attn.k_proj", mdl.num_kv_heads * mdl.head_dim,
                mdl.width, bias=False)
            lin(p + ".self_attn.v_proj", mdl.num_kv_heads * mdl.head_dim,
                mdl.width, bias=False)
            lin(p + ".self_attn.o_proj", mdl.width,
                mdl.num_heads * mdl.head_dim, bias=False)
            lin(p + ".mlp.gate_proj", mdl.mlp_dim, mdl.width, bias=False)
            lin(p + ".mlp.up_proj", mdl.mlp_dim, mdl.width, bias=False)
            lin(p + ".mlp.down_proj", mdl.width, mdl.mlp_dim, bias=False)
        sd[pre + ".norm.weight"] = torch.zeros(mdl.width)

    v = cfg.vision
    sd[vt + ".embeddings.patch_embedding.weight"] = \
        rnd(v.width, 3, v.patch_size, v.patch_size)
    sd[vt + ".embeddings.patch_embedding.bias"] = rnd(v.width, std=0.01)
    sd[vt + ".embeddings.position_embedding.weight"] = \
        rnd(v.num_patches, v.width)
    for i in range(v.depth):
        p = f"{vt}.encoder.layers.{i}"
        for nm in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{nm}.weight"] = torch.ones(v.width)
            sd[f"{p}.{nm}.bias"] = torch.zeros(v.width)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{p}.self_attn.{nm}", v.width, v.width)
        lin(f"{p}.mlp.fc1", v.mlp_dim, v.width)
        lin(f"{p}.mlp.fc2", v.width, v.mlp_dim)
    sd[vt + ".post_layernorm.weight"] = torch.ones(v.width)
    sd[vt + ".post_layernorm.bias"] = torch.zeros(v.width)

    lin("model.paligemma_with_expert.paligemma.multi_modal_projector.linear",
        w.width, v.width)
    lin("model.state_proj", cfg.proj_width, cfg.max_state_dim)
    lin("model.action_in_proj", cfg.proj_width, cfg.max_action_dim)
    lin("model.action_out_proj", cfg.max_action_dim, cfg.proj_width)
    lin("model.action_time_mlp_in", cfg.proj_width, 2 * cfg.proj_width)
    lin("model.action_time_mlp_out", cfg.proj_width, cfg.proj_width)

    # lerobot Normalize/Unnormalize buffers (modeling_pi0.py:221-260)
    for mod, feat in (("normalize_inputs", "observation_state"),
                      ("normalize_targets", "action"),
                      ("unnormalize_outputs", "action")):
        dim = cfg.max_state_dim if feat == "observation_state" \
            else cfg.max_action_dim
        sd[f"{mod}.buffer_{feat}.mean"] = torch.zeros(dim)
        sd[f"{mod}.buffer_{feat}.std"] = torch.ones(dim)

    n_params = sum(t.numel() for t in sd.values())
    from safetensors.torch import save_file
    save_file(sd, out_path)
    return {"path": out_path, "n_params": int(n_params),
            "n_tensors": len(sd),
            "bytes": os.path.getsize(out_path)}


def _gen_verifier_merged(pt_path: str, backbone_path: str,
                         num_members: int = 3, seed: int = 1) -> dict:
    """Merged ensemble .pt (exact EfficientEnsembleMerged schema) built
    from real torch modules, plus an open_clip SigLIP2 backbone sd."""
    import torch
    from cover_vla_tpu.configs import VerifierConfig

    cfg = VerifierConfig()
    torch.manual_seed(seed)

    def pooling_sd(kv_dim):
        out_dim, heads = cfg.text_pooling_output_dim, cfg.pooling_heads

        class Block(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.attention = torch.nn.MultiheadAttention(
                    out_dim, heads, batch_first=True,
                    kdim=kv_dim, vdim=kv_dim)
                self.mlp = torch.nn.Sequential()
                self.mlp.fc1 = torch.nn.Linear(out_dim, out_dim)
                self.mlp.fc2 = torch.nn.Linear(out_dim, out_dim)
                self.q_layer_norm = torch.nn.LayerNorm(out_dim)
                self.layer_norm = torch.nn.LayerNorm(out_dim)

        class Pool(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.query = torch.nn.Parameter(torch.randn(1, 1, out_dim))
                self.blocks = torch.nn.ModuleList(
                    [Block() for _ in range(cfg.pooling_layers)])
                self.layer_norm = torch.nn.LayerNorm(out_dim)

        return {k: v.detach().clone()
                for k, v in Pool().state_dict().items()}

    def traj_sd():
        d = cfg.vision_pooling_output_dim
        layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=cfg.traj_heads, dim_feedforward=2 * d,
            dropout=0.0, batch_first=False)
        enc = torch.nn.TransformerEncoder(layer, num_layers=cfg.traj_layers)
        return {k: v.detach().clone() for k, v in enc.state_dict().items()}

    def lin_sd(i, o):
        m = torch.nn.Linear(i, o)
        return {k: v.detach().clone() for k, v in m.state_dict().items()}

    components = []
    for _ in range(num_members):
        components.append({
            "logit_scale": torch.tensor(cfg.logit_scale_init),
            "action_padding_value": float(cfg.action_padding_value),
            "text_aware_visual_extraction": {
                "temperature": torch.tensor(cfg.tave_temperature_init)},
            "text_pooling": pooling_sd(cfg.text.embed_dim),
            "vision_poolings": pooling_sd(cfg.vision.width),
            "input_projection": lin_sd(cfg.fused_dim,
                                       cfg.vision_pooling_output_dim),
            "single_step_action_encoder": lin_sd(
                cfg.action_dim, cfg.vision_pooling_output_dim),
            "trajectory_encoder": traj_sd(),
        })
    torch.save({"ensemble_components": components,
                "config": {"siglip_model": "ViT-L-16-SigLIP2-384"}}, pt_path)

    # open_clip backbone: timm ViT trunk (packed qkv) + custom text tower
    g = np.random.Generator(np.random.SFC64(seed + 1))
    bsd = {}

    def rnd(*shape, std=0.02):
        return torch.from_numpy(
            g.standard_normal(shape, dtype=np.float32) * np.float32(std))

    v = cfg.vision
    bsd["visual.trunk.patch_embed.proj.weight"] = \
        rnd(v.width, 3, v.patch_size, v.patch_size)
    bsd["visual.trunk.patch_embed.proj.bias"] = rnd(v.width, std=0.01)
    bsd["visual.trunk.pos_embed"] = rnd(1, v.num_patches, v.width)
    for i in range(v.depth):
        p = f"visual.trunk.blocks.{i}."
        for nm in ("norm1", "norm2"):
            bsd[p + nm + ".weight"] = torch.ones(v.width)
            bsd[p + nm + ".bias"] = torch.zeros(v.width)
        bsd[p + "attn.qkv.weight"] = rnd(3 * v.width, v.width)
        bsd[p + "attn.qkv.bias"] = rnd(3 * v.width, std=0.01)
        bsd[p + "attn.proj.weight"] = rnd(v.width, v.width)
        bsd[p + "attn.proj.bias"] = rnd(v.width, std=0.01)
        bsd[p + "mlp.fc1.weight"] = rnd(v.mlp_dim, v.width)
        bsd[p + "mlp.fc1.bias"] = rnd(v.mlp_dim, std=0.01)
        bsd[p + "mlp.fc2.weight"] = rnd(v.width, v.mlp_dim)
        bsd[p + "mlp.fc2.bias"] = rnd(v.width, std=0.01)
    bsd["visual.trunk.norm.weight"] = torch.ones(v.width)
    bsd["visual.trunk.norm.bias"] = torch.zeros(v.width)

    t = cfg.text
    bsd["text.token_embedding.weight"] = rnd(t.vocab_size, t.width)
    bsd["text.positional_embedding"] = rnd(t.context_length, t.width)
    for i in range(t.depth):
        p = f"text.transformer.resblocks.{i}."
        for nm in ("ln_1", "ln_2"):
            bsd[p + nm + ".weight"] = torch.ones(t.width)
            bsd[p + nm + ".bias"] = torch.zeros(t.width)
        bsd[p + "attn.in_proj_weight"] = rnd(3 * t.width, t.width)
        bsd[p + "attn.in_proj_bias"] = rnd(3 * t.width, std=0.01)
        bsd[p + "attn.out_proj.weight"] = rnd(t.width, t.width)
        bsd[p + "attn.out_proj.bias"] = rnd(t.width, std=0.01)
        bsd[p + "mlp.c_fc.weight"] = rnd(t.mlp_dim, t.width)
        bsd[p + "mlp.c_fc.bias"] = rnd(t.mlp_dim, std=0.01)
        bsd[p + "mlp.c_proj.weight"] = rnd(t.width, t.mlp_dim)
        bsd[p + "mlp.c_proj.bias"] = rnd(t.width, std=0.01)
    bsd["text.ln_final.weight"] = torch.ones(t.width)
    bsd["text.ln_final.bias"] = torch.zeros(t.width)
    bsd["text.text_projection.weight"] = rnd(t.embed_dim, t.width)
    bsd["text.text_projection.bias"] = rnd(t.embed_dim, std=0.01)
    # extra open_clip keys the converter must tolerate
    bsd["logit_scale"] = torch.tensor(2.6592)
    bsd["logit_bias"] = torch.tensor(-10.0)
    torch.save(bsd, backbone_path)

    return {"merged_pt": pt_path,
            "merged_bytes": os.path.getsize(pt_path),
            "backbone_pt": backbone_path,
            "backbone_bytes": os.path.getsize(backbone_path),
            "n_members": num_members,
            "backbone_n_params": int(sum(x.numel() for x in bsd.values()))}


def cmd_generate(args):
    os.makedirs(args.dir, exist_ok=True)
    t0 = time.time()
    pi0_info = _gen_pi0_lerobot(os.path.join(args.dir, "model.safetensors"))
    print(f"pi0 safetensors: {pi0_info['n_params'] / 1e9:.2f}B params, "
          f"{pi0_info['bytes'] / 2**30:.1f} GiB "
          f"({time.time() - t0:.0f}s)")
    t0 = time.time()
    ver_info = _gen_verifier_merged(
        os.path.join(args.dir, "cover_verifier.pt"),
        os.path.join(args.dir, "siglip2_backbone.pt"))
    print(f"verifier merged+backbone: "
          f"{ver_info['backbone_n_params'] / 1e9:.2f}B backbone params "
          f"({time.time() - t0:.0f}s)")
    with open(os.path.join(args.dir, "generate_info.json"), "w") as f:
        json.dump({"pi0": pi0_info, "verifier": ver_info}, f, indent=1)


# ---------------------------------------------------------------------------
# run: convert, load on the current platform, execute, record
# ---------------------------------------------------------------------------


def cmd_run(args):
    # honor an explicit JAX_PLATFORMS choice even though sitecustomize
    # pre-imports jax on the axon platform (CLAUDE.md: both the env var
    # AND config.update are needed to actually switch)
    import jax
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        jax.config.update("jax_platforms", plat)
    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cover_vla_tpu.configs import Pi0Config, VerifierConfig, CoVerConfig
    from cover_vla_tpu.convert import pi0_from_torch, verifier_from_torch
    from cover_vla_tpu.data.stats import DatasetStatistics
    from cover_vla_tpu.engine import make_verified_step
    from cover_vla_tpu.models import pi0, verifier
    from cover_vla_tpu.utils.monitor import log_device_memory

    dev = jax.devices()[0]
    report = {"device": str(dev), "platform": dev.platform,
              "tag": args.tag}
    pcfg, vcfg = Pi0Config(), VerifierConfig()
    ccfg = CoVerConfig(n_samples=16, n_rephrases=1)
    stats = DatasetStatistics.from_json()

    # --- convert + load (the measured ingestion path) --------------------
    # staged: host restructure (hostmode) | one batched device_put — the
    # split separates CPU work from the h2d transfer floor
    from cover_vla_tpu.convert import hostmode
    t0 = time.time()
    sd = pi0_from_torch.load_state_dict(
        os.path.join(args.dir, "model.safetensors"))
    report["pi0_read_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    with hostmode.host_arrays():
        host_policy = pi0_from_torch.convert_pi0(sd, pcfg)
    norm = pi0_from_torch.extract_norm_stats(sd)
    assert norm and "normalize_inputs.observation_state" in norm
    del sd
    report["pi0_convert_host_s"] = round(time.time() - t0, 1)
    policy_bytes = sum(x.nbytes
                       for x in jax.tree_util.tree_leaves(host_policy))
    t1 = time.time()
    policy_params = jax.device_put(host_policy)
    jax.block_until_ready(policy_params)
    report["pi0_device_transfer_s"] = round(time.time() - t1, 1)
    report["h2d_mib_s"] = round(
        policy_bytes / 2**20 / max(time.time() - t1, 1e-9), 1)
    del host_policy
    report["pi0_convert_load_s"] = round(time.time() - t0, 1)
    report["pi0_param_count"] = int(sum(
        np.prod(x.shape) for x in jax.tree_util.tree_leaves(policy_params)))

    t0 = time.time()
    backbone_sd = pi0_from_torch.load_state_dict(
        os.path.join(args.dir, "siglip2_backbone.pt"))
    verifier_params = verifier_from_torch.convert_merged_checkpoint(
        os.path.join(args.dir, "cover_verifier.pt"), vcfg,
        backbone_sd=backbone_sd)
    jax.block_until_ready(verifier_params)
    del backbone_sd
    report["verifier_convert_load_s"] = round(time.time() - t0, 1)
    report["verifier_param_count"] = int(sum(
        np.prod(x.shape)
        for x in jax.tree_util.tree_leaves(verifier_params)))

    mem = next(iter(log_device_memory().values()), {})
    if mem.get("available"):
        report["hbm_params_gib"] = round(mem["bytes_in_use"] / 2**30, 2)
    else:  # never report a fabricated 0.0 for a 3.3B load
        report["hbm_params_gib"] = None
        report["hbm_unavailable_reason"] = mem.get(
            "reason", "no local device memory stats")
        # analytic footprint from the actual loaded trees (bf16 params +
        # fp32 norms) so the memory-fit claim has a real number behind it
        report["hbm_params_analytic_gib"] = round(sum(
            x.size * x.dtype.itemsize
            for tree in (policy_params, verifier_params)
            for x in jax.tree_util.tree_leaves(tree)) / 2**30, 2)

    # --- cached reload (checkpoint-iteration speed, loaders.jaxcache) ----
    if not args.skip_cache_check:
        import shutil
        from cover_vla_tpu.convert import loaders
        src = os.path.join(args.dir, "model.safetensors")
        shutil.rmtree(src + ".jaxcache", ignore_errors=True)
        # cold call: re-converts host-side and writes the blob cache
        # (measured separately above; here it just creates the cache)
        t0 = time.time()
        first = loaders.load_policy_params(src, pcfg)
        jax.block_until_ready(first)
        report["cache_cold_load_s"] = round(time.time() - t0, 1)
        del first
        t0 = time.time()
        cached = loaders.load_policy_params(src, pcfg)   # cache hit
        jax.block_until_ready(cached)
        report["cached_reload_s"] = round(time.time() - t0, 1)
        # effective h2d rate of the memmap+device_put reload (the first
        # staged transfer above is slower: it pays host page-cache
        # pressure from the just-freed fp32 state dict)
        report["cached_reload_mib_s"] = round(
            policy_bytes / 2**20 / max(time.time() - t0, 1e-9), 1)
        del cached

    # --- one full-size verified_step at N=16 -----------------------------
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    prop = rng.uniform(-0.1, 0.1, 7).astype(np.float32)
    lt = rng.integers(0, 1000, (1, pcfg.tokenizer_max_length)).astype(np.int32)
    lm = np.zeros((1, pcfg.tokenizer_max_length), bool)
    lm[:, :12] = True
    vt = rng.integers(0, 1000, vcfg.text.context_length).astype(np.int32)
    hist = np.zeros((ccfg.max_history, 7), np.float32)

    if not args.skip_step:
        step = make_verified_step(pcfg, vcfg, ccfg, stats)
        t0 = time.time()
        out = step(policy_params, verifier_params, jax.random.PRNGKey(0),
                   raw, prop, lt, lm, vt, hist, np.int32(0))
        jax.block_until_ready(out)
        report["verified_step_compile_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        out = step(policy_params, verifier_params, jax.random.PRNGKey(1),
                   raw, prop, lt, lm, vt, hist, np.int32(0))
        jax.block_until_ready(out)
        report["verified_step_s"] = round(time.time() - t0, 3)
        report["verified_step_finite"] = bool(
            np.isfinite(np.asarray(out.exec_chunk)).all()
            and np.isfinite(np.asarray(out.scores)).all())
        mem = next(iter(log_device_memory().values()), {})
        if mem.get("available"):
            report["hbm_peak_gib"] = round(
                mem.get("peak_bytes_in_use",
                        mem["bytes_in_use"]) / 2**30, 2)
        else:
            report["hbm_peak_gib"] = None

    with open(os.path.join(args.dir, f"run_{args.tag}.json"), "w") as f:
        json.dump(report, f, indent=1)  # partial write before cross-check

    # --- deterministic cross-check forward (bf16, fixed key) -------------
    imgs = ((raw.astype(np.float32) / 255.0 - 0.5) / 0.5)[None]
    imgs = jax.image.resize(
        jax.numpy.asarray(imgs),
        (1, pcfg.vision.image_size, pcfg.vision.image_size, 3),
        "bilinear")[None]                       # [1, 1, 224, 224, 3]
    state = np.zeros((1, pcfg.max_state_dim), np.float32)
    state[0, :7] = prop
    actions = pi0.sample_actions(
        policy_params, pcfg, jax.random.PRNGKey(42),
        imgs, np.ones((1, 1), bool), lt, lm,
        jax.numpy.asarray(state), num_candidates=1)
    traj = np.full((1, vcfg.history_length, 7), vcfg.action_padding_value,
                   np.float32)
    traj[0, -4:] = rng.uniform(-0.5, 0.5, (4, 7))
    vimg = ((raw.astype(np.float32) / 255.0 - 0.5) / 0.5)[None]
    vimg_r = jax.image.resize(
        jax.numpy.asarray(vimg), (1, vcfg.vision.image_size,
                                  vcfg.vision.image_size, 3), "bilinear")
    score = verifier.score_actions(verifier_params, vcfg, vimg_r,
                                   vt[None], jax.numpy.asarray(traj))
    np.savez(os.path.join(args.dir, f"xcheck_{args.tag}.npz"),
             actions=np.asarray(actions, np.float32),
             score=np.asarray(score, np.float32))
    report["xcheck_saved"] = f"xcheck_{args.tag}.npz"

    with open(os.path.join(args.dir, f"run_{args.tag}.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


# ---------------------------------------------------------------------------
# torch_oracle: full-size fp32 parity vs the REFERENCE implementation
# ---------------------------------------------------------------------------


def cmd_torch_oracle(args):
    """The BASELINE.md north star at REAL dims: load the generated 3.24B
    checkpoint into the reference's own PI0FlowMatching
    (modeling_pi0.py:449-752, lerobot-internal imports stubbed), run one
    fp32 `sample_actions` with fixed noise on CPU, and compare the action
    chunk against the JAX CPU path converted from the SAME file. Round 3
    carried fp32 parity only at tiny dims + one full-width layer pair;
    this closes it at the full 3.24B geometry."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp
    import torch
    from cover_vla_tpu.configs import Pi0Config
    from cover_vla_tpu.convert import pi0_from_torch, torch_oracle
    from cover_vla_tpu.models import pi0 as jpi0

    pcfg = Pi0Config()
    report = {"stage": "torch_oracle", "platform": "cpu fp32"}

    t0 = time.time()
    sd = pi0_from_torch.load_state_dict(
        os.path.join(args.dir, "model.safetensors"))
    report["read_s"] = round(time.time() - t0, 1)

    # deterministic inputs shared by both sides (the preprocessing layers
    # are covered by their own parity tests; the oracle pins the MODEL)
    rng = np.random.default_rng(0)
    b = 1
    img = rng.uniform(-1, 1, (b, 3, pcfg.vision.image_size,
                              pcfg.vision.image_size)).astype(np.float32)
    state = rng.standard_normal((b, pcfg.max_state_dim)).astype(np.float32)
    lang = rng.integers(0, 1000, (b, pcfg.tokenizer_max_length)
                        ).astype(np.int64)
    lmask = np.zeros((b, pcfg.tokenizer_max_length), bool)
    lmask[:, :12] = True  # ragged language padding
    noise = rng.standard_normal(
        (b, pcfg.chunk_size, pcfg.max_action_dim)).astype(np.float32)

    # --- reference torch fp32 -------------------------------------------
    t0 = time.time()
    pwe, mpi0 = torch_oracle.load_reference_pi0_modules(fp32_oracle=True)
    ref = torch_oracle.build_reference_flow_matching(pcfg, pwe, mpi0)
    n_loaded = torch_oracle.load_lerobot_sd_into_reference(ref, sd)
    report["torch_build_load_s"] = round(time.time() - t0, 1)
    report["torch_tensors_loaded"] = n_loaded
    report["torch_param_count"] = int(
        sum(p.numel() for p in ref.parameters()))
    t0 = time.time()
    with torch.no_grad():
        ref_actions = ref.sample_actions(
            [torch.from_numpy(img)], [torch.ones(b, dtype=torch.bool)],
            torch.from_numpy(lang), torch.from_numpy(lmask),
            torch.from_numpy(state),
            noise=torch.from_numpy(noise.copy())).numpy()
    report["torch_sample_actions_s"] = round(time.time() - t0, 1)
    del ref, pwe, mpi0

    # --- JAX CPU fp32 from the same file --------------------------------
    t0 = time.time()
    params = pi0_from_torch.convert_pi0(sd, pcfg, dtype=jnp.float32)
    del sd
    jax.block_until_ready(params)
    report["jax_convert_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    jcfg = dataclasses.replace(pcfg, compute_dtype="float32")
    ours = jpi0.sample_actions(
        params, jcfg, jax.random.PRNGKey(0),
        jnp.asarray(img.transpose(0, 2, 3, 1))[:, None],
        jnp.ones((b, 1), bool), jnp.asarray(lang.astype(np.int32)),
        jnp.asarray(lmask), jnp.asarray(state),
        num_candidates=1, noise=jnp.asarray(noise)[:, None])
    ours = np.asarray(ours[:, 0], np.float32)
    report["jax_sample_actions_s"] = round(time.time() - t0, 1)

    dev = np.abs(ours - ref_actions)
    report["action_max_abs_dev"] = float(dev.max())
    report["action_mean_abs_dev"] = float(dev.mean())
    report["action_rms"] = float(np.sqrt((ref_actions ** 2).mean()))
    report["parity_1e4"] = bool(dev.max() <= 1e-4)
    with open(os.path.join(args.dir, "torch_oracle.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


# ---------------------------------------------------------------------------
# compare: deviation stats between two runs' deterministic outputs
# ---------------------------------------------------------------------------


def cmd_compare(args):
    a = np.load(os.path.join(args.dir, f"xcheck_{args.a}.npz"))
    b = np.load(os.path.join(args.dir, f"xcheck_{args.b}.npz"))
    da = np.abs(a["actions"] - b["actions"])
    ds = np.abs(a["score"] - b["score"])
    cmp = {
        "action_max_abs_dev": float(da.max()),
        "action_mean_abs_dev": float(da.mean()),
        "action_rms": float(np.sqrt((a["actions"] ** 2).mean())),
        "score_abs_dev": float(ds.max()),
        "score_a": float(a["score"].ravel()[0]),
        "score_b": float(b["score"].ravel()[0]),
    }
    report = {"compare": {f"{args.a}_vs_{args.b}": cmp}}
    # scoop up every run_*.json (not just the two compared tags): the
    # warm-cache rerun (tag tpu_warm) documents cross-process compile
    # reuse next to the cold run
    import glob as _glob
    for p in sorted(_glob.glob(os.path.join(args.dir, "run_*.json"))):
        tag = os.path.basename(p)[len("run_"):-len(".json")]
        with open(p) as f:
            report[f"run_{tag}"] = json.load(f)
    gi = os.path.join(args.dir, "generate_info.json")
    if os.path.exists(gi):
        with open(gi) as f:
            report["generate"] = json.load(f)
    to = os.path.join(args.dir, "torch_oracle.json")
    if os.path.exists(to):
        with open(to) as f:
            report["torch_oracle"] = json.load(f)
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(cmp, indent=1))


# ---------------------------------------------------------------------------
# fetch: the real-weights path (one command once the environment has egress)
# ---------------------------------------------------------------------------

# The published checkpoints this framework ingests (reference README.md:
# 69-74 and the eval protocol at :136). File layouts match what `generate`
# fabricates, so `run` consumes either source unchanged.
HUB_ARTIFACTS = [
    # (hub repo, filename-in-repo, destination name under --dir, what)
    ("juexzz/INTACT-pi0-finetune-bridge", "model.safetensors",
     "model.safetensors",
     "pi0 policy, lerobot save_pretrained layout (trainer.py:606-625)"),
    ("juexzz/INTACT-pi0-rephrase-bridge", "model.safetensors",
     "model_rephrase.safetensors",
     "pi0 policy finetuned with paraphrase augmentation"),
    ("cover-vla/cover-vla-bridge", "cover_verifier_bridge.pt",
     "cover_verifier.pt",
     "merged verifier ensemble (EfficientEnsembleMerged schema :36-53)"),
    ("timm/ViT-L-16-SigLIP2-384", "open_clip_model.safetensors",
     "siglip2_backbone.pt",
     "frozen SigLIP2 backbone (open_clip state dict)"),
]


def cmd_fetch(args):
    """Download the published checkpoints into --dir so `run --tag real`
    measures REAL-weights ingestion. Air-gapped environments fail fast
    with the exact manual steps; nothing else in the pipeline changes."""
    os.makedirs(args.dir, exist_ok=True)
    missing, present = [], []
    for repo, fname, dest, what in HUB_ARTIFACTS:
        dest_path = os.path.join(args.dir, dest)
        if os.path.exists(dest_path):
            present.append(dest)
            continue
        try:
            from huggingface_hub import hf_hub_download
            path = hf_hub_download(repo_id=repo, filename=fname,
                                   etag_timeout=args.timeout)
            import shutil
            shutil.copy(path, dest_path)
            present.append(dest)
            print(f"fetched {repo}/{fname} -> {dest}")
        except Exception as e:
            missing.append((repo, fname, dest, what, f"{type(e).__name__}"))
    if missing:
        print("\nUNFETCHABLE (air-gapped?) — manual recipe:")
        for repo, fname, dest, what, err in missing:
            print(f"  # {what}\n"
                  f"  huggingface-cli download {repo} {fname} "
                  f"--local-dir /tmp && cp /tmp/{fname} "
                  f"{os.path.join(args.dir, dest)}   # blocked: {err}")
        print("\nThen:  python scripts/full_size_ingest.py run "
              f"--dir {args.dir} --tag real")
        raise SystemExit(2)
    print(f"all {len(present)} artifacts present in {args.dir}; next: "
          f"python scripts/full_size_ingest.py run --dir {args.dir} "
          "--tag real")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--dir", default="/tmp/full_ingest")
    g.set_defaults(fn=cmd_generate)
    f = sub.add_parser("fetch")
    f.add_argument("--dir", default="/tmp/full_ingest")
    f.add_argument("--timeout", type=float, default=10.0)
    f.set_defaults(fn=cmd_fetch)
    r = sub.add_parser("run")
    r.add_argument("--dir", default="/tmp/full_ingest")
    r.add_argument("--tag", required=True)
    r.add_argument("--skip-step", action="store_true",
                   help="skip the N=16 verified_step (CPU cross-check runs)")
    r.add_argument("--skip-cache-check", action="store_true",
                   help="skip the convert-cache write/reload measurement")
    r.set_defaults(fn=cmd_run)
    t = sub.add_parser("torch_oracle")
    t.add_argument("--dir", default="/tmp/full_ingest")
    t.set_defaults(fn=cmd_torch_oracle)
    c = sub.add_parser("compare")
    c.add_argument("--dir", default="/tmp/full_ingest")
    c.add_argument("--a", required=True)
    c.add_argument("--b", required=True)
    c.add_argument("--report", default=None)
    c.set_defaults(fn=cmd_compare)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
