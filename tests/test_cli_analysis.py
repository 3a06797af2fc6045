"""CLI config system, run.py roles, analysis, sim metrics, lang transforms."""

import json
import os
import pickle

import numpy as np
import pytest

from cover_vla_tpu.utils.cli import parse, load_yaml
from cover_vla_tpu.run import RunCfg, TrainCfg
from cover_vla_tpu.eval import analyze, sim_metrics
from cover_vla_tpu.eval.lang_transform import (
    LangTransform, TemplateBackend, generate_rephrase_store, TRANSFORM_TYPES)


def test_cli_nested_overrides():
    cfg = parse(RunCfg, ["--role", "train", "--train.batch_size", "8",
                         "--train.lr", "1e-3", "--eval.tiny", "true"])
    assert cfg.role == "train"
    assert cfg.train.batch_size == 8
    assert cfg.train.lr == 1e-3
    assert cfg.eval.tiny is True
    assert cfg.serve.port == 8000  # default preserved


def test_cli_yaml_with_include(tmp_path):
    inc = tmp_path / "model.yaml"
    inc.write_text("batch_size: 16\nlr: 2.0e-4\n")
    main = tmp_path / "main.yaml"
    main.write_text("role: train\ntrain: !include model.yaml\n")
    cfg = parse(RunCfg, ["--config", str(main)])
    assert cfg.role == "train"
    assert cfg.train.batch_size == 16
    assert cfg.train.lr == 2e-4
    # CLI overrides YAML
    cfg2 = parse(RunCfg, ["--config", str(main), "--train.batch_size", "4"])
    assert cfg2.train.batch_size == 4


def test_cli_rejects_unknown():
    with pytest.raises(SystemExit):
        parse(RunCfg, ["--nonexistent.option", "3"])


def _write_episode(out_dir, task, trial, seed, success, scores=(0.2, 0.3)):
    os.makedirs(out_dir, exist_ok=True)
    stem = (f"episode_{task}_trial{trial}_seed{seed}_"
            f"{'success' if success else 'failure'}")
    with open(os.path.join(out_dir, stem + ".pkl"), "wb") as f:
        pickle.dump({"verifier_scores": list(scores)}, f)


def test_analyze_aggregation(tmp_path):
    d = str(tmp_path)
    for i in range(4):
        _write_episode(d, "widowx_carrot_on_plate", i, 7, i % 2 == 0)
    for i in range(2):
        _write_episode(d, "widowx_stack_cube", i, 7, True)
    eps = analyze.load_episodes(d)
    assert len(eps) == 6
    agg = analyze.aggregate(eps, seed_period=2)
    assert agg["per_task"]["widowx_carrot_on_plate"]["success_rate"] == 0.5
    assert agg["per_task"]["widowx_stack_cube"]["success_rate"] == 1.0
    assert abs(agg["overall"] - 4 / 6) < 1e-9
    table = analyze.render_table(agg)
    assert "widowx_stack_cube" in table and "OVERALL" in table
    plot = analyze.plot_success_rates(agg, str(tmp_path / "plot.png"))
    assert plot is None or os.path.exists(plot)


def test_filename_parser_rejects_garbage():
    assert analyze.extract_success_from_filename("notanepisode.pkl") is None
    meta = analyze.extract_success_from_filename(
        "episode_widowx_spoon_on_towel_trial3_seed9_failure.pkl")
    assert meta == {"task": "widowx_spoon_on_towel", "trial": 3, "seed": 9,
                    "success": False}


def test_sim_metrics():
    real = [0.2, 0.5, 0.8]
    sim_good = [0.25, 0.55, 0.75]
    sim_bad = [0.8, 0.5, 0.2]
    assert sim_metrics.pearson_correlation(real, sim_good) > 0.99
    assert sim_metrics.pearson_correlation(real, sim_bad) < -0.99
    assert sim_metrics.mean_maximum_rank_violation(real, sim_good) == 0.0
    assert sim_metrics.mean_maximum_rank_violation(real, sim_bad) > 0.3
    kw = sim_metrics.kruskal_wallis([[1, 0, 1, 1]], [[1, 1, 0, 1]])
    assert 0.0 <= kw["mean_pvalue"] <= 1.0


def test_lang_transforms():
    lt = LangTransform(seed=0)
    for tt in TRANSFORM_TYPES:
        out = lt.transform("put the carrot on the plate", tt, n=3)
        assert isinstance(out, list)
    reph = lt.transform("put the carrot on the plate", "rephrase", n=5)
    assert len(reph) == 5 and len(set(reph)) == 5
    neg = lt.transform("put the carrot on the plate", "negation")
    assert neg[0].startswith("do not")
    with pytest.raises(ValueError):
        lt.transform("x", "bogus")


def test_generate_rephrase_store_schema():
    store = generate_rephrase_store(["put carrot on plate"], n_per_task=8,
                                    backend=TemplateBackend(0))
    entry = store["instructions"]["put carrot on plate"]
    assert entry["count"] == len(entry["ert_rephrases"]) <= 8
    assert entry["count"] >= 4  # template backend finds enough variants
    # round-trips through the loader
    import json as _json
    from cover_vla_tpu.eval.rephrase import load_rephrases
    path = "/tmp/_reph_test.json"
    with open(path, "w") as f:
        _json.dump(store, f)
    loaded = load_rephrases(path)
    assert loaded["put carrot on plate"] == entry["ert_rephrases"]


def test_run_train_role_tiny(tmp_path):
    """End-to-end: python -m cover_vla_tpu.run --role train (tiny model,
    synthetic npz dataset, 3 steps, checkpointing)."""
    from cover_vla_tpu import run as run_mod
    rng = np.random.default_rng(0)
    ds_dir = tmp_path / "ds"
    os.makedirs(ds_dir)
    np.savez(ds_dir / "traj0.npz",
             images=rng.integers(0, 255, (6, 56, 56, 3)).astype(np.uint8),
             states=rng.standard_normal((6, 7)).astype(np.float32),
             actions=rng.standard_normal((6, 7)).astype(np.float32),
             task="pick up the cube")
    ck_dir = tmp_path / "ck"
    run_mod.main(["--role", "train", "--train.tiny", "true",
                  "--train.dataset_dir", str(ds_dir),
                  "--train.num_steps", "3", "--train.batch_size", "2",
                  "--train.checkpoint_dir", str(ck_dir),
                  "--train.save_every", "1000"])
    from cover_vla_tpu.convert import checkpoints
    assert checkpoints.latest_checkpoint(str(ck_dir)) is not None


def _write_rich_episode(out_dir, task, trial, success, stats=None,
                        instructions=None):
    os.makedirs(out_dir, exist_ok=True)
    stem = (f"episode_{task}_trial{trial}_seed7_"
            f"{'success' if success else 'failure'}")
    with open(os.path.join(out_dir, stem + ".pkl"), "wb") as f:
        pickle.dump({
            "verifier_scores": [0.2, 0.3],
            "episode_stats": stats or {},
            "selected_instructions": instructions or [],
        }, f)


def test_analyze_partial_metric_breakdown(tmp_path):
    d = str(tmp_path)
    _write_rich_episode(d, "widowx_carrot_on_plate", 0, True,
                        stats={"moved_correct_obj": True,
                               "is_src_obj_grasped": True,
                               "consecutive_grasp": True})
    _write_rich_episode(d, "widowx_carrot_on_plate", 1, False,
                        stats={"moved_correct_obj": False,
                               "moved_wrong_obj": True,
                               "is_src_obj_grasped": False,
                               "consecutive_grasp": False})
    eps = analyze.load_episodes(d)
    bd = analyze.partial_metric_breakdown(eps)
    row = bd["widowx_carrot_on_plate"]
    assert row["moved_correct_obj"] == 0.5
    assert row["is_src_obj_grasped"] == 0.5
    assert row["moved_wrong_obj"] == 1.0  # present in only one episode
    table = analyze.render_partial_table(bd)
    assert "moved_correct_" in table


def test_analyze_instruction_switches(tmp_path):
    d = str(tmp_path)
    _write_rich_episode(d, "widowx_stack_cube", 0, True,
                        instructions=["stack blocks", "stack blocks"])
    _write_rich_episode(d, "widowx_stack_cube", 1, True,
                        instructions=["stack blocks", "pile the cubes"])
    sw = analyze.instruction_switch_stats(analyze.load_episodes(d))
    assert sw["episodes"] == 2
    assert sw["episodes_with_switch"] == 1
    assert sw["switch_rate"] == 0.5
    assert sw["instruction_counts"]["stack blocks"] == 3


def test_analyze_compare_runs(tmp_path):
    a, b = str(tmp_path / "runA"), str(tmp_path / "runB")
    for i in range(4):
        _write_rich_episode(a, "widowx_carrot_on_plate", i, i % 2 == 0)
        _write_rich_episode(b, "widowx_carrot_on_plate", i, True)
    cmp = analyze.compare_runs({"A": a, "B": b}, seed_period=2)
    assert cmp["table"]["widowx_carrot_on_plate"]["A"]["success_rate"] == 0.5
    assert cmp["table"]["widowx_carrot_on_plate"]["B"]["success_rate"] == 1.0
    txt = analyze.render_comparison(cmp)
    assert "A" in txt.splitlines()[0] and "OVERALL" in txt
    plot = analyze.plot_comparison(cmp, str(tmp_path / "cmp.png"))
    assert plot is None or os.path.exists(plot)
    # CLI path
    analyze.main([a, "--partial", "--switches", "--compare", f"B={b}",
                  "--seed-period", "2"])


def test_openai_backend_parse_and_fallback(monkeypatch):
    """OpenAI-compatible HTTP rephrase backend: request/parse round-trip
    against a stubbed endpoint; make_backend('auto') falls back to the
    template backend without a key (air-gapped default)."""
    import io
    import json as _json
    import urllib.request
    from cover_vla_tpu.eval.lang_transform import (
        OpenAICompatibleBackend, TemplateBackend, make_backend)

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert isinstance(make_backend("auto"), TemplateBackend)
    with pytest.raises(ValueError):
        OpenAICompatibleBackend()

    captured = {}

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        captured["url"] = req.full_url
        captured["body"] = _json.loads(req.data.decode())
        captured["auth"] = req.headers.get("Authorization")
        return _Resp(_json.dumps({"choices": [{"message": {"content":
            "1. place the carrot on the dish\n"
            "2) set the carrot onto the plate\n"
            "- move the carrot to the plate\n"}}]}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    be = make_backend("openai", api_key="k", base_url="http://fake/v1",
                      model="test-model")
    out = be.rephrase("put carrot on plate", 3, image=b"\x89PNG")
    assert out == ["place the carrot on the dish",
                   "set the carrot onto the plate",
                   "move the carrot to the plate"]
    assert captured["url"] == "http://fake/v1/chat/completions"
    assert captured["auth"] == "Bearer k"
    content = captured["body"]["messages"][0]["content"]
    assert content[1]["type"] == "image_url"   # image-conditioned prompt


def test_stream_json_scalar_at_chunk_boundary(tmp_path):
    """A bare number straddling the read-chunk boundary must not be split
    into two elements (raw_decode accepts truncated scalars)."""
    from cover_vla_tpu.data.bridge_verifier_dataset import _stream_json_field
    # chunk_size chosen so '123456789' splits across reads
    arr = [111, 123456789, 222]
    doc = '{"pad": "' + "x" * 10 + '", "vals": [111, 123456789, 222]}'
    p = tmp_path / "doc.json"
    p.write_text(doc)
    idx = doc.find("123456789")
    for cs in (idx + 3, idx + 5, 16, 7):
        got = list(_stream_json_field(str(p), "vals", chunk_size=cs))
        assert got == arr, (cs, got)
