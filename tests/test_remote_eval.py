"""Process-split evaluation over the websocket RPC with a scripted policy,
plus the MP4 episode sink."""

import os

import numpy as np
import pytest

from cover_vla_tpu.serving import WebsocketPolicyServer, WebsocketPolicyClient
from cover_vla_tpu.serving.alt_policies import ScriptedPolicyWrapper
from cover_vla_tpu.eval.remote_evaluator import RemoteEvaluator
from cover_vla_tpu.eval.fake_env import FakeWidowXEnv


def test_remote_evaluation_roundtrip():
    server = WebsocketPolicyServer(ScriptedPolicyWrapper(), "127.0.0.1",
                                   18767, metadata={"model": "scripted"})
    server.serve_in_thread()
    client = WebsocketPolicyClient("127.0.0.1", 18767, retry_interval_s=0.2,
                                   max_retries=30)
    ev = RemoteEvaluator(client, max_steps=10)
    envs = [FakeWidowXEnv("widowx_carrot_on_plate", max_steps=10)
            for _ in range(2)]
    out = ev.evaluate(envs)
    assert len(out["episodes"]) == 2
    assert 0.0 <= out["success_rate"] <= 1.0
    assert out["episodes"][0]["task"] == "put carrot on plate"
    client.close()


def test_episode_mp4_sink(tmp_path):
    from cover_vla_tpu.eval.evaluator import EpisodeResult, save_episode
    rng = np.random.default_rng(0)
    ep = EpisodeResult(
        task="widowx_stack_cube", trial=0, seed=7, success=True,
        num_steps=5, episode_stats={}, verifier_scores=[0.2],
        selected_instructions=["x"], execute_actions=[np.zeros(7)],
        wall_s=0.1,
        frames=[rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
                for _ in range(5)])
    stem = save_episode(ep, str(tmp_path))
    assert os.path.exists(tmp_path / (stem + ".pkl"))
    mp4 = tmp_path / (stem + ".mp4")
    if mp4.exists():  # imageio/ffmpeg present
        assert mp4.stat().st_size > 0
