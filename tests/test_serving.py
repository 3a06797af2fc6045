"""msgpack-numpy codec + websocket policy server/client round trip."""

import threading

import numpy as np
import pytest

from cover_vla_tpu.serving import msgpack_numpy as mpn
from cover_vla_tpu.serving import (
    WebsocketPolicyServer, WebsocketPolicyClient)


def test_msgpack_numpy_roundtrip():
    obj = {
        "image": np.random.default_rng(0).integers(
            0, 255, (32, 32, 3)).astype(np.uint8),
        "state": np.linspace(0, 1, 7).astype(np.float32),
        "task": "put carrot on plate",
        "n": 3,
        "nested": {"x": np.arange(4, dtype=np.int64)},
    }
    out = mpn.unpackb(mpn.packb(obj))
    np.testing.assert_array_equal(out["image"], obj["image"])
    np.testing.assert_array_equal(out["state"], obj["state"])
    np.testing.assert_array_equal(out["nested"]["x"], obj["nested"]["x"])
    assert out["task"] == obj["task"] and out["n"] == 3


class EchoPolicy:
    def __init__(self):
        self.resets = 0
        self.model = "initial"

    def infer(self, obs):
        return {"actions": np.asarray(obs["state"]) * 2}

    def reset(self):
        self.resets += 1

    def switch_model(self, path):
        self.model = path


def test_websocket_server_client_roundtrip():
    policy = EchoPolicy()
    server = WebsocketPolicyServer(policy, host="127.0.0.1", port=18765,
                                   metadata={"name": "echo"})
    server.serve_in_thread()

    client = WebsocketPolicyClient("127.0.0.1", 18765, retry_interval_s=0.2,
                                   max_retries=20)
    assert client.metadata == {"name": "echo"}
    out = client.infer({"state": np.array([1.0, 2.0])})
    np.testing.assert_allclose(out["actions"], [2.0, 4.0])
    client.reset()
    assert policy.resets == 1
    client.switch_model("/some/ckpt")
    assert policy.model == "/some/ckpt"
    client.close()


class FailingPolicy(EchoPolicy):
    def infer(self, obs):
        raise ValueError("boom")


def test_server_error_propagates_traceback():
    server = WebsocketPolicyServer(FailingPolicy(), host="127.0.0.1",
                                   port=18766)
    server.serve_in_thread()
    client = WebsocketPolicyClient("127.0.0.1", 18766, retry_interval_s=0.2,
                                   max_retries=20)
    with pytest.raises(RuntimeError, match="boom"):
        client.infer({"state": np.array([1.0])})
    client.close()


def test_role_serve_cover_mode_builds_and_infers():
    """--role serve_policy --serve.mode cover: the fused engine behind the
    RPC verbs (previously only pi0 mode was reachable from the CLI)."""
    import numpy as np
    from cover_vla_tpu.run import RunCfg, ServeCfg, build_server

    cfg = RunCfg(role="serve_policy",
                 serve=ServeCfg(mode="cover", tiny=True, n_samples=2,
                                n_rephrases=2, port=18999))
    server = build_server(cfg)
    assert server.metadata["model"] == "cover"
    pol = server.policy
    rng = np.random.default_rng(0)
    pol.infer({"reset_task": "put carrot on plate",
               "image": rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
               "proprio": np.zeros(7, np.float32)})
    out = pol.infer({
        "image": rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
        "proprio": np.zeros(7, np.float32)})
    assert out["actions"].shape == (7,)
    assert out["instruction"]
