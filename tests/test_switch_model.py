"""Checkpoint switching on the served policy wrappers + the remote
evaluator's per-checkpoint iteration (base_evaluator.py:119-126,
websocket_policy_server.py:75)."""

import numpy as np
import jax
import pytest

from cover_vla_tpu.configs import (
    tiny_pi0_config, tiny_verifier_config, CoVerConfig)
from cover_vla_tpu.convert import checkpoints
from cover_vla_tpu.models import pi0, verifier


def _leaf(params):
    return np.asarray(jax.tree_util.tree_leaves(params)[0])


def test_pi0_wrapper_switch_model(tmp_path):
    from cover_vla_tpu.serving.policy_wrapper import Pi0PolicyWrapper
    cfg = tiny_pi0_config()
    p1 = pi0.init_pi0(jax.random.PRNGKey(0), cfg)
    p2 = pi0.init_pi0(jax.random.PRNGKey(9), cfg)
    ck2 = checkpoints.save_params(str(tmp_path / "ck2"), p2)

    w = Pi0PolicyWrapper(p1, cfg)
    w._queue = [np.zeros(7)]                # must be cleared by the switch
    w.switch_model(ck2)
    assert w._queue == []
    np.testing.assert_array_equal(_leaf(w.params), _leaf(p2))

    # a bad path must NOT clobber the working params (atomic switch)
    with pytest.raises(Exception):
        w.switch_model(str(tmp_path / "nope"))
    np.testing.assert_array_equal(_leaf(w.params), _leaf(p2))


def test_cover_wrapper_switch_model(tmp_path):
    from cover_vla_tpu.engine import CoVerEngine
    from cover_vla_tpu.serving.policy_wrapper import CoVerPolicyWrapper
    pcfg, vcfg = tiny_pi0_config(), tiny_verifier_config()
    ccfg = CoVerConfig(n_samples=2, n_rephrases=2)
    pp1 = pi0.init_pi0(jax.random.PRNGKey(0), pcfg)
    pp2 = pi0.init_pi0(jax.random.PRNGKey(9), pcfg)
    vp1 = verifier.init_verifier(jax.random.PRNGKey(1), vcfg, num_members=2)
    vp2 = verifier.init_verifier(jax.random.PRNGKey(8), vcfg, num_members=2)
    pck = checkpoints.save_params(str(tmp_path / "p2"), pp2)
    vck = checkpoints.save_params(str(tmp_path / "v2"), vp2)

    eng = CoVerEngine(pp1, vp1, pcfg, vcfg, ccfg)
    eng.reset("stack the blocks")
    w = CoVerPolicyWrapper(eng)
    w.switch_model(pck)
    np.testing.assert_array_equal(_leaf(eng.policy_params), _leaf(pp2))
    w.switch_model("verifier:" + vck)
    np.testing.assert_array_equal(_leaf(eng.verifier_params), _leaf(vp2))

    # the switched engine still runs end-to-end
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    a = eng.step(img, rng.uniform(-0.1, 0.1, 7).astype(np.float32))
    assert np.isfinite(np.asarray(a)).all()


def test_remote_checkpoint_iteration(tmp_path):
    """switch_and_evaluate drives the switch_model verb over the RPC for
    each checkpoint and re-evaluates (reference checkpoint iteration)."""
    from cover_vla_tpu.serving import (
        WebsocketPolicyServer, WebsocketPolicyClient)
    from cover_vla_tpu.serving.policy_wrapper import Pi0PolicyWrapper
    from cover_vla_tpu.eval.remote_evaluator import switch_and_evaluate
    from cover_vla_tpu.eval.fake_env import FakeWidowXEnv

    cfg = tiny_pi0_config()
    cks = []
    for i in range(2):
        p = pi0.init_pi0(jax.random.PRNGKey(i), cfg)
        cks.append(checkpoints.save_params(str(tmp_path / f"ck{i}"), p))

    wrapper = Pi0PolicyWrapper(pi0.init_pi0(jax.random.PRNGKey(7), cfg), cfg)
    server = WebsocketPolicyServer(wrapper, "127.0.0.1", 18773,
                                   metadata={"model": "pi0"})
    server.serve_in_thread()
    client = WebsocketPolicyClient("127.0.0.1", 18773, retry_interval_s=0.2,
                                   max_retries=30)
    out = switch_and_evaluate(
        client, cks,
        lambda: [FakeWidowXEnv("widowx_carrot_on_plate", max_steps=3)],
        max_steps=3)
    assert set(out.keys()) == set(cks)
    for res in out.values():
        assert 0.0 <= res["success_rate"] <= 1.0
    # the last switched checkpoint is what the server now holds
    np.testing.assert_array_equal(
        _leaf(wrapper.params),
        _leaf(checkpoints.load_params(cks[-1])))
    client.close()
