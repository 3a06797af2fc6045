"""Policy factory (lerobot factory.make_policy / INT-ACT model_map
equivalent): name -> (config, init, host wrapper)."""

from __future__ import annotations

from typing import Any, Optional

import jax


def make_policy(name: str, *, tiny: bool = False, params: Any = None,
                seed: int = 0, **kwargs):
    """Supported families: 'pi0' (flow matching) and 'pi0fast'
    (autoregressive FAST tokens). Returns a host-side policy object with
    reset()/select_action()-style surface."""
    name = name.lower()
    if name == "pi0":
        from cover_vla_tpu.configs import Pi0Config, tiny_pi0_config
        from cover_vla_tpu.models import pi0
        from cover_vla_tpu.serving.policy_wrapper import Pi0PolicyWrapper
        cfg = tiny_pi0_config() if tiny else Pi0Config()
        if params is None:
            params = jax.jit(lambda k: pi0.init_pi0(k, cfg))(
                jax.random.PRNGKey(seed))
        return Pi0PolicyWrapper(params, cfg, **kwargs)
    if name == "pi0fast":
        from cover_vla_tpu.models import pi0fast
        cfg = pi0fast.tiny_pi0fast_config() if tiny \
            else pi0fast.Pi0FastConfig()
        if params is None:
            params = jax.jit(lambda k: pi0fast.init_pi0fast(k, cfg))(
                jax.random.PRNGKey(seed))
        return pi0fast.Pi0FastPolicy(params, cfg, **kwargs)
    raise ValueError(f"unknown policy family {name!r} (pi0 | pi0fast)")
