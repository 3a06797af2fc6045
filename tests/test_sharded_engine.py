"""Multi-chip episode-sharded verified step on the virtual CPU mesh."""

import numpy as np
import jax
from jax.sharding import Mesh

from cover_vla_tpu.configs import (
    tiny_pi0_config, tiny_verifier_config, CoVerConfig)
from cover_vla_tpu.data.stats import DatasetStatistics
from cover_vla_tpu.models import pi0, verifier
from cover_vla_tpu.engine import make_verified_step_batched
from cover_vla_tpu.engine.verified_step import make_verified_step_sharded

PCFG = tiny_pi0_config()
VCFG = tiny_verifier_config()
CCFG = CoVerConfig(n_samples=2, n_rephrases=2)
STATS = DatasetStatistics.from_json()


def test_sharded_equals_unsharded():
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices), ("data",))

    pp = pi0.init_pi0(jax.random.PRNGKey(0), PCFG)
    vp = verifier.init_verifier(jax.random.PRNGKey(1), VCFG, 1)

    e = 8
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (e, 256, 256, 3)).astype(np.uint8)
    prop = rng.uniform(-0.1, 0.1, (e, 7)).astype(np.float32)
    k, t = CCFG.n_rephrases, PCFG.tokenizer_max_length
    lt = rng.integers(0, PCFG.paligemma.vocab_size, (e, k, t)).astype(np.int32)
    lm = np.ones((e, k, t), bool)
    vt = rng.integers(0, VCFG.text.vocab_size,
                      (e, VCFG.text.context_length)).astype(np.int32)
    hist = np.zeros((e, CCFG.max_history, 7), np.float32)
    hlen = np.full((e,), 2, np.int32)
    keys = jax.random.split(jax.random.PRNGKey(3), e)

    args = (pp, vp, keys, raw, prop, lt, lm, vt, hist, hlen)
    with mesh:
        sharded = make_verified_step_sharded(PCFG, VCFG, CCFG, STATS, mesh)
        rs = sharded(*args)
        # episode axis is genuinely distributed over the 8 devices
        assert len(rs.exec_chunk.sharding.device_set) == 8

    rb = make_verified_step_batched(PCFG, VCFG, CCFG, STATS)(*args)
    # partitioned compilation reorders fp accumulation slightly
    np.testing.assert_allclose(np.asarray(rs.exec_chunk),
                               np.asarray(rb.exec_chunk),
                               rtol=1e-2, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(rs.winner_idx),
                                  np.asarray(rb.winner_idx))
