"""Test config: force an 8-device CPU mesh so sharding paths are exercised
without TPU hardware (SURVEY.md §4: host-device-count-faked mesh tests).

Note: the environment pre-imports jax with JAX_PLATFORMS=axon (a tunneled
real TPU) via sitecustomize, so we must override the config AFTER import —
setting the env var alone is not enough. Tests must not run concurrently
with another JAX process: the axon tunnel is exclusive and a second client
deadlocks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# persistent compilation cache: the suite's CPU compiles dominate its wall
# time; repeat runs hit the cache (same flag the TPU bench uses)
import os as _os
_cache = _os.path.expanduser("~/.cache/jax_comp_cache_cpu")
_os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
