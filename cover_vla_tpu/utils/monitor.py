"""Timing / logging / device-memory observability.

Mirrors INT-ACT/src/utils/monitor.py (Timer :17, log_execution_time
decorator :28-44, setup_logger :50+, log_allocated_gpu_memory) with
TPU-native equivalents (jax device memory stats, jax.profiler traces).
"""

from __future__ import annotations

import contextlib
import functools
import logging
import os
import sys
import time
from typing import Optional


class Timer:
    """Incremental wall-clock timer: elapsed() returns time since last call."""

    def __init__(self):
        self._t = time.time()

    def elapsed(self) -> float:
        now = time.time()
        dt = now - self._t
        self._t = now
        return dt

    def reset(self):
        self._t = time.time()


def log_execution_time(logger: Optional[logging.Logger] = None):
    """Decorator: log the wall time of each call."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **kw):
            t0 = time.time()
            out = fn(*a, **kw)
            (logger or logging.getLogger(fn.__module__)).info(
                "%s took %.3fs", fn.__name__, time.time() - t0)
            return out
        return wrapped
    return deco


def setup_logger(name: str = "cover_vla_tpu", log_file: Optional[str] = None,
                 level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        fmt = logging.Formatter(
            "[%(asctime)s] %(name)s %(levelname)s: %(message)s")
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def log_device_memory(logger: Optional[logging.Logger] = None,
                      tag: str = "") -> dict:
    """TPU equivalent of log_allocated_gpu_memory: per-device HBM stats.

    Backends without memory introspection (e.g. the tunneled axon
    platform returns an empty memory_stats()) are reported with
    available=False rather than fabricated zeros — callers must surface
    'unavailable', never 0.0 (a 3.3B model did not use 0 bytes)."""
    import jax
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)() or {}
        available = "bytes_in_use" in stats
        entry = {"available": available}
        if available:
            entry["bytes_in_use"] = stats["bytes_in_use"]
            entry["bytes_limit"] = stats.get("bytes_limit", 0)
            if "peak_bytes_in_use" in stats:
                entry["peak_bytes_in_use"] = stats["peak_bytes_in_use"]
        else:
            entry["reason"] = "memory_stats() empty on this backend"
        out[str(d)] = entry
        if logger and available:
            logger.info("%s %s: %.2f/%.2f GB", tag, d,
                        entry["bytes_in_use"] / 2**30,
                        entry["bytes_limit"] / 2**30)
    return out


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace scope (chrome-trace viewable in TensorBoard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class blockprint:
    """Context manager silencing stdout (monitor.py blockprint)."""

    def __enter__(self):
        self._stdout = sys.stdout
        sys.stdout = open("/dev/null", "w")
        return self

    def __exit__(self, *exc):
        sys.stdout.close()
        sys.stdout = self._stdout
        return False


def enable_persistent_compile_cache(min_compile_secs: float = 2.0) -> str:
    """Point XLA's persistent compilation cache at the shared per-platform
    directory every entry point uses (bench.py, tests/conftest.py, the
    experiment scripts). Checkpoint-iteration workflows (switch_model,
    full_size_ingest) then pay the 10-min full-size verified_step compile
    ONCE per machine instead of once per process — the reference's
    evaluator iterates checkpoints in one process and never recompiles
    (INT-ACT base_evaluator.py:119-126); this is the cross-process
    equivalent.

    Honors JAX_COMPILATION_CACHE_DIR; defaults to
    ~/.cache/jax_comp_cache[_cpu] keyed by the active platform.
    """
    import jax

    platform = jax.default_backend()
    default = ("~/.cache/jax_comp_cache_cpu" if platform == "cpu"
               else "~/.cache/jax_comp_cache")
    cache_dir = os.path.expanduser(
        os.environ.get("JAX_COMPILATION_CACHE_DIR", default))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
