"""Host-array mode for the torch->JAX converters.

The converters normally emit device arrays (``jnp.asarray`` per leaf).
For the convert-once cache (`loaders.py`) the tree must be written to
disk BEFORE any device transfer: serializing device arrays pulls every
leaf back through the axon host<->TPU tunnel (measured 570 s for the
3.24B policy in INGEST_r03/r04), while a host-side tree writes at disk
speed and reaches the device in one batched ``jax.device_put``.

Inside ``with host_arrays():`` the helpers below return numpy arrays
(bf16 via ml_dtypes) instead of committed device buffers; outside it
they are exactly ``jnp.asarray`` / ``jnp.stack``. The flag is a plain
module list (converters run single-threaded on the ingest path).
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np
import jax.numpy as jnp

_HOST = [False]


@contextmanager
def host_arrays():
    """Make converter `asarray`/`stack` calls produce host numpy arrays."""
    prev = _HOST[0]
    _HOST[0] = True
    try:
        yield
    finally:
        _HOST[0] = prev


def active() -> bool:
    return _HOST[0]


def asarray(x, dtype=None):
    """`jnp.asarray(x, dtype)`, or its host-side numpy equivalent under
    `host_arrays()` (same dtype semantics incl. bf16 via ml_dtypes)."""
    if not _HOST[0]:
        return jnp.asarray(x, dtype)
    a = np.asarray(x)
    if dtype is not None:
        a = a.astype(np.dtype(dtype), copy=False)
    return a


def stack(xs):
    """`jnp.stack`, numpy under `host_arrays()`."""
    if not _HOST[0]:
        return jnp.stack(xs)
    return np.stack([np.asarray(x) for x in xs])
