"""msgpack codec with numpy array support.

Wire-compatible with the reference's msgpack-numpy codec
(INT-ACT/packages/policy-server-client/src/policy_server_client/
msgpack_numpy.py): ndarrays are encoded as ext/dict payloads carrying
dtype, shape, and raw bytes; scalars pass through natively.
"""

from __future__ import annotations

import functools
from typing import Any

import msgpack
import numpy as np


def _encode(obj: Any):
    if isinstance(obj, np.ndarray):
        return {b"__ndarray__": True,
                b"data": obj.tobytes(),
                b"dtype": obj.dtype.str,
                b"shape": list(obj.shape)}
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def _decode(obj: Any):
    if isinstance(obj, dict) and (b"__ndarray__" in obj or "__ndarray__" in obj):
        get = (lambda k: obj.get(k.encode()) if obj.get(k.encode()) is not None
               else obj.get(k))
        return np.frombuffer(get("data"), dtype=np.dtype(get("dtype"))
                             ).reshape(get("shape"))
    return obj


def packb(obj: Any) -> bytes:
    return msgpack.packb(obj, default=_encode, use_bin_type=True)


def unpackb(data: bytes) -> Any:
    return msgpack.unpackb(data, object_hook=_decode, raw=False,
                           strict_map_key=False)
