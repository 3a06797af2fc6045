"""Websocket policy server/client (process-split serving).

Mirrors the reference RPC surface (policy_server_client/
websocket_policy_server.py:16-91, websocket_policy_client.py:19-81):
msgpack-numpy frames; a metadata handshake on connect; verbs
`infer` / `reset` / `switch_model`; on internal error the server sends a
traceback frame and closes. The client busy-waits for the server with a
retry interval.

The policy process holds the TPU; the env/eval process talks to it over
the socket — identical topology to the reference's split mode
(INT-ACT/src/agent/run.py:43-69).
"""

from __future__ import annotations

import asyncio
import logging
import threading
import time
import traceback
from typing import Any, Dict, Optional, Protocol

from cover_vla_tpu.serving import msgpack_numpy as mpn

logger = logging.getLogger(__name__)


class BasePolicy(Protocol):
    def infer(self, obs: Dict[str, Any]) -> Dict[str, Any]: ...
    def reset(self) -> None: ...
    def switch_model(self, path: str) -> None: ...


class WebsocketPolicyServer:
    """Serve a policy over a websocket (one request -> one response)."""

    def __init__(self, policy: BasePolicy, host: str = "0.0.0.0",
                 port: int = 8000, metadata: Optional[Dict] = None):
        self.policy = policy
        self.host = host
        self.port = port
        self.metadata = metadata or {}
        self._stop: Optional[asyncio.AbstractEventLoop] = None

    async def _handler(self, websocket):
        await websocket.send(mpn.packb(self.metadata))
        async for message in websocket:
            try:
                req = mpn.unpackb(message)
                verb = req.get("type", "infer")
                if verb == "reset":
                    self.policy.reset()
                    resp = {"status": "ok"}
                elif verb == "switch_model":
                    self.policy.switch_model(req.get("path", ""))
                    resp = {"status": "ok"}
                else:
                    resp = self.policy.infer(req.get("obs", req))
                await websocket.send(mpn.packb(resp))
            except Exception:
                # traceback frame then close (websocket_policy_server.py:85-91)
                await websocket.send(mpn.packb(
                    {"error": traceback.format_exc()}))
                await websocket.close()
                return

    async def _serve(self, ready: threading.Event):
        import websockets.asyncio.server as ws_server
        async with ws_server.serve(self._handler, self.host, self.port,
                                   max_size=None) as server:
            self._stop = asyncio.get_running_loop()
            ready.set()
            await asyncio.get_running_loop().create_future()  # run forever

    def serve_forever(self):
        ready = threading.Event()
        asyncio.run(self._serve(ready))

    def serve_in_thread(self) -> threading.Thread:
        ready = threading.Event()
        th = threading.Thread(target=lambda: asyncio.run(self._serve(ready)),
                              daemon=True)
        th.start()
        ready.wait(timeout=10)
        return th


class WebsocketPolicyClient:
    """Blocking client; retries until the server is reachable
    (websocket_policy_client.py:39-51)."""

    def __init__(self, host: str = "localhost", port: int = 8000,
                 retry_interval_s: float = 5.0, max_retries: int = 60):
        self.uri = f"ws://{host}:{port}"
        self.retry_interval_s = retry_interval_s
        self.max_retries = max_retries
        self._conn = None
        self._loop = asyncio.new_event_loop()
        self.metadata = self._connect()

    def _connect(self):
        import websockets.asyncio.client as ws_client
        for attempt in range(self.max_retries):
            try:
                self._conn = self._loop.run_until_complete(
                    ws_client.connect(self.uri, max_size=None))
                return mpn.unpackb(self._loop.run_until_complete(
                    self._conn.recv()))
            except (ConnectionRefusedError, OSError):
                logger.info("server not up, retrying in %.1fs",
                            self.retry_interval_s)
                time.sleep(self.retry_interval_s)
        raise ConnectionError(f"could not reach {self.uri}")

    def _call(self, payload: Dict) -> Dict:
        self._loop.run_until_complete(self._conn.send(mpn.packb(payload)))
        resp = mpn.unpackb(self._loop.run_until_complete(self._conn.recv()))
        if isinstance(resp, dict) and "error" in resp:
            raise RuntimeError(f"server error:\n{resp['error']}")
        return resp

    def infer(self, obs: Dict) -> Dict:
        return self._call({"type": "infer", "obs": obs})

    def reset(self) -> None:
        self._call({"type": "reset"})

    def switch_model(self, path: str) -> None:
        self._call({"type": "switch_model", "path": path})

    def close(self):
        if self._conn is not None:
            self._loop.run_until_complete(self._conn.close())
