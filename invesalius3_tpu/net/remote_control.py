"""Remote control: mirror the internal event bus to/from an external
controller over a line-delimited JSON TCP socket.

Reference: invesalius/net/remote_control.py :29 — a Socket.IO client that
(a) re-publishes received ``to_neuronavigation`` messages onto the
internal bus and (b) registers a ``add_sendMessage_hook`` forwarding every
internal pubsub message out.  Socket.IO isn't in this environment, so the
transport is a dependency-free JSON-lines TCP protocol with identical
semantics: {"topic": ..., "data": {...}} per line in both directions.
"""

from __future__ import annotations

import json
import socket
import threading
from typing import Optional

from invesalius3_tpu import events


class RemoteControl:
    def __init__(self, host: str, port: int = 5000, bus=None):
        self.host = host
        self.port = port
        self.bus = bus or events.bus
        self._sock: Optional[socket.socket] = None
        self._reader: Optional[threading.Thread] = None
        self._connected = False
        self._lock = threading.Lock()

    def connect(self, timeout: float = 5.0) -> bool:
        self._sock = socket.create_connection((self.host, self.port), timeout=timeout)
        self._connected = True
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        # forward every internal event outward (reference remote_control.py:57)
        self.bus.add_send_message_hook(self._on_internal_message)
        return True

    def disconnect(self) -> None:
        self._connected = False
        self.bus.remove_send_message_hook()
        if self._sock:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None

    # -- outbound: internal bus -> remote ----------------------------------------
    def _on_internal_message(self, topic: str, kwargs: dict) -> None:
        if not self._connected:
            return
        try:
            payload = json.dumps({"topic": topic, "data": _jsonable(kwargs)})
            with self._lock:
                self._sock.sendall(payload.encode() + b"\n")
        except (OSError, TypeError, ValueError):
            pass

    # -- inbound: remote -> internal bus (no hook, avoid echo loops) --------------
    def _read_loop(self) -> None:
        buf = b""
        while self._connected:
            try:
                chunk = self._sock.recv(4096)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                try:
                    msg = json.loads(line)
                    self.bus.send_message_no_hook(msg["topic"], **msg.get("data", {}))
                except (ValueError, KeyError):
                    continue
        self._connected = False


def _jsonable(obj):
    import numpy as np

    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer, np.floating, np.bool_)):
        return obj.item()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return repr(obj)
