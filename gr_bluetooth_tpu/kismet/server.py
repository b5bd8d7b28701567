"""BTBBDEV line-protocol server — the network half of the Kismet plugin.

The reference registers a "BTBBDEV" protocol with Kismet's client/server
core: on client enable it blits every tracked network, and a 1 Hz timer
blits dirty networks to all clients (tracker_bluetooth.cc:131-158,
209-233).  Kismet's wire format is `*PROTO: field field ...\n` with
space-separated positional fields.

This server speaks the same record shape standalone over TCP:

    *BTBBDEV: <bdaddr> <firsttime> <lasttime> <packets> <gps...17 fields>

so existing Kismet-protocol tooling patterns apply, without requiring the
Kismet process.  Clients connect, immediately receive a full snapshot, then
receive dirty-network updates on every `tick()` (call it at ~1 Hz like the
reference's SERVER_TIMESLICES_SEC timer, or after each processed block).
"""
from __future__ import annotations

import socket
import threading

from .tracker import BTBBDEV_FIELDS, TrackerBluetooth

__all__ = ["BtbbDevServer", "format_record", "parse_record"]


def format_record(net) -> str:
    f = net.fields()
    vals = []
    for name in BTBBDEV_FIELDS:
        v = f[name]
        vals.append(f"{v:.6f}" if isinstance(v, float) else str(v))
    return "*BTBBDEV: " + " ".join(vals) + "\n"


def parse_record(line: str) -> dict:
    if not line.startswith("*BTBBDEV: "):
        raise ValueError("not a BTBBDEV record")
    parts = line[len("*BTBBDEV: "):].split()
    if len(parts) != len(BTBBDEV_FIELDS):
        raise ValueError(f"want {len(BTBBDEV_FIELDS)} fields, got {len(parts)}")
    out = {}
    for name, raw in zip(BTBBDEV_FIELDS, parts):
        if name == "bdaddr":
            out[name] = raw
        elif "." in raw:
            out[name] = float(raw)
        else:
            out[name] = int(raw)
    return out


class BtbbDevServer:
    """TCP fanout of tracker blits. Thread-safe; clients handled inline."""

    def __init__(self, tracker: TrackerBluetooth, host: str = "127.0.0.1",
                 port: int = 0):
        self.tracker = tracker
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(8)
        self.address = self._srv.getsockname()
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._running = True
        self._accept_thread.start()

    def _accept_loop(self):
        while self._running:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            # protocol enable: full snapshot to the new client
            # (Protocol_BTBBDEV_enable -> BlitDevices(fd)).  Format under
            # the tracker lock so a concurrent observe() can't tear a
            # record; send outside it so a slow client can't stall the
            # processing thread.
            with self.tracker.lock:
                payload = "".join(format_record(net)
                                  for net in self.tracker.snapshot()).encode()
            try:
                conn.sendall(payload)
            except OSError:
                conn.close()
                continue
            with self._lock:
                self._clients.append(conn)

    def tick(self):
        """Blit dirty networks to all clients (the 1 Hz timer path)."""
        with self.tracker.lock:
            records = [format_record(n) for n in self.tracker.blit()]
        if not records:
            return 0
        payload = "".join(records).encode()
        with self._lock:
            dead = []
            for c in self._clients:
                try:
                    c.sendall(payload)
                except OSError:
                    dead.append(c)
            for c in dead:
                self._clients.remove(c)
                c.close()
        return len(records)

    def close(self):
        self._running = False
        try:
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._srv.close()
        with self._lock:
            for c in self._clients:
                c.close()
            self._clients.clear()
