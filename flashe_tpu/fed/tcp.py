"""TCP federation transport for real multi-process / multi-host parties.

Replaces the reference's Java federation + proxy stack
(arch/driver/federation, arch/networking/proxy: gRPC streams staged
through LMDB with 4MB bz2 fragments, route_table.json party routing) with
a compact exchange:

- one broker process (the "exchange") listens on a host:port; every party
  connects and registers its (role, party_id) — the analogue of the
  proxy's route table.  The broker is **native C++** like the reference's
  WAN hop (native/fedbroker.cpp, built on demand via
  flashe_tpu/native.py); a pure-Python broker speaking the identical wire
  protocol remains as a no-compiler fallback,
- frames are length-prefixed with a fixed binary envelope
  (op, dst role, dst party id) so the broker routes raw bytes without
  deserializing anything; message metadata (name, tag, src, fragment
  counters) rides inside the opaque body and is only parsed by the
  destination party,
- big payloads are split into 4MB fragments like the reference's
  splitable transfer (arch/api/utils/splitable.py:48) and reassembled at
  the receiver,
- delivery is push-based with broker-side buffering of not-yet-registered
  destinations (the reference's recv polls transfer status; here a get()
  blocks on a local store fed by the broker connection).

Wire protocol (all integers big-endian):
  frame := u64 length | u8 op | u8 role_len | role | i32 party_id | body
  op 0 REGISTER (body empty, role/party = self)
  op 1 DATA     (role/party = destination; body = pickled metadata dict
                 {name, tag, src, frag, nfrag, payload})
"""

from __future__ import annotations

import pickle
import socket
import struct
import subprocess
import threading
from typing import Any, Dict, Tuple

from flashe_tpu import native as _native
from flashe_tpu.fed.transport import Federation, Party

__all__ = ["FedBroker", "TcpFederation"]

_FRAGMENT = 0x3FFF80  # ~4MB, the reference's splitable fragment size
_REGISTER, _DATA = 0, 1


def _envelope(op: int, role: str, party_id: int, body: bytes = b"") -> bytes:
    rb = role.encode()
    return (struct.pack("!BB", op, len(rb)) + rb
            + struct.pack("!i", party_id) + body)


def _parse_envelope(frame) -> Tuple[int, Tuple[str, int], int]:
    """Returns (op, (role, party_id), body_offset)."""
    op, rl = frame[0], frame[1]
    role = bytes(frame[2:2 + rl]).decode()
    (party,) = struct.unpack_from("!i", frame, 2 + rl)
    return op, (role, party), 6 + rl


def _send_frame(sock: socket.socket, frame: bytes, lock: threading.Lock):
    with lock:
        sock.sendall(struct.pack("!Q", len(frame)) + frame)


def _recv_frame(sock: socket.socket) -> bytes | None:
    hdr = _recv_exact(sock, 8)
    if hdr is None:
        return None
    (length,) = struct.unpack("!Q", hdr)
    return _recv_exact(sock, length)


def _recv_exact(sock, n):
    chunks = []
    got = 0
    while got < n:
        try:
            chunk = sock.recv(min(n - got, 1 << 20))
        except OSError:  # socket closed under us (federation shutdown)
            return None
        if not chunk:
            return None
        chunks.append(chunk)
        got += len(chunk)
    return b"".join(chunks)


class FedBroker:
    """Central exchange: routes DATA frames to the registered destination
    party, buffering frames for parties that have not connected yet.

    Prefers the native C++ broker executable (native/fedbroker.cpp);
    ``native=False`` forces the in-process Python loop, ``native=True``
    requires the binary.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 native: bool | str = "auto"):
        self._proc = None
        self._srv = None
        if native in ("auto", True):
            path = _native.broker_binary()
            if path is not None:
                proc = subprocess.Popen(
                    [path, str(port), host], stdout=subprocess.PIPE)
                line = proc.stdout.readline().decode()
                if line.startswith("PORT "):
                    self._proc = proc
                    self.address = (host, int(line.split()[1]))
                    return
                proc.terminate()
                proc.wait()
            if native is True:
                raise RuntimeError("native fedbroker unavailable")
        self._start_python_broker(host, port)

    # ---- pure-Python fallback broker (same wire protocol) ----

    def _start_python_broker(self, host, port):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(128)
        self.address = self._srv.getsockname()
        self._conns: Dict[Tuple[str, int], socket.socket] = {}
        self._locks: Dict[Tuple[str, int], threading.Lock] = {}
        self._pending: Dict[Tuple[str, int], list] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _serve(self, conn: socket.socket):
        hello = _recv_frame(conn)
        if not hello or hello[0] != _REGISTER:
            conn.close()
            return
        _, me, _ = _parse_envelope(hello)
        me_lock = threading.Lock()
        with self._lock:
            self._conns[me] = conn
            self._locks[me] = me_lock
            for frame in self._pending.pop(me, []):
                _send_frame(conn, frame, me_lock)
        while not self._stop.is_set():
            frame = _recv_frame(conn)
            if frame is None:
                with self._lock:
                    if self._conns.get(me) is conn:
                        del self._conns[me]
                return
            if frame[0] != _DATA:
                continue
            _, dst, _ = _parse_envelope(frame)
            with self._lock:
                dst_conn = self._conns.get(dst)
                dst_lock = self._locks.get(dst)
                if dst_conn is None:
                    self._pending.setdefault(dst, []).append(frame)
                    continue
            try:
                _send_frame(dst_conn, frame, dst_lock)
            except OSError:
                with self._lock:
                    self._pending.setdefault(dst, []).append(frame)

    def close(self):
        if self._proc is not None:
            self._proc.terminate()
            self._proc.wait()
            return
        self._stop.set()
        self._srv.close()


class TcpFederation(Federation):
    """Per-party handle speaking to a FedBroker."""

    def __init__(self, broker_addr, job_id, local: Party, parties,
                 authorization=None):
        super().__init__(job_id, local, parties, authorization)
        self._sock = socket.create_connection(tuple(broker_addr), timeout=600)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._send_lock = threading.Lock()
        _send_frame(self._sock,
                    _envelope(_REGISTER, local.role, local.party_id),
                    self._send_lock)
        self._store: Dict[Tuple, Any] = {}
        self._partial: Dict[Tuple, list] = {}
        self._cond = threading.Condition()
        self._rx = threading.Thread(target=self._recv_loop, daemon=True)
        self._rx.start()

    def _recv_loop(self):
        while True:
            frame = _recv_frame(self._sock)
            if frame is None:
                return
            if frame[0] != _DATA:
                continue
            _, _me, off = _parse_envelope(frame)
            msg = pickle.loads(memoryview(frame)[off:])
            key = (msg["name"], msg["tag"], tuple(msg["src"]))
            nfrag = msg["nfrag"]
            self.stats.add_recv_bytes(msg["name"], len(frame) + 8)
            with self._cond:
                if nfrag == 1:
                    self._store[key] = pickle.loads(msg["payload"])
                else:
                    parts = self._partial.setdefault(key, [None] * nfrag)
                    parts[msg["frag"]] = msg["payload"]
                    if all(p is not None for p in parts):
                        self._store[key] = pickle.loads(b"".join(parts))
                        del self._partial[key]
                if key in self._store:
                    self._cond.notify_all()

    def _send(self, obj, name, tag, src: Party, dst: Party):
        blob = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        frags = [blob[i : i + _FRAGMENT]
                 for i in range(0, max(len(blob), 1), _FRAGMENT)]
        for i, frag in enumerate(frags):
            body = pickle.dumps({
                "name": name, "tag": tag,
                "src": (src.role, src.party_id),
                "frag": i, "nfrag": len(frags), "payload": frag,
            }, protocol=pickle.HIGHEST_PROTOCOL)
            frame = _envelope(_DATA, dst.role, dst.party_id, body)
            self.stats.add_sent_bytes(name, len(frame) + 8)
            _send_frame(self._sock, frame, self._send_lock)

    def _recv(self, name, tag, src: Party, dst: Party, timeout: float):
        key = (name, tag, (src.role, src.party_id))
        with self._cond:
            ok = self._cond.wait_for(lambda: key in self._store, timeout)
            if not ok:
                raise TimeoutError(f"tcp federation get timed out on {key}")
            return self._store.pop(key)

    def _clean(self, name, src: Party, dst: Party):
        with self._cond:
            for k in [k for k in self._store
                      if k[0] == name and k[2] == (src.role, src.party_id)]:
                del self._store[k]

    def close(self):
        self._sock.close()
