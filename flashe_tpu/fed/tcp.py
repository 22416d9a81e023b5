"""TCP federation transport for real multi-process / multi-host parties.

Replaces the reference's Java federation + proxy stack
(arch/driver/federation, arch/networking/proxy: gRPC streams staged
through LMDB with 4MB bz2 fragments, route_table.json party routing) with
a compact broker:

- one broker process (the "exchange") listens on a host:port; every party
  connects and registers its (role, party_id) — the analogue of the
  proxy's route table,
- messages are length-prefixed pickled frames addressed by
  (name, tag, src, dst); big payloads are split into 4MB fragments like
  the reference's splitable transfer (arch/api/utils/splitable.py:48) and
  reassembled at the receiver,
- delivery is push-based with broker-side buffering of not-yet-requested
  keys (the reference's recv polls transfer status; here a get() blocks on
  a local queue fed by the broker connection).
"""

from __future__ import annotations

import pickle
import socket
import struct
import threading
from typing import Any, Dict, Tuple

from flashe_tpu.fed.transport import Federation, Party

__all__ = ["FedBroker", "TcpFederation"]

_FRAGMENT = 0x3FFF80  # ~4MB, the reference's splitable fragment size


def _send_frame(sock: socket.socket, obj: Any, lock: threading.Lock):
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    with lock:
        sock.sendall(struct.pack("!Q", len(data)) + data)


def _recv_frame(sock: socket.socket):
    hdr = _recv_exact(sock, 8)
    if hdr is None:
        return None
    (length,) = struct.unpack("!Q", hdr)
    data = _recv_exact(sock, length)
    if data is None:
        return None
    return pickle.loads(data)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            return None
        buf += chunk
    return buf


class FedBroker:
    """Central exchange: routes (name, tag, src, dst) frames to the
    registered dst party, buffering frames for parties that have not
    connected yet."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(64)
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
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _serve(self, conn: socket.socket):
        hello = _recv_frame(conn)
        if not hello or hello.get("op") != "register":
            conn.close()
            return
        me = (hello["role"], hello["party_id"])
        me_lock = threading.Lock()
        with self._lock:
            self._conns[me] = conn
            self._locks[me] = me_lock
            for frame in self._pending.pop(me, []):
                _send_frame(conn, frame, me_lock)
        while not self._stop.is_set():
            frame = _recv_frame(conn)
            if frame is None:
                return
            dst = tuple(frame["dst"])
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
        _send_frame(self._sock, {"op": "register", "role": local.role,
                                 "party_id": local.party_id},
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
            key = (frame["name"], frame["tag"], tuple(frame["src"]))
            nfrag = frame["nfrag"]
            with self._cond:
                if nfrag == 1:
                    self._store[key] = pickle.loads(frame["payload"])
                else:
                    parts = self._partial.setdefault(key, [None] * nfrag)
                    parts[frame["frag"]] = frame["payload"]
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
            _send_frame(self._sock, {
                "name": name, "tag": tag,
                "src": (src.role, src.party_id),
                "dst": (dst.role, dst.party_id),
                "frag": i, "nfrag": len(frags), "payload": frag,
            }, self._send_lock)

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
