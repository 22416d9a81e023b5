"""Remote storage node client + launcher.

The reference's DTables live in a *separate storage service* (eggroll's
storage-service-cxx C++ LMDB node) that Python reaches over the network
(arch/api/table/table.py against the eggroll cluster runtime;
SURVEY.md section 2.3).  This module is that split here:

- `StorageNode` launches the native C++ server (native/kvserver.cpp) —
  or a pure-python server speaking the same wire protocol when no
  compiler is available — over a storage root directory,
- `RemoteKVStore` is the client; it exposes the exact API of the
  in-process `data.kvstore.KVStore` (put/get/delete/count/items/flush/
  close + `.nparts`), so `PersistentDTable` works unchanged against a
  remote node: `data.table.init(job_id, storage_addr="host:port")`.

Partition counts are pinned server-side in the same META file the
in-process store writes, so a directory can be served locally or
remotely interchangeably (and reopening with a different requested
partition count keeps the on-disk value — no silent key loss).
"""

from __future__ import annotations

import os
import socket
import struct
import subprocess
import threading
from typing import Iterator, Optional, Tuple

__all__ = ["RemoteKVStore", "StorageNode"]

_OPEN, _PUT, _GET, _DEL, _COUNT, _ITER, _FLUSH, _SHUTDOWN = range(8)
_TERM = 0xFFFFFFFF


def _read_full(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = sock.recv(n - len(buf))
        if not part:
            raise ConnectionError("storage node closed the connection")
        buf += part
    return buf


class RemoteKVStore:
    """KVStore-compatible client for one (namespace, name) table."""

    def __init__(self, addr: str, namespace: str, name: str,
                 nparts: int = 1):
        host, port = addr.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)))
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._lock = threading.Lock()
        self._ns = namespace.encode()
        self._name = name.encode()
        status, payload = self._call(_OPEN, part=nparts)
        if status != 0:
            raise OSError(f"storage node failed to open {namespace}/{name}")
        self.nparts = struct.unpack("<I", payload)[0]

    def _call(self, op: int, part: int = 0, key: bytes = b"",
              value: bytes = b"") -> Tuple[int, bytes]:
        hdr = struct.pack("<BIIIII", op, len(self._ns), len(self._name),
                          part, len(key), len(value))
        with self._lock:
            self._sock.sendall(hdr + self._ns + self._name + key + value)
            resp = _read_full(self._sock, 9)
            status = resp[0]
            n = struct.unpack("<Q", resp[1:])[0]
            payload = _read_full(self._sock, n) if n else b""
        return status, payload

    @property
    def native(self) -> bool:  # parity with KVStore's introspection
        return True

    def put(self, part: int, key: bytes, value: bytes):
        status, _ = self._call(_PUT, part, key, value)
        if status != 0:
            raise OSError("remote kv_put failed")

    def get(self, part: int, key: bytes) -> Optional[bytes]:
        status, payload = self._call(_GET, part, key)
        if status == 1:
            return None
        if status != 0:
            raise OSError("remote kv_get failed")
        return payload

    def delete(self, part: int, key: bytes) -> bool:
        status, _ = self._call(_DEL, part, key)
        return status == 0

    def count(self, part: int) -> int:
        _, payload = self._call(_COUNT, part)
        return struct.unpack("<Q", payload)[0]

    def items(self, part: int) -> Iterator[Tuple[bytes, bytes]]:
        _, payload = self._call(_ITER, part)
        off = 0
        while True:
            (klen,) = struct.unpack_from("<I", payload, off)
            if klen == _TERM:
                return
            (vlen,) = struct.unpack_from("<I", payload, off + 4)
            off += 8
            yield payload[off : off + klen], payload[off + klen :
                                                     off + klen + vlen]
            off += klen + vlen

    def flush(self):
        self._call(_FLUSH)

    def close(self):
        try:
            self._sock.close()
        except OSError:
            pass


class StorageNode:
    """Launches a storage node over `root_dir` and reports its address.

    native=True compiles/spawns native/kvserver.cpp; native=False (or no
    compiler) runs an in-process python server speaking the same
    protocol over the same on-disk format.
    """

    def __init__(self, root_dir: str, port: int = 0, native: bool = True):
        self.root_dir = root_dir
        os.makedirs(root_dir, exist_ok=True)
        self._proc = None
        self._srv = None
        if native:
            from flashe_tpu.native import kvserver_binary

            binary = kvserver_binary()
            if binary is not None:
                self._proc = subprocess.Popen(
                    [binary, root_dir, str(port)],
                    stdout=subprocess.PIPE, text=True)
                line = self._proc.stdout.readline()
                if not line.startswith("KVSERVER PORT "):
                    raise OSError(f"kvserver failed to start: {line!r}")
                self.port = int(line.split()[-1])
                self.address = f"127.0.0.1:{self.port}"
                return
        self._start_python(port)

    @property
    def native(self) -> bool:
        return self._proc is not None

    # -- python fallback server -------------------------------------------

    def _start_python(self, port: int):
        from flashe_tpu.data.kvstore import open_store

        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(64)
        self.port = srv.getsockname()[1]
        self.address = f"127.0.0.1:{self.port}"
        self._srv = srv
        self._stores = {}
        self._stores_lock = threading.Lock()
        self._shutdown = threading.Event()

        def get_store(ns: str, name: str, nparts: int):
            with self._stores_lock:
                key = (ns, name)
                st = self._stores.get(key)
                if st is None:
                    d = os.path.join(self.root_dir, ns, name)
                    os.makedirs(d, exist_ok=True)
                    st = open_store(d, max(nparts, 1))
                    self._stores[key] = st
                return st

        def handle(conn: socket.socket):
            try:
                while True:
                    hdr = _read_full(conn, 21)
                    op, nslen, namelen, part, klen, vlen = struct.unpack(
                        "<BIIIII", hdr)
                    ns = _read_full(conn, nslen).decode() if nslen else ""
                    name = (_read_full(conn, namelen).decode()
                            if namelen else "")
                    key = _read_full(conn, klen) if klen else b""
                    val = _read_full(conn, vlen) if vlen else b""

                    def resp(status, payload=b""):
                        conn.sendall(struct.pack("<BQ", status,
                                                 len(payload)) + payload)

                    if op == _SHUTDOWN:
                        with self._stores_lock:
                            for st in self._stores.values():
                                st.flush()
                        resp(0)
                        self._shutdown.set()
                        # unblock accept
                        try:
                            socket.create_connection(
                                ("127.0.0.1", self.port), timeout=1).close()
                        except OSError:
                            pass
                        return
                    st = get_store(ns, name, part)
                    if op == _OPEN:
                        resp(0, struct.pack("<I", st.nparts))
                    elif op == _PUT:
                        st.put(part, key, val)
                        resp(0)
                    elif op == _GET:
                        out = st.get(part, key)
                        resp(1) if out is None else resp(0, out)
                    elif op == _DEL:
                        resp(0 if st.delete(part, key) else 1)
                    elif op == _COUNT:
                        resp(0, struct.pack("<Q", st.count(part)))
                    elif op == _ITER:
                        chunks = []
                        for k, v in st.items(part):
                            chunks.append(struct.pack("<II", len(k),
                                                      len(v)) + k + v)
                        chunks.append(struct.pack("<I", _TERM))
                        resp(0, b"".join(chunks))
                    elif op == _FLUSH:
                        st.flush()
                        resp(0)
                    else:
                        resp(3)
            except (ConnectionError, OSError):
                pass
            finally:
                conn.close()

        def accept_loop():
            while not self._shutdown.is_set():
                try:
                    conn, _ = srv.accept()
                except OSError:
                    return
                if self._shutdown.is_set():
                    conn.close()
                    return
                threading.Thread(target=handle, args=(conn,),
                                 daemon=True).start()

        threading.Thread(target=accept_loop, daemon=True).start()

    # -- lifecycle ---------------------------------------------------------

    def shutdown(self):
        """Flush + stop the node (graceful; also used by tests)."""
        try:
            c = RemoteKVStore.__new__(RemoteKVStore)
            host, port = self.address.rsplit(":", 1)
            c._sock = socket.create_connection((host, int(port)), timeout=5)
            c._lock = threading.Lock()
            c._ns = b""
            c._name = b""
            c._call(_SHUTDOWN)
            c.close()
        except OSError:
            pass
        self.close()

    def close(self):
        if self._proc is not None:
            try:
                self._proc.terminate()
                self._proc.wait(timeout=5)
            except Exception:
                self._proc.kill()
            self._proc = None
        if self._srv is not None:
            try:
                self._shutdown.set()
                self._srv.close()
            except OSError:
                pass
            with self._stores_lock:
                for st in self._stores.values():
                    st.close()
                self._stores.clear()
            self._srv = None
