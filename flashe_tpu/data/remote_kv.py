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
- `ShardedRemoteKV` spans several nodes with a fixed partition->node
  map (partition p lives on node p % n_nodes) — the meta-service role
  of eggroll's storage tier.  `storage_addr` accepts a comma-separated
  address list.
- Both clients carry the EXEC op (`exec_job`): ship a pickled
  map/reduce job to the node, where an egg processor (data/egg.py)
  runs it near the data — eggroll's roll/egg compute plane.

Partition counts are pinned server-side in the same META file the
in-process store writes, so a directory can be served locally or
remotely interchangeably (and reopening with a different requested
partition count keeps the on-disk value — no silent key loss).

Failure model: a dropped connection is retried with backoff
(reconnects are transparent — every request re-carries the table
identity, so no re-handshake is needed); a node that stays down raises
the typed `StorageNodeUnavailable` from any pending call, including
mid-iteration.
"""

from __future__ import annotations

import os
import socket
import struct
import subprocess
import sys
import threading
import time
from collections import Counter
from typing import Iterator, List, Optional, Tuple

__all__ = ["RemoteKVStore", "ShardedRemoteKV", "StorageNode",
           "StorageNodeUnavailable"]

_OPEN, _PUT, _GET, _DEL, _COUNT, _ITER, _FLUSH, _SHUTDOWN, _EXEC = range(9)
_TERM = 0xFFFFFFFF

# reconnect backoff schedule (seconds) after a dropped connection
_RETRY_BACKOFF = (0.05, 0.2, 0.8)


class StorageNodeUnavailable(ConnectionError):
    """The storage node stayed unreachable through the retry schedule."""


def _read_full(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = sock.recv(n - len(buf))
        if not part:
            raise ConnectionError("storage node closed the connection")
        buf += part
    return buf


def _egg_env() -> dict:
    """Environment for spawning egg processors: the node (C++ or python)
    launches `$FLASHE_PYTHON -m flashe_tpu.data.egg`, which must find
    this very package on PYTHONPATH even when the node's cwd is
    elsewhere."""
    env = dict(os.environ)
    pkg_parent = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    parts = [pkg_parent]
    if env.get("PYTHONPATH"):
        parts.append(env["PYTHONPATH"])
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env.setdefault("FLASHE_PYTHON", sys.executable)
    return env


class _EggPool:
    """Resident egg processors for the python storage server.

    eggroll keeps its egg processors alive in pools; forking a fresh
    interpreter per EXEC costs ~0.5 s of imports before any record is
    touched.  `size` workers (`data/egg.py --loop`, FLASHE_EGG_POOL env)
    spawn lazily; each is serialized by its own lock, so up to `size`
    jobs run concurrently per node.  A worker that dies (EOF / broken
    pipe) is respawned and the job retried once.
    """

    def __init__(self, address: str, env: dict, size: int = 2):
        import subprocess as _sp

        self._sp = _sp
        self._address = address
        self._env = env
        self._size = max(1, int(size))
        self._procs = [None] * self._size
        self._locks = [threading.Lock() for _ in range(self._size)]
        self._rr = 0

    def _spawn(self):
        py = self._env.get("FLASHE_PYTHON") or sys.executable
        return self._sp.Popen(
            [py, "-m", "flashe_tpu.data.egg", "--loop", self._address],
            stdin=self._sp.PIPE, stdout=self._sp.PIPE,
            stderr=self._sp.DEVNULL, env=self._env)

    def _run_on(self, i: int, spec_bytes: bytes):
        p = self._procs[i]
        if p is None or p.poll() is not None:
            p = self._procs[i] = self._spawn()
        p.stdin.write(struct.pack("<Q", len(spec_bytes)) + spec_bytes)
        p.stdin.flush()
        hdr = p.stdout.read(8)
        if len(hdr) < 8:
            raise EOFError("egg worker died")
        (n,) = struct.unpack("<Q", hdr)
        out = b""
        while len(out) < n:
            part = p.stdout.read(n - len(out))
            if not part:
                raise EOFError("egg worker died mid-result")
            out += part
        return 0, out

    def run(self, spec_bytes: bytes):
        for i in range(self._size):
            if self._locks[i].acquire(blocking=False):
                break
        else:
            i = self._rr % self._size
            self._rr += 1
            self._locks[i].acquire()
        try:
            try:
                return self._run_on(i, spec_bytes)
            except (OSError, EOFError):
                try:
                    if self._procs[i] is not None:
                        self._procs[i].kill()  # exact child PID only
                except Exception:
                    pass
                self._procs[i] = None
                try:
                    return self._run_on(i, spec_bytes)
                except (OSError, EOFError) as e:
                    return 2, f"egg processor failed: {e}".encode()
        finally:
            self._locks[i].release()

    def close(self):
        for i, p in enumerate(self._procs):
            if p is None:
                continue
            try:
                p.stdin.close()  # loop workers exit on stdin EOF
                p.wait(timeout=2)
            except Exception:
                try:
                    p.kill()
                except Exception:
                    pass
            self._procs[i] = None


class RemoteKVStore:
    """KVStore-compatible client for one (namespace, name) table on one
    node.  Reconnects with backoff on dropped connections; raises
    StorageNodeUnavailable once the schedule is exhausted.  `op_counts`
    tallies wire ops issued by *this client* (tests use it to prove
    server-side compute never streams records back here)."""

    def __init__(self, addr: str, namespace: str, name: str,
                 nparts: int = 1):
        host, port = addr.rsplit(":", 1)
        self.addr = addr
        self._host, self._port = host, int(port)
        self._sock: Optional[socket.socket] = None
        self._lock = threading.Lock()
        self._ns = namespace.encode()
        self._name = name.encode()
        self.op_counts: Counter = Counter()
        status, payload = self._call(_OPEN, part=nparts)
        if status != 0:
            raise OSError(f"storage node failed to open {namespace}/{name}")
        self.nparts = struct.unpack("<I", payload)[0]

    # -- wire --------------------------------------------------------------

    def _connect(self):
        self._sock = socket.create_connection(
            (self._host, self._port), timeout=30)
        # the 30 s bound applies to CONNECT only: a server-side EXEC
        # (map/reduce over a large table) or a big ITER payload may
        # legitimately take minutes, and a read timeout would masquerade
        # as a dead node and trigger replays
        self._sock.settimeout(None)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def _drop_sock(self):
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None

    def _call(self, op: int, part: int = 0, key: bytes = b"",
              value: bytes = b"") -> Tuple[int, bytes]:
        """One request/response exchange, retried across reconnects.

        Safe to retry: every KV op here is idempotent under replay (PUT
        rewrites the same record, GET/COUNT/ITER/FLUSH are reads or
        level-triggered; DEL may report already-missing on replay, which
        callers treat as success).  EXEC is the exception — a replay
        would re-run the whole job (possibly concurrently with the
        first, and non-deterministic functions would write a different
        record set into the same output table), so it gets ONE attempt
        and surfaces the failure to the caller instead."""
        hdr = struct.pack("<BIIIII", op, len(self._ns), len(self._name),
                          part, len(key), len(value))
        msg = hdr + self._ns + self._name + key + value
        self.op_counts[op] += 1
        attempts = 1 if op == _EXEC else len(_RETRY_BACKOFF) + 1
        with self._lock:
            last_err: Optional[Exception] = None
            for attempt in range(attempts):
                if attempt:
                    time.sleep(_RETRY_BACKOFF[attempt - 1])
                try:
                    if self._sock is None:
                        self._connect()
                    self._sock.sendall(msg)
                    resp = _read_full(self._sock, 9)
                    status = resp[0]
                    n = struct.unpack("<Q", resp[1:])[0]
                    payload = _read_full(self._sock, n) if n else b""
                    return status, payload
                except (ConnectionError, OSError, socket.timeout) as e:
                    last_err = e
                    self._drop_sock()
            raise StorageNodeUnavailable(
                f"storage node {self.addr} unreachable after "
                f"{attempts} attempt(s): {last_err}")

    @property
    def native(self) -> bool:  # parity with KVStore's introspection
        return True

    # -- KV surface --------------------------------------------------------

    def put(self, part: int, key: bytes, value: bytes):
        status, _ = self._call(_PUT, part, key, value)
        if status != 0:
            raise OSError("remote kv_put failed")

    def pipeline(self) -> "_PutPipeline":
        """Pipelined PUTs: send requests without awaiting each status,
        drain statuses in bulk — one RTT per batch instead of per
        record.  For single-threaded exclusive use of this connection
        (the egg shuffle writer); no reconnect-retry, a dropped node
        fails the job, which the client surfaces."""
        return _PutPipeline(self)

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
        self._drop_sock()

    # -- compute plane -----------------------------------------------------

    supports_exec = True

    @property
    def addrs(self) -> List[str]:
        return [self.addr]

    def exec_groups(self, nparts: int) -> List[Tuple["RemoteKVStore",
                                                     List[int]]]:
        """(connection, partition-list) groups for an EXEC fan-out —
        a single node owns every partition."""
        return [(self, list(range(nparts)))]

    def exec_call(self, spec_bytes: bytes) -> dict:
        """Ship one pickled job to this node's egg processor and return
        its result dict (data/egg.py)."""
        import pickle

        status, payload = self._call(_EXEC, value=spec_bytes)
        if status != 0:
            raise OSError(
                f"storage node {self.addr} EXEC failed: "
                f"{payload[:500].decode('utf-8', 'replace')}")
        return pickle.loads(payload)


class _PutPipeline:
    """Batched in-flight PUTs over one RemoteKVStore connection.

    The storage servers handle a connection's requests strictly in
    order, so N requests can be written back-to-back and their N
    status frames read afterwards — turning the shuffle's per-record
    round-trip into one per `flush_every` records.  Single-threaded
    exclusive use of the underlying connection only.
    """

    def __init__(self, store: "RemoteKVStore", flush_every: int = 512):
        self._st = store
        self._flush_every = flush_every
        self._outstanding = 0

    def put(self, part: int, key: bytes, value: bytes):
        st = self._st
        hdr = struct.pack("<BIIIII", _PUT, len(st._ns), len(st._name),
                          part, len(key), len(value))
        st.op_counts[_PUT] += 1
        with st._lock:
            if st._sock is None:
                st._connect()
            st._sock.sendall(hdr + st._ns + st._name + key + value)
        self._outstanding += 1
        if self._outstanding >= self._flush_every:
            self.drain()

    def drain(self):
        st = self._st
        with st._lock:
            for _ in range(self._outstanding):
                resp = _read_full(st._sock, 9)
                n = struct.unpack("<Q", resp[1:])[0]
                if n:
                    _read_full(st._sock, n)
                if resp[0] != 0:
                    self._outstanding = 0
                    raise OSError("remote kv_put failed")
        self._outstanding = 0


class ShardedRemoteKV:
    """KVStore-compatible client spanning several storage nodes.

    The partition->node map is fixed: partition p lives on node
    p % n_nodes (every node pins the table's full partition count in
    its own META, and only ever receives ops for its residue class).
    This is the meta-service role of eggroll's storage tier reduced to
    a static residue map — sessions just list the same addresses in
    the same order.
    """

    def __init__(self, addrs: List[str], namespace: str, name: str,
                 nparts: int = 1):
        if not addrs:
            raise ValueError("ShardedRemoteKV needs at least one address")
        self._conns = [RemoteKVStore(a, namespace, name, nparts)
                       for a in addrs]
        pinned = {c.nparts for c in self._conns}
        if len(pinned) != 1:
            raise OSError(
                f"storage nodes disagree on partition count for "
                f"{namespace}/{name}: {sorted(pinned)}")
        self.nparts = self._conns[0].nparts

    @property
    def native(self) -> bool:
        return True

    @property
    def op_counts(self) -> Counter:
        total: Counter = Counter()
        for c in self._conns:
            total.update(c.op_counts)
        return total

    def _node(self, part: int) -> RemoteKVStore:
        return self._conns[part % len(self._conns)]

    def put(self, part: int, key: bytes, value: bytes):
        self._node(part).put(part, key, value)

    def get(self, part: int, key: bytes) -> Optional[bytes]:
        return self._node(part).get(part, key)

    def delete(self, part: int, key: bytes) -> bool:
        return self._node(part).delete(part, key)

    def count(self, part: int) -> int:
        return self._node(part).count(part)

    def items(self, part: int) -> Iterator[Tuple[bytes, bytes]]:
        return self._node(part).items(part)

    def flush(self):
        for c in self._conns:
            c.flush()

    def close(self):
        for c in self._conns:
            c.close()

    # -- compute plane -----------------------------------------------------

    supports_exec = True

    @property
    def addrs(self) -> List[str]:
        return [c.addr for c in self._conns]

    def exec_groups(self, nparts: int) -> List[Tuple[RemoteKVStore,
                                                     List[int]]]:
        groups: List[Tuple[RemoteKVStore, List[int]]] = []
        for i, conn in enumerate(self._conns):
            parts = [p for p in range(nparts) if p % len(self._conns) == i]
            if parts:
                groups.append((conn, parts))
        return groups


class StorageNode:
    """Launches a storage node over `root_dir` and reports its address.

    native=True compiles/spawns native/kvserver.cpp; native=False (or no
    compiler, or a failed native launch — e.g. a stale foreign-arch
    binary) runs an in-process python server speaking the same protocol
    over the same on-disk format.
    """

    def __init__(self, root_dir: str, port: int = 0, native: bool = True):
        self.root_dir = root_dir
        os.makedirs(root_dir, exist_ok=True)
        self._proc = None
        self._srv = None
        if native and self._start_native(port):
            return
        self._start_python(port)

    def _start_native(self, port: int) -> bool:
        from flashe_tpu.native import kvserver_binary

        binary = kvserver_binary()
        if binary is None:
            return False
        try:
            proc = subprocess.Popen(
                [binary, self.root_dir, str(port)],
                stdout=subprocess.PIPE, text=True, env=_egg_env())
            line = proc.stdout.readline()
            if not line.startswith("KVSERVER PORT "):
                raise OSError(f"kvserver failed to start: {line!r}")
            self._proc = proc
            self.port = int(line.split()[-1])
            self.address = f"127.0.0.1:{self.port}"
            return True
        except Exception:
            # e.g. exec-format error on a foreign-arch binary, or a bad
            # handshake — fall back to the python server (documented
            # contract of this launcher)
            if self._proc is None and "proc" in locals():
                try:
                    proc.kill()
                except Exception:
                    pass
            return False

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
        self._conns = set()
        self._conns_lock = threading.Lock()
        egg_env = _egg_env()

        def get_store(ns: str, name: str, nparts: int):
            """-> (store, per-store lock).  The C++ server serializes
            each store's ops under st->mu; the per-store Lock mirrors
            that here — the ctypes-backed native KVStore releases the
            GIL during C calls, so two connection threads writing the
            same table would otherwise interleave log appends."""
            with self._stores_lock:
                key = (ns, name)
                entry = self._stores.get(key)
                if entry is None:
                    d = os.path.join(self.root_dir, ns, name)
                    os.makedirs(d, exist_ok=True)
                    entry = (open_store(d, max(nparts, 1)),
                             threading.Lock())
                    self._stores[key] = entry
                return entry

        pool_size = int(os.environ.get("FLASHE_EGG_POOL", "2"))
        self._egg_pool = (_EggPool(self.address, egg_env, pool_size)
                          if pool_size > 0 else None)

        def run_egg(spec_bytes: bytes):
            """Ship one job to a resident egg processor (data/egg.py
            --loop, see _EggPool); FLASHE_EGG_POOL=0 falls back to the
            fork-per-job mode (the C++ server's default)."""
            if self._egg_pool is not None:
                return self._egg_pool.run(spec_bytes)
            proc = subprocess.run(
                [egg_env.get("FLASHE_PYTHON") or sys.executable,
                 "-m", "flashe_tpu.data.egg", self.address],
                input=struct.pack("<Q", len(spec_bytes)) + spec_bytes,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env=egg_env)
            out = proc.stdout
            if proc.returncode != 0 or len(out) < 8:
                err = proc.stderr.decode("utf-8", "replace")[-500:]
                return 2, f"egg processor failed: {err}".encode()
            (n,) = struct.unpack("<Q", out[:8])
            return 0, out[8 : 8 + n]

        def handle(conn: socket.socket):
            with self._conns_lock:
                self._conns.add(conn)
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
                            for st, st_lock in self._stores.values():
                                with st_lock:
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
                    if op == _EXEC:
                        # the egg re-enters this server over loopback for
                        # its reads/shuffle writes, so no store lock may
                        # be held across the job
                        status, payload = run_egg(val)
                        resp(status, payload)
                        continue
                    st, st_lock = get_store(ns, name, part)
                    with st_lock:
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
                with self._conns_lock:
                    self._conns.discard(conn)
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
            c.addr = self.address
            c._host, c._port = host, int(port)
            c._sock = None
            c._lock = threading.Lock()
            c._ns = b""
            c._name = b""
            c.op_counts = Counter()
            c._call(_SHUTDOWN)
            c.close()
        except (OSError, StorageNodeUnavailable):
            pass
        self.close()

    def close(self):
        pool = getattr(self, "_egg_pool", None)
        if pool is not None:
            pool.close()
            self._egg_pool = None
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
            # sever live connections too — a real (native) node's death
            # drops them, and clients must see the same failure mode
            with self._conns_lock:
                for conn in list(self._conns):
                    try:
                        conn.close()
                    except OSError:
                        pass
                self._conns.clear()
            with self._stores_lock:
                for st, st_lock in self._stores.values():
                    # take the per-store lock: a handler thread may be
                    # inside a ctypes store call (GIL released) on a
                    # connection severed above — closing the handle
                    # under it would be a use-after-free
                    with st_lock:
                        st.close()
                self._stores.clear()
            self._srv = None
