"""In-memory partitioned KV tables — the storage/compute substrate.

The reference stages every dataset and federation object in eggroll
DTables (LMDB-backed, C++ storage service; API at arch/api/table/table.py:
25-179, session at arch/api/session.py:32-87).  Model payloads here are
device tensors moved directly, so the table layer only needs to serve the
*dataflow* role: ingesting datasets, key-addressed staging, and the
functional ops components use (map/mapValues/reduce/join/...).  This is a
compact process-local implementation with the same surface; partitions
are real (hash-partitioned dicts) so partition-parallel semantics
(mapPartitions, glom) behave like the reference's.
"""

from __future__ import annotations

import random
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

__all__ = ["DTable", "Session", "init"]


def _hash_partition(key, n: int) -> int:
    return hash(key) % n


class DTable:
    """Hash-partitioned in-memory KV table with functional ops.

    Mirrors the reference DTable surface (arch/api/table/table.py:25-179):
    put/put_all/get/delete/count/collect/take/first plus
    map/mapValues/mapPartitions/reduce/join/filter/union/subtractByKey/
    flatMap/glom/sample, and save_as persistence into the session registry.
    """

    def __init__(self, session: "Session", name: str, namespace: str,
                 partitions: int = 1):
        self._session = session
        self._name = name
        self._namespace = namespace
        self._n = max(int(partitions), 1)
        self._parts: List[Dict[Any, Any]] = [dict() for _ in range(self._n)]

    # -- identity ---------------------------------------------------------

    def get_name(self) -> str:
        return self._name

    def get_namespace(self) -> str:
        return self._namespace

    def get_partitions(self) -> int:
        return self._n

    # -- KV ops -----------------------------------------------------------

    def put(self, k, v):
        self._parts[_hash_partition(k, self._n)][k] = v

    def put_all(self, kv_list: Iterable[Tuple[Any, Any]]):
        for k, v in kv_list:
            self.put(k, v)

    def put_if_absent(self, k, v):
        part = self._parts[_hash_partition(k, self._n)]
        if k not in part:
            part[k] = v
            return None
        return part[k]

    def get(self, k, default=None):
        return self._parts[_hash_partition(k, self._n)].get(k, default)

    def delete(self, k):
        return self._parts[_hash_partition(k, self._n)].pop(k, None)

    def destroy(self):
        self._parts = [dict() for _ in range(self._n)]
        self._session._drop(self._namespace, self._name)

    def count(self) -> int:
        return sum(len(p) for p in self._parts)

    def collect(self) -> List[Tuple[Any, Any]]:
        out = []
        for p in self._parts:
            out.extend(p.items())
        return out

    def take(self, n: int = 1, keys_only: bool = False):
        out = []
        for k, v in self.collect():
            out.append(k if keys_only else (k, v))
            if len(out) >= n:
                break
        return out

    def first(self, keys_only: bool = False):
        got = self.take(1, keys_only)
        return got[0] if got else None

    # -- functional ops ---------------------------------------------------

    def _derived(self, partitions: Optional[int] = None) -> "DTable":
        return self._session._anon_table(partitions or self._n)

    def map(self, func: Callable[[Any, Any], Tuple[Any, Any]]) -> "DTable":
        out = self._derived()
        for k, v in self.collect():
            nk, nv = func(k, v)
            out.put(nk, nv)
        return out

    def mapValues(self, func: Callable[[Any], Any]) -> "DTable":
        out = self._derived()
        for p_in, p_out in zip(self._parts, out._parts):
            for k, v in p_in.items():
                p_out[k] = func(v)
        return out

    def mapPartitions(self, func: Callable[[Iterable], Any]) -> "DTable":
        """func consumes one partition's (k, v) iterator; result keyed by
        partition index (the reference's mapPartitions contract)."""
        out = self._derived()
        for i, p in enumerate(self._parts):
            out.put(i, func(iter(p.items())))
        return out

    def reduce(self, func: Callable[[Any, Any], Any]):
        acc = None
        for _, v in self.collect():
            acc = v if acc is None else func(acc, v)
        return acc

    def join(self, other: "DTable",
             func: Callable[[Any, Any], Any]) -> "DTable":
        out = self._derived()
        for k, v in self.collect():
            ov = other.get(k, None)
            if ov is not None or any(k in p for p in other._parts):
                out.put(k, func(v, ov))
        return out

    def filter(self, func: Callable[[Any, Any], bool]) -> "DTable":
        out = self._derived()
        for k, v in self.collect():
            if func(k, v):
                out.put(k, v)
        return out

    def union(self, other: "DTable",
              func: Callable[[Any, Any], Any] = lambda v1, v2: v1,
              ) -> "DTable":
        out = self._derived()
        out.put_all(self.collect())
        for k, v in other.collect():
            mine = out.get(k, None)
            out.put(k, func(mine, v) if mine is not None else v)
        return out

    def subtractByKey(self, other: "DTable") -> "DTable":
        out = self._derived()
        for k, v in self.collect():
            if other.get(k, None) is None:
                out.put(k, v)
        return out

    def flatMap(self, func: Callable[[Any, Any], Iterable]) -> "DTable":
        out = self._derived()
        for k, v in self.collect():
            out.put_all(func(k, v))
        return out

    def glom(self) -> "DTable":
        out = self._derived()
        for i, p in enumerate(self._parts):
            out.put(i, list(p.items()))
        return out

    def sample(self, fraction: float, seed=None) -> "DTable":
        rng = random.Random(seed)
        out = self._derived()
        for k, v in self.collect():
            if rng.random() < fraction:
                out.put(k, v)
        return out

    def save_as(self, name: str, namespace: str,
                partition: Optional[int] = None) -> "DTable":
        out = self._session.table(name, namespace,
                                  partition or self._n)
        out.put_all(self.collect())
        return out


class PersistentDTable(DTable):
    """DTable whose KV state lives in the native storage node
    (native/kvstore.cpp via flashe_tpu/data/kvstore.py) — the analogue
    of an eggroll LMDB-backed table in FATE standalone work mode.

    KV ops (put/get/delete/count/collect) hit the store directly;
    functional ops (map/reduce/join/...) inherit from DTable and
    materialize into in-memory derived tables, exactly as eggroll's
    compute ops produce new tables.  Keys/values pickle on the way in;
    partition routing hashes the pickled key with crc32 so the layout is
    stable across processes (python's `hash` is per-process salted).
    """

    def __init__(self, session: "Session", name: str, namespace: str,
                 partitions: int, store):
        self._session = session
        self._name = name
        self._namespace = namespace
        self._n = max(int(partitions), 1)
        self._kv = store

    @staticmethod
    def _enc(obj) -> bytes:
        import pickle

        return pickle.dumps(obj, protocol=4)

    @staticmethod
    def _dec(b: bytes):
        import pickle

        return pickle.loads(b)

    def _part_of(self, kb: bytes) -> int:
        import zlib

        return zlib.crc32(kb) % self._n

    def put(self, k, v):
        kb = self._enc(k)
        self._kv.put(self._part_of(kb), kb, self._enc(v))

    def put_if_absent(self, k, v):
        kb = self._enc(k)
        part = self._part_of(kb)
        cur = self._kv.get(part, kb)
        if cur is None:
            self._kv.put(part, kb, self._enc(v))
            return None
        return self._dec(cur)

    def get(self, k, default=None):
        kb = self._enc(k)
        got = self._kv.get(self._part_of(kb), kb)
        return default if got is None else self._dec(got)

    def delete(self, k):
        kb = self._enc(k)
        part = self._part_of(kb)
        cur = self._kv.get(part, kb)
        self._kv.delete(part, kb)
        return None if cur is None else self._dec(cur)

    def destroy(self):
        for i in range(self._n):
            for kb, _ in list(self._kv.items(i)):
                self._kv.delete(i, kb)
        self._session._drop(self._namespace, self._name)

    def count(self) -> int:
        return sum(self._kv.count(i) for i in range(self._n))

    def collect(self) -> List[Tuple[Any, Any]]:
        out = []
        for i in range(self._n):
            for kb, vb in self._kv.items(i):
                out.append((self._dec(kb), self._dec(vb)))
        return out

    @property
    def _parts(self) -> List[Dict[Any, Any]]:
        # read-only snapshot view for the inherited functional ops
        parts: List[Dict[Any, Any]] = [dict() for _ in range(self._n)]
        for i in range(self._n):
            for kb, vb in self._kv.items(i):
                parts[i][self._dec(kb)] = self._dec(vb)
        return parts

    def flush(self):
        self._kv.flush()


class Session:
    """Process-local analogue of `arch.api.session` (session.py:32-87):
    named-table registry + parallelize ingestion.  With `storage_dir`,
    named tables persist through the native C++ storage node
    (PersistentDTable) and survive restarts — FATE standalone work
    mode's local-LMDB behavior."""

    def __init__(self, job_id: str = "local",
                 storage_dir: Optional[str] = None,
                 storage_addr: Optional[str] = None):
        self.job_id = job_id
        self.storage_dir = storage_dir
        self.storage_addr = storage_addr
        self._registry: Dict[Tuple[str, str], DTable] = {}
        self._stores: Dict[Tuple[str, str], Any] = {}
        self._anon = 0

    def table(self, name: str, namespace: str,
              partition: int = 1) -> DTable:
        key = (namespace, name)
        if key not in self._registry:
            if self.storage_addr is not None:
                # remote storage node (data/remote_kv.py — the eggroll
                # storage-service split: tables live in another process
                # or on another machine)
                from flashe_tpu.data.remote_kv import RemoteKVStore

                store = self._stores.get(key)
                if store is None:
                    store = RemoteKVStore(self.storage_addr, namespace,
                                          name, partition)
                    self._stores[key] = store
                self._registry[key] = PersistentDTable(
                    self, name, namespace, store.nparts, store)
            elif self.storage_dir is not None:
                import os

                from flashe_tpu.data.kvstore import open_store

                d = os.path.join(self.storage_dir, namespace, name)
                os.makedirs(d, exist_ok=True)
                store = self._stores.get(key)
                if store is None:
                    store = open_store(d, partition)
                    self._stores[key] = store
                # the store pins its partition count on disk at creation
                # (kvstore.META); reopening must route with that count,
                # not whatever this run's caller passed
                self._registry[key] = PersistentDTable(
                    self, name, namespace, store.nparts, store)
            else:
                self._registry[key] = DTable(self, name, namespace,
                                             partition)
        return self._registry[key]

    def parallelize(self, data: Iterable, include_key: bool = False,
                    partition: int = 1) -> DTable:
        t = self._anon_table(partition)
        if include_key:
            t.put_all(data)
        else:
            t.put_all(enumerate(data))
        return t

    def _anon_table(self, partition: int) -> DTable:
        self._anon += 1
        return DTable(self, f"_anon_{self._anon}", self.job_id, partition)

    def _drop(self, namespace: str, name: str):
        self._registry.pop((namespace, name), None)

    def stop(self):
        self._registry.clear()
        for store in self._stores.values():
            store.close()
        self._stores.clear()


def init(job_id: str = "local",
         storage_dir: Optional[str] = None,
         storage_addr: Optional[str] = None) -> Session:
    """session.init analogue: returns a fresh process-local session.

    storage_dir enables persistent (native C++ node) tables in this
    process; storage_addr ("host:port") binds tables to a remote
    storage node instead (data/remote_kv.StorageNode)."""
    return Session(job_id, storage_dir=storage_dir,
                   storage_addr=storage_addr)
