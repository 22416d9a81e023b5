"""Networked storage node (native/kvserver.cpp + data/remote_kv.py) —
the eggroll remote storage-service analogue: DTables whose bytes live in
a separate server process, reachable over TCP, surviving client
restarts.  Runs against both the native C++ server and the pure-python
fallback (same wire protocol, same on-disk format)."""

import os

import pytest

from flashe_tpu import native
from flashe_tpu.data import table as table_mod
from flashe_tpu.data.remote_kv import RemoteKVStore, StorageNode


@pytest.mark.parametrize("use_native", [False, True])
def test_remote_store_roundtrip(tmp_path, use_native):
    if use_native and native.kvserver_binary() is None:
        pytest.skip("no compiler for the native kvserver")
    node = StorageNode(str(tmp_path), native=use_native)
    assert node.native == use_native
    try:
        st = RemoteKVStore(node.address, "ns", "t1", nparts=4)
        assert st.nparts == 4
        st.put(0, b"a", b"1")
        st.put(3, b"b", b"x" * 100_000)  # large value
        st.put(0, b"c", b"")
        assert st.get(0, b"a") == b"1"
        assert st.get(3, b"b") == b"x" * 100_000
        assert st.get(0, b"c") == b""
        assert st.get(0, b"missing") is None
        assert st.count(0) == 2
        assert st.delete(0, b"a")
        assert not st.delete(0, b"a")
        assert st.get(0, b"a") is None
        items = dict(st.items(3))
        assert items == {b"b": b"x" * 100_000}
        st.flush()

        # a second client sees the same data (shared server state)
        st2 = RemoteKVStore(node.address, "ns", "t1", nparts=4)
        assert st2.get(3, b"b") == b"x" * 100_000
        # partition count pinned on disk: requesting a different count
        # on reopen keeps the original
        st3 = RemoteKVStore(node.address, "ns", "t1", nparts=9)
        assert st3.nparts == 4
        st.close(); st2.close(); st3.close()
    finally:
        node.shutdown()


@pytest.mark.parametrize("use_native", [False, True])
def test_remote_session_tables_survive_node_restart(tmp_path, use_native):
    if use_native and native.kvserver_binary() is None:
        pytest.skip("no compiler for the native kvserver")
    node = StorageNode(str(tmp_path), native=use_native)
    try:
        s = table_mod.init("job", storage_addr=node.address)
        t = s.table("weights", "fed", partition=3)
        t.put_all([(f"k{i}", {"v": i}) for i in range(50)])
        assert t.count() == 50
        assert t.get("k7") == {"v": 7}
        s.stop()
    finally:
        node.shutdown()

    # a NEW node over the same directory serves the persisted tables
    node2 = StorageNode(str(tmp_path), native=use_native)
    try:
        s2 = table_mod.init("job2", storage_addr=node2.address)
        t2 = s2.table("weights", "fed", partition=1)  # wrong count: pinned
        assert t2.count() == 50
        got = dict(t2.collect())
        assert got["k13"] == {"v": 13}
        s2.stop()
    finally:
        node2.shutdown()


def test_native_and_python_servers_share_format(tmp_path):
    """Data written through the python server is served by the native
    server (and vice versa) — one on-disk format."""
    if native.kvserver_binary() is None:
        pytest.skip("no compiler for the native kvserver")
    node = StorageNode(str(tmp_path), native=False)
    st = RemoteKVStore(node.address, "x", "t", nparts=2)
    st.put(1, b"k", b"v1")
    st.flush(); st.close()
    node.shutdown()

    node2 = StorageNode(str(tmp_path), native=True)
    try:
        st2 = RemoteKVStore(node2.address, "x", "t", nparts=2)
        assert st2.get(1, b"k") == b"v1"
        st2.put(0, b"k2", b"v2")
        st2.flush(); st2.close()
    finally:
        node2.shutdown()

    node3 = StorageNode(str(tmp_path), native=False)
    try:
        st3 = RemoteKVStore(node3.address, "x", "t", nparts=2)
        assert st3.get(0, b"k2") == b"v2"
        st3.close()
    finally:
        node3.shutdown()
