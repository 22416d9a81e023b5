"""Native C++ storage node (native/kvstore.cpp) and its python-format
twin, plus the persistent Session/DTable built on them (the eggroll
storage-service-cxx / FATE standalone LMDB analogue)."""

import numpy as np
import pytest

from flashe_tpu.data import table as table_mod
from flashe_tpu.data.kvstore import open_store


@pytest.mark.parametrize("force_python", [False, True],
                         ids=["native", "python"])
def test_kv_roundtrip_and_reopen(tmp_path, force_python):
    d = str(tmp_path / "kv")
    st = open_store(d, nparts=3, force_python=force_python)
    if not force_python and not st.native:
        pytest.skip("no compiler for the native node")
    st.put(0, b"alpha", b"1" * 100)
    st.put(1, b"beta", b"")
    st.put(0, b"alpha", b"overwritten")  # last write wins
    st.put(2, b"gamma", bytes(range(256)))
    st.delete(1, b"beta")
    assert st.get(0, b"alpha") == b"overwritten"
    assert st.get(1, b"beta") is None
    assert st.count(0) == 1 and st.count(1) == 0 and st.count(2) == 1
    st.close()

    # reopen: log replay restores the exact state
    st2 = open_store(d, nparts=3, force_python=force_python)
    assert st2.get(0, b"alpha") == b"overwritten"
    assert st2.get(2, b"gamma") == bytes(range(256))
    assert st2.get(1, b"beta") is None
    assert dict(st2.items(0)) == {b"alpha": b"overwritten"}
    st2.close()


def test_native_and_python_formats_interoperate(tmp_path):
    d = str(tmp_path / "kv")
    nat = open_store(d, nparts=1)
    if not nat.native:
        pytest.skip("no compiler for the native node")
    nat.put(0, b"k1", b"v1")
    nat.put(0, b"k2", b"v2")
    nat.delete(0, b"k1")
    nat.close()
    # python reader sees the native writer's state
    py = open_store(d, nparts=1, force_python=True)
    assert dict(py.items(0)) == {b"k2": b"v2"}
    py.put(0, b"k3", b"v3")
    py.close()
    # and back
    nat2 = open_store(d, nparts=1)
    assert nat2.get(0, b"k3") == b"v3"
    assert nat2.get(0, b"k1") is None
    nat2.close()


def test_torn_tail_truncated(tmp_path):
    d = str(tmp_path / "kv")
    st = open_store(d, nparts=1, force_python=True)
    st.put(0, b"good", b"value")
    st.close()
    # simulate a crash mid-append: a record header without its bytes
    with open(str(tmp_path / "kv" / "p0.log"), "ab") as fh:
        fh.write((5).to_bytes(4, "little") + (99).to_bytes(4, "little")
                 + b"torn!")
    st2 = open_store(d, nparts=1)
    assert dict(st2.items(0)) == {b"good": b"value"}
    st2.put(0, b"after", b"crash")  # appends land on a clean boundary
    st2.close()
    st3 = open_store(d, nparts=1, force_python=True)
    assert st3.get(0, b"after") == b"crash"
    st3.close()


def test_persistent_session_tables(tmp_path):
    root = str(tmp_path / "tables")
    sess = table_mod.init("job1", storage_dir=root)
    t = sess.table("t1", "ns", partition=2)
    t.put_all([(i, {"w": np.arange(3) * i}) for i in range(10)])
    t.put("strkey", [1, 2, 3])
    assert t.count() == 11
    assert t.get(3)["w"].tolist() == [0, 3, 6]
    # functional surface works on the persistent table
    s = t.filter(lambda k, v: isinstance(k, int)).reduce(
        lambda a, b: {"w": a["w"] + b["w"]})
    assert s["w"].tolist() == [0, 45, 90]
    sess.stop()

    # a new session (fresh process semantics) sees the same data
    sess2 = table_mod.init("job2", storage_dir=root)
    t2 = sess2.table("t1", "ns", partition=2)
    assert t2.count() == 11
    assert t2.get("strkey") == [1, 2, 3]
    assert t2.delete(0) is not None
    assert t2.count() == 10
    sess2.stop()
