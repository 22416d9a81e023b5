"""Session/DTable substrate + CSV ingestion (reference
arch/api/table/table.py:25-179, arch/api/session.py:32-87,
federatedml/util/data_io.py)."""

import numpy as np

from flashe_tpu.data.io import Instance, read_dense_csv, upload_csv
from flashe_tpu.data.table import init


def test_table_kv_and_functional_ops():
    s = init("job1")
    t = s.parallelize([10, 20, 30, 40], partition=3)
    assert t.count() == 4
    assert sorted(v for _, v in t.collect()) == [10, 20, 30, 40]
    assert t.get(2) == 30

    doubled = t.mapValues(lambda v: v * 2)
    assert doubled.get(3) == 80
    assert doubled.reduce(lambda a, b: a + b) == 200

    remapped = t.map(lambda k, v: (k + 100, v + 1))
    assert remapped.get(101) == 21

    other = s.parallelize([(1, 5), (2, 7)], include_key=True)
    joined = t.join(other, lambda a, b: a + b)
    assert dict(joined.collect()) == {1: 25, 2: 37}

    assert dict(t.subtractByKey(other).collect()) == {0: 10, 3: 40}
    assert t.filter(lambda k, v: v > 25).count() == 2

    union = t.union(other, lambda v1, v2: v1 + v2)
    assert union.get(1) == 25 and union.get(0) == 10

    flat = other.flatMap(lambda k, v: [(k, v), (k + 10, v * 10)])
    assert flat.get(12) == 70

    parts = t.glom().collect()
    assert sum(len(items) for _, items in parts) == 4
    counted = t.mapPartitions(lambda it: sum(1 for _ in it))
    assert counted.reduce(lambda a, b: a + b) == 4


def test_table_registry_and_save_as():
    s = init("job2")
    t = s.parallelize([1, 2, 3])
    saved = t.save_as("train", "ns")
    assert s.table("train", "ns") is saved
    assert saved.count() == 3
    saved.destroy()
    assert s.table("train", "ns").count() == 0

    t2 = s.table("x", "ns", partition=4)
    t2.put_all((i, i * i) for i in range(100))
    assert t2.get_partitions() == 4
    assert t2.count() == 100
    assert t2.first() is not None
    assert len(t2.take(5)) == 5
    assert t2.sample(0.5, seed=0).count() < 100
    assert t2.put_if_absent(0, -1) == 0
    t2.delete(0)
    assert t2.get(0) is None


def test_csv_ingestion(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("y,f0,f1\n1,0.5,1.5\n0,2.5,3.5\n1,4.0,5.0\n")
    x, y = read_dense_csv(str(p))
    assert x.shape == (3, 2) and x.dtype == np.float32
    assert y.tolist() == [1, 0, 1]

    s = init("job3")
    table = upload_csv(s, str(p), "train", "ns")
    assert table.count() == 3
    inst = table.get(0)
    assert isinstance(inst, Instance)
    assert inst.label == 1 and inst.features.tolist() == [0.5, 1.5]

    x2, y2 = read_dense_csv(str(p), label_index=None)
    assert x2.shape == (3, 3) and y2 is None
