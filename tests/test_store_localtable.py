"""LocalTable ↔ Spark parquet contract.

Append-mode store tables mix producers across versions: early deltas are
written by Spark executors, fused windows' deltas by the commit thread
via pyarrow (sources/store.py LocalTable). A mixed directory must read
back as ONE schema — pyarrow's defaults (int64 everywhere, no tz) would
silently diverge from Spark's (int stays int32, timestamps
micros-adjusted-to-UTC), which is why LocalTable maps Spark DDL types
explicitly. These tests pin that contract.
"""

import os

from pyspark.sql import functions as F

from news_crawler_spark.sources.store import LocalTable, SnapshotStore

DDL = ("k int, n bigint, s string, ok boolean, b binary, x double")
ROWS_SPARK = [(1, 10, "a", True, b"\x00\x01", 1.5),
              (2, 20, "b", False, b"", 2.5)]
ROWS_LOCAL = [(3, 30, "c", True, b"\xff", 3.5)]


def test_mixed_producer_append_reads_one_schema(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    # version 1: Spark-written delta
    store.commit(1, append={"t": spark.createDataFrame(ROWS_SPARK, DDL).coalesce(1)})
    # version 2: pyarrow-written delta of the SAME table
    store.commit(2, append={"t": LocalTable(ROWS_LOCAL, DDL)})

    df = store.read(spark, "t")
    # one schema across both producer's files — exact Spark types
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("k", "int"), ("n", "bigint"), ("s", "string"),
        ("ok", "boolean"), ("b", "binary"), ("x", "double"),
    ]
    got = sorted((r.k, r.n, r.s, r.ok, bytes(r.b), r.x) for r in df.collect())
    assert got == sorted(ROWS_SPARK + ROWS_LOCAL)


def test_localtable_overwrite_roundtrip_and_rollback(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(1, overwrite={"t": LocalTable([(1, 10, "a", True, b"z", 0.5)], DDL)})
    store.commit(2, overwrite={"t": LocalTable([(2, 20, "b", False, b"y", 1.5)], DDL)})
    assert [r.k for r in store.read(spark, "t").collect()] == [2]
    store.rollback(1)
    assert [r.k for r in store.read(spark, "t").collect()] == [1]


def test_localtable_empty_rows_keeps_schema(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(1, append={"t": LocalTable([], DDL)})
    df = store.read(spark, "t")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "n", "s", "ok", "b", "x"]


def test_localtable_is_snapshot_of_mutable_state(spark, tmp_path):
    """The arrow conversion is eager: mutating the source rows after
    construction (as the next window mutates seed_state / shard buffers
    while the async commit is in flight) must not change what commits."""
    buf = bytearray(b"\x01\x02")
    rows = [(1, 10, "a", True, bytes(buf), 1.0)]
    t = LocalTable(rows, DDL)
    buf[0] = 0xFF
    rows.append((9, 90, "z", False, b"mut", 9.0))
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(1, overwrite={"t": t})
    got = store.read(spark, "t").collect()
    assert len(got) == 1 and bytes(got[0].b) == b"\x01\x02"
