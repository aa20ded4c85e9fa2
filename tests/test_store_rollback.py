"""Snapshot rollback + corrupt-manifest recovery (S5 hardening — the
Google_Crawler.py:112-145 corrupted-state analog) and async-commit
ordering."""

import json
import os

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.sources.store import SnapshotStore


def _mk(spark, rows):
    return spark.createDataFrame([(int(r),) for r in rows], "v int")


def test_rollback_restores_overwrite_and_append(spark, tmp_store):
    store = SnapshotStore(tmp_store, keep_versions=5)
    store.commit(1, overwrite={"state": _mk(spark, [1])}, append={"log": _mk(spark, [10])})
    store.commit(2, overwrite={"state": _mk(spark, [2, 2])}, append={"log": _mk(spark, [20])})
    store.commit(3, overwrite={"state": _mk(spark, [3])}, append={"log": _mk(spark, [30])})
    assert store.read(spark, "state").count() == 1
    assert store.read(spark, "log").count() == 3

    store.rollback(2)
    assert store.last_batch_id == 2
    assert [r.v for r in store.read(spark, "state").collect()] == [2, 2]
    assert sorted(r.v for r in store.read(spark, "log").collect()) == [10, 20]
    # committing after rollback continues from the restored state
    store.commit(3, overwrite={"state": _mk(spark, [33])}, append={"log": _mk(spark, [31])})
    assert sorted(r.v for r in store.read(spark, "log").collect()) == [10, 20, 31]


def test_rollback_outside_window_raises(spark, tmp_store):
    store = SnapshotStore(tmp_store, keep_versions=2)
    for b in range(1, 6):
        store.commit(b, overwrite={"state": _mk(spark, [b])})
    with pytest.raises(KeyError):
        store.rollback(1)  # overwrite dir GC'd beyond the window


def test_corrupt_manifest_recovers_from_history(spark, tmp_store):
    store = SnapshotStore(tmp_store)
    store.commit(1, overwrite={"state": _mk(spark, [1])})
    store.commit(2, overwrite={"state": _mk(spark, [2])})
    with open(os.path.join(tmp_store, "_manifest.json"), "w") as f:
        f.write('{"version": 2, "batch')  # truncated write
    man = store.manifest()
    assert man["batch_id"] == 2
    assert [r.v for r in store.read(spark, "state").collect()] == [2]


def test_read_at_batch_beyond_50_commits(spark, tmp_store):
    """Full (untruncated) history: time travel works for batch 1 even
    after 55 commits (round-1 ADVICE: the 50-entry cap broke this)."""
    store = SnapshotStore(tmp_store)
    for b in range(1, 56):
        store.commit(b, append={"log": _mk(spark, [b])})
    first = store.read_at_batch(spark, "log", 1)
    assert first is not None and [r.v for r in first.collect()] == [1]
    mid = store.read_at_batch(spark, "log", 30)
    assert mid.count() == 30


def test_commit_async_orders_and_surfaces_results(spark, tmp_store):
    store = SnapshotStore(tmp_store)
    for b in range(1, 4):
        store.commit_async(b, append={"log": _mk(spark, [b])})
    store.wait_commit()
    assert store.last_batch_id == 3
    assert store.read(spark, "log").count() == 3


def test_dim_join_broadcast_threshold(spark):
    """robots joins broadcast below the threshold and shuffle above it
    (round-1 scale-killer: a 10^7-host dimension cannot broadcast)."""
    from news_crawler_spark.functions.timeparse import batch_ts_lit
    from news_crawler_spark.operators.scheduler import schedule

    due = spark.range(100).select(
        F.concat(F.lit("https://h"), (F.col("id") % 10), F.lit(".com/p/"), F.col("id"))
        .alias("url_canon"),
        F.concat(F.lit("h"), (F.col("id") % 10), F.lit(".com")).alias("host"),
        F.lit(0).alias("priority"),
        F.col("id").alias("order_key"),
    )
    robots = spark.range(10).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".com")).alias("host"),
        F.lit(1.0).alias("crawl_delay_s"),
        F.array().cast("array<string>").alias("disallow_prefixes"),
    )
    bts = batch_ts_lit("2025-06-14 12:00:00")
    # emulate a dimension too big for auto-broadcast: with the hint off,
    # Catalyst must NOT broadcast (at 10^7 hosts the size stats do this)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_b = schedule(due, robots, bts, 600.0, broadcast_robots=True) \
            ._jdf.queryExecution().executedPlan().toString()
        plan_s = schedule(due, robots, bts, 600.0, broadcast_robots=False) \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in plan_b or "BroadcastExchange" in plan_b
    assert "BroadcastExchange" not in plan_s


def test_ua_rotation_deterministic(spark):
    from news_crawler_spark.operators.scheduler import UA_POOL, ua_expr

    urls = spark.createDataFrame(
        [(f"https://x.com/{i}",) for i in range(40)], "url_canon string"
    )
    a = [r.ua for r in urls.select(ua_expr(F.col("url_canon")).alias("ua")).collect()]
    b = [r.ua for r in urls.select(ua_expr(F.col("url_canon")).alias("ua")).collect()]
    assert a == b  # bit-exact replay
    assert set(a) <= set(UA_POOL)
    assert len(set(a)) > 1  # actually rotates


def test_read_at_batch_overwrite_tables(spark, tmp_store):
    """Overwrite tables are as-of readable via history manifests while
    inside the keep_versions window; outside it → None."""
    store = SnapshotStore(tmp_store, keep_versions=2)
    for b in range(1, 5):
        store.commit(b, overwrite={"state": _mk(spark, [b] * b)})
    at3 = store.read_at_batch(spark, "state", 3)
    assert at3 is not None and [r.v for r in at3.collect()] == [3, 3, 3]
    assert store.read_at_batch(spark, "state", 1) is None  # GC'd out of window
    assert store.read_at_batch(spark, "missing_table", 3) is None
