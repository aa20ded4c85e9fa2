"""Bucketed seen table (the 10^10-URL D1 layout): the anti-join must
scan the seen side pre-bucketed — Exchange only on the candidate side —
and stay exactly equal to the plain anti-join."""

from pyspark.sql import functions as F

from news_crawler_spark.sources.bucketed import (
    anti_join_seen_bucketed,
    compact_seen_bucketed,
    write_seen_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_anti_join_no_seen_side_exchange(spark):
    seen = spark.range(50_000).select(
        F.concat(F.lit("https://ex.com/a/"), F.col("id")).alias("url_canon")
    )
    write_seen_bucketed(seen, "tb_seen", n_buckets=8)
    cand = spark.range(0, 60_000).select(
        F.concat(F.lit("https://ex.com/a/"), F.col("id")).alias("url_canon"),
        (F.col("id") % 7).alias("x"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast join strategy (the at-scale case)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = anti_join_seen_bucketed(cand, spark, "tb_seen")
        plan = _plan(out)
        n = out.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Bucketed: true" in plan  # seen side read pre-bucketed
    # exactly ONE Exchange in the whole plan — the candidate side;
    # the 10^10-row seen side never re-shuffles
    assert plan.count("Exchange hashpartitioning") == 1
    assert n == 10_000  # exact: ids 50000..59999 are unseen
    spark.sql("DROP TABLE IF EXISTS tb_seen")


def test_compact_folds_deltas_idempotently(spark):
    base = spark.createDataFrame([(f"u{i}",) for i in range(10)], "url_canon string")
    write_seen_bucketed(base, "tb_seen2", n_buckets=4)
    delta = spark.createDataFrame([("u5",), ("u10",), ("u11",)], "url_canon string")
    compact_seen_bucketed(spark, delta, "tb_seen2", n_buckets=4)
    got = {r.url_canon for r in spark.table("tb_seen2").collect()}
    assert got == {f"u{i}" for i in range(12)}
    # re-compacting the same delta changes nothing (idempotent)
    compact_seen_bucketed(spark, delta, "tb_seen2", n_buckets=4)
    assert spark.table("tb_seen2").count() == 12
    spark.sql("DROP TABLE IF EXISTS tb_seen2")
