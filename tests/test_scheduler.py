"""Politeness/priority scheduler (C1/C7/C8): per-host budgets enforced
exactly under salting, priority order respected, robots paths dropped,
deterministic politeness slots."""

from pyspark.sql import functions as F

from news_crawler_spark.functions.timeparse import batch_ts_lit
from news_crawler_spark.operators.scheduler import order_key_col, schedule


def _frontier(spark, host, n, priority_of=lambda i: 0):
    rows = [
        (f"https://{host}/p/{i}", host, priority_of(i), i)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "url_canon string, host string, priority int, pos int")
    return df.withColumn("order_key", order_key_col(F.lit(1), F.lit(0), F.col("pos")))


def _robots(spark, host, delay, disallow=()):
    return spark.createDataFrame(
        [(host, float(delay), list(disallow))],
        "host string, crawl_delay_s double, disallow_prefixes array<string>",
    )


def test_budget_enforced_exactly_per_host(spark):
    due = _frontier(spark, "h1.com", 100)
    robots = _robots(spark, "h1.com", 2.0)
    out = schedule(due, robots, batch_ts_lit(), window_s=20.0, n_salts=4)
    rows = out.collect()
    assert len(rows) == 10  # floor(20/2) — budget per-host, not per-salt
    # the admitted rows are the 10 best by (priority, order_key)
    assert {r.pos for r in rows} == set(range(10))


def test_priority_order_wins(spark):
    due = _frontier(spark, "h2.com", 50, priority_of=lambda i: 50 - i)
    robots = _robots(spark, "h2.com", 1.0)
    out = schedule(due, robots, batch_ts_lit(), window_s=5.0, n_salts=4)
    rows = sorted(out.collect(), key=lambda r: r.slot)
    assert len(rows) == 5
    assert [r.pos for r in rows] == [49, 48, 47, 46, 45]  # highest priority = lowest value


def test_robots_disallow_dropped(spark):
    due = _frontier(spark, "h3.com", 10).withColumn(
        "url_canon", F.concat(F.lit("https://h3.com/ad/"), F.col("pos"))
    )
    robots = _robots(spark, "h3.com", 1.0, disallow=["/ad/"])
    assert schedule(due, robots, batch_ts_lit(), window_s=60.0).count() == 0


def test_politeness_slots_deterministic(spark):
    due = _frontier(spark, "h4.com", 8)
    robots = _robots(spark, "h4.com", 2.0)
    out = schedule(due, robots, batch_ts_lit(), window_s=60.0, n_salts=2)
    rows = sorted(out.collect(), key=lambda r: r.slot)
    # next_fetch_after = batch_ts + slot*2s — strictly increasing by 2s
    deltas = [
        (rows[i + 1].next_fetch_after - rows[i].next_fetch_after).total_seconds()
        for i in range(len(rows) - 1)
    ]
    assert all(d == 2.0 for d in deltas)
    # slot order follows order_key (equal priority)
    assert [r.pos for r in rows] == sorted(r.pos for r in rows)


def test_unknown_host_defaults(spark):
    due = _frontier(spark, "unknown.com", 3)
    robots = _robots(spark, "other.com", 9.0)
    out = schedule(due, robots, batch_ts_lit(), window_s=2.0)
    # default crawl_delay 1.0 → budget 2
    assert out.count() == 2
