"""Hot-host skew measurement — SURVEY §7.3: 'the salted scheduler plus
AQE must be measured, not assumed.'

Frontier: N rows, ``hot_frac`` of them on ONE host (the 10^10-frontier
failure mode), the rest uniform over 5k hosts. schedule() ranks within
host_salt partitions; n_salts=1 degenerates to one task sorting the hot
host's entire frontier, n_salts=S distributes it. Budgets are exact
either way (test_scheduler); this measures the wall-clock effect.

Usage: python tools/skew_bench.py [n_rows] [hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from news_crawler_spark.functions.timeparse import batch_ts_lit  # noqa: E402
from news_crawler_spark.operators.scheduler import order_key_col, schedule  # noqa: E402
from news_crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark()
    cut = int(n * hot_frac)
    df = spark.range(0, n, 1, 64)
    i = F.col("id")
    host = F.when(i < cut, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), F.pmod(i, F.lit(5000)), F.lit(".example.com"))
    )
    due = df.select(
        F.concat(F.lit("https://"), host, F.lit("/p/"), i).alias("url_canon"),
        host.alias("host"),
        F.lit(0).alias("priority"),
        order_key_col(F.lit(1), F.lit(0), i.cast("int")).alias("order_key"),
    ).persist()
    due.count()
    robots = spark.createDataFrame(
        [("hot.example.com", 0.001, [])],
        "host string, crawl_delay_s double, disallow_prefixes array<string>",
    )

    results = {}
    for n_salts in (1, 16):
        t0 = time.time()
        got = schedule(due, robots, batch_ts_lit(), window_s=100.0, n_salts=n_salts).count()
        results[f"salts_{n_salts}"] = {"wall_s": round(time.time() - t0, 2), "rows": got}

    assert results["salts_1"]["rows"] == results["salts_16"]["rows"]
    print(json.dumps({
        "n_rows": n, "hot_frac": hot_frac,
        **results,
        "speedup_from_salting": round(
            results["salts_1"]["wall_s"] / results["salts_16"]["wall_s"], 2
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
