"""R1-R4 at reference keyword scale — SURVEY §2.5: 'HOF over 486
keywords × per row may lose to Aho-Corasick UDF; benchmark decides.'

Generates a 486-include / 259-exclude synthetic config (News_keyword.json
shape), runs the native higher-order-function predicate and the
vectorized Arrow UDF over N duplicated documents rows, prints timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from news_crawler_spark.functions.relevance import (  # noqa: E402
    keyword_arrays,
    relevance_expr,
    relevance_profile_fast_factory,
    relevance_profile_loop_factory,
    relevance_udf_factory,
    relevance_udf_fast_factory,
)
from news_crawler_spark.session import get_spark  # noqa: E402


def synth_keywords(n_inc: int = 486, n_exc: int = 259):
    inc = [f"kw{i:03d}" for i in range(n_inc)]
    exc = [f"bad{i:03d}" for i in range(n_exc)]
    return inc, exc


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(extra_conf={"spark.sql.ansi.enabled": "false"})
    inc, exc = synth_keywords()
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_docs = docs.count()
    mult = max(1, rows // n_docs)
    big = docs.crossJoin(spark.range(mult).select(F.col("id").alias("rep"))).select(
        # salt ~20% of rows with real keywords so the predicate has work + selectivity
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" kw001 kw002")))
        .when(F.col("doc_id") % 7 == 0,
              F.concat(F.col("text"), F.lit(" kw003 bad004")))
        .otherwise(F.col("text")).alias("text")
    ).persist()
    n = big.count()

    inc_arr, exc_arr = keyword_arrays(inc, exc)
    native = big.filter(
        relevance_expr(F.col("text"), F.lit("wordset"), F.lit(True), inc_arr, exc_arr, F.lit(2))
    )
    t0 = time.time()
    n_native = native.count()
    t_native = time.time() - t0

    fast = relevance_udf_fast_factory(inc, exc)
    viafast = big.filter(fast(F.col("text")))
    t0 = time.time()
    n_fast = viafast.count()
    t_fast = time.time() - t0
    assert n_native == n_fast, (n_native, n_fast)

    # the crawl's actual large-config path: the profile UDF with mixed
    # per-row variants — round-2 per-row loop vs round-3 mega-string
    # vectorized arm (must agree exactly; target speedup >= 1.5x)
    mixed = big.select(
        "text",
        F.when(F.crc32(F.col("text")) % 3 == 0, F.lit("substring"))
        .when(F.crc32(F.col("text")) % 3 == 1, F.lit("wordset"))
        .otherwise(F.lit("regex")).alias("variant"),
        F.lit(True).alias("use_exclude"),
        F.lit(2).alias("min_include"),
    ).persist()
    mixed.count()
    args = (F.col("text"), F.col("variant"), F.col("use_exclude"), F.col("min_include"))
    loop_udf = relevance_profile_loop_factory(inc, exc)
    t0 = time.time()
    n_loop = mixed.filter(loop_udf(*args)).count()
    t_loop = time.time() - t0
    fastp_udf = relevance_profile_fast_factory(inc, exc)
    t0 = time.time()
    n_fastp = mixed.filter(fastp_udf(*args)).count()
    t_fastp = time.time() - t0
    assert n_loop == n_fastp, (n_loop, n_fastp)

    # reference-exact per-keyword UDF is O(keywords) per row — measure on
    # a slice and extrapolate (it loses by orders of magnitude)
    slice_df = big.limit(5000).persist()
    n_slice = slice_df.count()
    udf = relevance_udf_factory(inc, exc)
    t0 = time.time()
    slice_df.filter(udf(F.col("text"), F.lit("wordset"), F.lit(True), F.lit(2))).count()
    t_exact_slice = time.time() - t0

    print(json.dumps({
        "rows": n, "keywords": [len(inc), len(exc)], "matches": n_native,
        "native_hof_s": round(t_native, 2),
        "combined_regex_udf_s": round(t_fast, 2),
        "per_keyword_udf_s_per_5k_rows": round(t_exact_slice, 2),
        "native_rows_per_s": round(n / t_native, 0),
        "combined_udf_rows_per_s": round(n / t_fast, 0),
        "per_keyword_udf_rows_per_s": round(n_slice / t_exact_slice, 0),
        "profile_loop_udf_s": round(t_loop, 2),
        "profile_vectorized_udf_s": round(t_fastp, 2),
        "profile_vectorized_speedup": round(t_loop / t_fastp, 2),
        "winner": "native_hof" if t_native < t_fast else "combined_regex_udf",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
