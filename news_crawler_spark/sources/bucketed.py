"""Bucketed URL-seen table — the 10^10-row deployment shape of D1.

The crawl's per-window exact anti-join (candidates ∖ seen) re-shuffles
BOTH sides on ``url_canon`` every window when seen lives in plain
parquet. At 10^10 URLs the seen side dominates: re-shuffling it per
window is the single biggest avoidable data movement in the pipeline.

Storing seen as a Spark **bucketed table** (``bucketBy(url_canon)`` +
``sortBy``) fixes the layout once at write time: the anti-join then
shuffles only the (small) candidate side into the bucket layout, and the
seen side is scanned pre-bucketed — no Exchange, no sort
(``FileScan … Bucketed: true`` in the plan; asserted by
tests/test_bucketed_seen.py). This mirrors Iceberg's
``bucket(N, url_canon)`` partition transform, which is the production
target; the Spark-catalog bucketed table is the sandbox-runnable
equivalent.

The snapshot store keeps the parity-authoritative append-delta ``seen``
table; ``compact_seen_bucketed`` is the maintenance job that folds those
deltas into the bucketed layout (run every N windows / offline —
deltas stay smaller than N windows of accepts, so the per-window probe
joins bucketed-big ∪ recent-deltas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def write_seen_bucketed(
    seen: DataFrame,
    table: str = "seen_bucketed",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize the seen set as a bucketed+sorted catalog table."""
    (
        seen.select("url_canon").dropDuplicates(["url_canon"])
        .write.bucketBy(n_buckets, "url_canon")
        .sortBy("url_canon")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def compact_seen_bucketed(
    spark: SparkSession,
    deltas: DataFrame,
    table: str = "seen_bucketed",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Fold append deltas into the bucketed table (idempotent union —
    the periodic maintenance pass)."""
    if spark.catalog.tableExists(table):
        merged = spark.table(table).unionByName(deltas.select("url_canon"))
    else:
        merged = deltas.select("url_canon")
    # write through a temp table: the source table cannot be overwritten
    # while being read
    tmp = f"{table}__compacting"
    write_seen_bucketed(merged, tmp, n_buckets)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")


def anti_join_seen_bucketed(
    candidates: DataFrame,
    spark: SparkSession,
    table: str = "seen_bucketed",
    url_col: str = "url_canon",
) -> DataFrame:
    """candidates ∖ seen with the seen side read pre-bucketed (only the
    candidate side shuffles)."""
    seen = spark.table(table)
    if url_col != "url_canon":
        seen = seen.withColumnRenamed("url_canon", url_col)
    return candidates.join(seen, on=url_col, how="left_anti")
