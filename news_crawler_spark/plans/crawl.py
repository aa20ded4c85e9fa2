"""The micro-batch crawl pipeline — SURVEY.md §3.4, the engine's core.

One micro-batch = a WINDOW of K page generations across all active seeds
(``pages_per_batch``). K=1 reproduces the reference's page-at-a-time
cadence; larger K amortizes per-batch scheduling/commit overhead K× —
the scale lever — while keeping parity EXACT:

* Crawl order is (page, seed_index, dom_pos) regardless of batching
  (SURVEY §3.4) — encoded in ``order_key``, never a global window.
* Every non-dedup gate (canonicalize, robots, detail-fetch status,
  relevance, time, freshness) is a pure per-row function → computed once
  per window as a ``row_ok`` column (``pregate``), independent of
  processing order.
* URL collisions never cross sites (hosts are per-site), and in-window
  dedup is keep-first-by-order_key — identical to the sequential seen-set
  behavior because all occurrences of a URL share the same gate outcome.
* The only inherently sequential decisions — A6 stop-on-empty pagination
  (Gukje/Nate/YNA/Daum) and D4 fuzzy-title replay (Google) — run on the
  tiny per-window slice they actually need: a driver-side replay of the
  stop rule over the stop-on-empty sites' window items (bounded by
  K × seeds × items/page, NOT by corpus size), and a per-site
  applyInPandas for the fuzzy gate whose prior-title state rides the
  shuffle as flagged rows, not the UDF closure.

Driver-loop scale shape (round-2 rework of the round-1 scale-killers):

* ``due`` is expanded **in Spark** from the committed ``frontier_pending``
  table's in-memory twin (one row per active seed → explode over the
  window's K pages). The driver holds only per-seed scalars (active
  flag, max_pages) — never per-page or per-URL rows.
* Exactly TWO driver collects per window, each one job: a tagged-union
  stats job (per-(seed,page) item counts ∪ stop-on-empty replay rows ∪
  dispatch/gate counts — the gate/dispatch legs scan caches filled by the
  same job, never recomputing the robots join) and the accept-row job,
  which for small windows also carries the head-list scalars (the top-50
  is then merged driver-side and committed via pyarrow — no per-window
  head Spark job) and the bloom/cuckoo delta twins. Round 1 had five
  collects; empty windows additionally elide their zero-row appends.
* The snapshot commit is ASYNC: window N+1's DAG builds and runs while
  window N's tables write; the manifest swap stays strictly ordered
  (one in-flight commit; the loop waits before submitting the next).
  Cross-window state is threaded in memory — seen set and fuzzy titles
  as persisted DataFrames, Bloom/cuckoo shards as driver-held rows
  (bounded by the small-filter broadcast cap; deltas collected per
  window, merged in numpy) — so no window blocks on reading back what
  the previous one wrote. A crash loses only uncommitted windows;
  resume replays them deterministically from the last manifest.
* Host-count dimensions (robots, profiles) broadcast only below
  ``dim_broadcast_max`` rows; past that they shuffle-join (a 10^7-host
  robots table cannot broadcast). The per-site semantic profile map the
  driver needs (crawl delays, stop flags) comes from the 10 base
  profiles in config — never a ``collect()`` of per-host rows.
* The politeness window is derived from the actual per-host due-page
  count (crawl_delay × seeds-per-host × K with 2× headroom), and the
  scheduler's output is ASSERTED equal to the robots-allowed due count —
  a budget shortfall fails loudly instead of silently skipping pages.

Batch plan:

  frontier_pending (1 row/active seed) → explode K pages → robots gate
    → politeness schedule → corpus join (S2)
    → mapInPandas parse (P1/P2) → canonicalize (U1-U5, native)
    → link robots gate (C7) → exact anti-join vs seen, Bloom-routed (D1)
    → article-detail corpus join + parse where the profile needs it
      (S3/P3, semi-join reduced) → relevance (R1-R4) → time (T1-T8)
    → freshness (T6)  ⇒ pregate(row_ok)
  stats job 1 (items ∪ soe-rows ∪ counts) → stop replay (driver) ⇒ limits
  mask ∧ first-occurrence dedup (D2) ∧ row_ok ∧ fuzzy (D4)
    → span assembly (P4) → stats job 2 → async snapshot commit (C6)

Shuffles per window: corpus join on url_canon, dedup window on
url_canon, seen anti-join on url_canon (Bloom-pruned), fuzzy
applyInPandas on site. Listing/article scans prune on the corpus
page_kind partition column.
"""

from __future__ import annotations

import hashlib
import os
import time
from collections import Counter, defaultdict

import pandas as pd
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import config
from ..config import BATCH_TS, profile_of
from ..functions.relevance import (
    keyword_arrays,
    relevance_expr,
    relevance_profile_fast_factory,
)
from ..functions.timeparse import batch_ts_lit, freshness_filter_expr, parse_time_expr
from ..functions.urls import canonicalize_expr
from ..operators import bloom, cuckoo
from ..operators.fuzzy import fuzzy_gate
from ..operators.parse import parse_article, parse_listing
from ..operators.scheduler import (
    order_key_col,
    robots_gate,
    schedule_gated,
    ua_expr,
)
from ..operators.archive import article_scalar_fields, head_fields
from ..operators.spans import build_spans
from ..sources.bucketed import compact_seen_bucketed
from ..sources.store import LocalTable, SnapshotStore
from ..sources.world import profiles_df

SEED_STATE_SCHEMA = "seed_index int, site string, url string, max_pages int, active boolean"
FRONTIER_SCHEMA = (
    "seed_index int, site string, url_base string, next_page int, max_pages int, status string"
)
FUZZY_SCHEMA = "site string, norm_title string, seq long"
HEAD_SCHEMA = (
    "title string, time string, img string, summary string, url string, "
    "original_url string, site string, ts timestamp, crawl_order long"
)
METRICS_SCHEMA = (
    "batch_id int, stage string, partition_id int, rows_in long, rows_out long, wall_ms long"
)
STATS_SCHEMA = "tag string, a int, b int, c long, s string"


@dataclass
class CrawlResult:
    prelude_s: float = 0.0
    batches: int = 0
    dispatched: int = 0
    items: int = 0
    accepted: int = 0
    frontier_rows: int = 0
    per_batch: list = field(default_factory=list)
    compactions: int = 0       # seen/fuzzy state folds (compact_every)
    max_union_depth: int = 0   # peak # of uncompacted seen deltas
    seen_table: str | None = None  # bucketed seen catalog table, if enabled


class InjectedFailure(RuntimeError):
    """Raised by the fault-injection hook in resume tests."""


class BudgetShortfall(RuntimeError):
    """The politeness scheduler dropped robots-allowed due pages — the
    window is too small for the host's due count (round-1 ADVICE: fail
    loudly instead of silently skipping pages forever)."""


def _tagged(df: DataFrame, tag: str, a=None, b=None, c=None, s=None) -> DataFrame:
    """Project a DataFrame onto the shared stats schema."""
    return df.select(
        F.lit(tag).alias("tag"),
        (a if a is not None else F.lit(None)).cast("int").alias("a"),
        (b if b is not None else F.lit(None)).cast("int").alias("b"),
        (c if c is not None else F.lit(None)).cast("long").alias("c"),
        (s if s is not None else F.lit(None)).cast("string").alias("s"),
    )


def run_crawl(
    spark: SparkSession,
    world: dict[str, DataFrame],
    store: SnapshotStore,
    batch_ts: str = BATCH_TS,
    use_bloom: bool = True,
    seen_filter: str | None = None,   # 'bloom' | 'cuckoo' | 'none'; None → from use_bloom
    n_bloom_shards: int = bloom.DEFAULT_N_SHARDS,
    n_salts: int = 4,
    pages_per_batch: int = 1,
    max_batches: int = 10_000,
    fail_after_batch: int | None = None,
    include_keywords: list[str] | None = None,
    exclude_keywords: list[str] | None = None,
    dim_broadcast_max: int = 4096,
    fetch_broadcast_max: int = 4_000_000,
    max_retries: int = 0,
    retry_backoff_windows: int = 1,
    relevance_udf_threshold: int = 64,
    robots_from_corpus: bool = False,
    compact_every: int | None = None,
    seen_buckets: int = 64,
    cache_corpus: bool = False,
    driver_stats_max_rows: int = 500_000,
    driver_head_max_rows: int = 50_000,
) -> CrawlResult:
    """Run the crawl to frontier exhaustion (or ``max_batches`` windows),
    committing one snapshot per window; resumes from the store's last
    committed batch if one exists.

    ``compact_every=N`` bounds the cross-window seen/fuzzy state: every N
    windows the seen-delta union chain folds into a bucketed catalog
    table (sources/bucketed.py) and ``seen_mem`` re-points at that single
    pre-bucketed scan, so the per-window anti-join shuffles only the
    candidate side and the analyzer never walks a W-way union; the fuzzy
    title chain collapses to one localCheckpoint. The bucketed table is a
    RUN-LOCAL layout artifact — dropped and rebuilt from the committed
    ``seen`` deltas on every (re)start, so crash replay and rollback can
    never observe URLs that were compacted but not committed (production
    target: an Iceberg table whose bucket layout is versioned with the
    snapshot, making the fold itself atomic)."""
    corpus, seeds = world["corpus"], world["seeds"]
    listings = corpus.filter(F.col("page_kind") == "listing")
    articles = corpus.filter(F.col("page_kind") == "article")
    # The replay-corpus joins stand in for the fetcher tier: a real crawl
    # pays per-URL network IO, so the simulator must not pay a full
    # corpus scan per window either. Listings prune to the window's page
    # band (see win_listings below); articles have no page locality (any
    # page links any article), so ``cache_corpus`` pins that branch once
    # (memory-and-disk) instead of re-decoding parquet every window —
    # the sandbox analog of an indexed fetch service.
    if cache_corpus:
        from pyspark import StorageLevel

        articles = articles.persist(StorageLevel.MEMORY_AND_DISK)
    if robots_from_corpus:
        # C7 end-to-end: the robots dimension is PARSED from fetched
        # robots.txt bytes in the replayed corpus (operators/robots.py
        # native state machine), not handed in as a table
        from ..operators.robots import parse_robots

        rpages = corpus.filter(F.col("page_kind") == "robots").select(
            F.parse_url(F.col("url_canon"), F.lit("HOST")).alias("host"), "content"
        )
        robots = parse_robots(rpages, default_delay_s=1.0).persist()
    else:
        robots = world["robots"]
    if include_keywords is None:
        include_keywords = config.INCLUDE_KEYWORDS
    if exclude_keywords is None:
        exclude_keywords = config.EXCLUDE_KEYWORDS
    inc_arr, exc_arr = keyword_arrays(include_keywords, exclude_keywords)
    bts = batch_ts_lit(batch_ts)
    K = pages_per_batch
    if seen_filter is None:
        seen_filter = "bloom" if use_bloom else "none"
    res = CrawlResult()
    _t_prelude = time.time()
    _had_snapshot = store.last_batch_id >= 0  # resume: append tables exist

    # ---- resume or init ------------------------------------------------
    if store.last_batch_id >= 0:
        ss = store.read(spark, "seed_state").toPandas().sort_values("seed_index")
        seed_state = ss.to_dict("records")
        frontier_mem = store.read(spark, "frontier_pending")
        if frontier_mem is not None:
            frontier_mem = frontier_mem.filter(F.col("seed_index") >= 0).persist()
        fuzzy_mem = store.read(spark, "fuzzy_titles")
        if fuzzy_mem is not None:
            fuzzy_mem = fuzzy_mem.filter(F.col("seq") >= 0).persist()
        head_mem = store.read(spark, "head_list")
        if head_mem is not None:
            head_mem = head_mem.persist()
        retry_mem = store.read(spark, "retry_pending")
        if retry_mem is not None:
            retry_mem = retry_mem.filter(F.col("seed_index") >= 0).persist()
        seen_mem = store.read(spark, "seen")
        shard_tab = {"bloom": "bloom_shards", "cuckoo": "cuckoo_shards"}.get(seen_filter)
        shards_df = store.read(spark, shard_tab) if shard_tab else None
        shard_rows = [r.asDict() for r in shards_df.collect()] if shards_df is not None else None
    else:
        # no init snapshot: a crash before the first window's commit
        # re-initializes from the world's seed list — same state
        ss = seeds.toPandas().sort_values("seed_index")
        ss["active"] = True
        seed_state = ss.to_dict("records")
        frontier_mem = seeds.select(
            "seed_index", "site", F.col("url").alias("url_base"),
            F.lit(1).alias("next_page"), "max_pages", F.lit("pending").alias("status"),
        ).persist()
        fuzzy_mem = None
        head_mem = None
        seen_mem = None
        shard_rows = None
        retry_mem = None

    # Per-site semantic scalars the driver-side stop logic needs come from
    # the 10 base profiles (config) — NEVER a collect() of the per-host
    # profiles dimension (round-1 scale-killer #3).
    world_sites = sorted({s["site"] for s in seed_state})
    prof_map = {site: profile_of(site) for site in world_sites}
    profiles = profiles_df(spark, world_sites)
    n_dim_rows = len(world_sites)
    if n_dim_rows <= dim_broadcast_max:
        # Localize the broadcast-sized robots dim: the distributed parse
        # (or scan) runs exactly ONCE here; per-window broadcasts of a
        # driver-local relation then rebuild the hash relation without
        # re-running the corpus-derived robots chain as a cluster job
        # (two such jobs per window otherwise: robots_gate + the
        # link-host disallow join). Past the broadcast cap the
        # distributed shuffle-join path below is unchanged.
        _r_rows = robots.collect()
        _r_schema = robots.schema
        robots.unpersist()
        robots = spark.createDataFrame(_r_rows, _r_schema)

    def _dim(df: DataFrame) -> DataFrame:
        """Host/site-count dimensions broadcast only while they are small;
        at web scale they shuffle-join (round-1 scale-killer #2)."""
        return F.broadcast(df) if n_dim_rows <= dim_broadcast_max else df

    # politeness window must admit every due page of the window's hosts:
    # a host's due count per window page is its seed count (derived from
    # the actual seed list, not a hard-coded bound — round-1 ADVICE)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    seeds_per_site = Counter(s["site"] for s in seed_state)
    max_delay_seeds = max(
        prof_map[site].crawl_delay_s * n for site, n in seeds_per_site.items()
    )
    window_s = max(60.0, max_delay_seeds * K * 2)

    # ---- loop-invariant column expressions (py4j expression building is
    # driver-serial — build the heavy trees once, reuse every window) ----
    url_canon_e = canonicalize_expr(F.col("href"), F.col("origin"), F.col("strip_query"))
    link_path_e = F.coalesce(F.parse_url(F.col("url_canon"), F.lit("PATH")), F.lit(""))
    order_key_e = order_key_col(F.col("page"), F.col("seed_index"), F.col("dom_pos"))
    need_detail = F.col("time_source") == "article"  # detail_before_filter ⊆ this
    detail_ok = F.col("a_status").isNotNull() & (F.col("a_status") == 200)
    match_text = (
        F.when(F.col("match_input") == "title_lead",
               F.concat_ws(" ", F.col("title"), F.col("lead")))
        .when(F.col("match_input") == "title_summary",
              F.concat_ws(" ", F.col("title"), F.coalesce(F.col("d_summary"), F.lit(""))))
        .otherwise(F.col("title"))
    )
    # relevance path: native HOFs carry small configs (JVM, codegen);
    # past the threshold the EXACT vectorized Arrow UDF wins (~2.5× at
    # News_keyword.json scale, tools/relevance_bench.py)
    if len(include_keywords) + len(exclude_keywords) > relevance_udf_threshold:
        rel_fast = relevance_profile_fast_factory(include_keywords, exclude_keywords)
        rel_ok = rel_fast(match_text, F.col("relevance_variant"), F.col("use_exclude"),
                          F.col("min_include"))
    else:
        rel_ok = relevance_expr(match_text, F.col("relevance_variant"),
                                F.col("use_exclude"), inc_arr, exc_arr,
                                F.col("min_include"))
    time_str_e = F.when(F.col("time_source") == "article", F.col("d_time_str")).otherwise(
        F.col("time_str"))
    ts_e = parse_time_expr(time_str_e, F.col("time_chain"), bts)
    fresh_ok = freshness_filter_expr(F.col("ts"), bts, F.col("freshness_days"))
    row_ok_e = (~need_detail | detail_ok) & rel_ok & F.col("ts").isNotNull() & fresh_ok
    summary_e = F.when(need_detail, F.coalesce(F.col("d_summary"), F.lit(""))).otherwise(F.lit(""))
    img_raw_e = F.when(
        need_detail, F.coalesce(F.nullif(F.col("d_img"), F.lit("")), F.col("img"))
    ).otherwise(F.col("img"))
    img_canon_e = F.when(img_raw_e.isNull() | (img_raw_e == ""), F.lit("")).otherwise(
        F.coalesce(canonicalize_expr(img_raw_e, F.col("origin"), F.lit(False)), F.lit(""))
    )
    spans_e = build_spans(F.col("title"), summary_e, img_canon_e)
    norm_title_e = F.regexp_replace(F.lower(F.col("title")), r"\s+", "")
    w_dedup = Window.partitionBy("url_canon").orderBy("order_key")
    pages_cap_e = F.when(F.col("max_pages") > 0, F.col("max_pages")).otherwise(F.lit(1 << 30))

    n_retry = retry_mem.count() if retry_mem is not None else 0
    seen_table: str | None = None
    seen_rows_total = 0  # driver twin of |seen| — sizes the bucket layout
    if compact_every:
        seen_table = "seen_bucketed_" + hashlib.md5(
            store.root.encode()).hexdigest()[:10]
        # run-local artifact: always rebuilt from committed seen deltas
        spark.sql(f"DROP TABLE IF EXISTS {seen_table}")
        res.seen_table = seen_table
        if seen_mem is not None:
            seen_rows_total = seen_mem.count()  # one bounded prelude job
    res.prelude_s = time.time() - _t_prelude
    batch = max(store.last_batch_id, 0)  # fresh store: no init snapshot
    prev_unpersist: list[DataFrame] = []
    # filter-probe broadcasts live on the prev_unpersist lifecycle: the
    # window's sc.broadcast handles are drained into prev_probe_bcs when
    # the window ends and destroyed at the NEXT window's drain point —
    # after wait_commit (their commit plans are done) and after the next
    # window's stats actions (which materialize the lazy checkpoints whose
    # lineage was the last reference). Stale registry entries from earlier
    # same-session queries are discarded (not destroyed) up front.
    bloom.drain_probe_broadcasts()
    prev_probe_bcs: list = []
    # driver-side head-list twin: small fused windows maintain the top-50
    # as driver rows (LocalTable commit — no per-window head Spark job);
    # exactly one of head_rows / head_mem is live at any time
    head_rows: list[tuple] | None = None
    seen_chain: list[DataFrame] = []   # persisted seen deltas not yet folded
    # resume base: committed seen rows not yet in the bucketed table — part
    # of the first fold only (afterwards the table itself carries them)
    seen_resume_base: DataFrame | None = seen_mem
    fuzzy_chain: list[DataFrame] = []  # persisted fuzzy deltas not yet folded
    if fuzzy_mem is not None:
        fuzzy_chain.append(fuzzy_mem)  # resume base: released on first fold
    fuzzy_ckpt: DataFrame | None = None
    since_compact = 0
    # Static planning for BIG windows: AQE materializes every shuffle
    # stage sequentially with a driver round-trip between stages, which
    # at high core counts leaves the executor pool idle between waves —
    # measured 94.6 s → 82.4 s (same world, same accepted set) at 8
    # cores, 2-core arm unchanged. The crawl's widths are already sized
    # explicitly there (shuffle_partitions=cores, parse oversplit,
    # explicit broadcasts), so runtime re-planning buys nothing. SMALL
    # windows are the opposite case: their per-stage row counts are far
    # below the configured width, and AQE's partition coalescing is
    # exactly the right tool (measured at local[32], K=1/mult=12:
    # 6.8 s/window with AQE vs 11.2 s static — 32-task stages over a
    # few hundred rows). Threshold: the window's due-page upper bound
    # must cover the shuffle width with real work. Scoped to the loop,
    # restored after; NCS_LOOP_AQE overrides either way.
    _initial_due = sum(1 for s in seed_state if s["active"]) * K
    _static_plan = _initial_due >= 16 * n_parts
    _aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.enabled",
        os.environ.get("NCS_LOOP_AQE", "false" if _static_plan else _aqe_prev))
    try:
        while batch < max_batches:
            _t_win = time.time()
            stage_wall: dict[str, int] = {}

            def _clock(stage: str, t0: float) -> None:
                stage_wall[stage] = int((time.time() - t0) * 1000)

            batch += 1
            p0 = (batch - 1) * K + 1
            p1 = p0 + K - 1
            # window-band listing scan: prunes the fetch join's corpus
            # side to the K due pages (partition dirs / cached-batch
            # stats). Retried URLs point at older pages — widen to the
            # full history only when retries are actually pending.
            lo_page = 1 if (retry_mem is not None and n_retry > 0) else p0
            win_listings = listings.filter(
                (F.col("page") >= lo_page) & (F.col("page") <= p1)
            )
            # page-cap deactivation at window start (oracle loop-top order)
            for s in seed_state:
                if s["active"] and s["max_pages"] and p0 > s["max_pages"]:
                    s["active"] = False
            active = [s for s in seed_state if s["active"]]
            if not active and n_retry == 0:
                break

            # ---- periodic state compaction (bounds the cross-window
            # union chains; VERDICT r2 structural item). Fold-all is
            # idempotent, so the resume base and any prior table content
            # fold in for free. wait_commit first: the in-flight commit's
            # fuzzy_titles write reads the chain being collapsed. --------
            if seen_table and since_compact >= compact_every and seen_mem is not None:
                t0 = time.time()
                store.wait_commit()
                # fold ONLY the uncompacted deltas (+ the resume base on the
                # first fold) — compact re-adds the table content itself;
                # passing seen_mem would scan and dedup the table twice
                # (round-3 ADVICE)
                pending = ([seen_resume_base] if seen_resume_base is not None else []) \
                    + seen_chain
                if pending:
                    uncomp = pending[0]
                    for df in pending[1:]:
                        uncomp = uncomp.unionByName(df)
                    # bucket count sized to the data (each fold rewrites
                    # the table, so the layout grows with it): a fixed
                    # 64-bucket layout costs 64 scheduled scan tasks per
                    # window at K=1 regardless of bytes, while a 10^10-row
                    # table wants the full configured width
                    n_b = max(8, min(seen_buckets,
                                     seen_rows_total // 250_000 + 8))
                    compact_seen_bucketed(spark, uncomp, seen_table,
                                          n_buckets=n_b)
                seen_resume_base = None
                for df in seen_chain:
                    df.unpersist()
                seen_chain = []
                seen_mem = spark.table(seen_table)
                if fuzzy_mem is not None:
                    new_ckpt = fuzzy_mem.localCheckpoint()  # eager: copies
                    # the chain's data before the sources are released
                    for df in fuzzy_chain:
                        df.unpersist()
                    if fuzzy_ckpt is not None:
                        fuzzy_ckpt.unpersist()
                    fuzzy_chain = []
                    fuzzy_ckpt = fuzzy_mem = new_ckpt
                since_compact = 0
                res.compactions += 1
                _clock("compact", t0)

            # ---- due: Spark-side explode of the frontier table ----------
            t0 = time.time()
            due = (
                frontier_mem.filter(F.col("next_page") <= pages_cap_e)
                .withColumn(
                    "page",
                    F.explode(F.sequence(
                        F.col("next_page"),
                        F.least(F.col("next_page") + F.lit(K - 1), pages_cap_e),
                    )),
                )
                .select(
                    F.concat(F.col("url_base"), F.lit("?page="), F.col("page"))
                    .alias("url_canon"),
                    "site", "seed_index", "page",
                    F.col("seed_index").alias("priority"),
                )
                .withColumn("attempt", F.lit(0))
                .withColumn("host", F.parse_url(F.col("url_canon"), F.lit("HOST")))
                .withColumn("order_key",
                            order_key_col(F.col("page"), F.col("seed_index"), F.lit(0)))
            )
            # C5 retry/requeue: failed fetches re-enter the due set after a
            # deterministic backoff measured in WINDOWS (wall-clock backoff
            # would break replay); retried rows keep their original
            # (page, seed_index, dom_pos) order keys, so recovered items
            # land in crawl order. Retries never resurrect stopped seeds.
            held = None
            if retry_mem is not None and n_retry > 0:
                eligible = retry_mem.filter(F.col("retry_after_batch") <= batch)
                held = retry_mem.filter(F.col("retry_after_batch") > batch)
                retry_due = (
                    eligible.select(
                        "url_canon", "site", "seed_index", "page",
                        F.col("seed_index").alias("priority"), "attempt",
                    )
                    .withColumn("host", F.parse_url(F.col("url_canon"), F.lit("HOST")))
                    .withColumn("order_key",
                                order_key_col(F.col("page"), F.col("seed_index"), F.lit(0)))
                )
                due = due.unionByName(retry_due)
            # gated is persisted so stats1's gate-count leg scans the
            # cache (filled when dispatched evaluates, same job) instead
            # of re-running the due-explode + robots join per window.
            # (df.observe was tried for this — round-3/4 ADVICE — and
            # measured the same job shape, but Observation.get returns a
            # schema-less row on resume windows whose first action
            # evaluates the observed node only under a cached/broadcast
            # subtree, so the cache-leg form is the robust one.)
            gated = robots_gate(
                due, robots, broadcast_robots=n_dim_rows <= dim_broadcast_max
            ).persist()
            dispatched = schedule_gated(gated, bts, window_s, n_salts=n_salts).persist()
            retries_next = None
            if max_retries > 0:
                fail_rows = (
                    dispatched.select("url_canon", "site", "seed_index", "page", "attempt")
                    .join(win_listings.select("url_canon", "http_status"),
                          on="url_canon", how="left")
                    .filter(F.col("http_status").isNull() | (F.col("http_status") != 200))
                    .drop("http_status")
                )
                retries_next = (
                    fail_rows.filter(F.col("attempt") < max_retries)
                    .withColumn("attempt", F.col("attempt") + 1)
                    .withColumn("retry_after_batch",
                                F.lit(batch + retry_backoff_windows))
                )
                if held is not None:
                    retries_next = retries_next.unionByName(held)
                retries_next = retries_next.persist()
            _clock("due_build", t0)

            # ---- fetch (replayed corpus join) + parse -------------------
            # Broadcast the DISPATCH side (≤ active_seeds × K rows, known
            # driver-side) so the big listings scan never shuffles its
            # content column — the join runs map-side on the scan
            # partitions and parsing starts right on top of them.
            n_due_max = len(active) * K
            disp_side = dispatched.select("url_canon", "site", "seed_index", "page")
            if n_due_max <= fetch_broadcast_max:
                disp_side = F.broadcast(disp_side)
            # re-spread the MATCHED pages (small) across all cores before
            # the parse UDF — the map-side join leaves them on the scan's
            # few partitions, which would serialize parsing. Oversplit to
            # 4× the shuffle width when the window is big enough (≥8 pages
            # per slice): page HTML sizes vary by site, and at exactly
            # one-partition-per-core the parse stage idles every core
            # behind the largest slice (the 2→8-core profile showed ~20%
            # straggler overhead); tiny windows keep fewer, fuller slices.
            parse_parts = max(1, min(n_parts * 4, -(-n_due_max // 8)))
            fetched = disp_side.join(
                win_listings.filter(F.col("http_status") == 200)
                .select("url_canon", "content", "charset"),
                on="url_canon", how="inner",
            ).repartition(parse_parts)
            items = parse_listing(fetched).withColumnRenamed("url_canon", "listing_url").persist()

            # ---- per-row gates (dedup-independent) → pregate -------------
            cand = items.join(_dim(profiles), on="site", how="inner")
            cand = cand.withColumn("url_canon", url_canon_e).filter(F.col("url_canon").isNotNull())
            cand = (
                cand.withColumn("link_host", F.parse_url(F.col("url_canon"), F.lit("HOST")))
                .join(_dim(robots.withColumnRenamed("host", "link_host")
                           .select("link_host", "disallow_prefixes")),
                      on="link_host", how="left")
                .filter(F.col("disallow_prefixes").isNull()
                        | ~F.exists(F.col("disallow_prefixes"),
                                    lambda p: link_path_e.startswith(p)))
                .drop("disallow_prefixes")
            )
            cand = cand.withColumn("order_key", order_key_e)

            # D1: cross-batch seen — seen rows can neither accept nor claim
            # first-occurrence, so dropping them entirely is exact. The
            # prefilter arm (bloom or cuckoo) only routes; the anti-join decides.
            # shard state is driver-held rows (bounded by the small-filter
            # broadcast cap): no per-window collect/first jobs, no lazy
            # merge chain whose evaluation grows with window count. Past
            # BROADCAST_SHARD_BYTES the cogrouped bloom.probe path over
            # store-materialized shards is the scale arm.
            if seen_mem is not None:
                if seen_filter == "cuckoo":
                    cand = cuckoo.dedup_new_rows(cand, seen_mem, shard_rows or [],
                                                 n_shards=n_bloom_shards)
                elif seen_filter == "bloom":
                    cand = bloom.dedup_new_rows(cand, seen_mem, shard_rows or [],
                                                n_shards=n_bloom_shards)
                else:
                    cand = cand.join(seen_mem, on="url_canon", how="left_anti")

            # S3/P3: article detail where the profile needs it (single join;
            # parse carries http_status — C5 failure routing). The
            # candidate-URL side is bounded by the window's parsed items —
            # broadcast it so the article corpus (content column, the
            # heaviest table) is semi-join-reduced at the SCAN, not
            # shuffled wholesale.
            cand_urls = cand.filter(need_detail).select("url_canon").distinct()
            if n_due_max * 64 <= fetch_broadcast_max:
                cand_urls = F.broadcast(cand_urls)
            detail = parse_article(
                articles.join(cand_urls, on="url_canon", how="left_semi")
                .repartition(parse_parts)
            ).withColumnRenamed("url_canon", "d_url")
            cand = cand.join(detail, cand["url_canon"] == detail["d_url"], "left").drop("d_url")

            # LAZY localCheckpoint: caches AND severs lineage, so the
            # analyzer stops re-walking the full gate tree on every downstream
            # transformation (driver-serial, ~3s/window on wide worlds).
            # Lazy (round-4): the materializing action is stats1's collect
            # just below — an eager checkpoint here scheduled a whole extra
            # job per window for the same single evaluation. Column-pruned
            # first: the gates consumed the wide profile/detail columns
            # already — caching them would double the checkpoint bytes.
            t0 = time.time()
            pregate = (
                cand.withColumn("ts", ts_e)
                .withColumn("row_ok", row_ok_e)
                .select("url_canon", "site", "seed_index", "page", "dom_pos",
                        "order_key", "title", "img", "origin", "time_source",
                        "fuzzy_dedup", "d_summary", "d_img", "ts", "row_ok",
                        F.col("href").alias("original_url"))
            )
            pregate_pre = None
            if os.environ.get("NCS_PHASE_DEBUG"):
                pregate._jdf.queryExecution().executedPlan()
                _clock("pregate_plan", t0)
                if os.environ.get("NCS_PLAN_DEBUG"):
                    pregate_pre = pregate
                t0 = time.time()
            pregate = pregate.localCheckpoint(eager=False)
            _clock("pregate_materialize", t0)

            # ---- stats job 1: ONE collect for item counts (A6 input),
            # stop-on-empty replay rows, and dispatch/gate counts ----------
            t0 = time.time()
            soe_sites = [s["site"] for s in active if prof_map[s["site"]].stop_on_empty]
            stats1 = (
                _tagged(
                    items.groupBy("seed_index", "page").agg(F.count("*").alias("n")),
                    "item", a=F.col("seed_index"), b=F.col("page"), c=F.col("n"),
                )
                .unionByName(_tagged(
                    pregate.filter(F.col("site").isin(soe_sites) & F.col("row_ok")),
                    "soe", a=F.col("seed_index"), b=F.col("page"),
                    c=F.col("dom_pos"), s=F.col("url_canon"),
                ))
                .unionByName(_tagged(dispatched.agg(F.count("*").alias("n")),
                                     "disp", c=F.col("n")))
                .unionByName(_tagged(gated.agg(F.count("*").alias("n")),
                                     "gated", c=F.col("n")))
            )
            if retries_next is not None:
                stats1 = stats1.unionByName(_tagged(
                    retries_next.agg(F.count("*").alias("n")), "retry", c=F.col("n")))
            if os.environ.get("NCS_PHASE_DEBUG"):
                tp = time.time()
                stats1._jdf.queryExecution().executedPlan()
                _clock("stats1_plan", tp)
            stats1 = stats1.toPandas()
            item_counts: dict[tuple[int, int], int] = {}
            soe_rows: list[tuple[int, int, int, str]] = []
            n_disp = n_gated = 0
            n_retry = 0
            for tag, a, b, c, s_ in zip(stats1["tag"], stats1["a"], stats1["b"],
                                        stats1["c"], stats1["s"]):
                if tag == "item":
                    item_counts[(int(a), int(b))] = int(c)
                elif tag == "soe":
                    soe_rows.append((int(a), int(b), int(c), s_))
                elif tag == "disp":
                    n_disp = int(c)
                elif tag == "retry":
                    n_retry = int(c)
                else:
                    n_gated = int(c)
            if n_disp != n_gated:
                raise BudgetShortfall(
                    f"scheduler dispatched {n_disp} of {n_gated} robots-allowed due "
                    f"pages in window {batch}; widen window_s or lower K"
                )
            _clock("stats1", t0)
            if pregate_pre is not None and batch <= 1:
                print("PREGATE_FINAL_PLAN\n"
                      + pregate_pre._jdf.queryExecution().executedPlan().toString())

            # ---- driver-side stop replay (exact A6; bounded by window rows)
            t0 = time.time()
            limits = _stop_replay(active, prof_map, item_counts, soe_rows, p0, p1)
            _clock("stop_replay", t0)
            t0 = time.time()

            # ---- mask + in-window first-occurrence dedup (D2) -----------
            # The mask join is only built when some stop rule actually
            # bound below the window's last due page — the common window
            # (no seed stopped) keeps every row by construction, so the
            # join + filter would be a per-window no-op job.
            def _last_due(s) -> int:
                return min(p1, s["max_pages"]) if s["max_pages"] else p1

            if any(limits[s["seed_index"]] < _last_due(s) for s in active):
                limit_df = spark.createDataFrame(
                    pd.DataFrame(
                        [(s["seed_index"], limits[s["seed_index"]]) for s in active],
                        columns=["seed_index", "page_limit"],
                    ),
                    "seed_index int, page_limit int",
                ).coalesce(1)  # parallelize defaults to 32 near-empty slices
                # left join: retried rows from earlier windows (or stopped
                # seeds) have no limit row — the window mask applies only to
                # the current window's pages
                masked = pregate.join(F.broadcast(limit_df), on="seed_index", how="left").filter(
                    F.col("page_limit").isNull() | (F.col("page") <= F.col("page_limit"))
                )
            else:
                masked = pregate
            # first occurrence among ACCEPTABLE rows only — the oracle claims a
            # URL on accept; a rejected earlier occurrence never blocks
            first_occ = (
                masked.filter(F.col("row_ok"))
                .withColumn("rn", F.row_number().over(w_dedup))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )

            # ---- fuzzy replay (D4, last gate): prior titles ride the
            # shuffle as flagged rows — constant-size closure --------------
            fuzzy_cand = first_occ.filter(F.col("fuzzy_dedup"))
            plain = first_occ.filter(~F.col("fuzzy_dedup"))
            gated_fz = fuzzy_gate(
                fuzzy_cand.select("site", "order_key", "url_canon", "title"),
                fuzzy_mem,
            ).select("url_canon")
            accepted = plain.unionByName(
                fuzzy_cand.join(gated_fz, on="url_canon", how="left_semi")
            )

            # ---- document assembly (P4) ---------------------------------
            docs = accepted.select(
                F.md5(F.col("url_canon")).alias("doc_id"),
                spans_e.alias("spans"),
                # the reference record keeps the raw href next to the
                # canonical key (Nate_Crawler.py:126-132 'original_url',
                # Google_Crawler.py:248-254)
                F.col("url_canon"), F.col("original_url"),
                F.col("site"), F.col("ts"),
                F.col("order_key").alias("crawl_order"),
                F.lit(batch).alias("batch_id"),
                F.col("seed_index"), F.col("page"),
                norm_title_e.alias("norm_title"),
                F.col("fuzzy_dedup"),
            )
            if os.environ.get("NCS_PHASE_DEBUG"):
                tp = time.time()
                docs._jdf.queryExecution().executedPlan()
                _clock("docs_plan", tp)
            docs = docs.localCheckpoint(eager=False)
            # LAZY checkpoint: caches like persist() AND truncates the
            # logical plan at creation (no extra job — stats2 below is
            # the materializing action). Truncation here is structural,
            # not cosmetic: docs' lineage embeds fuzzy_gate(fuzzy_mem),
            # and fuzzy_mem's deltas are built FROM prior docs — without
            # severing, the state plans double per window (2^W nodes by
            # window W; observed as minutes-long Catalyst stalls by
            # window 4 at K=1). Same reasoning for the delta/head
            # checkpoints below.
            _clock("dag_build", t0)

            # ---- stats job 2: accept counts. Window-bounded windows
            # (items <= driver_stats_max_rows) collect the accepted
            # (seed, page, url) rows instead of pre-aggregated counts:
            # ONE job then yields accept counts AND the bloom/cuckoo
            # filter delta (driver-side numpy twins of the shard
            # builders) — the per-window applyInPandas+collect filter
            # job disappears. Larger windows keep the aggregate+job path.
            t0 = time.time()
            n_items_total = sum(item_counts.values())
            fuse_stats = n_items_total <= driver_stats_max_rows
            # small windows also piggyback the HEAD-LIST scalars on the
            # same collect (title/time/img/summary can be long strings, so
            # the cap is tighter than the count-stats cap): the top-50 is
            # then maintained driver-side and committed as a LocalTable —
            # one fewer Spark job per window
            fuse_head = fuse_stats and n_items_total <= driver_head_max_rows
            accept_urls = None
            fz_rows = None
            pid_counts = None
            if fuse_stats:
                # site/norm_title/crawl_order piggyback on the same single
                # collect: the fuzzy-title delta then commits driver-side
                # (LocalTable) like the seen delta — no per-window job
                sel = [F.col("seed_index"), F.col("page"), F.col("url_canon"),
                       F.col("site"), F.col("norm_title"), F.col("crawl_order"),
                       F.col("fuzzy_dedup"), F.spark_partition_id().alias("pid")]
                if fuse_head:
                    sel += article_scalar_fields() + [F.col("original_url"),
                                                      F.col("ts")]
                ac = docs.select(*sel).toPandas()
                g = ac.groupby(["seed_index", "page"]).size()
                acc_counts = {(int(k[0]), int(k[1])): int(v) for k, v in g.items()}
                accept_urls = ac["url_canon"]
                fz = ac[ac["fuzzy_dedup"]]
                fz_rows = list(zip(fz["site"], fz["norm_title"],
                                   (int(x) for x in fz["crawl_order"])))
                pid_counts = {int(k): int(v)
                              for k, v in ac.groupby("pid").size().items()}
            else:
                ac = docs.groupBy("seed_index", "page").agg(F.count("*").alias("n")).toPandas()
                acc_counts = {
                    (int(s_), int(p)): int(n)
                    for s_, p, n in zip(ac["seed_index"], ac["page"], ac["n"])
                }
            n_accepted = sum(acc_counts.values())
            _clock("stats2", t0)
            t0 = time.time()

            # ---- pagination state for next window ------------------------
            for s in active:
                si = s["seed_index"]
                last_due = min(p1, s["max_pages"]) if s["max_pages"] else p1
                if limits[si] < last_due:
                    s["active"] = False  # stop rule fired inside the window
                elif item_counts.get((si, last_due), 0) == 0:
                    s["active"] = False  # final window page was empty
                elif (prof_map[s["site"]].stop_on_empty
                      and acc_counts.get((si, last_due), 0) == 0):
                    s["active"] = False  # final page accepted nothing

            # ---- cross-window state (in-memory, committed async) ---------
            seen_delta = docs.select("url_canon").localCheckpoint(eager=False)
            seen_chain.append(seen_delta)
            res.max_union_depth = max(res.max_union_depth, len(seen_chain))
            new_seen = seen_mem.unionByName(seen_delta) if seen_mem is not None else seen_delta
            fz_delta = (
                docs.filter(F.col("fuzzy_dedup"))
                .select("site", "norm_title", F.col("crawl_order").alias("seq"))
                .localCheckpoint(eager=False)
            )
            fuzzy_chain.append(fz_delta)
            new_fuzzy = fuzzy_mem.unionByName(fz_delta) if fuzzy_mem is not None else fz_delta

            # filter update: collect only the DELTA (one small job on the
            # cached seen_delta), merge/insert driver-side in numpy
            overwrite: dict[str, DataFrame] = {}
            if seen_filter == "bloom":
                if accept_urls is not None:
                    delta_rows = bloom.rows_from_urls(
                        accept_urls, n_shards=n_bloom_shards, version=batch)
                else:
                    delta_rows = [r.asDict() for r in bloom.build_shards(
                        seen_delta, n_shards=n_bloom_shards, version=batch).collect()]
                shard_rows = bloom.merge_rows(shard_rows, delta_rows)
                # driver rows → pyarrow commit write: no per-window 1-task
                # Spark job per state table (the K=1 window floor was job
                # count, not bytes — see LocalTable)
                overwrite["bloom_shards"] = LocalTable(
                    [(int(r["shard_id"]), int(r["n_bits"]), int(r["n_hashes"]),
                      bytes(r["bits"]), int(r["version"])) for r in shard_rows],
                    bloom.BLOOM_SCHEMA)
            elif seen_filter == "cuckoo":
                if accept_urls is not None:
                    fps_rows = cuckoo.fps_rows_from_urls(
                        accept_urls, n_shards=n_bloom_shards)
                else:
                    fps_rows = [r.asDict() for r in cuckoo.delta_fps(
                        seen_delta, n_shards=n_bloom_shards).collect()]
                shard_rows = cuckoo.insert_rows(shard_rows, fps_rows,
                                                n_shards=n_bloom_shards)
                overwrite["cuckoo_shards"] = LocalTable(
                    [(int(r["shard_id"]), int(r["n_buckets"]), bytes(r["table"]),
                      int(r["version"]), int(r["n_items"])) for r in shard_rows],
                    cuckoo.CUCKOO_SCHEMA)

            frontier_rows = [
                (s["seed_index"], s["site"], s["url"], p1 + 1, s["max_pages"], "pending")
                for s in seed_state if s["active"]
            ]
            new_frontier = spark.createDataFrame(
                pd.DataFrame(
                    frontier_rows or [(-1, "", "", -1, -1, "none")],
                    columns=["seed_index", "site", "url_base", "next_page",
                             "max_pages", "status"],
                ),
                FRONTIER_SCHEMA,
            ).coalesce(1).filter(F.col("seed_index") >= 0).persist()

            # C5 failure routing: non-200 / missing listings are logged as
            # failed|missing rather than silently dropped (per-article
            # try/except → sentinel, Daum_crawler.py:71-73,
            # Google_Crawler.py:259-267). C2: deterministic per-dispatch
            # user_agent from the hash family (Google_Crawler.py:57,152).
            frontier_log = (
                dispatched.select("url_canon", "site", "seed_index", "page",
                                  "attempt", "next_fetch_after")
                .withColumn("user_agent", ua_expr(F.col("url_canon")))
                .join(win_listings.select("url_canon", "http_status"), on="url_canon", how="left")
                .withColumn(
                    "status",
                    F.when(F.col("http_status") == 200, F.lit("fetched"))
                    .when(F.col("http_status").isNotNull(), F.lit("failed"))
                    .otherwise(F.lit("missing")),
                )
                .drop("http_status")
                .withColumn("depth", F.lit(0))
                .withColumn("batch_id", F.lit(batch))
            )
            # article-detail fetches are frontier rows too (depth 1): the
            # frontier log lists every URL the engine fetched this window
            article_log = docs.select(
                "url_canon", "site", "seed_index", "page",
                F.lit(0).alias("attempt"),
                F.lit(None).cast("timestamp").alias("next_fetch_after"),
                ua_expr(F.col("url_canon")).alias("user_agent"),
                F.lit("fetched").alias("status"),
                F.lit(1).alias("depth"),
                F.lit(batch).alias("batch_id"),
            )
            frontier_log = frontier_log.unionByName(article_log)

            # ---- per-partition lineage/metrics (north rule) ---------------
            stage_rows = [
                (batch, "dispatch", -1, n_gated, n_disp,
                 stage_wall.get("stats1", 0)),
                (batch, "parse", -1, n_disp, n_items_total,
                 stage_wall.get("pregate_materialize", 0)),
                (batch, "accept", -1, n_items_total, n_accepted,
                 stage_wall.get("stats2", 0)),
            ]
            if pid_counts is not None:
                # fused window: the partition ids rode the stats2 collect —
                # the lineage rows are driver-held, no metrics write job
                metrics = LocalTable(
                    stage_rows + [
                        (batch, "accept_partition", pid, n_items_total, n, 0)
                        for pid, n in sorted(pid_counts.items())
                    ],
                    METRICS_SCHEMA)
            else:
                part_metrics = docs.groupBy(
                    F.spark_partition_id().alias("partition_id")
                ).agg(F.count("*").alias("rows_out")).select(
                    F.lit(batch).cast("int").alias("batch_id"),
                    F.lit("accept_partition").alias("stage"),
                    F.col("partition_id").cast("int"),
                    F.lit(n_items_total).cast("long").alias("rows_in"),
                    F.col("rows_out").cast("long"),
                    F.lit(0).cast("long").alias("wall_ms"),
                )
                metrics = spark.createDataFrame(
                    stage_rows, METRICS_SCHEMA,
                ).coalesce(1).unionByName(part_metrics)

            # S9: the reference maintains a global 50-newest news.json
            # every run (utils.js:18-23); the engine keeps it as an
            # incrementally-merged 50-row overwrite table — new docs'
            # top-k vs the previous head, never a full-table sort.
            # Fused small windows (fuse_head): the head scalars rode the
            # stats2 collect, so the merge runs driver-side and commits
            # as a LocalTable — no per-window head Spark job at K=1.
            new_head = None
            if fuse_head:
                if head_rows is None:
                    if head_mem is not None:
                        # one-time conversion (resume / after a big window):
                        # 50 rows — bounded collect. Defer the unpersist to
                        # the post-wait_commit drain: the in-flight commit
                        # may still be writing this DataFrame.
                        head_rows = [tuple(r) for r in head_mem.select(
                            "title", "time", "img", "summary", "url",
                            "original_url", "site", "ts", "crawl_order"
                        ).collect()]
                        prev_unpersist.append(head_mem)
                        head_mem = None
                    else:
                        head_rows = []
                new_rows = list(zip(
                    ac["title"], ac["time"], ac["img"], ac["summary"],
                    ac["url_canon"], ac["original_url"], ac["site"],
                    (t.to_pydatetime() for t in ac["ts"]),
                    (int(x) for x in ac["crawl_order"]),
                ))
                merged = head_rows + new_rows
                merged.sort(key=lambda r: r[8])                # crawl_order asc
                merged.sort(key=lambda r: r[7], reverse=True)  # ts desc, stable
                head_rows = merged[:50]
                overwrite["head_list"] = LocalTable(head_rows, HEAD_SCHEMA)
            else:
                if head_mem is None and head_rows is not None:
                    # back to the Spark path (window outgrew the driver
                    # cap): 50 rows — a LocalRelation, no job
                    head_mem = spark.createDataFrame(head_rows, HEAD_SCHEMA)
                    head_rows = None
                win_head = docs.select(*head_fields())
                new_head = (
                    head_mem.unionByName(win_head) if head_mem is not None else win_head
                ).orderBy(F.desc("ts"), F.col("crawl_order")).limit(50) \
                    .localCheckpoint(eager=False)  # cap the union-of-unions depth
                overwrite["head_list"] = new_head
            overwrite["seed_state"] = LocalTable(
                [tuple(s[k] for k in ("seed_index", "site", "url",
                                      "max_pages", "active"))
                 for s in seed_state],
                SEED_STATE_SCHEMA)
            overwrite["frontier_pending"] = LocalTable(
                frontier_rows, FRONTIER_SCHEMA)
            if retries_next is not None:
                overwrite["retry_pending"] = retries_next
            _clock("prep", t0)

            # ---- async snapshot commit (C6): wait for the previous
            # window's commit (manifest swaps stay ordered), release its
            # cached inputs, then write this window in the background while
            # the next window's DAG builds and runs -------------------------
            t0 = time.time()
            store.wait_commit()
            for df in prev_unpersist:
                df.unpersist()
            bloom.destroy_broadcasts(prev_probe_bcs)
            prev_probe_bcs = []
            _clock("commit_wait", t0)
            t0 = time.time()
            # size the write partitioning to the window: a K=1 window of a
            # few hundred rows must not emit 32 files x 4 tables (and 32
            # tasks each) per commit; big windows keep their parallelism
            w_docs = max(1, min(n_parts, n_accepted // 100_000 + 1))
            w_log = max(1, min(n_parts, (n_disp + n_accepted) // 100_000 + 1))
            append_tables = {
                "documents": docs.drop("seed_index", "page", "norm_title",
                                       "fuzzy_dedup").coalesce(w_docs),
                # fused windows already collected the accepted URLs for
                # the stats/filter twins — the seen delta is driver rows
                "seen": (LocalTable([(u,) for u in accept_urls],
                                    "url_canon string")
                         if accept_urls is not None
                         else seen_delta.coalesce(w_docs)),
                # append-mode deltas: the old overwrite re-evaluated and
                # rewrote the WHOLE fuzzy union chain every window; the
                # title set only ever grows, so committed deltas read
                # back as the same full set (fused windows: driver rows)
                "fuzzy_titles": (LocalTable(fz_rows, FUZZY_SCHEMA)
                                 if fz_rows is not None
                                 else fz_delta.coalesce(1)),
                "frontier_log": frontier_log.coalesce(w_log),
                "metrics": (metrics if isinstance(metrics, LocalTable)
                            else metrics.coalesce(1)),
            }
            # Empty-window write elision (retry-drain tails at K=1): a
            # zero-row append is a pure job + manifest-delta tax. Only
            # elide once the table provably exists from an earlier commit
            # (resume or a prior accepting window) so first-window readers
            # always find their tables.
            if n_accepted == 0 and (_had_snapshot or res.accepted > 0):
                for t in ("documents", "seen", "fuzzy_titles"):
                    del append_tables[t]
            if n_disp + n_accepted == 0 and (_had_snapshot or res.dispatched > 0):
                append_tables.pop("frontier_log", None)
            store.commit_async(
                batch,
                overwrite=overwrite,
                append=append_tables,
                meta={"pages": [p0, p1],
                      "active_seeds": sum(1 for s in seed_state if s["active"]),
                      "retries_pending": n_retry},
            )
            _clock("commit_submit", t0)

            prev_unpersist = [docs, pregate, items, dispatched, gated, frontier_mem]
            prev_probe_bcs = bloom.drain_probe_broadcasts()
            if retry_mem is not None:
                prev_unpersist.append(retry_mem)
            if new_head is not None:  # Spark-path head window
                if head_mem is not None:
                    prev_unpersist.append(head_mem)
                head_mem = new_head
            retry_mem = retries_next
            seen_mem, fuzzy_mem, frontier_mem = new_seen, new_fuzzy, new_frontier

            res.batches += 1
            since_compact += 1
            seen_rows_total += n_accepted
            # Nudge the JVM so the ContextCleaner reclaims the previous
            # windows' checkpoint RDDs and broadcasts NOW: their py4j
            # proxies just died, but without a GC the weak refs never
            # enqueue and a long run accretes them until the heap
            # thrashes (observed: minutes-long unpersist calls, then
            # OOM). A full GC of a healthy heap costs ~100-300 ms.
            if res.batches % 8 == 0:
                spark.sparkContext._jvm.System.gc()
            res.dispatched += n_disp
            res.items += n_items_total
            res.accepted += n_accepted
            res.frontier_rows += n_disp + n_accepted + len(frontier_rows)
            stage_wall["window_total"] = int((time.time() - _t_win) * 1000)
            res.per_batch.append(
                {"batch": batch, "pages": [p0, p1], "dispatched": n_disp,
                 "items": n_items_total, "accepted": n_accepted, "wall_ms": stage_wall}
            )
            if fail_after_batch is not None and batch >= fail_after_batch:
                store.wait_commit()
                raise InjectedFailure(f"injected failure after batch {batch}")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", _aqe_prev)
        store.wait_commit()
        for df in prev_unpersist + seen_chain + fuzzy_chain:
            df.unpersist()
        bloom.destroy_broadcasts(prev_probe_bcs + bloom.drain_probe_broadcasts())
        if fuzzy_ckpt is not None:
            fuzzy_ckpt.unpersist()
        if frontier_mem is not None:
            frontier_mem.unpersist()
        if retry_mem is not None:
            retry_mem.unpersist()
        if head_mem is not None:
            head_mem.unpersist()
        if robots_from_corpus:
            robots.unpersist()
        if cache_corpus:
            articles.unpersist()
    return res


# ---------------------------------------------------------------- helpers

def _stop_replay(
    active: list[dict],
    prof_map: dict[str, object],
    item_counts: dict[tuple[int, int], int],
    soe_rows: list[tuple[int, int, int, str]],
    p0: int,
    p1: int,
) -> dict[int, int]:
    """Exact per-seed page limits for this window — pure driver-side
    computation over the stats job's collected rows.

    Non-stop-on-empty seeds stop only on an empty/missing page (or page
    cap). Stop-on-empty sites additionally stop on a page with items but
    zero accepts — acceptance depends on in-window URL claims, which
    never cross sites, so the sequential rule is replayed driver-side
    over ONLY those sites' window candidates (``soe_rows``, bounded by
    pages_per_batch × seeds × items/page, independent of corpus size;
    SURVEY §2.7 A6; Gukje_Crawler.py:149-151, Nate_Crawler.py:190-192).
    """
    limits: dict[int, int] = {}
    soe_sites = {s["site"] for s in active if prof_map[s["site"]].stop_on_empty}
    by_site_seed: dict[str, list[dict]] = defaultdict(list)
    seed_site = {s["seed_index"]: s["site"] for s in active}
    for s in active:
        by_site_seed[s["site"]].append(s)

    # empty-page limits apply to every seed
    for s in active:
        si = s["seed_index"]
        last = min(p1, s["max_pages"]) if s["max_pages"] else p1
        lim = last
        for p in range(p0, last + 1):
            if item_counts.get((si, p), 0) == 0:
                lim = p  # page p processed (empty) then stop
                break
        limits[si] = lim

    if not soe_sites:
        return limits

    # Only row_ok rows can claim a URL or count toward acceptance; rejected
    # rows are no-ops in the sequential rule (empty-page detection uses
    # item_counts, gathered in the same stats job).
    per_cell: dict[tuple[int, int], list] = defaultdict(list)
    for si, p, dp, u in soe_rows:
        if si in seed_site:
            per_cell[(si, p)].append((dp, u))

    for site in sorted(soe_sites):
        site_seeds = sorted(by_site_seed[site], key=lambda s: s["seed_index"])
        claimed: set[str] = set()
        stopped: set[int] = set()
        for p in range(p0, p1 + 1):
            for s in site_seeds:
                si = s["seed_index"]
                if si in stopped or p > limits[si]:
                    continue
                if item_counts.get((si, p), 0) == 0:
                    stopped.add(si)  # limit already set by empty-page pass
                    continue
                acc = 0
                for _dp, u in sorted(per_cell.get((si, p), [])):
                    if u in claimed:
                        continue
                    claimed.add(u)
                    acc += 1
                if acc == 0:
                    limits[si] = min(limits[si], p)
                    stopped.add(si)
    return limits
