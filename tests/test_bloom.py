"""Bloom shard prefilter: never a false negative (exactness — SURVEY
§7.3 'Bloom ∧ exactness'), OR-merge idempotence, and routing stats."""

from pyspark.sql import functions as F

from news_crawler_spark.operators import bloom


def _urls(prefix, n):
    return [(f"https://example.com/{prefix}/{i}",) for i in range(n)]


def test_no_false_negatives_and_routing(spark):
    seen = spark.createDataFrame(_urls("seen", 500), "url_canon string")
    shards = bloom.build_shards(seen, n_shards=8, n_bits=1 << 14)
    cand = spark.createDataFrame(_urls("seen", 500) + _urls("new", 500), "url_canon string")
    flagged = bloom.probe(cand, shards, n_shards=8)
    rows = flagged.collect()
    for r in rows:
        if "/seen/" in r.url_canon:
            assert r.maybe_seen, f"false negative: {r.url_canon}"
    # the filter must prune most definitely-new urls (fp rate sanity)
    fp = sum(1 for r in rows if "/new/" in r.url_canon and r.maybe_seen)
    assert fp < 50


def test_dedup_new_exact(spark):
    seen = spark.createDataFrame(_urls("seen", 300), "url_canon string")
    shards = bloom.build_shards(seen, n_shards=8, n_bits=1 << 14)
    cand = spark.createDataFrame(_urls("seen", 300) + _urls("new", 300), "url_canon string")
    out = {r.url_canon for r in bloom.dedup_new(cand, seen, shards, n_shards=8).collect()}
    assert out == {u for (u,) in _urls("new", 300)}


def test_merge_shards_idempotent(spark):
    a = bloom.build_shards(
        spark.createDataFrame(_urls("a", 100), "url_canon string"), n_shards=4, n_bits=1 << 12
    )
    b = bloom.build_shards(
        spark.createDataFrame(_urls("b", 100), "url_canon string"), n_shards=4, n_bits=1 << 12
    )
    ab = bloom.merge_shards(a, b)
    ab2 = bloom.merge_shards(ab, b)  # re-merging the same delta: no-op
    m1 = {r.shard_id: r.bits for r in ab.collect()}
    m2 = {r.shard_id: r.bits for r in ab2.collect()}
    assert m1 == m2


def test_shard_routing_matches_python_hash(spark):
    df = spark.createDataFrame(_urls("x", 200), "url_canon string")
    got = df.select("url_canon", bloom.shard_id_col(F.col("url_canon"), 32).alias("sid")).collect()
    import hashlib

    for r in got:
        h1 = int.from_bytes(hashlib.md5(r.url_canon.encode()).digest()[:8], "big")
        assert r.sid == h1 % 32


def test_probe_broadcast_registry_lifecycle(spark):
    # probe_broadcast registers its sc.broadcast handle as a WEAKref:
    # the crawl loop drains the registry per window and destroys the
    # handles once no live plan can re-evaluate them; one-shot callers
    # never drain and must keep the normal ContextCleaner lifecycle
    # (a weakref cannot pin the handle alive).
    seen = spark.createDataFrame(_urls("seen", 20), "url_canon string")
    shard_rows = bloom.build_shards(seen, n_shards=4, n_bits=1 << 12).collect()
    cand = spark.createDataFrame(_urls("seen", 20) + _urls("new", 20), "url_canon string")

    bloom.drain_probe_broadcasts()  # isolate from earlier tests
    flagged = bloom.probe_broadcast(cand, shard_rows, n_shards=4)
    refs = bloom.drain_probe_broadcasts()
    assert len(refs) == 1 and refs[0]() is not None  # live while the plan is
    assert flagged.filter(F.col("maybe_seen")).count() >= 20
    assert bloom.drain_probe_broadcasts() == []  # drain resets the registry

    # destroy after the plan is released: probing again must mint a fresh
    # working broadcast (destroyed handles are never reused)
    del flagged
    bloom.destroy_broadcasts(refs)
    out = {r.url_canon
           for r in bloom.dedup_new_rows(cand, seen, shard_rows, n_shards=4).collect()}
    assert out == {u for (u,) in _urls("new", 20)}
    bloom.destroy_broadcasts(bloom.drain_probe_broadcasts())


def test_broadcast_probe_with_empty_shards(spark):
    # only 3 urls → most of the 32 configured shards have no committed row;
    # routing must still use the configured modulus (regression: a probe
    # keyed on len(present_shards) mis-routes and yields false negatives)
    seen = spark.createDataFrame(_urls("seen", 3), "url_canon string")
    shards = bloom.build_shards(seen, n_shards=32, n_bits=1 << 12)
    assert shards.count() <= 3
    cand = spark.createDataFrame(_urls("seen", 3) + _urls("new", 50), "url_canon string")
    out = {r.url_canon for r in bloom.dedup_new(cand, seen, shards, n_shards=32).collect()}
    assert out == {u for (u,) in _urls("new", 50)}
