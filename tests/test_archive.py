"""Archive sinks (S6/S9): day-grouped nested archive + head list over
crawled documents, checked against a driver-side recomputation from the
golden run."""

import datetime as dt

import pytest

from news_crawler_spark.operators.archive import day_grouped_archive, head_list
from news_crawler_spark.plans.crawl import run_crawl
from news_crawler_spark.sources.store import SnapshotStore


@pytest.fixture(scope="module")
def documents(spark, world, tmp_path_factory):
    store = SnapshotStore(str(tmp_path_factory.mktemp("archive_store")))
    run_crawl(spark, world, store, use_bloom=False, pages_per_batch=8)
    return store.read(spark, "documents")


def test_day_groups_match_golden(spark, golden, documents):
    got = day_grouped_archive(documents).collect()
    # recompute expected groups from the golden run
    by_key: dict[tuple, list] = {}
    for did, meta in golden.meta.items():
        key = (meta["site"], meta["ts"].date())
        by_key.setdefault(key, []).append((meta["ts"], did))
    assert len(got) == len(by_key)
    for r in got:
        # Korean date key shape: 'YYYY년 MM월 DD일 요일'
        assert "년" in r.date_key and "일" in r.date_key
        # articles are newest-first within the day
        times = [a["time"] for a in r.articles]
        assert times == sorted(times, reverse=True)
    n_articles = sum(len(r.articles) for r in got)
    assert n_articles == len(golden.docs)


def test_head_list_matches_golden(spark, golden, documents):
    got = head_list(documents, k=20).collect()
    # golden newest-20 by (ts desc, crawl order)
    order_of = {u: i for i, u in enumerate(golden.order)}
    ranked = sorted(
        golden.meta.values(), key=lambda m: (-m["ts"].timestamp(), order_of[m["url_canon"]])
    )[:20]
    assert [r.url for r in got] == [m["url_canon"] for m in ranked]
    assert all(isinstance(r.title, str) and r.title for r in got)


def test_head_list_plan_is_take_ordered(spark, documents):
    plan = head_list(documents, k=50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
