"""Two-cluster-size scaling evidence (BASELINE.json north_rule, sandbox
variant): run the SAME crawl job on the SAME parquet world at local[N]
and local[4N] in separate JVMs, report throughput at both plus the
scaling efficiency (speedup / 4), and write BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [N] [scale] [site_mult] [K]
Defaults: N=2 (→ 2 vs 8 cores; this host is noisy past ~8-16
threads — CLAUDE.md), scale=8, mult=96, K=128.

Each measurement is a fresh `python -c` subprocess so JVM thread pools,
shuffle partitions, and memory are sized for that parallelism level only
— one process can't honestly measure both."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = """
import json, shutil, time, sys
sys.path.insert(0, {repo!r})
from news_crawler_spark.session import get_spark
from news_crawler_spark.sources.world import read_world
from news_crawler_spark.sources.store import SnapshotStore
from news_crawler_spark.plans.crawl import run_crawl

spark = get_spark(cores={cores}, shuffle_partitions={cores},
                  extra_conf={{"spark.sql.ansi.enabled": "false"}})
world = read_world(spark, {world_dir!r})
store = SnapshotStore({store_dir!r})
t0 = time.time()
res = run_crawl(spark, world, store, use_bloom=True, pages_per_batch={K},
                cache_corpus=True)
wall = time.time() - t0
fetched = res.dispatched + res.accepted
print("RESULT " + json.dumps({{
    "cores": {cores}, "wall_s": round(wall, 2),
    "fetched": fetched, "accepted": res.accepted,
    "fetched_urls_per_sec": round(fetched / wall, 1),
    "frontier_rows_per_sec": round(res.frontier_rows / wall, 1),
}}))
spark.stop()
"""

BUILD_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
from news_crawler_spark.session import get_spark
from news_crawler_spark.sources.world import write_world
spark = get_spark(cores=32, extra_conf={{"spark.sql.ansi.enabled": "false"}})
write_world(spark, {world_dir!r}, {scale}, distributed=True, site_mult={mult})
spark.stop()
"""


def run_py(snippet: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True, cwd=REPO
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return out.stdout


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    tmp = tempfile.mkdtemp(prefix="scaling_")
    world_dir = f"{tmp}/world"
    print(f"building world scale={scale} mult={mult} …", flush=True)
    run_py(BUILD_SNIPPET.format(repo=REPO, world_dir=world_dir, scale=scale, mult=mult))

    results = {}
    for cores in (n, 4 * n):
        store_dir = f"{tmp}/store_{cores}"
        print(f"running crawl at local[{cores}] …", flush=True)
        out = run_py(RUN_SNIPPET.format(
            repo=REPO, cores=cores, world_dir=world_dir, store_dir=store_dir, K=K
        ))
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        results[cores] = json.loads(line[len("RESULT "):])
        print(" ", results[cores], flush=True)

    lo, hi = results[n], results[4 * n]
    assert lo["accepted"] == hi["accepted"], "parallelism changed the result set!"
    speedup = lo["wall_s"] / hi["wall_s"]
    efficiency = speedup / 4.0
    # throughput-ratio form of the same number
    thr_eff = (hi["fetched_urls_per_sec"] / lo["fetched_urls_per_sec"]) / 4.0

    md = f"""# BENCH/BASELINE — measured results

## Scaling efficiency (north_rule two-cluster-size criterion, sandbox variant)

Same job, same parquet world (synth scale={scale}, site_mult={mult} ⇒
{mult * 10} hosts, K={K} pages/micro-batch), two parallelism levels in
separate JVMs. The accepted-document set is identical at both levels
(asserted) — parallelism changes throughput, never results.

| cores | wall (s) | fetched URLs/s | frontier rows/s |
|---|---|---|---|
| local[{n}] | {lo['wall_s']} | {lo['fetched_urls_per_sec']} | {lo['frontier_rows_per_sec']} |
| local[{4 * n}] | {hi['wall_s']} | {hi['fetched_urls_per_sec']} | {hi['frontier_rows_per_sec']} |

- speedup {n}→{4 * n} cores: **{speedup:.2f}×** (ideal 4×)
- scaling efficiency: **{efficiency:.2f}** (wall-clock form) / {thr_eff:.2f}
  (throughput form) — target ≥ 0.8 (BASELINE.json)

## Reference comparison

The reference's implied ceiling is 0.1–5 fetched URLs/sec per site
process (sleep- and thread-bound; BASELINE.md rows 1–5). This engine
sustains {hi['fetched_urls_per_sec']} fetched URLs/s on one node at
local[{4 * n}] with exact crawl-order/URL-seen/span parity
(tests/test_parity.py), and the per-host politeness budget is enforced
by the scheduler rather than wall-clock sleeps — throughput scales with
hosts and cores, not with per-process sleep budgets.

Raw: {json.dumps(results)}
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)
    print(f"wrote {out_path}\nefficiency={efficiency:.2f}")


if __name__ == "__main__":
    main()
