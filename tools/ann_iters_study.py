"""IVF k-means iters-vs-recall study (round-4 VERDICT #6): measure
planted-twin recall and train/probe walls at iters ∈ {3, 5, 10} on the
bench's sf0.1 ANN world. Writes BENCH/ann_iters_study.json; bench.py's
default BENCH_IVF_ITERS is pinned to the smallest iters whose recall
matches the iters=10 value.

Usage: python tools/ann_iters_study.py [sf_dir] [iters ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from news_crawler_spark.operators.ann_eval import plant_twins
    from news_crawler_spark.operators.similarity import (
        ivf_assign, ivf_candidates, ivf_train)
    from news_crawler_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters_grid = [int(x) for x in sys.argv[2:]] or [3, 5, 10]

    spark = get_spark("ann_iters", extra_conf={"spark.sql.ansi.enabled": "false"})
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    world = plant_twins(em).persist()
    n = world.count()
    n_twins = world.filter(F.col("vec_id") >= 100_000).count()
    probes = world.filter(F.col("vec_id") >= 100_000).select(
        F.col("vec_id").alias("qid"))
    w_ann = Window.partitionBy("qid").orderBy(F.desc("cos"), F.col("vec_id"))

    rows = []
    for iters in iters_grid:
        t0 = time.time()
        cent = ivf_train(world, n_centroids=32, iters=iters)
        train_s = time.time() - t0
        t0 = time.time()
        assigned = ivf_assign(world, cent).persist()
        cand = ivf_candidates(assigned, cent, probes, nprobe=2).persist()
        n_cand = cand.count()
        hits = (
            cand.withColumn("r", F.row_number().over(w_ann))
            .filter((F.col("r") <= 5) & (F.col("vec_id") == F.col("qid") - 100_000))
            .count()
        )
        probe_s = time.time() - t0
        cand.unpersist()
        assigned.unpersist()
        rows.append({
            "iters": iters,
            "recall": round(hits / n_twins, 3),
            "candidates": n_cand,
            "train_wall_s": round(train_s, 2),
            "probe_wall_s": round(probe_s, 2),
        })
        print(rows[-1], flush=True)
    world.unpersist()
    spark.stop()

    out = {
        "sf_dir": sf_dir, "n_vectors": n, "planted_pairs": n_twins,
        "n_centroids": 32, "nprobe": 2, "k": 5,
        "grid": rows,
        "ts": int(time.time()),
    }
    path = os.path.join(REPO, "BENCH", "ann_iters_study.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
