"""Training-data operators: dedup family, similarity search, text stats,
multimodal plumbing — semantic sanity checks beyond the DuckDB oracle
equivalence (which tools/check_oracles.py and the driver cover)."""

import math

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.functions.textstats import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)
from news_crawler_spark.operators.multimodal import embed_image_stub, frame_sample, image_metadata
from news_crawler_spark.operators.similarity import brute_force_topk, cosine_expr, ivf_assign, ivf_topk
from news_crawler_spark.operators.textdedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_docs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base, "en"),
        (2, base, "en"),                                   # exact dup of 1
        (3, base.replace("today", "tonight"), "en"),       # near dup of 1
        (4, "completely different text about spark query engines and tables", "en"),
        (5, "el rapido zorro marron salta sobre el perro que duerme en la orilla", "es"),
        (6, "  the   quick brown fox jumps over the lazy dog near the river bank today ", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_normalizes_whitespace(spark, docs):
    out = {r.doc_id: r.n_dups for r in exact_dedup(docs).collect()}
    # docs 1, 2 and 6 share a fingerprint (whitespace-normalized)
    assert out[1] == 3
    assert sum(out.values()) == 6


def test_fingerprint_stability(spark, docs):
    fps = {r.doc_id: r.fp for r in docs.select("doc_id", fingerprint_expr(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[6]
    assert fps[1] != fps[3]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r.a, r.b) for r in
             minhash_lsh_pairs(docs, verify_jaccard=0.5).collect()}
    assert (1, 2) in pairs          # exact dup always collides
    assert (1, 6) in pairs
    assert not any(4 in p or 5 in p for p in pairs)  # unrelated docs never verified


def test_minhash_xxhash_arm_matches_md5_pairs(spark, docs):
    """The native xxhash64 signature arm (throughput path) must verify the
    SAME near-dup pair set as the md5 oracle arm — on a randomized corpus
    of planted near-dups plus unrelated fillers. Signatures/buckets come
    from different min-wise families, but every surviving pair passes the
    same exact-Jaccard filter, and planted near-dups collide in some band
    in both families at these (n_hashes, band_size) settings."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    did = 0
    for g in range(12):  # planted near-dup groups
        base = " ".join(rng.choice(vocab) for _ in range(40))
        rows.append((did, base, "en")); did += 1
        toks = base.split()
        toks[rng.randrange(len(toks))] = rng.choice(vocab)
        rows.append((did, " ".join(toks), "en")); did += 1
    for _ in range(30):  # unrelated fillers
        rows.append((did, " ".join(rng.choice(vocab) for _ in range(40)), "en"))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    md5_pairs = {(r.a, r.b, r.jac) for r in
                 minhash_lsh_pairs(df, verify_jaccard=0.5).collect()}
    xx_pairs = {(r.a, r.b, r.jac) for r in
                minhash_lsh_pairs(df, verify_jaccard=0.5,
                                  hash_family="xxhash64").collect()}
    assert md5_pairs == xx_pairs
    assert len(md5_pairs) >= 12  # every planted pair found


def test_ngram_jaccard_minhash_blocked(spark, docs):
    pairs = {(r.a, r.b): r.jac for r in
             ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0     # identical word sets share every band
    assert pairs[(1, 6)] == 1.0     # whitespace-only variant too
    assert (1, 4) not in pairs      # unrelated word sets never verified
    assert (1, 5) not in pairs


def test_ngram_jaccard_buckets_bounded(spark):
    """Scale guard (round-2 VERDICT d04): candidate blocks come from
    MinHash bands, so bucket size tracks true-duplicate cluster size —
    never |language|. At test scale on the driver testdata, no bucket
    exceeds a small bound while a lang block would hold hundreds."""
    import os

    from news_crawler_spark.operators.textdedup import (
        banded_buckets,
        minhash_signature_expr,
        shingles_expr,
        word_set_expr,
    )

    sfdir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    d = spark.read.parquet(f"{sfdir}/documents.parquet")
    sh = shingles_expr(F.col("text"), 3)
    sigs = d.select(F.col("doc_id").cast("long").alias("id"),
                    word_set_expr(F.col("text")).alias("ws"),
                    minhash_signature_expr(sh, 8).alias("sig"))
    sizes = banded_buckets(sigs, 2, 4).select(F.size("ms").alias("n"))
    mx = sizes.agg(F.max("n")).first()[0] or 0
    n_docs = d.count()
    n_langs = d.select("lang").distinct().count()
    assert mx <= 64                      # data-bounded buckets
    assert mx < n_docs / n_langs         # strictly better than lang blocks


def test_simhash_near_for_near_dups(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash_docs(docs).collect()}
    assert sh[1] == sh[2] == sh[6]
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near < ham_far
    assert all(0 <= v < (1 << 32) for v in sh.values())


def test_lang_and_quality(spark, docs):
    out = {r.doc_id: (r.lp, r.q, r.n) for r in docs.select(
        "doc_id",
        lang_id_expr(F.col("text")).alias("lp"),
        quality_score_expr(F.col("text")).alias("q"),
        token_count_expr(F.col("text")).alias("n"),
    ).collect()}
    assert out[1][0] == "en"
    assert out[5][0] == "es"
    assert 0.0 <= out[1][1] <= 1.0
    assert out[1][2] == 14


# ------------------------------------------------------------- similarity

@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 8).astype("float32")
    base[1] = base[0] + 0.01 * rng.randn(8).astype("float32")  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(spark, vectors):
    probes = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    top = [r.vec_id for r in brute_force_topk(vectors, probes, k=3)
           .orderBy("rank").collect()]
    assert top[0] == 1  # the planted near-dup is the nearest neighbor
    # cross-check against numpy
    import numpy as np

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in vectors.collect()}
    q = vecs[0]
    cos = {i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
           for i, v in vecs.items() if i != 0}
    expect = [i for i, _ in sorted(cos.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:3]]
    assert top == expect


def test_ivf_ann_recalls_planted_neighbor(spark, vectors):
    # centroids disjoint from the planted pair (a vector that IS a
    # centroid trivially owns its own cluster)
    cent = vectors.filter(F.col("vec_id") >= 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    assigned = ivf_assign(vectors, cent)
    # every vector lands in exactly one cluster
    assert assigned.count() == 20
    clusters = {r.vec_id: r.cluster for r in assigned.collect()}
    assert clusters[0] == clusters[1]  # near-identical vectors co-cluster
    probes = spark.createDataFrame([(0,)], "qid long")
    top = [r.vec_id for r in ivf_topk(assigned, probes, k=3).orderBy("rank").collect()]
    assert top and top[0] == 1  # near-dup ranks first within the cluster


def test_cosine_expr_range(spark, vectors):
    a = vectors.alias("a")
    b = vectors.alias("b")
    vals = [r.c for r in a.crossJoin(b.withColumnRenamed("embedding", "e2")
                                     .withColumnRenamed("vec_id", "v2"))
            .select(cosine_expr(F.col("embedding"), F.col("e2")).alias("c"))
            .collect()]
    assert all(-1.000001 <= v <= 1.000001 for v in vals)


# ------------------------------------------------------------- multimodal

def test_multimodal_plumbing(spark):
    rows = [(str(i), f"https://img/{i}.jpg", bytes([i]) * (10 + i)) for i in range(6)]
    media = spark.createDataFrame(rows, "doc_id string, media_ref string, payload binary")
    meta = image_metadata(media).collect()
    assert len(meta) == 6
    for r in meta:
        assert r.format in ("jpeg", "png", "webp")
        assert r.width >= 64 and r.height >= 64
        assert r.n_bytes == 10 + int(r.doc_id)
    # determinism: same payload → same metadata
    again = {r.doc_id: (r.format, r.width, r.height, r.digest)
             for r in image_metadata(media).collect()}
    assert {r.doc_id: (r.format, r.width, r.height, r.digest) for r in meta} == again

    frames = frame_sample(media).collect()
    assert all(1 <= len([f for f in frames if f.doc_id == str(i)]) <= 3 for i in range(6))

    emb = embed_image_stub(media, dim=8).collect()
    assert all(len(r.embedding) == 8 for r in emb)


def test_simhash_multiprobe_recall(spark):
    """Multi-probe (4 rotated blocks) must recover ≥90% of the exact
    hamming≤8 pairs that single-block d05 can miss (round-1 VERDICT #6)."""
    from pyspark.sql import functions as F

    from news_crawler_spark.operators.textdedup import (
        simhash_docs,
        simhash_near_pairs,
        simhash_near_pairs_multiprobe,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    sh = simhash_docs(d)
    a, b = sh.alias("a"), sh.alias("b")
    exact = {
        (r.a, r.b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
        )
        .filter(F.col("h") <= 8)
        .collect()
    }
    exact1 = {
        (r.a, r.b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
        )
        .filter(F.col("h") <= 1)
        .collect()
    }
    multi = {(r.a, r.b) for r in simhash_near_pairs_multiprobe(d, max_hamming=8).collect()}
    single = {(r.a, r.b) for r in simhash_near_pairs(d, max_hamming=8).collect()}
    assert multi <= exact  # no false pairs (verified by hamming)
    assert single <= multi  # strictly more probes → superset of single-block
    # guarantee: one differing bit invalidates only 2 of the 4 byte-aligned
    # 16-bit windows, so hamming ≤ 1 pairs are found EXHAUSTIVELY
    assert exact1 <= multi
    # and on this corpus the extra probes recover strictly more pairs
    if exact - single:
        assert len(multi) > len(single)


def test_ivf_nprobe2_recall_not_worse(spark):
    """nprobe=2 must match brute-force top-k at least as well as nprobe=1
    (boundary neighbors recovered)."""
    from pyspark.sql import functions as F

    from news_crawler_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        ivf_topk_nprobe,
    )

    em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = em.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    assigned = ivf_assign(em, cent)
    probes = em.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"))
    pv = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = {(r.qid, r.vec_id) for r in brute_force_topk(em, pv, k=5).collect()}
    n1 = {(r.qid, r.vec_id) for r in ivf_topk(assigned, probes, k=5).collect()}
    n2 = {(r.qid, r.vec_id) for r in ivf_topk_nprobe(assigned, cent, probes, k=5,
                                                     nprobe=2).collect()}
    assert len(n2 & truth) >= len(n1 & truth)
    assert len(n2 & truth) / len(truth) >= 0.5


def test_sign_lsh_recall_vs_exact(spark):
    """Round-3 gate: the banded B×T sign-LSH arm recovers ≥ 0.9 of the
    exact (e02) pairs at the same threshold, with perfect precision
    (every emitted pair is exact-cosine verified)."""
    from news_crawler_spark.operators.similarity import (
        cosine_near_dup_pairs,
        sign_lsh_near_dup_pairs,
    )

    em = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {(r.a, r.b) for r in cosine_near_dup_pairs(em, threshold=0.4).collect()}
    lsh = {(r.a, r.b) for r in sign_lsh_near_dup_pairs(
        em, dim=64, threshold=0.4, n_bits=2, n_tables=8).collect()}
    assert lsh <= exact                       # precision 1.0 by verify
    assert len(lsh & exact) / len(exact) >= 0.9


def test_plant_twins_deterministic_and_near(spark):
    """ann_eval.plant_twins: per-row hash-seeded jitter ⇒ identical twin
    vectors under ANY partitioning, and cos(orig, twin) lands in the
    high-threshold regime the bench's ann block measures."""
    from news_crawler_spark.operators.ann_eval import plant_twins
    from news_crawler_spark.operators.similarity import cosine_expr

    em = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding")
    a = {r.vec_id: tuple(r.embedding)
         for r in plant_twins(em).filter(F.col("vec_id") >= 100_000).collect()}
    b = {r.vec_id: tuple(r.embedding)
         for r in plant_twins(em.repartition(7)).filter(F.col("vec_id") >= 100_000).collect()}
    assert a == b and len(a) == 50
    world = plant_twins(em)
    pairs = (
        world.filter(F.col("vec_id") < 100_000).alias("o")
        .join(world.filter(F.col("vec_id") >= 100_000).alias("t"),
              F.col("t.vec_id") == F.col("o.vec_id") + 100_000)
        .select(cosine_expr(F.col("o.embedding"), F.col("t.embedding")).alias("cos"))
        .collect()
    )
    assert len(pairs) == 50
    assert all(0.90 <= r.cos <= 0.99 for r in pairs)


def test_ivf_train_twin_recall_and_pruning(spark):
    """ivf_train (spherical k-means) + nprobe=2 recovers planted twins
    while measurably pruning the candidate set — the sf0.01 fast twin of
    bench.py's ann block (round-3 VERDICT task 8)."""
    from pyspark.sql import Window
    from news_crawler_spark.operators.ann_eval import plant_twins
    from news_crawler_spark.operators.similarity import (
        ivf_assign, ivf_candidates, ivf_train)

    em = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding")
    world = plant_twins(em).persist()
    n = world.count()
    cent = ivf_train(world, n_centroids=16, iters=5)
    assert cent.count() == 16
    assigned = ivf_assign(world, cent)
    probes = world.filter(F.col("vec_id") >= 100_000).select(
        F.col("vec_id").alias("qid"))
    n_twins = probes.count()
    cand = ivf_candidates(assigned, cent, probes, nprobe=2).persist()
    n_cand = cand.count()
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.col("vec_id"))
    hits = (
        cand.withColumn("r", F.row_number().over(w))
        .filter((F.col("r") <= 5) & (F.col("vec_id") == F.col("qid") - 100_000))
        .count()
    )
    cand.unpersist(); world.unpersist()
    assert hits / n_twins >= 0.9                      # recall@5
    assert n_twins * (n - 1) / n_cand >= 4.0          # real pruning at 16 cells


def test_sign_lsh_candidates_expose_pruning(spark):
    """sign_lsh_near_dup_pairs == candidate_pairs.filter(cos ≥ t), and the
    candidate set is strictly smaller than all-pairs (the pruning the
    bench reports is real, not an artifact of the threshold filter)."""
    from news_crawler_spark.operators.similarity import (
        sign_lsh_candidate_pairs, sign_lsh_near_dup_pairs)

    em = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = em.count()
    cand = sign_lsh_candidate_pairs(em, dim=64, n_bits=8, n_tables=6).persist()
    filtered = {(r.a, r.b) for r in cand.filter(F.col("cos") >= 0.4).collect()}
    direct = {(r.a, r.b) for r in sign_lsh_near_dup_pairs(
        em, dim=64, threshold=0.4, n_bits=8, n_tables=6).collect()}
    assert filtered == direct
    assert cand.count() < n * (n - 1) / 2
    cand.unpersist()
