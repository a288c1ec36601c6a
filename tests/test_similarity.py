"""ANN: brute force is the ground truth; LSH must recall most of it."""

import numpy as np
import pyspark.sql.functions as F

from kg.similarity import brute_force_topk, lsh_topk


def _vectors(spark, n=300, dim=64, seed=5, clusters=10):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((clusters, dim))
    rows = []
    for i in range(n):
        c = centers[i % clusters]
        v = c + 0.15 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_bruteforce_topk_is_exact(spark):
    corpus = _vectors(spark, n=120)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    got = brute_force_topk(corpus, queries, k=5).collect()
    # numpy ground truth
    vecs = {r["vec_id"]: np.array(r["v"]) for r in corpus.collect()}
    for qid in range(3):
        q = vecs[qid]
        sims = {
            vid: round(
                float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), 6
            )
            for vid, v in vecs.items()
            if vid != qid
        }
        want = sorted(sims, key=lambda v: (-sims[v], v))[:5]
        got_q = [r["vec_id"] for r in sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rk"]
        )]
        assert got_q == want, (qid, got_q, want)


def test_lsh_recall_vs_bruteforce(spark):
    corpus = _vectors(spark, n=300)
    queries = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    bf = brute_force_topk(corpus, queries, k=5)
    ann = lsh_topk(corpus, queries, k=5, n_tables=12, n_bits=10)
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf.collect()}
    ann_set = {(r["query_id"], r["vec_id"]) for r in ann.collect()}
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall >= 0.7, recall


def test_ivf_recall_vs_bruteforce(spark):
    from kg.similarity import ivf_topk

    corpus = _vectors(spark, n=300)
    queries = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    bf = brute_force_topk(corpus, queries, k=5)
    ivf = ivf_topk(corpus, queries, k=5, n_cells=10, nprobe=4)
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf.collect()}
    ivf_set = {(r["query_id"], r["vec_id"]) for r in ivf.collect()}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.6, recall


def test_ivf_neutral_recall_and_partition_invariance(spark):
    """The engine-neutral IVF (integer-L2 quantizer, exact DuckDB
    oracle since r5) must keep useful recall vs brute force AND be
    invariant to input partitioning (every decision is exact integer
    arithmetic, so a repartition can't flip a cell assignment)."""
    from kg.similarity import ivf_topk_neutral

    corpus = _vectors(spark, n=300)
    queries = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    bf = brute_force_topk(corpus, queries, k=5)
    ivf = ivf_topk_neutral(corpus, queries, k=5, n_cells=10, nprobe=4)
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf.collect()}
    got = {(r["query_id"], r["vec_id"], r["cos_sim"], r["rk"]) for r in ivf.collect()}
    ivf_set = {(q, v) for q, v, _, _ in got}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.6, recall
    again = {
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rk"])
        for r in ivf_topk_neutral(
            corpus.repartition(7), queries, k=5, n_cells=10, nprobe=4
        ).collect()
    }
    assert got == again


def test_ivf_index_bit_identical_across_runs(spark):
    """The Lloyd sweep's centroid means are computed by exact integer
    summation (advisor r2: float avg is partial-order-nondeterministic
    and can flip boundary vectors between cells), so rebuilding the
    index on the same input — even at a different partitioning — must
    produce identical centroids and identical cell assignments."""
    from kg.similarity import ivf_assign

    corpus = _vectors(spark, n=300)
    c1, a1 = ivf_assign(corpus, n_cells=10)
    c2, a2 = ivf_assign(corpus.repartition(7), n_cells=10)
    cent1 = {r["cell_id"]: tuple(r["cv"]) for r in c1.collect()}
    cent2 = {r["cell_id"]: tuple(r["cv"]) for r in c2.collect()}
    assert cent1 == cent2  # bit-identical, not approximately equal
    asg1 = {r["vec_id"]: r["cell_id"] for r in a1.collect()}
    asg2 = {r["vec_id"]: r["cell_id"] for r in a2.collect()}
    assert asg1 == asg2
