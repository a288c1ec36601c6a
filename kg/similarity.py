"""Similarity search over embedding columns (`array<float>`).

Two paths:
  * brute-force cosine top-k — the correctness baseline: broadcast the
    (small) query set against the corpus, UDF-free zip_with/aggregate
    dot product, per-query window top-k. Scales linearly in corpus
    size with zero shuffle of the corpus (queries broadcast).
  * LSH-bucketed ANN — the 10^12-row path: seeded random-hyperplane
    sign buckets (L tables of k bits) computed in one vectorized
    pandas UDF; candidates = bucket-join; exact cosine only on
    candidates. Recall vs brute force is gated in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, LongType

from kg.relational import T, query

EMBED_DIM = 64


def _cosine(va: str, vb: str):
    dot = F.aggregate(
        F.zip_with(F.col(va), F.col(vb), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(va) * norm(vb))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """queries(query_id, qv) x corpus(vec_id, v) -> top-k by cosine.

    Deterministic ranking: ties broken on rounded cosine then vec_id,
    so the result is stable across engines and partitionings."""
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(_cosine("qv", "v"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cos_sim", "rk")
    )


def _hyperplanes(n_tables: int, n_bits: int, dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float64)


def lsh_bucket_udf(n_tables: int = 8, n_bits: int = 12, dim: int = EMBED_DIM, seed: int = 42):
    planes = _hyperplanes(n_tables, n_bits, dim, seed)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def bucket_ids(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            M = np.stack(vecs.to_numpy())  # [n, dim] float
            # [T, n, bits]: sign bits of plane projections
            proj = np.einsum("tbd,nd->tnb", planes, M.astype(np.float64))
            bits = (proj > 0).astype(np.int64)
            codes = bits @ weights  # [T, n]
            # offset buckets by table index so tables don't collide
            codes = codes + (np.arange(n_tables)[:, None] << n_bits)
            yield pd.Series(list(codes.T))

    return bucket_ids


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 8,
    n_bits: int = 12,
) -> DataFrame:
    """ANN: bucket-join candidates (any shared table bucket) + exact
    cosine re-rank. Shuffle keys on bucket ids, never the full corpus
    cross product."""
    bucket = lsh_bucket_udf(n_tables, n_bits)
    cb = corpus.withColumn("bkt", F.explode(bucket(F.col("v")))).select(
        "vec_id", "v", "bkt"
    )
    qb = queries.withColumn("bkt", F.explode(bucket(F.col("qv")))).select(
        "query_id", "qv", "bkt"
    )
    cand = (
        cb.join(qb, "bkt")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "v")
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        cand.withColumn("cos_sim", F.round(_cosine("qv", "v"), 6))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cos_sim", "rk")
    )


def _fixture_queries(embeddings: DataFrame, n: int = 5) -> DataFrame:
    return embeddings.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )


def _fixture_corpus(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


# ------------------------------------------------------- driver queries


@query(
    "ann_bruteforce_topk",
    """
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6)
               AS cos_sim
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 5),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rk
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= 5
    """,
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    return brute_force_topk(_fixture_corpus(e), _fixture_queries(e), k=5)


def _lsh_oracle_sql(
    n_tables: int = 8, n_bits: int = 12, k: int = 5, seed: int = 42
) -> str:
    """DuckDB replica of lsh_topk (r3: converts the driver row from
    rows-only to exact): the seeded hyperplanes are corpus-independent,
    so they embed as literal DOUBLE[] rows in a VALUES CTE — built from
    the SAME _hyperplanes() array the Spark UDF closes over, so the two
    engines cannot drift. Bucket codes are sign-bit sums per (vec,
    table); candidates share >= 1 bucket; exact-cosine re-rank matches
    brute force's ROUND(...,6) + vec_id tie-break. Shortest-repr float
    literals round-trip exactly through DuckDB's parser; a sign flip
    would need |projection| below ~1e-13, far outside the fixture's
    value range."""
    planes = _hyperplanes(n_tables, n_bits, EMBED_DIM, seed)
    rows = []
    for t in range(n_tables):
        for b in range(n_bits):
            w = ", ".join(repr(float(x)) for x in planes[t, b])
            rows.append(f"({t}, {b}, [{w}])")
    values = ",\n      ".join(rows)
    return f"""
    WITH planes(t, b, w) AS (VALUES
      {values}
    ),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qs AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5),
    cb AS (
      SELECT c.vec_id, p.t * {1 << n_bits} + SUM(
               CASE WHEN list_dot_product(c.v, p.w) > 0
                    THEN (1 << p.b) ELSE 0 END) AS bkt
      FROM corpus c CROSS JOIN planes p GROUP BY c.vec_id, p.t),
    qb AS (
      SELECT q.query_id, p.t * {1 << n_bits} + SUM(
               CASE WHEN list_dot_product(q.qv, p.w) > 0
                    THEN (1 << p.b) ELSE 0 END) AS bkt
      FROM qs q CROSS JOIN planes p GROUP BY q.query_id, p.t),
    cand AS (
      SELECT DISTINCT qb.query_id, cb.vec_id
      FROM cb JOIN qb USING (bkt) WHERE cb.vec_id != qb.query_id),
    scored AS (
      SELECT cand.query_id, cand.vec_id,
             ROUND(list_cosine_similarity(q.qv, c.v), 6) AS cos_sim
      FROM cand JOIN qs q ON q.query_id = cand.query_id
                JOIN corpus c ON c.vec_id = cand.vec_id),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rk
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rk FROM ranked WHERE rk <= {k}
    """


@query("ann_lsh_topk", _lsh_oracle_sql())  # exact since r3
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recall vs brute force gated in tests/test_similarity.py
    e = T(spark, sf_dir, "embeddings")
    return lsh_topk(_fixture_corpus(e), _fixture_queries(e), k=5)


def _nearest_cell_udf(C: np.ndarray):
    """Vectorized per-row argmax against the (broadcast-by-closure)
    centroid matrix: zero shuffle of the corpus."""
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @pandas_udf(IntegerType())
    def nearest_cell(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            M = np.stack(vecs.to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            # argmax returns the FIRST max -> lowest cell_id tie-break
            yield pd.Series(np.argmax(Mn @ Cn.T, axis=1).astype(np.int32) + 1)

    return nearest_cell


def ivf_assign(
    corpus: DataFrame, n_cells: int = 16, refine_iters: int = 1
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic hash-ordered seed sample +
    ``refine_iters`` Lloyd (k-means) sweeps, each vector assigned to
    its nearest centroid by cosine. Returns
    (centroids(cell_id, cv), assigned(vec_id, v, cell_id)).

    Assignment is a per-row argmax against the centroid matrix inside
    ONE vectorized pandas UDF — zero shuffle of the corpus (the r1
    shape ranked corpus x n_cells rows through a Window.partitionBy
    (vec_id), an avoidable corpus-sized exchange; audited in
    scripts/audit_plans.py). Each refinement sweep is one extra corpus
    pass + one n_cells-group shuffle at INDEX-BUILD time (stride/hash
    seeds alone under-cover clustered data). The centroid table is
    dictionary-sized, so collecting it between sweeps is the same
    bounded-driver-work class as the union-find shortcut.

    Determinism: refined centroids come from EXACT integer summation
    (see the sweep body), so the whole index — centroids and every
    cell assignment — is bit-identical run-to-run on the same input,
    independent of partitioning."""
    spark = corpus.sparkSession
    # deterministic hash-ordered sample via TakeOrderedAndProject
    # (distributed top-k; a global row_number window over the corpus
    # would funnel everything through one task)
    crows = sorted(
        corpus.orderBy(F.xxhash64("vec_id")).limit(n_cells).collect(),
        key=lambda r: r["vec_id"],
    )
    C = np.stack([np.asarray(r["v"], dtype=np.float64) for r in crows])

    for _ in range(refine_iters):
        tmp = corpus.select(
            "v", _nearest_cell_udf(C)(F.col("v")).alias("cell_id")
        )
        # per-cell mean: posexplode to (cell_id, dim, x) then SUM AS
        # SCALED INTEGERS — long addition is associative and exact, so
        # the refined centroid is bit-identical across runs regardless
        # of partial-aggregation order (F.avg over doubles is ulp-
        # nondeterministic, which can flip boundary vectors between
        # cells run-to-run — advisor r2 finding). 1e9 scaling keeps
        # unit-scale components exact to ~1e-9 and headroom for
        # ~1.8e9 rows/cell before long overflow (ANSI mode would
        # error, not wrap, beyond that).
        means = (
            tmp.select("cell_id", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell_id", "dim")
            .agg(
                F.sum(F.round(F.col("x") * 1e9).cast("long")).alias("sx"),
                F.count(F.lit(1)).alias("nx"),
            )
            .withColumn("m", F.col("sx") / F.lit(1e9) / F.col("nx"))
            .groupBy("cell_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("s")
            )
            .select("cell_id", F.col("s.m").alias("cv"))
            .collect()
        )
        C = C.copy()  # empty cells keep their previous centroid
        for r in means:
            C[r["cell_id"] - 1] = np.asarray(r["cv"], dtype=np.float64)

    centroids = spark.createDataFrame(
        [(i + 1, [float(x) for x in C[i]]) for i in range(len(C))],
        "cell_id int, cv array<double>",
    )
    assigned = corpus.select(
        "vec_id", "v", _nearest_cell_udf(C)(F.col("v")).alias("cell_id")
    )
    return centroids, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest cells per query, exact
    cosine only within probed cells. Complements lsh_topk (the other
    scale path); recall vs brute force gated in tests."""
    centroids, assigned = ivf_assign(corpus, n_cells)
    qscored = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", _cosine("qv", "cv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell_id"))
    probes = (
        qscored.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= nprobe)
        .select("query_id", "qv", "cell_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.withColumn("cos_sim", F.round(_cosine("qv", "v"), 6))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cos_sim", "rk")
    )


@query("ann_ivf_topk")  # rows-only: stride centroids not SQL-practical
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    return ivf_topk(_fixture_corpus(e), _fixture_queries(e), k=5)
