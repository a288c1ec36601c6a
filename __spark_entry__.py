"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship KG pipeline (SURVEY.md §3.2): pages
derived from the sf0.001 `documents` fixture -> K1 extract -> NER
mentions -> broadcast alias linking -> cosine re-rank -> co-sentence
relation extraction -> connected-component canonicalization ->
(subj, pred, obj) triples.

`queries()` exposes every implemented operator from SURVEY.md §2;
`oracle_sql()` gives the DuckDB-equivalent ANSI SQL for the
SQL-expressible ones (§2.C). KG-pipeline / NER operators are
non-SQL-expressible (Arrow-UDF model inference, iterative
convergence) and get rows-only checks, with their real correctness
gates in tests/ (frozen single-node oracles, gold-fixture P/R).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg import fixtures as FX
    from kg.pipeline import run_pipeline

    pages = FX.pages_from_documents(spark, sf_dir)
    res = run_pipeline(
        spark, pages, FX.aliases_df(spark), FX.entity_vecs_df(spark)
    )
    return res["triples"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, SF0001)


# ------------------------------------------------------------------ KG
# non-SQL-expressible operators (rows-only driver check; pytest holds
# the real gates)


def _kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg import fixtures as FX
    from kg.pipeline import stage_extract, stage_mentions, stage_sentences

    pages = FX.pages_from_documents(spark, sf_dir)
    return stage_mentions(stage_sentences(stage_extract(pages)))


def _kg_linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg import fixtures as FX
    from kg.pipeline import (
        stage_extract,
        stage_linked,
        stage_mentions,
        stage_sentences,
    )

    pages = FX.pages_from_documents(spark, sf_dir)
    mentions = stage_mentions(stage_sentences(stage_extract(pages)))
    return stage_linked(
        mentions, FX.aliases_df(spark), FX.entity_vecs_df(spark)
    )


def _kg_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg import fixtures as FX
    from kg.pipeline import stage_components
    from pyspark.sql import functions as F

    # full entity registry as the vertex set, so singleton components
    # appear too (not just the same-as-edge-connected entities)
    verts = FX.registry_df(spark).select(F.col("entity_id").alias("id"))
    return stage_components(FX.aliases_df(spark), registry_ids=verts)


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _flagship(spark, sf_dir)


def _conll_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M4-M8: the reference's CoNLL evaluation path — read gold
    CoNLL, run the NER stack, report per-type entity-level P/R/F1."""
    import os
    import tempfile

    from kg.fixtures import write_conll_fixture
    from kg.ner.bio import bio_to_mentions
    from kg.ner.conll import read_conll
    from kg.ner.metrics import per_type_prf
    from kg.ner.model import tag_sentences

    path = os.path.join(tempfile.gettempdir(), "kg_conll_eval.txt")
    if not os.path.exists(path):
        write_conll_fixture(path, n_sentences=300, seed=7, noise=0.0)
    gold = read_conll(spark, path)
    gm = bio_to_mentions(gold.withColumnRenamed("doc_id", "url"))
    pred = tag_sentences(gold.select("doc_id", "sent_id", "words"))
    pm = bio_to_mentions(pred.withColumnRenamed("doc_id", "url"))
    return per_type_prf(pm, gm)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    # importing these modules registers their entries in the shared
    # kg.relational.QUERIES/ORACLES registry
    from kg import (  # noqa: F401
        dedup,
        multimodal,
        relational,
        similarity,
        streaming,
        textstats,
    )

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(relational.QUERIES)
    q["kg_mentions"] = _kg_mentions
    q["kg_linked"] = _kg_linked
    q["kg_components"] = _kg_components
    q["kg_triples"] = _kg_triples
    q["conll_eval_prf"] = _conll_eval
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for the SQL-expressible queries."""
    from kg import (  # noqa: F401
        dedup,
        multimodal,
        relational,
        similarity,
        streaming,
        textstats,
    )

    return dict(relational.ORACLES)
