"""Python UDTF surface (SURVEY.md §2.C, optional row): BIO-decode as a
lateral table function.

Spark 4 `@udtf` table functions are the one Python-UDF shape the repo
did not exercise (scalar / iterator / grouped-map / grouped-agg all
live elsewhere). This is deliberately the SAME decode kernel as the
Arrow path (kg/ner/bio.py `decode_bio`), so pytest can assert the two
formulations are row-identical; the hot pipeline keeps the vectorized
pandas-UDF path (UDTFs are row-at-a-time and stay off the 100 TB hot
path — this exists to complete the API surface, and that trade-off is
documented here rather than hidden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from kg.ner.bio import decode_bio


@udtf(returnType="ent_type string, begin int, end int, surface string")
class BioDecodeUDTF:
    """LATERAL bio_decode(words, tags) -> one row per decoded span."""

    def eval(self, words: list, tags: list):  # noqa: D401
        words = list(words or [])
        for (t, b, e) in decode_bio(list(tags or [])):
            yield t, b, e, " ".join(words[b:e])


def bio_decode_lateral(sents: DataFrame) -> DataFrame:
    """sentences(doc_id, sent_id, words, tags) -> mentions via a SQL
    LATERAL join against the registered UDTF. Scalar output columns
    only (driver-hashable)."""
    spark = sents.sparkSession
    spark.udtf.register("bio_decode", BioDecodeUDTF)
    sents.createOrReplaceTempView("bio_udtf_in")
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_id, t.ent_type, t.begin, t.end, t.surface
        FROM bio_udtf_in s, LATERAL bio_decode(s.words, s.tags) t
        """
    )


def udtf_bio_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: decode the gold CoNLL fixture's BIO tags through
    the UDTF path (rows-only: the fixture is engine-side, not one of
    the driver's DuckDB views; exact equality vs the Arrow decode path
    is gated in tests/test_udtf.py)."""
    from kg.fixtures import conll_fixture_path
    from kg.ner.conll import read_conll

    gold = read_conll(spark, conll_fixture_path(n_sentences=300, seed=7, noise=0.0))
    return bio_decode_lateral(gold.select("doc_id", "sent_id", "words", "tags"))
