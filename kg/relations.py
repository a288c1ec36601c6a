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
    """K5: ordered co-sentence mention pairs (subject textual-first).

    Shuffle-hash hinted: sentence keys are high-cardinality and the
    per-key groups are tiny, so hashing beats the sort-merge default.
    If the linked mentions carry ``words`` (see detect_mentions
    carry_words), the subject side keeps them so K6 needs no further
    join."""
    subj_cols = [
        F.col("url"),
        F.col("sent_id"),
        F.col("mention_id").alias("subj_mention"),
        F.col("entity_id").alias("subj_entity"),
        F.col("ent_type").alias("subj_type"),
        F.col("begin").alias("subj_begin"),
        F.col("end").alias("subj_end"),
    ]
    if "words" in linked.columns:
        subj_cols.append(F.col("words"))
    m1 = linked.select(*subj_cols)
    m2 = linked.select(
        "url",
        "sent_id",
        F.col("mention_id").alias("obj_mention"),
        F.col("entity_id").alias("obj_entity"),
        F.col("ent_type").alias("obj_type"),
        F.col("begin").alias("obj_begin"),
        F.col("end").alias("obj_end"),
    )
    return m1.join(m2.hint("shuffle_hash"), ["url", "sent_id"], "inner").filter(
        F.col("subj_begin") < F.col("obj_begin")
    )


def pair_gen_grouped(linked: DataFrame) -> DataFrame:
    """K5 hot path: co-sentence pairs via ONE shuffle.

    groupBy (url, sent_id) + in-memory pair explosion instead of the
    self-join: per-sentence mention counts are tiny (explosion is
    O(k^2) with k<=~10), so one exchange of the linked table replaces
    two exchanges + a join — and, crucially for a lazy single-action
    pipeline, the upstream NER DAG executes ONCE instead of once per
    join side. Requires carry_words mentions (kg.ner.model)."""
    ms = F.collect_list(
        F.struct("mention_id", "entity_id", "ent_type", "begin", "end")
    ).alias("ms")
    grouped = linked.groupBy("url", "sent_id").agg(
        ms, F.first("words").alias("words")
    )
    pair = F.explode(
        F.filter(
            F.flatten(
                F.transform(
                    F.col("ms"),
                    lambda a: F.transform(
                        F.col("ms"),
                        lambda b: F.struct(a.alias("s"), b.alias("o")),
                    ),
                )
            ),
            lambda p: p["s"]["begin"] < p["o"]["begin"],
        )
    ).alias("p")
    return grouped.select("url", "sent_id", "words", pair).select(
        "url",
        "sent_id",
        "words",
        F.col("p.s.mention_id").alias("subj_mention"),
        F.col("p.s.entity_id").alias("subj_entity"),
        F.col("p.s.ent_type").alias("subj_type"),
        F.col("p.s.begin").alias("subj_begin"),
        F.col("p.s.end").alias("subj_end"),
        F.col("p.o.mention_id").alias("obj_mention"),
        F.col("p.o.entity_id").alias("obj_entity"),
        F.col("p.o.ent_type").alias("obj_type"),
        F.col("p.o.begin").alias("obj_begin"),
        F.col("p.o.end").alias("obj_end"),
    )


def extract_relations(
    pairs: DataFrame,
    sentences: DataFrame | None = None,
    threshold: float = CONFIDENCE_THRESHOLD,
) -> DataFrame:
    """K6: pairs + sentence words -> triples_raw.

    between-text = words strictly between the two spans; predicate via
    the rule table (whole-stage-codegen CASE expression). If the pairs
    already carry ``words`` (carry_words path), no sentence join runs."""
    if "words" in pairs.columns:
        with_words = pairs
    else:
        if sentences is None:
            raise ValueError("pairs lack words; pass the sentences table")
        with_words = pairs.join(
            sentences.select("url", "sent_id", "words").hint("shuffle_hash"),
            ["url", "sent_id"],
            "inner",
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
