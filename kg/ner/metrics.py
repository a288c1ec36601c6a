"""M8 — seqeval-equivalent entity-level P/R/F1 (SURVEY.md §2.A M8).

seqeval's micro-averaged entity-level scores reduce to set operations
over (doc, sent, type, begin, end) span tuples: TP = |pred ∩ gold|
via an inner join, P = TP/|pred|, R = TP/|gold|. As a distributed
join + three counts this is dramatically simpler than seqeval's
per-sentence Python — and exact, because spans must match type and
boundaries exactly (the seqeval 'strict' default the reference's
evaluation path reports — BASELINE.json:2,6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_KEYS_DEFAULT = ["url", "sent_id", "ent_type", "begin", "end"]


def entity_prf(
    pred: DataFrame,
    gold: DataFrame,
    keys: list[str] | None = None,
) -> dict[str, float]:
    """Micro-averaged entity-level precision/recall/F1."""
    keys = keys or SPAN_KEYS_DEFAULT
    p = pred.select(*keys).dropDuplicates(keys)
    g = gold.select(*keys).dropDuplicates(keys)
    tp = p.join(g, keys, "inner").count()
    n_pred = p.count()
    n_gold = g.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": float(tp),
        "n_pred": float(n_pred),
        "n_gold": float(n_gold),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def per_type_prf(
    pred: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """seqeval classification-report equivalent: P/R/F1 per ent_type,
    computed with a full outer join + conditional counts (one shuffle)."""
    keys = keys or SPAN_KEYS_DEFAULT
    p = pred.select(*keys).dropDuplicates(keys).withColumn("_p", F.lit(1))
    g = gold.select(*keys).dropDuplicates(keys).withColumn("_g", F.lit(1))
    both = p.join(g, keys, "full")
    agg = both.groupBy("ent_type").agg(
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_p").isNotNull(), 1).otherwise(0)).alias("n_pred"),
        F.sum(F.when(F.col("_g").isNotNull(), 1).otherwise(0)).alias("n_gold"),
    )
    return agg.select(
        "ent_type",
        "tp",
        "n_pred",
        "n_gold",
        (F.col("tp") / F.col("n_pred")).alias("precision"),
        (F.col("tp") / F.col("n_gold")).alias("recall"),
        (
            2 * F.col("tp") / (F.col("n_pred") + F.col("n_gold"))
        ).alias("f1"),
    )
