"""K7 — canonicalization via connected components
(BASELINE.json:6 "GraphFrames-style iterative hash-join label
propagation"; graphframes itself is not installed — SURVEY.md §0 —
so the loop is plain DataFrame joins).

Algorithm: min-label propagation with pointer jumping.
Each round does (1) a neighbor-min step — every vertex takes the min
component label over itself and its neighbors (one shuffle join +
groupBy.min) — and (2) a pointer-jump step — label := label(label) —
which gives the O(log n) round behavior of large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond") on
long chains. Lineage is truncated every round with localCheckpoint
(an unbounded iterative plan otherwise blows up the optimizer),
frontier DataFrames are cached, convergence = zero labels changed.

Same-as edge derivation: entities sharing a *high-prior* alias
(prior >= 0.5: full surfaces and distinctive org stems; ambiguous
person-first-name aliases sit below the bar) — the deterministic
stand-in for the reference's same-as rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAME_AS_PRIOR = 0.5
MAX_ITERATIONS = 50


def same_as_edges(aliases: DataFrame) -> DataFrame:
    """aliases(alias, entity_id, prior) -> edges(src, dst), src < dst."""
    high = aliases.filter(F.col("prior") >= SAME_AS_PRIOR).select(
        "alias", "entity_id"
    )
    a = high.alias("a")
    b = high.alias("b")
    return (
        a.join(b, "alias")
        .filter(F.col("a.entity_id") < F.col("b.entity_id"))
        .select(
            F.col("a.entity_id").alias("src"),
            F.col("b.entity_id").alias("dst"),
        )
        .distinct()
    )


def connected_components(
    edges: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """edges(src, dst) [+ vertices(id)] -> components(id, component).

    component = min vertex id in the component (deterministic, so
    resumed runs and the gold fixture agree on ids).
    """
    spark = edges.sparkSession
    sym = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    verts = sym.select(F.col("u").alias("id")).distinct()
    if vertices is not None:
        verts = vertices.select("id").unionAll(verts).distinct()
    labels = verts.select("id", F.col("id").alias("component"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(MAX_ITERATIONS):
        # (1) neighbor-min: component <- min over self + neighbors
        nbr_min = (
            sym.join(labels, sym["v"] == labels["id"], "inner")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
        )
        # (2) pointer jump: component <- component(component)
        parent = stepped.select(
            F.col("id").alias("pid"), F.col("component").alias("pcomp")
        )
        jumped = (
            stepped.join(parent, stepped["component"] == parent["pid"], "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("pcomp", "component")
                ).alias("component"),
            )
        )
        jumped = jumped.localCheckpoint(eager=True)  # truncate lineage
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels
