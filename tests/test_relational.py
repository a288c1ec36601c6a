

def test_bloom_prune_false_positive_accounting(spark):
    """Deliberately undersized bitmap (256 bits for 20 keys x 3
    hashes) must let false positives through and account for them
    exactly; the verified revenue must be IDENTICAL to the
    production-sized run (the bloom is one-sided — it can only add
    false positives, never drop true matches)."""
    from kg.relational import bloom_prune_semi_join

    sf01 = "/root/testdata/sf0.01"
    small = bloom_prune_semi_join(spark, sf01, bits=256).collect()[0]
    assert small["n_bloom_pass"] == small["n_true_match"] + small["n_false_pos"]
    assert small["n_false_pos"] > 0, "undersized bloom produced no FPs"
    full = bloom_prune_semi_join(spark, sf01).collect()[0]
    assert full["n_true_match"] == small["n_true_match"] == 608
    assert full["n_false_pos"] == 0
    assert full["revenue_c"] == small["revenue_c"]


def test_range_frame_is_time_based_not_row_based(spark):
    """The trailing-1h RANGE frame must actually exclude same-user
    events older than an hour (n_1h < the running row count for some
    event) while still including in-window neighbors (n_1h > 1 for
    some event) — i.e. the frame is event-time-bounded, not an
    unbounded-preceding ROWS frame in disguise."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from kg.relational import q_window_range_frame

    got = {
        r["event_id"]: r["n_1h"]
        for r in q_window_range_frame(spark, "/root/testdata/sf0.001").collect()
    }
    # the upper bound must count RANGE peers at the query's own
    # truncated-second granularity: two events flooring to the same
    # epoch second are frame peers of each other, so a row-number
    # over full-precision ts would undercount the legal maximum
    es = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy(es).rangeBetween(
        Window.unboundedPreceding, 0
    )
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", F.count(F.lit(1)).over(w).alias("n_upto"))
        .collect()
    )
    upto = {r["event_id"]: r["n_upto"] for r in rows}
    assert any(got[e] < upto[e] for e in got), "frame never excluded old events"
    assert any(got[e] > 1 for e in got), "frame never included a neighbor"
    assert all(got[e] <= upto[e] for e in got)
