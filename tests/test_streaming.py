"""Structured Streaming: availableNow replay equals the batch answer."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_tumbling_equals_batch(spark):
    from kg.streaming import tumbling_daily_counts

    got = {
        (r["day"], r["event_type"]): r["n"]
        for r in tumbling_daily_counts(spark, SF).collect()
    }
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["day"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_session_counts_events_conserved(spark):
    from kg.streaming import session_counts

    rows = session_counts(spark, SF).collect()
    total_events = sum(r["n_events"] for r in rows)
    assert total_events == spark.read.parquet(f"{SF}/events.parquet").count()
    for r in rows:
        assert 1 <= r["n_sessions"] <= r["n_events"]
