

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


def test_q21_decorrelation_hand_case(spark, tmp_path):
    """The per-order (n_supp, n_late_supp) profile must reproduce the
    correlated EXISTS/NOT-EXISTS semantics row-for-row: a supplier
    with TWO late lineitems on one qualifying order is counted twice
    (row-level numwait, as in the correlated form); an order where
    two suppliers are late disqualifies both; a single-supplier
    order never qualifies (no EXISTS-other-supplier)."""
    from datetime import datetime

    from kg.relational import q21_waiting_supplier

    d = datetime(2000, 1, 1)
    on_time = datetime(2000, 2, 1)  # 31 days — not late
    late = datetime(2000, 6, 1)  # 152 days — late (>90)
    li = [
        # order 1: supp 1 late TWICE, supp 2 on time -> supp1 += 2
        (1, 1, late), (1, 1, late), (1, 2, on_time),
        # order 2: both suppliers late -> nobody counted
        (2, 1, late), (2, 2, late),
        # order 3: single-supplier order, late -> excluded (no other supp)
        (3, 1, late),
        # order 4: supp 3 late once, supp 2 on time -> supp3 += 1
        (4, 3, late), (4, 2, on_time),
        # order 5: nobody late
        (5, 1, on_time), (5, 2, on_time),
    ]
    spark.createDataFrame(
        li, "l_orderkey long, l_suppkey long, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(k, d) for k in (1, 2, 3, 4, 5)],
        "o_orderkey long, o_orderdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, "Supp#1"), (2, "Supp#2"), (3, "Supp#3")],
        "s_suppkey long, s_name string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")

    got = {
        r["s_name"]: r["numwait"]
        for r in q21_waiting_supplier(spark, str(tmp_path)).collect()
    }
    assert got == {"Supp#1": 2, "Supp#3": 1}


def test_q15_argmax_keeps_ties(spark, tmp_path):
    """Two suppliers tied at the global max revenue must BOTH come
    back — the semantics that a sort-limit rewrite silently breaks."""
    from datetime import datetime

    from kg.relational import q15_top_supplier

    in_win = datetime(1996, 2, 1)
    li = [
        # suppliers 1 and 2 tie at 30.00 revenue; supplier 3 trails
        (1, 10.0, 0.0, in_win), (1, 20.0, 0.0, in_win),
        (2, 30.0, 0.0, in_win),
        (3, 5.0, 0.0, in_win),
        # out-of-window row that would break the tie if not filtered
        (3, 99.0, 0.0, datetime(1997, 1, 1)),
    ]
    spark.createDataFrame(
        li,
        "l_suppkey long, l_extendedprice double, l_discount double,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "Supp#1"), (2, "Supp#2"), (3, "Supp#3")],
        "s_suppkey long, s_name string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")

    got = {
        (r["s_name"], r["total_rev_c"])
        for r in q15_top_supplier(spark, str(tmp_path)).collect()
    }
    assert got == {("Supp#1", 300000), ("Supp#2", 300000)}
