SF = "/root/testdata/sf0.001"


def test_cms_one_sided_and_absent_probe(spark):
    """Count-min guarantees est >= true for every token; the absent
    probe's true count is 0 (its estimate may exceed 0 only through
    collisions — either way one-sidedness must hold)."""
    from kg.sketch import sketch_cms_heavy_hitters

    rows = {
        r["token"]: (r["est_n"], r["true_n"])
        for r in sketch_cms_heavy_hitters(spark, SF).collect()
    }
    assert set(rows) == {"join", "hash", "scan", "zzz-unseen"}
    for tok, (est, true) in rows.items():
        assert est >= true, f"{tok}: CMS underestimated ({est} < {true})"
    assert rows["zzz-unseen"][1] == 0
    assert rows["join"][1] > 0  # planted frequent token really occurs


def test_hll_estimate_within_error_bound(spark):
    """HLL raw estimator with m=256 has ~6.5% standard error in the
    n >> m regime; assert within 4 sigma (26%) of the exact distinct
    count, and that the integer-denominator construction produced a
    positive finite estimate."""
    from kg.sketch import sketch_hll_distinct

    r = sketch_hll_distinct(spark, SF).collect()[0]
    est, true = r["est_distinct"], r["true_distinct"]
    assert true > 2.5 * 256, "fixture bigram vocab below the raw regime"
    assert est > 0
    assert abs(est - true) / true < 0.26, (est, true)


def test_histogram_quantiles_within_bin_width(spark):
    """Each interpolated estimate must land within one bin width of
    the TRUE rank-r order statistic (the histogram's worst-case
    error bound), and ranks must be the exact ceil(n*q) integers."""
    import math

    from kg.sketch import HIST_BINS, sketch_histogram_quantiles

    rows = {
        r["q_label"]: (r["rank_r"], r["est_c"])
        for r in sketch_histogram_quantiles(spark, SF).collect()
    }
    vals = sorted(
        r["x"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .selectExpr("CAST(ROUND(l_extendedprice * 100) AS LONG) AS x")
        .collect()
    )
    n, lo, hi = len(vals), vals[0], vals[-1]
    width = (hi - lo + 1) / HIST_BINS
    for lab, qn, qd in (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
                        ("p90", 9, 10), ("p99", 99, 100)):
        r, est = rows[lab]
        assert r == math.ceil(n * qn / qd)
        true = vals[r - 1]
        assert abs(est - true) <= width, (lab, est, true, width)
