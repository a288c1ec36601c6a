

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
