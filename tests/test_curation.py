"""Curation operator gates: chunk math, deterministic sampling,
PII scrub counts, repetition scoring, vocab ranking."""

import pyspark.sql.functions as F

from kg.curation import (
    chunk_documents,
    pii_scrub,
    repetition_score,
    stratified_sample,
    token_vocab_topk,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_chunking_covers_every_token_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(95))
    chunks = sorted(
        chunk_documents(_docs(spark, [(1, text, "en", "s", 0)])).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [c["start_tok"] for c in chunks] == [1, 41, 81]
    assert [c["n_tokens"] for c in chunks] == [50, 50, 15]
    # overlap: chunk 2 starts 10 tokens before chunk 1 ends
    assert chunks[0]["chunk_text"].split()[40:] == chunks[1]["chunk_text"].split()[:10]
    # full coverage: union of chunk tokens == original tokens
    seen = set()
    for c in chunks:
        seen.update(c["chunk_text"].split())
    assert seen == set(text.split())


def test_stratified_sample_deterministic_and_ordered(spark):
    rows = [
        (i, "x", lang, "s", 0)
        for i in range(400)
        for lang in (["en"] if i % 2 == 0 else ["de"])
    ]
    docs = _docs(spark, rows)
    s1 = {r["doc_id"] for r in stratified_sample(docs).collect()}
    s2 = {r["doc_id"] for r in stratified_sample(docs).collect()}
    assert s1 == s2  # no rand(): identical on rerun
    n_en = sum(1 for d in s1 if d % 2 == 0)
    n_de = len(s1) - n_en
    # en keeps ~64/256, de ~192/256 of 200 docs each
    assert 30 <= n_en <= 70, n_en
    assert 120 <= n_de <= 180, n_de


def test_pii_scrub_counts_and_redacts(spark):
    text = (
        "reach me at jane.doe+spam@mail.example.org or "
        "+155-555-0199 from host 192.168.0.12 thanks"
    )
    r = pii_scrub(_docs(spark, [(7, text, "en", "s", 0)])).collect()[0]
    assert (r["n_email"], r["n_phone"], r["n_ip"]) == (1, 1, 1)
    assert "<EMAIL>" in r["scrubbed"] and "<PHONE>" in r["scrubbed"]
    assert "<IP>" in r["scrubbed"]
    assert "jane.doe" not in r["scrubbed"]
    assert "192.168" not in r["scrubbed"]


def test_repetition_score_flags_spam(spark):
    docs = _docs(
        spark,
        [
            (1, "buy now buy now buy now buy", "en", "s", 0),
            (2, "all tokens here are unique words", "en", "s", 0),
        ],
    )
    r = {x["doc_id"]: x for x in repetition_score(docs).collect()}
    assert r[1]["top_token"] == "buy" and r[1]["top_freq"] == 4
    assert r[1]["rep_ratio"] == 0.5714  # 4/7
    assert r[2]["top_freq"] == 1 and r[2]["rep_ratio"] < 0.2
    # tie-break: all freq-1 tokens -> lexicographically smallest
    assert r[2]["top_token"] == "all"


def test_vocab_topk_rank_order(spark):
    docs = _docs(
        spark,
        [(1, "b a a c b a", "en", "s", 0), (2, "c b", "en", "s", 0)],
    )
    rows = token_vocab_topk(docs, k=3).collect()
    got = [(r["token"], r["freq"], r["rank"]) for r in rows]
    assert sorted(got, key=lambda t: t[2]) == [("a", 3, 1), ("b", 3, 2), ("c", 2, 3)]


def test_pii_counts_equal_actual_redactions_on_overlap(spark):
    """'a@10.0.0.1.com' is ONE email and ZERO IPs: the email replace
    consumes the token, so counting every pattern on the original
    text would report a phantom IP redaction (reviewer finding)."""
    r = pii_scrub(
        _docs(spark, [(1, "mail a@10.0.0.1.com end", "en", "s", 0)])
    ).collect()[0]
    assert (r["n_email"], r["n_phone"], r["n_ip"]) == (1, 0, 0)
    assert r["scrubbed"] == "mail <EMAIL> end"


def test_bigram_lm_short_docs_dont_crash(spark):
    """Docs with < 2 tokens must be filtered, not crash: Spark's
    sequence(1, 0) DESCENDS and element_at(t, 0) throws under ANSI
    mode (reviewer finding — the DuckDB oracle returns empty)."""
    from kg.curation import bigram_lm

    docs = _docs(
        spark,
        [
            (1, "hello", "en", "s", 0),
            (2, "", "en", "s", 0),
            (3, "a b a b a b", "en", "s", 0),
        ],
    )
    rows = {(r["w1"], r["w2"]): r["n12"] for r in bigram_lm(docs, min_count=1).collect()}
    assert rows == {("a", "b"): 3, ("b", "a"): 2}


def _py_bpe_reference(word_freqs, n_merges):
    """Independent single-node BPE trainer (Sennrich-style): count
    adjacent symbol pairs weighted by word freq, merge the argmax
    (count desc, lhs, rhs) leftmost-non-overlapping, repeat."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + f
                )
        if not counts:
            break
        (x, y), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, x, y, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark):
    """Iterated BPE merges on a tiny corpus with a known answer equal
    an independent Python trainer, including overlap handling
    ('aaaa' merges to two 'aa', not three) and freq weighting."""
    from kg.curation import bpe_merges

    rows = [
        (1, "banana bandana aaaa", "en", "s", 0),
        (2, "banana banana low lower lowest", "en", "s", 0),
        (3, "aaaa abab low low", "en", "s", 0),
    ]
    words = {}
    for _, text, *_ in rows:
        for w in text.split():
            if w.isalpha() and w.islower() and 2 <= len(w) <= 20:
                words[w] = words.get(w, 0) + 1
    expected = _py_bpe_reference(words, 5)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_merges(_docs(spark, rows), n_merges=5)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected, (got, expected)
    # sanity on the known corpus: the first merge is 'an' (2 positions
    # in each of banana x3 and bandana x1 = 8, position-counted)
    assert got[0][1] + got[0][2] == "an" and got[0][3] == 8


def test_bpe_merges_50_rounds_flat_time(spark):
    """Large-n_merges behavior (r4 verdict #4): 50 rounds with the
    periodic vocab barrier (BPE_BARRIER_EVERY) must (a) still equal
    the independent Python trainer exactly and (b) keep per-round
    wall time flat — without the barrier the chained _apply_merge
    folds make round r re-execute rounds 1..r-1 (O(N^2)), so late
    rounds would be ~(45/10)^2 ≈ 20x the early ones; the 3x bound
    below separates that cleanly from host noise."""
    import random

    from kg.curation import bpe_merges

    rng = random.Random(7)
    words: dict[str, int] = {}
    for _ in range(80):
        w = "".join(rng.choice("abcdefgh") for _ in range(rng.randint(6, 12)))
        words[w] = words.get(w, 0) + rng.randint(1, 9)
    text = " ".join(w for w, f in sorted(words.items()) for _ in range(f))
    expected = _py_bpe_reference(words, 50)
    times: list[float] = []
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_merges(
            _docs(spark, [(1, text, "en", "s", 0)]),
            n_merges=50,
            round_times=times,
        )
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected
    assert len(got) == 50  # corpus rich enough that rounds never run dry
    # min, not mean (r5 review): co-tenant bursts on this shared host
    # can inflate any individual round multi-x, but contention only
    # ADDS time — the least-contended late round vs the least-contended
    # early round is the contention-robust O(N^2)-regression detector
    # (same estimator rationale as bench.py's min-of-N)
    assert min(times[35:50]) < 3 * min(times[3:18]) + 2.0, times


def test_pack_sequences_contiguous_and_exact(spark):
    """Concat-and-cut packing invariants: within every batch the docs
    tile the token stream contiguously in epoch order (tok_start ==
    running sum), sequence ids bracket each doc's token extent at
    seq_len granularity, empty docs are dropped, and the layout is
    partitioning-invariant."""
    from kg.curation import pack_sequences

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + i % 7)), "en", "s", 0)
            for i in range(50)]
    rows.append((50, "", "en", "s", 0))  # empty -> dropped
    docs = _docs(spark, rows)
    out = [
        (r["doc_id"], r["batch"], r["pos"], r["n_tok"], r["tok_start"],
         r["seq_first"], r["seq_last"])
        for r in pack_sequences(docs, seq_len=4).collect()
    ]
    assert {t[0] for t in out} == set(range(50))  # empty doc gone
    by_batch: dict = {}
    for t in out:
        by_batch.setdefault(t[1], []).append(t)
    for _batch, ts in by_batch.items():
        ts.sort(key=lambda t: t[2])
        run = 0
        for _, _, _, n_tok, tok_start, sf, sl in ts:
            assert tok_start == run
            assert sf == tok_start // 4
            assert sl == (tok_start + n_tok - 1) // 4
            run += n_tok
    again = {
        (r["doc_id"], r["tok_start"])
        for r in pack_sequences(docs.repartition(5), seq_len=4).collect()
    }
    assert again == {(t[0], t[4]) for t in out}


def test_tfidf_matches_python_math(spark):
    """tf-idf on a 3-doc corpus with hand-checkable counts equals
    round(tf * ln(N/df), 4) from Python's math.log, with (score desc,
    term) ranking."""
    import math

    from kg.textstats import tfidf_topk

    docs = _docs(
        spark,
        [
            (1, "apple apple banana", "en", "s", 0),
            (2, "banana cherry", "en", "s", 0),
            (3, "cherry cherry cherry", "en", "s", 0),
        ],
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"], r["rk"])
        for r in tfidf_topk(docs, k=5).collect()
    }
    s = lambda tf, df: round(tf * math.log(3.0 / df), 4)
    assert got == {
        (1, "apple"): (2, 1, s(2, 1), 1),
        (1, "banana"): (1, 2, s(1, 2), 2),
        (2, "banana"): (1, 2, s(1, 2), 1),  # score tie -> term asc
        (2, "cherry"): (1, 2, s(1, 2), 2),
        (3, "cherry"): (3, 2, s(3, 2), 1),
    }, got


def test_decontaminate_flags_planted_phrase_only(spark):
    from kg.curation import decontaminate

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta", "en", "s", 0),
            (2, "alpha beta SECRET EVAL SET gamma", "en", "s", 0),
            (3, "SECRET EVAL other words here", "en", "s", 0),  # partial
            (4, "x SECRET EVAL SET SECRET EVAL SET", "en", "s", 0),
            # whitespace/case robustness (r4 advice): tab + double
            # space separated, and lowercase vs the UPPER banned phrase
            (5, "pre secret\teval  set post", "en", "s", 0),
            (6, "pre Secret Eval Set\npost", "en", "s", 0),
            # vertical tab: in Java's \s but NOT RE2's — WS_REGEX
            # spells the class explicitly so both engines split here
            (7, "pre secret\x0beval set post", "en", "s", 0),
        ],
    )
    got = {
        r["doc_id"]: (r["n_banned_hits"], r["contaminated"])
        for r in decontaminate(docs, ["SECRET EVAL SET"]).collect()
    }
    # distinct-gram semantics: doc 4 contains the phrase twice but the
    # gram SET is distinct -> 1 hit; doc 3's partial phrase never flags
    assert got == {
        1: (0, 0), 2: (1, 1), 3: (0, 0), 4: (1, 1), 5: (1, 1), 6: (1, 1),
        7: (1, 1),
    }, got
    # a whitespace-only phrase normalizes to "" (split len 1) and could
    # never match any token — must hard-fail even at n=1 (r5 review)
    import pytest

    with pytest.raises(ValueError):
        decontaminate(docs, ["   "], n=1)


def test_shuffle_batches_deterministic_and_complete(spark):
    import hashlib

    from kg.curation import shuffle_batches

    docs = _docs(spark, [(i, "x", "en", "s", 0) for i in range(200)])
    a = {(r["doc_id"], r["batch"], r["pos"]) for r in shuffle_batches(docs).collect()}
    b = {
        (r["doc_id"], r["batch"], r["pos"])
        for r in shuffle_batches(docs.repartition(7)).collect()
    }
    assert a == b  # partitioning-independent
    assert len(a) == 200  # every doc assigned exactly once
    # batch matches the md5 derivation; positions are 1..size per batch
    by_batch = {}
    for doc_id, batch, pos in a:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        assert batch == h % 64, (doc_id, batch)
        by_batch.setdefault(batch, []).append(pos)
    for batch, poss in by_batch.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), batch


def test_lm_score_matches_python_reference(spark):
    """lm_score vs an independent single-node reference: same train
    split (even doc_ids), same add-one smoothing, micro-nat rounding
    reproduced with python floats (identical IEEE ops)."""
    import math
    from collections import Counter

    from kg.curation import LM_MIN_COUNT, lm_score

    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    toks = {r["doc_id"]: r["text"].split(" ") for r in rows}
    lm, ctx, vocab = Counter(), Counter(), set()
    for did, t in toks.items():
        if did % 2 == 0:
            vocab.update(t)
            for a, b in zip(t, t[1:]):
                lm[(a, b)] += 1
                ctx[a] += 1
    v = len(vocab)
    want = {}
    for did, t in toks.items():
        grams = list(zip(t, t[1:]))
        if not grams:
            continue
        s = 0
        n_oov = n_cov = 0
        for g in grams:
            n12 = lm.get(g, 0)
            n_oov += n12 == 0
            n_cov += n12 >= LM_MIN_COUNT
            p = float(n12 + 1) / float(ctx.get(g[0], 0) + v)
            # same expression shape as the engine: round half-away
            x = -math.log(p) * 1000000.0
            s += int(math.floor(x + 0.5))
        want[did] = (len(grams), n_oov, n_cov, round(s / (len(grams) * 1000000.0), 4))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["n_covered"], r["avg_nll"])
        for r in lm_score(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ).collect()
    }
    assert got == want
    # the train/score split must actually produce unseen bigrams
    assert any(o > 0 for (_, o, _, _) in got.values())


def test_mix_domains_hits_target_ratios(spark):
    """mix_domains: the binding domain keeps everything; every kept
    set is reproducible (md5-thresholded, rerun-identical) and kept
    counts land near the target weights."""
    from kg.curation import MIX_WEIGHTS, mix_domains

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = mix_domains(docs).groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in kept}
    full = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    # src0 (weight 3) is the binding domain on the uniform fixture:
    # kept in full
    assert counts.get("src0") == full["src0"]
    # weight-1 domains keep ~1/3 of src0's kept count (md5 noise at
    # tiny n: allow a wide but real band, and none may exceed src0)
    others = [counts.get(s, 0) for s in full if s != "src0"]
    assert all(o <= counts["src0"] for o in others)
    assert 0 < sum(others) / len(others) < full["src0"]
    # deterministic: a second run is identical
    again = {
        r["source"]: r["count"]
        for r in mix_domains(docs).groupBy("source").count().collect()
    }
    assert again == counts


def test_mix_domains_respects_explicit_weights(spark):
    """With weights concentrating on two sources, everything else is
    dropped and the kept ratio tracks the weights."""
    from kg.curation import mix_domains

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = mix_domains(docs, {"src1": 2, "src2": 1}).collect()
    srcs = {r["source"] for r in kept}
    assert srcs <= {"src1", "src2"}
    n1 = sum(1 for r in kept if r["source"] == "src1")
    n2 = sum(1 for r in kept if r["source"] == "src2")
    # src1 binds (higher weight on equal counts): kept fully; src2
    # keeps about half
    assert n1 >= n2 > 0


def test_bpe_encode_vocab_matches_python_apply(spark):
    """The encode table must equal independently applying the learned
    merges (greedy-left, in rank order) to every vocab word — the
    'aaaa' overlap case must count 2 tokens after the 'aa' merge, not
    3, and every count must sit in [1, len(word)]."""
    from kg.curation import bpe_encode_vocab

    rows = [
        (1, "banana bandana aaaa", "en", "s", 0),
        (2, "banana banana low lower lowest", "en", "s", 0),
        (3, "aaaa abab low low", "en", "s", 0),
    ]
    words = {}
    for _, text, *_ in rows:
        for w in text.split():
            if w.isalpha() and w.islower() and 2 <= len(w) <= 20:
                words[w] = words.get(w, 0) + 1
    merges = [(x, y) for _, x, y, _ in _py_bpe_reference(words, 5)]

    def encode(word):
        syms = list(word)
        for x, y in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    got = {
        r["w"]: (r["n_tokens"], r["freq"])
        for r in bpe_encode_vocab(_docs(spark, rows), n_merges=5).collect()
    }
    assert got == {w: (encode(w), f) for w, f in words.items()}
    assert all(1 <= n <= len(w) for w, (n, _) in got.items())
    assert got["aaaa"][0] == 2  # two 'aa' tokens, not three


def test_exotic_whitespace_one_token_stream_everywhere(spark):
    """r5 verdict gate: every corpus-text tokenizer shares ws_tokens'
    explicit whitespace class. A document whose words are separated by
    tabs, newlines, CR, form-feed, vertical tab, and multi-space runs
    must produce the SAME token stream in vocab building, quality
    stats, chunking, span-dup profiling, shingling, and
    decontamination — before r6 these 29 sites split on a single
    literal space and would each see a different stream."""
    import re

    from kg.dedup import shingles_df, substring_dup_stats
    from kg.relational import WS_REGEX
    from kg.curation import decontaminate
    from kg.textstats import quality_features

    text = "alpha\tbeta\n\ngamma \x0b delta\r\nepsilon  zeta\fbeta gamma"
    expected = [t for t in re.split("[ \t\n\x0b\f\r]+", text) if t]
    assert expected == [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "beta", "gamma"
    ]
    # the test is only meaningful if the regex classes agree
    assert re.sub(r"\\+", "\\\\", WS_REGEX) in ("[ \\t\\n\\x0B\\f\\r]+",)
    docs = _docs(spark, [(1, text, "en", "s", len(text))])

    vocab = {r["token"]: r["freq"] for r in token_vocab_topk(docs).collect()}
    from collections import Counter

    assert vocab == dict(Counter(expected))

    q = quality_features(docs).collect()[0]
    assert q["n_tokens"] == len(expected)

    chunks = chunk_documents(docs, chunk_tokens=5, stride=5).collect()
    rebuilt = " ".join(c["chunk_text"] for c in sorted(chunks, key=lambda c: c["chunk_id"]))
    assert rebuilt == " ".join(expected)

    # bigram shingles cross every whitespace flavor
    sh = {r["shingle"] for r in shingles_df(docs, n=2).collect()}
    assert sh == {f"{a} {b}" for a, b in zip(expected, expected[1:])}

    # span-dup profile counts token bigrams, not space-delimited blobs
    stats = substring_dup_stats(docs, n=2).collect()[0]
    assert stats["n_grams"] == len(expected) - 1

    # an eval phrase straddling a newline still flags
    flagged = decontaminate(docs, ["beta gamma"], n=2).collect()[0]
    assert flagged["contaminated"] == 1
    assert flagged["n_banned_hits"] == 1


def test_decontaminate_multi_ors_across_widths(spark):
    """Multi-n sweep: a 3-gram-only doc, a 5-gram-only doc, a
    both-phrases doc (hits sum), and a clean doc — flags OR across
    widths; a phrase whose width matches no sweep entry raises."""
    import pytest

    from kg.curation import decontaminate_multi

    p3, p5 = "zzq eval holdout", "zzv hidden test answer key"
    rows = [
        (0, f"alpha {p3} beta", "en", "s", 0),
        (1, f"gamma {p5} delta", "en", "s", 0),
        (2, f"{p3} and {p5}", "en", "s", 0),
        (3, "totally clean text here", "en", "s", 0),
    ]
    docs = _docs(spark, rows)
    got = {
        r["doc_id"]: (r["n_banned_hits"], r["contaminated"])
        for r in decontaminate_multi(docs, {3: [p3], 5: [p5]}).collect()
    }
    assert got == {0: (1, 1), 1: (1, 1), 2: (2, 1), 3: (0, 0)}

    with pytest.raises(ValueError):
        decontaminate_multi(docs, {5: [p3]})  # 3 words under n=5
    with pytest.raises(ValueError):
        decontaminate_multi(docs, {})
