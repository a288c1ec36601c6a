"""M7 BIO decode: unit cases + span->tags->span round-trip property."""

import random

from kg.ner.bio import decode_bio
from tests.oracle.kg_frozen import decode_bio_frozen

CASES = [
    ([], []),
    (["O", "O"], []),
    (["B-PER"], [("PER", 0, 1)]),
    (["B-PER", "I-PER", "O"], [("PER", 0, 2)]),
    (["B-PER", "B-PER"], [("PER", 0, 1), ("PER", 1, 2)]),
    (["B-PER", "I-ORG"], [("PER", 0, 1), ("ORG", 1, 2)]),
    # seqeval lenient: dangling I- opens a new span
    (["O", "I-LOC", "I-LOC", "O"], [("LOC", 1, 3)]),
    (["I-PER"], [("PER", 0, 1)]),
    (["B-ORG", "I-ORG", "I-ORG", "B-ORG"], [("ORG", 0, 3), ("ORG", 3, 4)]),
    (["B-LOC", "O", "I-LOC"], [("LOC", 0, 1), ("LOC", 2, 3)]),
]


def test_decode_cases():
    for tags, want in CASES:
        assert decode_bio(tags) == want, tags
        assert decode_bio_frozen(tags) == want, tags


def spans_to_tags(spans, n):
    tags = ["O"] * n
    for t, b, e in spans:
        tags[b] = f"B-{t}"
        for i in range(b + 1, e):
            tags[i] = f"I-{t}"
    return tags


def test_roundtrip_property():
    """Non-overlapping spans encoded to BIO decode back exactly
    (seeded parametrization stands in for hypothesis, SURVEY.md §5)."""
    rng = random.Random(7)
    types = ["PER", "ORG", "LOC"]
    for _ in range(500):
        n = rng.randint(0, 20)
        spans, pos = [], 0
        while pos < n:
            if rng.random() < 0.4:
                ln = rng.randint(1, min(3, n - pos))
                spans.append((rng.choice(types), pos, pos + ln))
                pos += ln
            else:
                pos += 1
        tags = spans_to_tags(spans, n)
        assert decode_bio(tags) == spans, (tags, spans)


def test_spark_decode_matches_kernel(spark):
    """The distributed posexplode path produces the kernel's spans."""
    from kg.ner.bio import bio_to_mentions

    rows = [
        ("u1", 0, ["Alice", "Smith", "met", "Bob", "."],
         ["B-PER", "I-PER", "O", "B-PER", "O"]),
        ("u1", 1, ["nothing", "here", "."], ["O", "O", "O"]),
        ("u2", 0, ["Acme", "Corp", "in", "Paris", "."],
         ["B-ORG", "I-ORG", "O", "B-LOC", "O"]),
    ]
    df = spark.createDataFrame(
        rows, "url string, sent_id int, words array<string>, tags array<string>"
    )
    got = {
        (r["url"], r["sent_id"], r["ent_type"], r["begin"], r["end"], r["surface"])
        for r in bio_to_mentions(df).collect()
    }
    assert got == {
        ("u1", 0, "PER", 0, 2, "Alice Smith"),
        ("u1", 0, "PER", 3, 4, "Bob"),
        ("u2", 0, "ORG", 0, 2, "Acme Corp"),
        ("u2", 0, "LOC", 3, 4, "Paris"),
    }
