"""M1/M4-M6/M8: CoNLL eval path, tokenizer alignment, scorer parity.

The CoNLL evaluation path is the reference-semantics gate named in
BASELINE.json:6: clean fixture F1 == 1.0, noise-injected >= 0.95.
"""

import pyspark.sql.functions as F

from kg.fixtures import write_conll_fixture
from kg.ner.bio import bio_to_mentions
from kg.ner.conll import read_conll
from kg.ner.metrics import entity_prf, per_type_prf
from kg.ner.model import _Model, tag_sentences
from kg.ner import vocab as V


def test_encode_word_ids_alignment():
    m = _Model.get()
    words = ["Alinda", "Stonefell", "works", "at", "Novari", "Labs", "."]
    pieces, word_idx = m.encode(words)
    # every word owns a contiguous non-empty piece range, in order
    assert word_idx == sorted(word_idx)
    assert set(word_idx) == set(range(len(words)))
    # reassembling continuation pieces restores each word
    rebuilt = [""] * len(words)
    for p, wi in zip(pieces, word_idx):
        rebuilt[wi] += p[2:] if p.startswith("##") else p
    assert rebuilt == words


def test_scorer_tags_match_intended_labels():
    """The hashed-feature scorer must reproduce the dictionary labels
    on every gazetteer/filler word (parity with the frozen-intended
    semantics on clean vocabulary)."""
    m = _Model.get()
    labels = V.word_label_map()
    words = list(labels)
    tags = m.forward_tags([words])[0]
    mismatches = [
        (w, want, got)
        for w, (want, got) in zip(words, zip(labels.values(), tags))
        if want != got
    ]
    assert not mismatches, mismatches[:10]


def test_word_tag_memo_equals_forward_tags():
    """r7: tags_of (the word-memoized fast path behind the fused
    span UDF) must reproduce forward_tags exactly — gazetteer words,
    filler words, corrupted/OOV words, empty sentences."""
    import random

    m = _Model.get()
    vocab = list(V.word_label_map()) + ["zzqx", "Unknown9", "x", ""]
    rng = random.Random(5)

    def corrupt(w):
        if not w:
            return w
        i = rng.randrange(len(w))
        return w[:i] + chr(97 + rng.randrange(26)) + w[i + 1 :]

    sents = []
    for _ in range(300):
        n = rng.randint(0, 12)
        s = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.3:
            s = [corrupt(w) if rng.random() < 0.2 else w for w in s]
        sents.append(s)
    sents.append([])
    assert m.tags_of(sents) == m.forward_tags(sents)


def test_length_sorted_micro_batches_preserve_order():
    m = _Model.get()
    sents = [
        ["Alinda", "Varek", "."],
        ["quiet"] * 40,
        ["Novari", "Labs", "is", "based", "in", "Valdoria", "."],
        [],
        ["the"],
    ]
    tags = m.forward_tags(sents)
    assert [len(t) for t in tags] == [len(s) for s in sents]
    assert tags[0][:2] == ["B-PER", "I-PER"]
    assert tags[2][0] == "B-ORG"


def _conll_f1(spark, tmp_path, noise):
    path = str(tmp_path / f"conll_{noise}.txt")
    write_conll_fixture(path, n_sentences=300, seed=7, noise=noise)
    gold = read_conll(spark, path)
    gold_mentions = bio_to_mentions(
        gold.withColumnRenamed("doc_id", "url")
    )
    pred = tag_sentences(gold.select("doc_id", "sent_id", "words"))
    pred_mentions = bio_to_mentions(pred.withColumnRenamed("doc_id", "url"))
    return entity_prf(pred_mentions, gold_mentions)


def test_conll_eval_clean_f1_is_one(spark, tmp_path):
    m = _conll_f1(spark, tmp_path, noise=0.0)
    assert m["f1"] == 1.0, m


def test_conll_eval_noisy_f1_gate(spark, tmp_path):
    m = _conll_f1(spark, tmp_path, noise=0.05)
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m


def test_conll_reader_preserves_order(spark, tmp_path):
    path = str(tmp_path / "tiny.txt")
    with open(path, "w") as f:
        f.write("Alpha B-PER\nBeta I-PER\n\nGamma O\nDelta B-LOC\n")
    rows = read_conll(spark, path).orderBy("sent_id").collect()
    assert rows[0]["words"] == ["Alpha", "Beta"]
    assert rows[0]["tags"] == ["B-PER", "I-PER"]
    assert rows[1]["words"] == ["Gamma", "Delta"]
    assert rows[1]["tags"] == ["O", "B-LOC"]


def test_per_type_report(spark, tmp_path):
    path = str(tmp_path / "conll_report.txt")
    write_conll_fixture(path, n_sentences=100, seed=7, noise=0.0)
    gold = read_conll(spark, path)
    gm = bio_to_mentions(gold.withColumnRenamed("doc_id", "url"))
    pred = tag_sentences(gold.select("doc_id", "sent_id", "words"))
    pm = bio_to_mentions(pred.withColumnRenamed("doc_id", "url"))
    rep = {r["ent_type"]: r for r in per_type_prf(pm, gm).collect()}
    assert set(rep) <= {"PER", "ORG", "LOC"}
    for t, r in rep.items():
        assert r["f1"] == 1.0, (t, r)
