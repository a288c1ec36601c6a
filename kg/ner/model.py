"""M4 subword tokenize + M5 scorer forward + M6 subword->word align.

Mirrors the reference's HF token-classification inference path
(SURVEY.md §2.A M4-M6, reconstructed from BASELINE.json:6):

  words -> WordPiece-style pieces + word_ids mapping (M4)
        -> batched padded forward over per-piece label logits (M5)
        -> first-subword prediction per word (M6, HF -100 convention)

Executed as **iterator pandas UDFs** so the scorer weights are
materialized once per Python worker (the per-partition model
broadcast pattern from BASELINE.json:6), with **length-sorted
micro-batches + dynamic padding** inside each Arrow batch — the same
physical shape a real transformer forward would use, with the
transformer replaced by a deterministic featurized scorer
(kg.ner.vocab.model_weights; no torch in env, SURVEY.md §0).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from kg.ner import vocab as V

_ENCODE_SCHEMA = StructType(
    [
        StructField("pieces", ArrayType(StringType())),
        StructField("word_idx", ArrayType(IntegerType())),
    ]
)

MICRO_BATCH = 128


class _Model:
    """Per-worker lazily built scorer state (weights + caches)."""

    _instance: "_Model | None" = None

    def __init__(self) -> None:
        # sentence-level padding uses a per-batch -1e9 row appended in
        # forward_tags; no feature-level pad row is needed (all
        # feature indices are already % FEATURE_DIM)
        self.W = V.model_weights()
        self.vocab = V.piece_vocab()
        self.labels = np.array(V.LABELS)
        self._word_pieces: dict[str, list[str]] = {}
        self._piece_logits: dict[str, np.ndarray] = {}
        self._word_tag: dict[str, str] = {}

    @classmethod
    def get(cls) -> "_Model":
        # one deserialization per python worker process — the
        # broadcast-once pattern (weights are built deterministically
        # from the in-repo gazetteer, so there is no file to ship).
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    # ---- M4 ---------------------------------------------------------
    def pieces_of(self, word: str) -> list[str]:
        p = self._word_pieces.get(word)
        if p is None:
            p = V.word_to_pieces(word, self.vocab)
            self._word_pieces[word] = p
        return p

    def encode(self, words: list[str]) -> tuple[list[str], list[int]]:
        """words -> (pieces, word_idx) — HF word_ids() equivalent."""
        pieces: list[str] = []
        word_idx: list[int] = []
        for wi, w in enumerate(words):
            for p in self.pieces_of(w):
                pieces.append(p)
                word_idx.append(wi)
        return pieces, word_idx

    # ---- M5 ---------------------------------------------------------
    def _piece_logit_rows(self, unique_pieces: list[str]) -> np.ndarray:
        """Featurize + gather-sum 'forward' for unique pieces: the
        matmul equivalent logits = onehot(features) @ W."""
        rows = np.empty((len(unique_pieces), V.N_LABELS), dtype=np.float32)
        for i, p in enumerate(unique_pieces):
            cached = self._piece_logits.get(p)
            if cached is None:
                feats = V.piece_features(p)
                # logits = onehot(features) @ W, as a row gather-sum
                cached = self.W[feats].sum(axis=0)
                self._piece_logits[p] = cached
            rows[i] = cached
        return rows

    def forward_tags(self, sent_words: list[list[str]]) -> list[list[str]]:
        """M4+M5+M6 over a batch of sentences.

        Length-sorted micro-batches with dynamic padding: sentences
        are ordered by piece count, padded only to the micro-batch
        max, argmax'd, then restored to input order (BASELINE.json:6
        'dynamic padding, length-sorted micro-batches')."""
        n = len(sent_words)
        encoded = [self.encode(w) for w in sent_words]
        order = sorted(range(n), key=lambda i: len(encoded[i][0]))

        # per-batch piece id space
        piece_ids: dict[str, int] = {}
        for pieces, _ in encoded:
            for p in pieces:
                if p not in piece_ids:
                    piece_ids[p] = len(piece_ids)
        uniq = list(piece_ids)
        logits_table = self._piece_logit_rows(uniq)  # [P, L]
        pad_row = len(uniq)
        logits_table = np.vstack(
            [logits_table, np.full((1, V.N_LABELS), -1e9, dtype=np.float32)]
        )

        pred_piece_label: list[np.ndarray | None] = [None] * n
        for s in range(0, n, MICRO_BATCH):
            chunk = order[s : s + MICRO_BATCH]
            maxlen = max((len(encoded[i][0]) for i in chunk), default=0)
            if maxlen == 0:
                for i in chunk:
                    pred_piece_label[i] = np.empty(0, dtype=np.int64)
                continue
            ids = np.full((len(chunk), maxlen), pad_row, dtype=np.int64)
            for r, i in enumerate(chunk):
                pieces = encoded[i][0]
                ids[r, : len(pieces)] = [piece_ids[p] for p in pieces]
            batch_logits = logits_table[ids]          # [b, Lmax, L]
            pred = batch_logits.argmax(axis=2)        # [b, Lmax]
            for r, i in enumerate(chunk):
                pred_piece_label[i] = pred[r, : len(encoded[i][0])]

        # ---- M6: first-subword prediction per word ------------------
        out: list[list[str]] = []
        for i in range(n):
            words = sent_words[i]
            _, word_idx = encoded[i]
            piece_pred = pred_piece_label[i]
            tags = ["O"] * len(words)
            seen = -1
            for pos, wi in enumerate(word_idx):
                if wi != seen:  # first piece of the word
                    tags[wi] = str(self.labels[piece_pred[pos]])
                    seen = wi
            out.append(tags)
        return out


    # ---- fused fast path -------------------------------------------
    # The scorer is per-piece with no cross-token interaction, and M6
    # keeps only the FIRST subword's argmax per word — so the tag of a
    # word is a pure function of the word alone. Memoizing word -> tag
    # (guide §4.5: heavyweight work once per task, amortized across
    # batches) turns the per-sentence forward into dict lookups:
    # measured 12.4 -> 0.6 us/sentence on the bench fixture with
    # OUTPUT IDENTICAL to forward_tags (argmax over the same cached
    # float32 logits row, same first-index tie-break; asserted in
    # tests/test_ner_model.py). forward_tags stays as the
    # batched/padded reference shape for the visible M5 operator.
    _WORD_TAG_CACHE_MAX = 1 << 20  # bound worker memory on open vocab

    def tags_of(self, sent_words: list[list[str]]) -> list[list[str]]:
        """forward_tags-identical tags via the word-level memo."""
        cache = self._word_tag
        labels = self.labels
        out: list[list[str]] = []
        for words in sent_words:
            tags: list[str] = []
            for w in words:
                t = cache.get(w)
                if t is None:
                    pieces = self.pieces_of(w)
                    if pieces:
                        row = self._piece_logit_rows([pieces[0]])[0]
                        t = str(labels[int(row.argmax())])
                    else:
                        t = "O"
                    if len(cache) < self._WORD_TAG_CACHE_MAX:
                        cache[w] = t
                tags.append(t)
            out.append(tags)
        return out


# ---------------------------------------------------------- Spark ops


@pandas_udf(_ENCODE_SCHEMA)
def _encode_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    model = _Model.get()
    for words_col in it:
        recs = [model.encode(list(w)) for w in words_col]
        yield pd.DataFrame(
            {"pieces": [r[0] for r in recs], "word_idx": [r[1] for r in recs]}
        )


def subword_tokenize(df: DataFrame, words_col: str = "words") -> DataFrame:
    """M4 as a visible operator: + pieces, word_idx columns."""
    enc = _encode_udf(F.col(words_col))
    return df.withColumn("_enc", enc).select(
        "*", F.col("_enc.pieces").alias("pieces"),
        F.col("_enc.word_idx").alias("word_idx"),
    ).drop("_enc")


@pandas_udf(ArrayType(StringType()))
def _tag_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    model = _Model.get()  # once per worker, reused across batches
    for words_col in it:
        tags = model.forward_tags([list(w) for w in words_col])
        yield pd.Series(tags)


def tag_sentences(df: DataFrame, words_col: str = "words") -> DataFrame:
    """M4+M5+M6 fused batched inference: + tags: array<string>."""
    return df.withColumn("tags", _tag_udf(F.col(words_col)))


# parallel primitive arrays instead of array<struct>: Arrow converts
# list<primitive> vectorized, while list-of-dict rows fall back to
# slow object conversion (measured in the 1M-page profile)
_SPANS_SCHEMA = StructType(
    [
        StructField("ent_types", ArrayType(StringType())),
        StructField("begins", ArrayType(IntegerType())),
        StructField("ends", ArrayType(IntegerType())),
    ]
)


@pandas_udf(_SPANS_SCHEMA)
def _detect_spans_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """M4..M7 in ONE JVM<->Python crossing: tokenize+forward+align+BIO
    decode inside the same Arrow batch (the pipeline hot path; the
    separate tag/decode UDFs remain for per-op tests and queries)."""
    from kg.ner.bio import decode_bio

    model = _Model.get()
    for words_col in it:
        tags = model.tags_of([list(w) for w in words_col])
        spans = [decode_bio(ts) for ts in tags]
        yield pd.DataFrame(
            {
                "ent_types": [[s[0] for s in sp] for sp in spans],
                "begins": [[s[1] for s in sp] for sp in spans],
                "ends": [[s[2] for s in sp] for sp in spans],
            }
        )


def detect_mentions(
    df: DataFrame, words_col: str = "words", carry_words: bool = False
) -> DataFrame:
    """sentences(url, sent_id, words) -> mentions table, one fused
    Arrow stage + Catalyst explode/slice for surfaces.

    ``carry_words=True`` keeps the sentence token array on each
    mention row: K6's between-text then needs NO join back to the
    sentences table (saves a full shuffle+sort of the corpus-sized
    sentence relation at the cost of duplicating token arrays across
    a sentence's mentions)."""
    spans = df.withColumn("_spans", _detect_spans_udf(F.col(words_col))).select(
        "url",
        "sent_id",
        F.col(words_col).alias("_words"),
        F.explode(
            F.arrays_zip(
                F.col("_spans.ent_types").alias("ent_type"),
                F.col("_spans.begins").alias("begin"),
                F.col("_spans.ends").alias("end"),
            )
        ).alias("span"),
    )
    cols = [
        F.col("url"),
        F.col("sent_id"),
        F.xxhash64("url", "sent_id", F.col("span.begin")).alias("mention_id"),
        F.col("span.ent_type").alias("ent_type"),
        F.col("span.begin").alias("begin"),
        F.col("span.end").alias("end"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("_words"),
                F.col("span.begin") + 1,
                F.col("span.end") - F.col("span.begin"),
            ),
        ).alias("surface"),
        F.lit(1.0).alias("score"),
    ]
    if carry_words:
        cols.append(F.col("_words").alias("words"))
    return spans.select(*cols)
