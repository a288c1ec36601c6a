"""NER core (SURVEY.md §2.A): the reference-semantics operators.

M1 conll_read, M2 sentence_split, M3 word_tokenize, M4 subword
tokenize, M5 deterministic scorer forward, M6 subword->word
alignment, M7 BIO decode, M8 seqeval-equivalent entity-level metrics.

The reference's transformer forward is replaced by a deterministic
featurized scorer (no torch/transformers in env — SURVEY.md §0) that
preserves the *pipeline semantics* named in BASELINE.json:6: subword
tokenization with word_ids alignment, batched padded forward with
length-sorted micro-batches, first-subword tag per word, BIO span
decoding, entity-level exact-match P/R/F1.
"""
