"""FROZEN single-node pure-Python KG oracle (SURVEY.md §5 layer 1).

An *independent* implementation of the intended pipeline semantics —
dictionary word tagging instead of the hashed-feature scorer, plain
loops instead of DataFrames, union-find instead of iterative joins.
Operationally defines "the reference's emitted triples" for the
P/R >= 0.95 gate (BASELINE.json:14): the Spark pipeline must
reproduce these spans/triples exactly on clean text.

Imports ONLY the gazetteer *data* surface (entity registry + alias
rows) so both sides agree on the fixture vocabulary; every algorithm
is reimplemented here. Do not refactor together with kg/.
"""

from __future__ import annotations

import re

from tests.oracle.extract_frozen import extract_text_frozen

# data-only imports (lists of dicts; no logic reused)
from kg.ner.vocab import alias_rows, entity_registry

SENTENCE_RE = re.compile(r"(?<=[.!?])\s+|\n+")

RELATION_RULES = {
    "works at": ("works_for", 0.95),
    "visited": ("visited", 0.90),
    "is based in": ("based_in", 0.95),
    "met": ("met", 0.85),
}


def _word_labels() -> dict[str, str]:
    m: dict[str, str] = {}
    for e in entity_registry():
        ws = e["surface"].split()
        m.setdefault(ws[0], "B-" + e["ent_type"])
        for w in ws[1:]:
            m.setdefault(w, "I-" + e["ent_type"])
    return m


def _alias_map() -> dict[str, list[tuple[int, float]]]:
    m: dict[str, list[tuple[int, float]]] = {}
    for r in alias_rows():
        m.setdefault(r["alias"], []).append((r["entity_id"], r["prior"]))
    return m


def _surfaces() -> dict[int, str]:
    return {e["entity_id"]: e["surface"] for e in entity_registry()}


def _trigram_vec(s: str) -> dict[int, float]:
    # independent 64-dim hashed embedding (same public spec: md5 of
    # 'emb|<3gram>', sign from bit 32) reimplemented with dicts
    import hashlib

    v: dict[int, float] = {}
    t = "^" + s.lower() + "$"
    for i in range(len(t) - 2):
        h = int.from_bytes(
            hashlib.md5(("emb|" + t[i : i + 3]).encode()).digest()[:8], "little"
        )
        idx = h % 64
        v[idx] = v.get(idx, 0.0) + (1.0 if (h >> 32) & 1 else -1.0)
    return v


def _cos(a: dict[int, float], b: dict[int, float]) -> float:
    import math

    dot = sum(x * b.get(i, 0.0) for i, x in a.items())
    na = math.sqrt(sum(x * x for x in a.values()))
    nb = math.sqrt(sum(x * x for x in b.values()))
    return dot / (na * nb) if na and nb else 0.0


def decode_bio_frozen(tags: list[str]) -> list[tuple[str, int, int]]:
    spans, open_t, b = [], None, 0
    for i, t in enumerate(tags):
        if t.startswith("B-"):
            if open_t:
                spans.append((open_t, b, i))
            open_t, b = t[2:], i
        elif t.startswith("I-"):
            if open_t != t[2:]:
                if open_t:
                    spans.append((open_t, b, i))
                open_t, b = t[2:], i
        else:
            if open_t:
                spans.append((open_t, b, i))
                open_t = None
    if open_t:
        spans.append((open_t, b, len(tags)))
    return spans


class FrozenOracle:
    def __init__(self) -> None:
        self.labels = _word_labels()
        self.aliases = _alias_map()
        self.entity_vecs = {
            eid: _trigram_vec(surf) for eid, surf in _surfaces().items()
        }
        # union-find over high-prior shared aliases
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for alias, cands in self.aliases.items():
            high = [eid for eid, p in cands if p >= 0.5]
            for other in high[1:]:
                ra, rb = find(high[0]), find(other)
                if ra != rb:
                    # min-id root, matching the Spark convention
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
        self._find = find

    def component(self, eid: int) -> int:
        return self._find(eid)

    # ---- per-page pipeline ------------------------------------------
    def mentions(self, text: str) -> list[dict]:
        out = []
        # sent_id = position in the raw split INCLUDING empty segments
        # (mirrors Spark's posexplode-then-filter exactly)
        for sid, raw in enumerate(SENTENCE_RE.split(text)):
            sent = raw.strip()
            if not sent:
                continue
            words = sent.split()
            tags = [self.labels.get(w, "O") for w in words]
            for (t, b, e) in decode_bio_frozen(tags):
                out.append(
                    {
                        "sent_id": sid,
                        "ent_type": t,
                        "begin": b,
                        "end": e,
                        "surface": " ".join(words[b:e]),
                        "words": words,
                    }
                )
        return out

    def link(self, surface: str) -> int | None:
        cands = self.aliases.get(surface.lower())
        if not cands:
            return None
        mv = _trigram_vec(surface)
        best = min(
            cands,
            key=lambda c: (-round(self._cos_cached(mv, c[0]), 9), c[0]),
        )
        return best[0]

    def _cos_cached(self, mv: dict[int, float], eid: int) -> float:
        return _cos(mv, self.entity_vecs[eid])

    def triples(self, pages: list[dict]) -> set[tuple]:
        """pages: [{url, html}] -> {(subj_comp, pred, obj_comp, url, sent_id)}"""
        out: set[tuple] = set()
        for page in pages:
            text = extract_text_frozen(page["html"])
            ms = self.mentions(text)
            by_sent: dict[int, list[dict]] = {}
            for m in ms:
                eid = self.link(m["surface"])
                if eid is None:
                    continue
                m = {**m, "entity_id": eid}
                by_sent.setdefault(m["sent_id"], []).append(m)
            for sid, sms in by_sent.items():
                sms.sort(key=lambda m: m["begin"])
                for i in range(len(sms)):
                    for j in range(len(sms)):
                        a, b = sms[i], sms[j]
                        if a["begin"] >= b["begin"]:
                            continue
                        between = " ".join(
                            a["words"][a["end"] : b["begin"]]
                        ).lower()
                        rule = RELATION_RULES.get(between)
                        if rule:
                            out.add(
                                (
                                    self.component(a["entity_id"]),
                                    rule[0],
                                    self.component(b["entity_id"]),
                                    page["url"],
                                    sid,
                                )
                            )
        return out
