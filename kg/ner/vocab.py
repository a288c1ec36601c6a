"""Gazetteer, label set, subword vocab, and the deterministic scorer
weights (the engine's stand-in for the reference's fine-tuned
transformer checkpoint — SURVEY.md §2.A M5, §7 Milestone 2).

Everything here is seeded/deterministic and stdlib+numpy only. The
"model" is a linear scorer over hashed character n-gram features with
an exact-match feature that memorizes the gazetteer — the same
featurize -> padded batch -> matmul -> argmax shape as a transformer
token classifier, minus the learned context mixing.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------- labels

LABELS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC"]
LABEL_TO_ID = {l: i for i, l in enumerate(LABELS)}
N_LABELS = len(LABELS)

# ------------------------------------------------------------- gazetteer

_FIRST_NAMES = [
    "Alinda", "Borvan", "Cedrik", "Darelle", "Evandra", "Fenwick",
    "Galiana", "Hobart", "Isolde", "Jorvik", "Katriel", "Lorimar",
]
_LAST_NAMES = [
    "Varek", "Stonefell", "Quillon", "Marchetti", "Ombrave",
    "Pellerin", "Rookwood", "Sablethorn", "Tarquin", "Undermere",
]
_ORG_STEMS = [
    "Novari", "Quellix", "Zephyrion", "Bramblecore", "Luminara",
    "Vantrel", "Ostrander", "Kiremor", "Thaleon", "Pyrelight",
    "Snowdrift", "Veridian", "Marrowgate", "Cobaltine", "Fernhollow",
]
_ORG_SUFFIXES = ["Labs", "Corp", "Group", "Institute", "Systems"]
_LOC_SINGLE = [
    "Valdoria", "Eastmoor", "Karavel", "Lundholm", "Tessarine",
    "Windmere", "Ashgrove", "Brinevale", "Coldharbor", "Duskwell",
]
_LOC_PAIR_FIRST = ["Port", "Lake", "Mount", "Fort", "Cape"]
_LOC_PAIR_SECOND = ["Meridian", "Solstice", "Vermello", "Ketterly", "Ravenna"]

FILLER_WORDS = (
    "the a an and or but while after before during again quietly "
    "slowly report meeting project garden window coffee morning "
    "evening river stone paper letter music silence number update "
    "journey harvest lantern bridge market story winter summer "
    "question answer travel notice signal record detail moment "
    "season corner village road simple quiet bright early late "
    "often never always seldom nearby together apart beyond under "
    "over toward against without within"
).split()

# template glue words (also label O)
TEMPLATE_WORDS = (
    "works at visited last spring is based in met yesterday . ,".split()
)


def persons() -> list[str]:
    """30 two-word person names, deterministic pairing."""
    out = []
    for i in range(30):
        out.append(f"{_FIRST_NAMES[i % 12]} {_LAST_NAMES[(i * 7 + 3) % 10]}")
    # dedup while keeping order (pairing above yields unique combos)
    seen, uniq = set(), []
    for p in out:
        if p not in seen:
            seen.add(p)
            uniq.append(p)
    return uniq


def orgs() -> list[str]:
    """20 orgs + 5 duplicate-surface variants (for canonicalization).

    The variants ("X Corp" vs "X Incorporated") get distinct entity
    ids but share the stem alias, producing the same-as edges K7 must
    merge (SURVEY.md §2.B K7).
    """
    base = [
        f"{_ORG_STEMS[i]} {_ORG_SUFFIXES[i % len(_ORG_SUFFIXES)]}"
        for i in range(15)
    ]
    variants = [f"{_ORG_STEMS[i]} Holdings" for i in range(5)]
    return base + variants


def locations() -> list[str]:
    single = list(_LOC_SINGLE)
    pairs = [
        f"{_LOC_PAIR_FIRST[i]} {_LOC_PAIR_SECOND[(i * 3 + 1) % 5]}"
        for i in range(5)
    ]
    return single + pairs


@lru_cache(maxsize=1)
def entity_registry() -> list[dict]:
    """Canonical entity list: id, type, canonical surface, component.

    ``component`` is the gold canonical-group id: the 5 org "Holdings"
    variants share a component with their stem org; everything else is
    its own component.
    """
    ents: list[dict] = []
    eid = 1000
    for p in persons():
        ents.append({"entity_id": eid, "ent_type": "PER", "surface": p,
                     "gold_component": eid})
        eid += 1
    org_list = orgs()
    stem_component: dict[str, int] = {}
    for o in org_list:
        stem = o.split()[0]
        comp = stem_component.get(stem, eid)
        stem_component.setdefault(stem, comp)
        ents.append({"entity_id": eid, "ent_type": "ORG", "surface": o,
                     "gold_component": comp})
        eid += 1
    for l in locations():
        ents.append({"entity_id": eid, "ent_type": "LOC", "surface": l,
                     "gold_component": eid})
        eid += 1
    return ents


@lru_cache(maxsize=1)
def alias_rows() -> list[dict]:
    """Alias dictionary for K3 (broadcast side): lowercase alias ->
    entity_id with prior.

    Full surface: prior 0.9. Stem word: 0.6 for ORG (distinctive stems
    like 'quellix' — shared between an org and its Holdings variant,
    driving both K4 multi-candidate re-rank and K7 same-as edges) but
    0.3 for PER/LOC (an ambiguous first name must NOT merge people —
    kg.graph.SAME_AS_PRIOR sits between the two)."""
    best: dict[tuple[str, int], float] = {}
    for e in entity_registry():
        full = e["surface"].lower()
        stem = e["surface"].split()[0].lower()
        stem_prior = 0.6 if e["ent_type"] == "ORG" else 0.3
        # single-word surfaces make full == stem: keep max prior so
        # (alias, entity_id) pairs are unique (duplicate candidate
        # rows would double-link every mention downstream)
        best[(full, e["entity_id"])] = max(
            best.get((full, e["entity_id"]), 0.0), 0.9
        )
        best[(stem, e["entity_id"])] = max(
            best.get((stem, e["entity_id"]), 0.0), stem_prior
        )
    return [
        {"alias": a, "entity_id": eid, "prior": p}
        for (a, eid), p in best.items()
    ]


# ------------------------------------------------- word-level gold labels


@lru_cache(maxsize=1)
def word_label_map() -> dict[str, str]:
    """word -> BIO label (context-free by construction: no word plays
    two roles in the gazetteer)."""
    m: dict[str, str] = {}
    for e in entity_registry():
        words = e["surface"].split()
        t = e["ent_type"]
        m.setdefault(words[0], f"B-{t}")
        for w in words[1:]:
            m.setdefault(w, f"I-{t}")
    for w in FILLER_WORDS + TEMPLATE_WORDS:
        m.setdefault(w, "O")
    return m


# ------------------------------------------------------- subword vocab

WORDPIECE_SPLIT_LEN = 6  # words longer than this split into 2 pieces


def word_to_pieces(word: str, piece_vocab: frozenset[str] | None = None) -> list[str]:
    """M4 kernel: WordPiece-style greedy split of one word.

    Known-shape split: <=6 chars -> [word]; else [word[:4], '##rest'].
    With a vocab, unknown words fall back to greedy longest-match over
    the vocab (single chars guarantee termination), mirroring HF
    WordPiece's [UNK]-free char fallback.
    """
    if piece_vocab is None or word in piece_vocab:
        if len(word) <= WORDPIECE_SPLIT_LEN:
            return [word]
        return [word[:4], "##" + word[4:]]
    # greedy longest match
    pieces: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        prefix = "##" if i > 0 else ""
        while j > i:
            cand = prefix + word[i:j]
            if cand in piece_vocab or j == i + 1:
                pieces.append(cand)
                break
            j -= 1
        i = j
    return pieces


@lru_cache(maxsize=1)
def piece_vocab() -> frozenset[str]:
    vocab: set[str] = set()
    for w in word_label_map():
        for p in word_to_pieces(w):
            vocab.add(p)
    return frozenset(vocab)


# ------------------------------------------------------- scorer weights

# 2^16 slots: ~2k training feature instances -> collision mass per
# slot << 1, so memorized exact-match features dominate cleanly
# (at 4096 slots, filler-word collisions handed O the argmax on ~10%
# of entity pieces — measured this session)
FEATURE_DIM = 1 << 16
_EXACT_WEIGHT = 8.0


def _stable_hash(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def piece_features(piece: str) -> list[int]:
    """Hashed feature indices of one subword piece: exact-match id +
    boundary-padded char 3-grams."""
    feats = [_stable_hash("exact|" + piece) % FEATURE_DIM]
    padded = "^" + piece + "$"
    for i in range(len(padded) - 2):
        feats.append(_stable_hash("3g|" + padded[i : i + 3]) % FEATURE_DIM)
    return feats


@lru_cache(maxsize=1)
def model_weights() -> np.ndarray:
    """W[FEATURE_DIM, N_LABELS]: one additive pass over the labelled
    piece inventory (the 'checkpoint' the forward pass broadcasts)."""
    W = np.zeros((FEATURE_DIM, N_LABELS), dtype=np.float32)
    for word, label in word_label_map().items():
        lid = LABEL_TO_ID[label]
        for k, piece in enumerate(word_to_pieces(word)):
            # first piece carries the word label (HF first-subword
            # convention); continuations share it (M6 ignores them).
            feats = piece_features(piece)
            W[feats[0], lid] += _EXACT_WEIGHT
            for f in feats[1:]:
                W[f, lid] += 1.0
    # mild O prior so unseen junk defaults to O
    W[:, LABEL_TO_ID["O"]] += 0.05
    return W


# -------------------------------------------------- surface embeddings

EMBED_DIM = 64


def surface_embedding(surface: str) -> np.ndarray:
    """Deterministic 64-dim hashed char-3-gram embedding of a surface
    form (used for entity_vecs at fixture time AND mention-context
    vectors in K4 — nearest canonical surface wins the re-rank)."""
    v = np.zeros(EMBED_DIM, dtype=np.float64)
    s = "^" + surface.lower() + "$"
    for i in range(len(s) - 2):
        h = _stable_hash("emb|" + s[i : i + 3])
        idx = h % EMBED_DIM
        sign = 1.0 if (h >> 32) & 1 else -1.0
        v[idx] += sign
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return v.astype(np.float32)
