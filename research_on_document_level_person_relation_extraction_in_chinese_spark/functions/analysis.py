"""Per-document analysis kernel: density, pair generation, co-occurrence.

Pure functions shared by the Spark pipeline (inside pandas UDFs /
``applyInPandas``) and the plain-Python parity oracle.
"""

from __future__ import annotations

import itertools
import re

#: Expansion work caps (reference ``sota_ner/ckip_expansion.py:44-52``):
#: doc truncated at 4000 chars; name density ≤ 0.95*2 per 100 chars;
#: at most C(15,2)=105 extra pairs per document. These caps are the skew /
#: fan-out guard — they bound per-document work at any corpus scale.
MAX_DOC_LENGTH = 4000
MAX_NAME_DENSITY = 0.95 * 2
MAX_PAIRS = 105

_SENTENCE_SPLIT_RE = re.compile(r"[\n。；;！!？?]")


def generate_pairs(names: list[str]) -> list[tuple[str, str]]:
    """F8 — all unordered name pairs, each sorted by codepoint
    (reference ``sota_ner/ckip_expansion.py:22-23``)."""
    return [tuple(sorted(c)) for c in itertools.combinations(names, 2)]


def expansion_pairs(
    entities: list[str],
    already_pairs: set[tuple[str, str]],
    document: str,
) -> tuple[str, list[tuple[str, str]]]:
    """F10 + J3 — density classification and extra-pair generation for one doc.

    Returns ``(density, extra_pairs)`` with density ∈ {low, middle, high};
    pairs already labeled by an annotator are anti-joined out and both names
    must literally occur in the (4000-char-truncated) document
    (reference ``sota_ner/ckip_expansion.py:62-97``).
    """
    document = document[:MAX_DOC_LENGTH]
    if len(entities) < 2:
        return "low", []
    name_density = len(entities) / len(document) * 100 if document else float("inf")
    extra = [
        p
        for p in generate_pairs(entities)
        if p not in already_pairs and p[0] in document and p[1] in document
    ]
    if not extra:
        return "low", []
    if name_density > MAX_NAME_DENSITY or len(extra) > MAX_PAIRS:
        return "high", []
    return "middle", extra


def contains_both(document: str, p1: str, p2: str, limit: int | None = None) -> bool:
    """F9 — hallucination / truncation-survival check: both names literally in
    ``document[:limit]`` (reference ``sota_ner/ckip_expansion.py:175,230``)."""
    doc = document[:limit] if limit else document
    return p1 in doc and p2 in doc


def sentence_cooccurrence(document: str, e1: str, e2: str) -> bool:
    """W1 — do the two names co-occur inside one sentence, splitting on
    ``[\\n。；;！!？?]`` (reference ``cross_sentence.py:11-12,21-38``)."""
    for sentence in _SENTENCE_SPLIT_RE.split(document):
        if e1 in sentence and e2 in sentence:
            return True
    return False


def min_char_distance(document: str, e1: str, e2: str) -> int:
    """F11 — minimum ``|pos1 - pos2| - len(e1)`` over all occurrence pairs of
    the two names; -1 when either is absent (reference
    ``cross_sentence.py:62-80``)."""
    pos1 = [m.start() for m in re.finditer(re.escape(e1), document)]
    pos2 = [m.start() for m in re.finditer(re.escape(e2), document)]
    if not pos1 or not pos2:
        return -1
    best = min(abs(a - b) for a in pos1 for b in pos2)
    return max(best - len(e1), 0)
