"""Parse/normalize kernel — the per-row invariant functions (SURVEY §2.6 F1–F5).

Each function re-expresses the *semantics* of the reference's row loops as a
pure function over one cell value; vectorization happens at the caller
(pandas UDF over a Series). Reference citations are per function.

The canonical triple form everywhere is ``(p_lo, p_hi, rel)`` with
``[p_lo, p_hi] = sorted([p1, p2])`` by Python Unicode codepoint order and
``p1 != p2`` (reference ``postprecess.py:237-240``, ``evalute.py:29,34``).
"""

from __future__ import annotations

import re

# Statuses / sentinels (reference CommonCrawl/multi_thread_gemini_api.py:186-195,
# postprecess.py:251-252, CommonCrawl/data/train/postprecess.py:239).
HAS_RELATION = "有"
NO_RELATION = "無"
STATUS_RETRY = "請重新嘗試"
STATUS_UNRECOGNIZED = "無法識別"
ERROR_SENTINEL_PARSE = "關係格式錯誤"
ERROR_SENTINEL_VERIFY = "驗證過程有誤"

#: 4-class relation taxonomy + the expansion-only "none" class
#: (reference README.md:54-85; sota_ner/ckip_expansion.py Prompt).
RELATION_CLASSES = ("親屬", "師生", "同事", "其他")
FIVE_CLASSES = RELATION_CLASSES + ("沒有",)

_TUPLE_RE = re.compile(r"\((.*?)\)")
_VERDICT_NUMBERED_RE = re.compile(r"\d+\.\s*(正確|錯誤)")
_VERDICT_BARE_RE = re.compile(r"(正確|錯誤)")
_FIVE_NUMBERED_RE = re.compile(r"\d+\.\s*(親屬|師生|同事|其他|沒有)")
_FIVE_BARE_RE = re.compile(r"(親屬|師生|同事|其他|沒有)")


def canonical_triple(p1: str, p2: str, rel: str) -> tuple[str, str, str] | None:
    """Canonical form ``tuple(sorted([p1,p2]) + [rel])``; ``None`` when
    ``p1 == p2`` (reference ``postprecess.py:237-240``)."""
    if p1 == p2:
        return None
    lo, hi = sorted([p1, p2])
    return (lo, hi, rel)


def parse_triples(
    output: str,
    *,
    tolerant: bool = True,
) -> tuple[list[tuple[str, str, str]], list[str], list[str], bool]:
    """F1 — extract canonical triples from LLM-style answer text.

    Returns ``(triples, relations, entities, parse_error)`` where order is
    deterministic (first-occurrence order; the reference uses Python sets +
    ``json.dumps(list(set))`` whose order is insertion order in CPython —
    comparisons downstream are set-based so order never matters, but we keep a
    stable order for Spark-side reproducibility).

    ``tolerant=True`` → test/inference variant: strips single quotes, accepts
    both ``,`` and ``，`` delimiters (reference ``postprecess.py:208-267``).
    ``tolerant=False`` → train variant: splits on ``,`` only, no quote strip
    (reference ``CommonCrawl/data/train/postprecess.py:360-398``).
    """
    triples: list[tuple[str, str, str]] = []
    relations: list[str] = []
    entities: list[str] = []
    seen: set[tuple[str, str, str]] = set()

    for group in _TUPLE_RE.findall(output or ""):
        if tolerant:
            group = group.replace("'", "")
            delimiters = [",", "，"]
        else:
            delimiters = [","]
        for delim in delimiters:
            parts = [s.strip() for s in group.split(delim) if s.strip()]
            if len(parts) == 3:
                trip = canonical_triple(*parts)
                if trip is not None and trip not in seen:
                    seen.add(trip)
                    triples.append(trip)
                    if trip[2] not in relations:
                        relations.append(trip[2])
                    for person in trip[:2]:
                        if person not in entities:
                            entities.append(person)
                break

    parse_error = len(triples) == 0
    return triples, relations, entities, parse_error


def check_detection_format(output: str) -> bool:
    """F2 — detection answer well-formedness: starts with 無 (no relation) or
    starts with 有 and every ``(...)`` group yields a 3-tuple under the
    tolerant parse (reference ``CommonCrawl/multi_thread_gemini_api.py:199-214``,
    ``inference.py:67-89``)."""
    text = (output or "").strip()
    if text.startswith(NO_RELATION):
        return True
    if not text.startswith(HAS_RELATION):
        return False
    groups = _TUPLE_RE.findall(text)
    if not groups:
        return False
    for group in groups:
        cleaned = group.replace("'", "")
        ok = any(
            len([s.strip() for s in cleaned.split(d) if s.strip()]) == 3
            for d in (",", "，")
        )
        if not ok:
            return False
    return True


def parse_ner_names(output: str) -> list[str]:
    """F3/M8 — person-name list out of NER answer text: ``(...)`` groups first
    (reference ``postprecess.py:276-300``), falling back to a comma-split line
    (reference ``sota_ner/gemini_expansion.py:198-223``). Dedup, keep order."""
    names: list[str] = []
    groups = _TUPLE_RE.findall(output or "")
    raw: list[str]
    if groups:
        raw = [n for g in groups for n in re.split("[,，]", g)]
    else:
        raw = re.split("[,，]", output or "")
    for name in raw:
        name = name.strip().strip("'\"")
        if name and name not in names:
            names.append(name)
    return names


#: Priority order of the single-pair answer check — the reference tests
#: containment in exactly this order (``re_inference.py:82-98`` check_format):
#: 同事 → 親屬 → 師生 → 其他 → 沒有.
_SINGLE_CLASS_PRIORITY = ("同事", "親屬", "師生", "其他", "沒有")


def parse_single_class(output: str) -> str | None:
    """F5 single-pair variant (M10) — priority-ordered substring containment
    over the 5 class words; ``None`` when no class word occurs (the reference
    retries, then silently skips the pair — ``re_inference.py:50-66,82-98``).
    """
    text = output or ""
    for cls in _SINGLE_CLASS_PRIORITY:
        if cls in text:
            return cls
    return None


def assemble_relation_answer(
    triples: list[tuple[str, str, str]],
) -> tuple[str, str]:
    """M10 reassembly — per-doc pair predictions back into detection-schema
    answer text so predictions round-trip through the same F1 parse
    (reference ``re_inference.py:67-79``): ``有 ('p1', 'p2', 'rel'), ...``
    (Python ``str(tuple)`` form — the tolerant parse strips the quotes) or
    ``無``. Returns ``(has_relation, output)``."""
    if not triples:
        return NO_RELATION, NO_RELATION
    body = ", ".join(str((p1, p2, rel)) for p1, p2, rel in triples)
    return HAS_RELATION, HAS_RELATION + " " + body


def parse_verdicts(output: str, expected: int) -> list[bool] | None:
    """F4 — numbered 正確/錯誤 verdicts; fallback to unnumbered; ``None`` when
    the count mismatches ``expected`` (→ sentinel ``驗證過程有誤``)
    (reference ``CommonCrawl/data/train/postprecess.py:230-241``)."""
    matches = _VERDICT_NUMBERED_RE.findall(output or "")
    if not matches:
        matches = _VERDICT_BARE_RE.findall(output or "")
    if len(matches) != expected:
        return None
    return [m == "正確" for m in matches]


def parse_five_class_answers(output: str, expected: int) -> list[str] | None:
    """F5/M9 — batched 5-way answers ``1.親屬 2.沒有 ...``; numbered first,
    bare fallback; ``None`` on count mismatch (reference
    ``sota_ner/ckip_expansion.py:119-131``)."""
    matches = _FIVE_NUMBERED_RE.findall(output or "")
    if not matches:
        matches = _FIVE_BARE_RE.findall(output or "")
    if len(matches) != expected:
        return None
    return list(matches)
