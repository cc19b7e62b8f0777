"""Deterministic rule-backed scorers (LLM replacements, SURVEY §2.7).

Each scorer consumes/produces the SAME textual answer schema as the
reference's prompts, so the downstream parse kernel (functions/parse.py) is
exercised exactly as it would be against real model output — including
deterministic "noise" paths (status failures, quoted tuples, false positives,
count mismatches) keyed on md5 of the document text so that the Spark
pipeline and the plain-Python parity oracle see identical scorer behavior.

Prompt schemas mirrored:
- detection     reference ``CommonCrawl/multi_thread_gemini_api.py:113-117``
- verification  reference ``CommonCrawl/data/train/postprecess.py:198-210``
- pair batch    reference ``sota_ner/ckip_expansion.py:13-21,100-108``
- NER           reference ``sota_ner/gemini_expansion.py:23-26``
- taxonomy      reference ``CommonCrawl/data/train/postprecess.py:292-300``
"""

from __future__ import annotations

import hashlib

from ..functions.chinese import s2t
from ..functions.parse import (
    HAS_RELATION,
    NO_RELATION,
    STATUS_RETRY,
    STATUS_UNRECOGNIZED,
)
from .rules import (
    CAST,
    classify_relation,
    find_instances,
    find_person_mentions,
    strip_title,
)

#: detect-scorer blindness per annotator: gpt misses two template families so
#: the cross-comparison / verification stages have real work to do (the
#: reference's two annotators genuinely disagreed; deck 20240510 slide 8).
#: taide (M3, a weaker 7B-class model) misses more; fewshot (M4) trades one
#: blind spot for the exemplar's guidance.
BLIND_TIDS = {
    "gemini": frozenset(),
    "gpt": frozenset({"tea_follow", "oth_friend"}),
    "taide": frozenset({"tea_follow", "oth_friend", "oth_meet", "col_research"}),
    "fewshot": frozenset({"oth_meet"}),
}

MAX_DETECT_CHARS = 4000  # reference multi_thread_gemini_api.py:107-109
MAX_TAIDE_CHARS = 2000  # reference taideAPI.py:39-40


def _bucket(text: str, salt: str, mod: int) -> int:
    h = hashlib.md5((salt + text[:128]).encode("utf-8")).digest()
    return int.from_bytes(h[:4], "big") % mod


DETECT_MAX_TRIES = 5  # reference multi_thread_gemini_api.py:148 (5 tries)
#: re-instruction the reference appends to the chat after a bad-format answer
#: before retrying (``multi_thread_gemini_api.py:163-170``). The deterministic
#: stand-in feeds it back into the bucket salt so attempt k > 1 is a genuinely
#: different (and here, well-formed) draw, like a re-prompted model.
REINSTRUCT = "請嚴格按照「有 (人名,人名,關係)」的格式重新回答"


def _detect_answer(doc: str, annotator: str) -> tuple[str, str]:
    """The well-formed detection answer for a doc (status 有/無) — byte-stable
    across rounds; the retry loop converges to exactly this text."""
    instances = find_instances(doc, blind_tids=BLIND_TIDS[annotator])
    if annotator == "gpt" and instances and _bucket(doc, "gpt:fp", 23) == 0:
        # deterministic false positive: misread relation word (exercises
        # cross-verification; the true annotator's version survives).
        a, b2, _, _ = instances[0]
        instances = instances + [(a, b2, "朋友", "noise")]
    if not instances:
        return NO_RELATION, NO_RELATION

    quoted = _bucket(doc, annotator + ":quote", 31) == 0
    sep = "，" if _bucket(doc, annotator + ":sep", 7) == 0 else ","
    parts = []
    for p1, p2, rel, _ in instances:
        if quoted:
            parts.append(f"('{p1}'{sep}'{p2}'{sep}'{rel}')")
        else:
            parts.append(f"({p1}{sep}{p2}{sep}{rel})")
    return HAS_RELATION, HAS_RELATION + "\n" + "\n".join(parts)


def _malformed_answer(doc: str, annotator: str) -> str:
    """A deterministic bad-format first answer (fails
    ``check_detection_format``): a 2-tuple when the doc has instances, free
    prose otherwise — the two malformation families the reference's format
    check rejects (``multi_thread_gemini_api.py:199-214``)."""
    instances = find_instances(doc, blind_tids=BLIND_TIDS[annotator])
    if instances:
        p1, p2, _, _ = instances[0]
        return f"{HAS_RELATION} ({p1},{p2})"
    return "這篇文章主要在描述近期的社會議題與相關發展。"


def _detect_bad_attempts(doc: str, annotator: str) -> int:
    """How many leading attempts answer malformed for this (doc, annotator):
    0 for most docs, 1 for ~1.6% (retry recovers on attempt 2),
    DETECT_MAX_TRIES for the legacy :status bucket (retry exhaustion →
    請重新嘗試), -1 for the blocked/unrecognized bucket (無法識別)."""
    b = _bucket(doc, annotator + ":status", 199)
    if b == 0:
        return DETECT_MAX_TRIES
    if b == 1:
        return -1
    if _bucket(doc, annotator + ":badfmt", 61) == 0:
        return 1
    return 0


def score_detect_with_attempts(text: str, annotator: str) -> tuple[str, str, int]:
    """One document → (has_relation status, answer text, attempts used).

    Implements the reference's retry-with-re-instruction loop
    (``multi_thread_gemini_api.py:148-183``): up to DETECT_MAX_TRIES tries;
    a bad-format answer is appended to the chat with REINSTRUCT and re-asked;
    請重新嘗試 is the retry-EXHAUSTION status (all tries malformed), 無法識別
    the blocked-response status. Terminal statuses replicate
    ``multi_thread_gemini_api.py:186-195``: 有 / 無 / 請重新嘗試 / 無法識別.
    Deterministic: the number of leading malformed tries is doc-keyed, and
    the recovered answer equals the well-formed draw byte-for-byte (so
    downstream parity is invariant to where in the loop an answer lands).
    """
    if annotator == "taide":
        status, output = score_detect_taide(text)
        return status, output, 1
    if annotator == "fewshot":
        status, output = score_detect_fewshot(text)
        return status, output, 1
    doc = text[:MAX_DETECT_CHARS]
    bad = _detect_bad_attempts(doc, annotator)
    if bad < 0:
        return STATUS_UNRECOGNIZED, "", 1
    from ..functions.parse import check_detection_format

    answer = ""
    for attempt in range(1, DETECT_MAX_TRIES + 1):
        if attempt <= bad:
            answer = _malformed_answer(doc, annotator)
        else:
            _, answer = _detect_answer(doc, annotator)
        if check_detection_format(answer):
            status = HAS_RELATION if answer.startswith(HAS_RELATION) else NO_RELATION
            return status, answer, attempt
        # bad format → the chat gains (answer, REINSTRUCT) and we re-ask
    return STATUS_RETRY, "", DETECT_MAX_TRIES


def score_detect(text: str, annotator: str) -> tuple[str, str]:
    """One document → (has_relation status, answer text).

    Statuses replicate the reference's terminal states
    (``multi_thread_gemini_api.py:186-195``): 有 / 無 / 請重新嘗試 / 無法識別.
    Annotators ``taide`` (M3) and ``fewshot`` (M4) dispatch to their prompt
    variants; ``gemini``/``gpt`` are the standard detection schema
    (prompts.DETECT_PROMPT) and run the retry/re-instruction loop
    (``score_detect_with_attempts``).
    """
    status, output, _attempts = score_detect_with_attempts(text, annotator)
    return status, output


def score_verify(text: str, triples: list[tuple[str, str, str]]) -> str:
    """k class-valued triples of one doc → numbered 正確/錯誤 answer text
    (M5). Truth = canonical class triples of the detectable templates."""
    doc = text[:MAX_DETECT_CHARS]
    truth = set()
    for p1, p2, raw, tid in find_instances(doc):
        p1, p2 = s2t(p1), s2t(p2)  # queried triples arrive Traditional-converted
        if p1 == p2:
            continue
        lo, hi = sorted([p1, p2])
        truth.add((lo, hi, classify_relation(raw)))
    lines = []
    for i, (s, o, rel) in enumerate(triples, start=1):
        verdict = "正確" if (s, o, rel) in truth else "錯誤"
        lines.append(f"{i}.{verdict}")
    # deterministic miscount noise (~2.4% of verifying docs): the answer
    # drops its last line, so parse_verdicts hits a count mismatch → the
    # 驗證過程有誤 sentinel. This exercises the verify-error path end to end —
    # train semantics drop just the unverified triples
    # (train/postprecess.py:36-44) while the strict test-corpus path zeroes
    # the whole doc (test/postprecess_other.py:24-31); both consumers and the
    # parity port key off the same doc-hash, so they stay in lock-step.
    if lines and _bucket(doc, "verify:miscount", 41) == 0:
        lines = lines[:-1]
    return "\n".join(lines)


def score_expansion_pairs(text: str, pairs: list[tuple[str, str]]) -> str:
    """k candidate pairs of one doc → numbered 5-class answer text (M9).

    ≈0.4% of batches deterministically answer with one missing line to
    exercise the count-mismatch failure path
    (``sota_ner/ckip_expansion.py:125-139``).
    """
    doc = text[:MAX_DETECT_CHARS]
    pair_cls: dict[tuple[str, str], str] = {}
    for p1, p2, raw, tid in find_instances(doc, include_expansion_only=True):
        if p1 == p2:
            continue
        key = tuple(sorted([p1, p2]))
        pair_cls.setdefault(key, classify_relation(raw))
    answers = [
        f"{i}.{pair_cls.get(tuple(sorted([a, b])), '沒有')}"
        for i, (a, b) in enumerate(pairs, start=1)
    ]
    if len(answers) > 1 and _bucket(doc, "exp:miscount", 251) == 0:
        answers = answers[:-1]
    return " ".join(answers)


def score_detect_taide(text: str) -> tuple[str, str]:
    """M3 — TAIDE API detection (reference ``taideAPI.py:27-110``):
    2000-char truncation, 20-token answers (triples never survive the token
    budget — only the 有/無 signal is usable), status derived by the
    reference's containment rules (``taideAPI.py:98-107``: 無/沒有親屬 → 無;
    有 without 沒 → 有; else 無法識別)."""
    doc = text[:MAX_TAIDE_CHARS]
    if _bucket(doc, "taide:status", 149) == 0:
        return STATUS_UNRECOGNIZED, "這篇文章主要在描述"  # off-format answer
    instances = find_instances(doc, blind_tids=BLIND_TIDS["taide"])
    if not instances:
        return NO_RELATION, NO_RELATION
    p1, p2, rel, _ = instances[0]
    answer = f"{HAS_RELATION} ({p1},{p2},{rel})"[:20]  # max_tokens≈20 cut
    return HAS_RELATION, answer


def score_detect_fewshot(text: str) -> tuple[str, str]:
    """M4 — one-shot detection (reference ``few_shot_gemini_api.py:89-225``):
    single try, answers carry the ``Relations:`` prefix and an
    ``Explanation:`` line (prompts.DETECT_PROMPT_FEWSHOT schema); the F1
    parse kernel consumes them unchanged (the regex scopes to ``(...)``
    groups)."""
    doc = text[:MAX_DETECT_CHARS]
    if _bucket(doc, "fewshot:status", 199) == 0:
        return STATUS_RETRY, ""
    instances = find_instances(doc, blind_tids=BLIND_TIDS["fewshot"])
    if not instances:
        return NO_RELATION, "Relations:" + NO_RELATION
    parts = ",".join(f"({p1},{p2},{rel})" for p1, p2, rel, _ in instances)
    first = instances[0]
    return (
        HAS_RELATION,
        f"Relations:{HAS_RELATION} {parts}\n"
        f"Explanation:文章中提到{first[0]}與{first[1]}的{first[2]}關係",
    )


MAX_RE_CHARS = 1024  # reference re_inference.py:119 / inference.py max_length


def score_re_pair(text: str, p1: str, p2: str) -> str:
    """One (doc, pair) → single 5-class answer text (M10, the fine-tuned
    mT5 per-pair RE model — reference ``re_inference.py:27-80``).

    The fine-tuned model trained on class-valued merge labels recognizes
    every template family including expansion-only ones. Deterministic noise:
    ~1% of pairs answer without any class word (exercises the 2-try retry →
    silent-skip path, ``re_inference.py:50-66``); ~8% answer verbosely with
    the class word embedded in a sentence (exercises the priority substring
    check, ``re_inference.py:82-98``).
    """
    doc = text[:MAX_RE_CHARS]
    if _bucket(doc, f"re:skip:{p1}|{p2}", 97) == 0:
        return "無法判斷這兩人的關聯"  # no class word → retry → skip
    pair_cls: dict[tuple[str, str], str] = {}
    for a, b, raw, _tid in find_instances(doc, include_expansion_only=True):
        if a == b:
            continue
        pair_cls.setdefault(tuple(sorted([a, b])), classify_relation(raw))
    cls = pair_cls.get(tuple(sorted([p1, p2])), "沒有")
    if _bucket(doc, f"re:verbose:{p1}|{p2}", 13) == 0:
        return f"兩人之間的關係是{cls}關係"
    return cls


def score_generate(text: str) -> str:
    """One doc → detection-schema triples text from the doc-level generation
    model (M11, reference ``inference.py:11-65``; models ``mt5.py:16-41``).

    Trained on class-valued merge labels, so it emits the 4-class relation
    directly (unlike the API detect scorers' free-text relation words).
    ~0.7% of docs answer with a malformed 2-tuple to exercise the
    format-check retry/skip path (``inference.py:67-89``).
    """
    doc = text[:MAX_RE_CHARS]
    triples: list[tuple[str, str, str]] = []
    seen: set[tuple[str, str, str]] = set()
    for a, b, raw, _tid in find_instances(doc, include_expansion_only=True):
        ta, tb = s2t(a), s2t(b)
        if ta == tb:
            continue
        lo, hi = sorted([ta, tb])
        key = (lo, hi, classify_relation(raw))
        if key not in seen:
            seen.add(key)
            triples.append(key)
    if not triples:
        return NO_RELATION
    if _bucket(doc, "gen:malformed", 151) == 0:
        return HAS_RELATION + f" ({triples[0][0]},{triples[0][1]})"
    body = ",".join(f"({s},{o},{r})" for s, o, r in triples)
    return HAS_RELATION + " " + body


def score_ner(text: str) -> list[str]:
    """Person mentions of one doc (M7/M8 replacement) — surface forms
    including simplified spellings and title-suffixed aliases."""
    return find_person_mentions(text[:MAX_DETECT_CHARS])


def score_ner_llm(text: str) -> list[str]:
    """LLM person-NER (M8, the second NER source — reference
    ``sota_ner/gemini_expansion.py:198-223`` llm_ner: comma-split answer,
    set semantics). Behavior differs from the CKIP path (``score_ner``):
    canonical (title-free) names only, plus deterministic noise — ~8% of
    docs drop the last-found name (LLM recall miss; motivates the union
    variant) and ~3% hallucinate a cast name absent from the doc (filtered
    downstream by the containment check; the reference's overlap audit
    counts exactly these, ``gemini_expansion.py:243-277``)."""
    doc = text[:MAX_DETECT_CHARS]
    names: list[str] = []
    for m in find_person_mentions(doc):
        c = strip_title(m)
        if c not in names:
            names.append(c)
    if names and _bucket(doc, "llmner:drop", 13) == 0:
        names = names[:-1]
    if _bucket(doc, "llmner:halluc", 31) == 0:
        extra = CAST[_bucket(doc, "llmner:pick", 1_000_003) % len(CAST)]
        if extra not in doc and extra not in names:
            names.append(extra)
    return names


def score_taxonomy(raw_relations: list[str]) -> dict[str, str]:
    """Distinct free-text relation words → 4-class labels (M6)."""
    return {raw: classify_relation(raw) for raw in raw_relations}
