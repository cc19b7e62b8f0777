"""HTML→text extraction + language ID — the per-row input invariants.

``extract_text`` is the pinned function behind the BASELINE per-row invariant
("byte-identical extracted text per url"): the corpus generator builds
``html`` from ``text`` and the pipeline must recover ``text`` exactly
(sha256-per-url asserted in tests).

Decode semantics replicate the reference byte-for-byte:
``payload.decode('utf-8', errors='replace')``
(reference ``CommonCrawl/warc_decoder.py:20-22``). On top of the decode we
apply a CCNet-style content extraction (the reference's production corpus was
CCNet output, SURVEY §1.3): keep ``<p>`` content paragraphs, drop boilerplate
(nav / cookie / footer classes), join with ``\\n``.
"""

from __future__ import annotations

import hashlib
import re

#: paragraph classes treated as boilerplate (dropped by extraction; the
#: generator emits them to exercise the path)
BOILERPLATE_CLASSES = ("nav", "cookie", "footer", "ad")

_P_RE = re.compile(r"<p(?:\s+class=\"([^\"]*)\")?>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def decode_payload(payload: bytes) -> str:
    """Exact reference decode: UTF-8 with U+FFFD replacement
    (``warc_decoder.py:22``)."""
    return payload.decode("utf-8", errors="replace")


def extract_text(html: bytes) -> str:
    """html bytes → content text. Deterministic, pure; pinned by hash tests."""
    decoded = decode_payload(html)
    paragraphs = [
        body
        for cls, body in _P_RE.findall(decoded)
        if cls not in BOILERPLATE_CLASSES
    ]
    return "\n".join(_TAG_RE.sub("", p).strip() for p in paragraphs)


def text_sha256(text: str) -> str:
    """Per-url invariant hash (UTF-8 bytes)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


# --- language ID (n-gram/script heuristic; langdetect is not in container) ---

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"},
    "es": {"el", "la", "de", "que", "los", "una", "por", "con", "para", "las"},
    "fr": {"le", "la", "les", "des", "est", "dans", "une", "pour", "que", "avec"},
}


def detect_language(text: str) -> str:
    """Heuristic language ID with the same contract as the reference's
    ``detect_language`` (``warc_decoder.py:4-11``): returns a lang code or
    ``Unknown``. CJK-script ratio decides ``zh``; Latin languages are scored
    by stopword hits."""
    if not text:
        return "Unknown"
    sample = text[:2000]
    cjk = sum(1 for ch in sample if "一" <= ch <= "鿿")
    if cjk / max(len(sample), 1) > 0.05:
        return "zh"
    words = set(re.findall(r"[a-zà-ÿ]+", sample.lower()))
    best_lang, best_hits = "Unknown", 0
    for lang, stops in _STOPWORDS.items():
        hits = len(words & stops)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= 2 else "Unknown"
