"""Scorer registry.

The reference's per-document LLM API calls (SURVEY §2.7 M1–M11) become
pluggable *batched scorers* behind the identical prompt/label schema. The
deterministic rule-backed implementations are the test/CI default; a real
model-backed scorer would register under another name and be selected by
config — the pipeline code is scorer-agnostic.
"""

from __future__ import annotations

from . import deterministic

_REGISTRY = {
    "deterministic": deterministic,
}


def get_scorer(name: str = "deterministic"):
    """Return the scorer module providing score_detect / score_verify /
    score_expansion_pairs / score_ner / score_taxonomy."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown scorer {name!r}; have {sorted(_REGISTRY)}") from None
