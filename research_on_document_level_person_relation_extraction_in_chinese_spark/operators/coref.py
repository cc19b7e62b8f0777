"""Intra-document coreference resolution (north-star component: resolve a
document's person mentions to canonical intra-doc representatives BEFORE
pair generation, so 林志玲 / 林先生 / 林老師 yield one candidate person).

The reference repo feeds raw CKIP surface forms straight into pair expansion
(`sota_ner/ckip_expansion.py:22-23` builds itertools.combinations over the
de-duplicated name list) and only merges aliases implicitly through the LLM's
answers; aliases therefore multiply the pair count and the per-pair scoring
cost. At 10^12 documents that multiplication is pure waste, so we canonicalize
first with a deterministic, wholly JVM-side kernel (no Python in the hot
path — nested higher-order functions only):

1. title-strip each mention (the twin of ``scorers.rules.strip_title`` /
   ``operators.linking.normalize_mention``: ONE trailing 博士/教授/先生/老師
   suffix removed, but never down to the empty string);
2. collect the document's *full names* (≥2 chars after stripping);
3. a bare-surname mention (1 char after stripping, e.g. 林先生 → 林) attaches
   to the document's full name sharing that surname IFF it is unique in the
   doc — an ambiguous surname (two 林s) keeps the bare form separate rather
   than guessing;
4. de-duplicate and sort (sorting makes the output canonical and lets the
   DuckDB oracle match bit-for-bit — DuckDB's ``list_distinct`` does not
   promise first-occurrence order, Spark's ``array_distinct`` does).

Scale shape: per-row array expressions only — no shuffle, no UDF, fully
whole-stage-codegen'd; mention arrays are tiny (persons per document), so the
nested filter/transform is O(|mentions|²) on single-digit arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..scorers.rules import TITLES

_TITLE_PATTERN = "(" + "|".join(TITLES) + ")$"


def _strip_title(m: Column) -> Column:
    # every title is 2 chars, so length > 2 == "remainder would be non-empty"
    return F.when(
        F.length(m) > 2, F.regexp_replace(m, _TITLE_PATTERN, "")
    ).otherwise(m)


def canonical_mentions(mentions: Column) -> Column:
    """array<string> of surface mentions → sorted array of canonical
    intra-doc persons (title-stripped, unique-surname-attached, deduped)."""
    stripped = F.transform(mentions, _strip_title)
    fulls = F.array_distinct(F.filter(stripped, lambda x: F.length(x) >= 2))

    def attach(m: Column) -> Column:
        same_surname = F.filter(fulls, lambda f: F.substring(f, 1, 1) == m)
        return F.when(F.length(m) >= 2, m).otherwise(
            F.when(F.size(same_surname) == 1, F.element_at(same_surname, 1))
            .otherwise(m)
        )

    return F.array_sort(F.array_distinct(F.transform(stripped, attach)))


def coref_stage(expanded: DataFrame, entity_col: str = "ckip_entity") -> DataFrame:
    """Optional pipeline stage: canonicalize the NER mention array in place.

    NOT part of the default parity pipeline — the reference expands pairs over
    raw surface forms (`sota_ner/ckip_expansion.py:22-23`), and the parity gate holds
    the pipeline to the reference's behavior; callers opt in where the pair
    blow-up matters (it shrinks downstream pair scoring, the expensive stage).
    """
    return expanded.withColumn(entity_col, canonical_mentions(F.col(entity_col)))
