"""NER-driven expansion stage (SURVEY §2.7 M7–M9, §2.6 F8–F10, §2.3 J3),
with the dual-NER golden variants.

Reference flow (``sota_ner/ckip_expansion.py:236-244``): on docs with a
non-empty consensus — (1) person NER over the trad document, (2) density
classification with the per-doc work caps (≤105 extra pairs, ≤1.9 names/100
chars — the skew/fan-out guard), (3) candidate pairs minus already-labeled
pairs (anti-join) with both names present in the 4000-char doc, (4) one
batched 5-way relation prompt per doc for all its extra pairs, (5) merge with
consensus preferring consensus per pair + hallucination filter, (6) 1024-char
truncation-survival golden variant.

NER sources (reference ``README.md:54-85`` columns 20–31):
- ``ckip``  → density / expansion_ternary / merge_label{,_1024}
  (``sota_ner/ckip_expansion.py``)
- ``gemini`` → gemini_ner / gemini_expansion_ternary /
  gemini_expansion_merge_label{,_1024} (``sota_ner/gemini_expansion.py:44-144``
  find_re + :165-198 merge_label + :226-241 truncation_label)
- ``union`` → (gemini+ckip) entity union → union_expansion_ternary /
  union_expansion_merge_label{,_1024} (``README.md:77-84`` cols 29–31)

Spark shape: steps 1–4 for ALL requested sources are ONE struct-returning
pandas UDF — only ``(text, gemini_trad, gpt_trad)`` cross the Arrow boundary;
per-doc pair generation stays bounded by the F10 caps (≤105 pairs per
source, so no quadratic self-join is ever needed). The merge and truncation
steps (5–6) are JVM array expressions in whole-stage codegen, one merge
column family per source.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from ..functions.analysis import expansion_pairs
from ..functions.chinese import s2t
from ..functions.parse import parse_five_class_answers
from ..scorers import get_scorer
from .parse import TERNARY_DT

_PAIR_DT = ArrayType(
    StructType([StructField("p1", StringType()), StructField("p2", StringType())])
)

NER_SOURCES = ("ckip", "gemini", "union")

#: per-source output column names; the ckip family keeps the reference's
#: unprefixed names (README.md cols 20–24), the others its prefixed ones.
_FIELDS_BY_SOURCE = {
    "ckip": ("ckip_entity", "density", "extra_pairs", "expansion_ternary",
             "expansion_failed", "merge_label"),
    "gemini": ("gemini_ner", "gemini_density", "gemini_extra_pairs",
               "gemini_expansion_ternary", "gemini_expansion_failed",
               "gemini_expansion_merge_label"),
    "union": ("union_entity", "union_density", "union_extra_pairs",
              "union_expansion_ternary", "union_expansion_failed",
              "union_expansion_merge_label"),
}


def _expand_dt(sources: tuple[str, ...]) -> StructType:
    fields = [StructField("trad_text", StringType())]
    for src in sources:
        ent, den, pairs, tern, failed, _merge = _FIELDS_BY_SOURCE[src]
        fields += [
            StructField(ent, ArrayType(StringType())),
            StructField(den, StringType()),
            StructField(pairs, _PAIR_DT),
            StructField(tern, TERNARY_DT),
            StructField(failed, BooleanType()),
        ]
    return StructType(fields)


def source_entities(mod, trad_text: str, src: str, cache: dict) -> list[str]:
    """NER entity list per source; ``union`` = ckip order + new gemini names
    (shared with the parity oracle)."""
    if src not in cache:
        if src == "ckip":
            cache[src] = mod.score_ner(trad_text)
        elif src == "gemini":
            cache[src] = mod.score_ner_llm(trad_text)
        else:
            ck = source_entities(mod, trad_text, "ckip", cache)
            gm = source_entities(mod, trad_text, "gemini", cache)
            cache[src] = ck + [e for e in gm if e not in ck]
    return cache[src]


def expand_one_source(mod, trad_text, already, entities) -> dict:
    """Steps 2–4 for one (doc, entity list): density, extra pairs, batched
    5-way scoring (shared with the parity oracle). Returns unprefixed keys."""
    density, extra = expansion_pairs(entities, already, trad_text)
    ternary: list[dict] = []
    failed = False
    if density == "middle" and extra:
        answer = mod.score_expansion_pairs(trad_text, extra)
        classes = parse_five_class_answers(answer, len(extra))
        if classes is None:  # count mismatch → doc fails expansion (M9)
            failed = True
        else:
            ternary = [
                {"subj": a, "obj": b, "rel": cls}
                for (a, b), cls in zip(extra, classes)
                if cls != "沒有"
            ]
    return {
        "entity": entities,
        "density": density,
        "extra_pairs": [{"p1": a, "p2": b} for a, b in extra],
        "expansion_ternary": ternary,
        "expansion_failed": failed,
    }


def _expand_one(mod, text, gemini_trad, gpt_trad, sources) -> dict:
    trad_text = s2t(text) if text is not None else ""
    already = {
        (t["subj"], t["obj"])
        for t in (list(gemini_trad) if gemini_trad is not None else [])
        + (list(gpt_trad) if gpt_trad is not None else [])
    }
    cache: dict = {}
    out = {"trad_text": trad_text}
    for src in sources:
        ents = source_entities(mod, trad_text, src, cache)
        res = expand_one_source(mod, trad_text, already, ents)
        ent, den, pairs, tern, failed, _merge = _FIELDS_BY_SOURCE[src]
        out[ent] = res["entity"]
        out[den] = res["density"]
        out[pairs] = res["extra_pairs"]
        out[tern] = res["expansion_ternary"]
        out[failed] = res["expansion_failed"]
    return out


def make_expand_udf(scorer: str = "deterministic", sources: tuple[str, ...] = ("ckip",)):
    mod = get_scorer(scorer)
    dt = _expand_dt(sources)

    @pandas_udf(dt)
    def expand_udf(text: pd.Series, g_trad: pd.Series, p_trad: pd.Series) -> pd.DataFrame:
        # column-major construction (same values, no per-row dict alignment)
        field_names = dt.fieldNames()
        cols: dict[str, list] = {f: [] for f in field_names}
        for t, g, p in zip(text.tolist(), g_trad.tolist(), p_trad.tolist()):
            row = _expand_one(mod, t, g, p, sources)
            for f in field_names:
                cols[f].append(row[f])
        return pd.DataFrame(cols)

    return expand_udf, dt


def _with_merge_columns(df: DataFrame, density_col: str, ternary_col: str, out_col: str) -> DataFrame:
    """Steps 5–6 (JVM array expressions): merge with consensus preferring
    consensus per pair + hallucination filter (reference merge_label
    :159-192), then the 1024-truncation-survival variant (:218-234)."""
    doc = F.col("trad_text")
    kept_consensus = F.filter(
        F.col("consensus_label"),
        lambda t: doc.contains(t["subj"]) & doc.contains(t["obj"]),
    )
    covered = F.transform(
        kept_consensus, lambda t: F.struct(t["subj"].alias("p1"), t["obj"].alias("p2"))
    )
    extra_kept = F.filter(
        F.col(ternary_col),
        lambda t: ~F.array_contains(
            covered, F.struct(t["subj"].alias("p1"), t["obj"].alias("p2"))
        ),
    )
    empty_ternary = F.slice(F.col("consensus_label"), 1, 0)  # typed empty array
    merge = F.when(F.col(density_col) == "high", empty_ternary).otherwise(
        F.concat(kept_consensus, extra_kept)
    )
    df = df.withColumn(out_col, merge)
    head = F.substring(F.col("trad_text"), 1, 1024)
    return df.withColumn(
        f"{out_col}_1024",
        F.filter(
            F.col(out_col),
            lambda t: head.contains(t["subj"]) & head.contains(t["obj"]),
        ),
    )


def expansion_stage(
    consensus_df: DataFrame,
    scorer: str = "deterministic",
    ner_sources: tuple[str, ...] = ("ckip",),
) -> DataFrame:
    """Input: consensus stage output (must already be filtered to
    ``size(consensus_label) > 0`` — reference ``ckip_expansion.py:238-239``).
    Adds per requested source: entity list, density, extra_pairs,
    expansion_ternary, expansion_failed, merge label + _1024 variant
    (column names per ``_FIELDS_BY_SOURCE``), plus ``trad_text``."""
    for src in ner_sources:
        if src not in NER_SOURCES:
            raise ValueError(f"unknown NER source {src!r}; have {NER_SOURCES}")
    udf, dt = make_expand_udf(scorer, tuple(ner_sources))
    df = consensus_df.withColumn(
        "_exp",
        udf(F.col("text"), F.col("gemini_ternary_trad"), F.col("gpt_ternary_trad")),
    )
    for field in dt.fieldNames():
        df = df.withColumn(field, F.col(f"_exp.{field}"))
    df = df.drop("_exp")

    for src in ner_sources:
        _ent, den, _pairs, tern, _failed, merge = _FIELDS_BY_SOURCE[src]
        df = _with_merge_columns(df, den, tern, merge)
    return df
