"""NER-driven expansion stage (SURVEY §2.7 M7–M9, §2.6 F8–F10, §2.3 J3).

Reference flow (``sota_ner/ckip_expansion.py:236-244``): on docs with a
non-empty consensus — (1) person NER over the trad document, (2) density
classification with the per-doc work caps (≤105 extra pairs, ≤1.9 names/100
chars — the skew/fan-out guard), (3) candidate pairs minus already-labeled
pairs (anti-join) with both names present in the 4000-char doc, (4) one
batched 5-way relation prompt per doc for all its extra pairs, (5) merge with
consensus preferring consensus per pair + hallucination filter, (6) 1024-char
truncation-survival golden variant.

Spark shape: steps 1–4 are ONE struct-returning pandas UDF — only
``(text, gemini_trad, gpt_trad)`` cross the Arrow boundary; per-doc pair
generation stays bounded by the F10 caps (≤105 pairs, so no quadratic
self-join is ever needed). The merge and truncation steps (5–6) are JVM
array expressions in whole-stage codegen.
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
_EXPAND_DT = StructType(
    [
        StructField("trad_text", StringType()),
        StructField("ckip_entity", ArrayType(StringType())),
        StructField("density", StringType()),
        StructField("extra_pairs", _PAIR_DT),
        StructField("expansion_ternary", TERNARY_DT),
        StructField("expansion_failed", BooleanType()),
    ]
)


def _expand_one(mod, text, gemini_trad, gpt_trad) -> dict:
    trad_text = s2t(text) if text is not None else ""
    entities = mod.score_ner(trad_text)
    already = {
        (t["subj"], t["obj"])
        for t in (list(gemini_trad) if gemini_trad is not None else [])
        + (list(gpt_trad) if gpt_trad is not None else [])
    }
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
        "trad_text": trad_text,
        "ckip_entity": entities,
        "density": density,
        "extra_pairs": [{"p1": a, "p2": b} for a, b in extra],
        "expansion_ternary": ternary,
        "expansion_failed": failed,
    }


def make_expand_udf(scorer: str = "deterministic"):
    mod = get_scorer(scorer)

    @pandas_udf(_EXPAND_DT)
    def expand_udf(text: pd.Series, g_trad: pd.Series, p_trad: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_expand_one(mod, t, g, p) for t, g, p in zip(text, g_trad, p_trad)]
        )

    return expand_udf


def expansion_stage(consensus_df: DataFrame, scorer: str = "deterministic") -> DataFrame:
    """Input: consensus stage output (must already be filtered to
    ``size(consensus_label) > 0`` — reference ``ckip_expansion.py:238-239``).
    Adds: trad_text, ckip_entity, density, extra_pairs, expansion_ternary,
    expansion_failed, merge_label, merge_label_1024."""
    udf = make_expand_udf(scorer)
    df = consensus_df.withColumn(
        "_exp",
        udf(F.col("text"), F.col("gemini_ternary_trad"), F.col("gpt_ternary_trad")),
    )
    for field in _EXPAND_DT.fieldNames():
        df = df.withColumn(field, F.col(f"_exp.{field}"))
    df = df.drop("_exp")

    # merge (reference merge_label :159-192): density-high docs dropped; keep
    # consensus triples whose names survive the hallucination check, then add
    # expansion triples for pairs not already covered.
    doc = F.col("trad_text")
    kept_consensus = F.filter(
        F.col("consensus_label"),
        lambda t: doc.contains(t["subj"]) & doc.contains(t["obj"]),
    )
    covered = F.transform(
        kept_consensus, lambda t: F.struct(t["subj"].alias("p1"), t["obj"].alias("p2"))
    )
    extra_kept = F.filter(
        F.col("expansion_ternary"),
        lambda t: ~F.array_contains(
            covered, F.struct(t["subj"].alias("p1"), t["obj"].alias("p2"))
        ),
    )
    empty_ternary = F.slice(F.col("consensus_label"), 1, 0)  # typed empty array
    merge = F.when(F.col("density") == "high", empty_ternary).otherwise(
        F.concat(kept_consensus, extra_kept)
    )
    df = df.withColumn("merge_label", merge)

    # truncation-survival variant (reference truncation_label :218-234)
    head = F.substring(F.col("trad_text"), 1, 1024)
    df = df.withColumn(
        "merge_label_1024",
        F.filter(
            F.col("merge_label"),
            lambda t: head.contains(t["subj"]) & head.contains(t["obj"]),
        ),
    )
    return df
