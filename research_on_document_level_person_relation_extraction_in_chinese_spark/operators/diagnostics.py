"""Corpus diagnostics (SURVEY §2.5 W1, §2.6 F11): per-pair windowed
co-occurrence context — does a labeled person pair co-occur inside one
sentence, and what is the minimum character distance between the mentions?

The reference runs this as an offline analysis
(``CommonCrawl/data/test/cross_sentence.py:6-125``) to quantify how much
relation evidence is cross-sentence; here it is a stage over the merged
triples: explode pairs → one struct-returning pandas UDF computing
(same_sentence, min_distance) per (doc, pair).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, IntegerType, StructField, StructType

from ..functions.analysis import min_char_distance, sentence_cooccurrence

_COOCCUR_DT = StructType(
    [
        StructField("same_sentence", BooleanType()),
        StructField("min_distance", IntegerType()),
    ]
)


@pandas_udf(_COOCCUR_DT)
def _cooccur_udf(text: pd.Series, p1: pd.Series, p2: pd.Series) -> pd.DataFrame:
    rows = []
    for t, a, b in zip(text, p1, p2):
        t = t or ""
        rows.append(
            {
                "same_sentence": sentence_cooccurrence(t, a, b),
                "min_distance": min_char_distance(t, a, b),
            }
        )
    return pd.DataFrame(rows)


def cross_sentence_stats(expanded: DataFrame, label_col: str = "merge_label") -> DataFrame:
    """(url, subj, obj, rel, same_sentence, min_distance) per labeled pair."""
    pairs = (
        expanded.filter(F.size(label_col) > 0)
        .select("url", "trad_text", F.explode(label_col).alias("t"))
        .select("url", "trad_text", "t.subj", "t.obj", "t.rel")
    )
    stats = _cooccur_udf(F.col("trad_text"), F.col("subj"), F.col("obj"))
    return (
        pairs.withColumn("_s", stats)
        .select(
            "url",
            "subj",
            "obj",
            "rel",
            F.col("_s.same_sentence").alias("same_sentence"),
            F.col("_s.min_distance").alias("min_distance"),
        )
    )


def cross_sentence_summary(stats: DataFrame) -> DataFrame:
    """Corpus-level rates (the reference's printed analysis, as a frame)."""
    return stats.groupBy("rel").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(F.col("same_sentence").cast("double")), 4).alias("same_sentence_rate"),
        F.round(F.avg(F.when(F.col("min_distance") >= 0, F.col("min_distance"))), 2).alias(
            "avg_min_distance"
        ),
    )


def ner_overlap_audit(expanded: DataFrame, multiplicity: bool = False) -> DataFrame:
    """NER-source overlap audit (reference
    ``sota_ner/gemini_expansion.py:243-277`` ``overlap()``): corpus totals of
    CKIP mentions, LLM mentions, hallucinated LLM mentions (absent from the
    trad document — the reference subtracts them from the LLM count), exact
    intersection, and union. One aggregation over array expressions — no
    Python. Requires a dual-NER expanded frame (``ner_sources`` incl. ckip +
    gemini) filtered to non-empty merge labels like the reference.

    Default (``multiplicity=False``) is an INTENTIONAL DEVIATION: the
    reference's nested loop increments the hallucination counter once per
    (ckip, gemini) pair — multiplying each hallucinated name by the doc's
    CKIP mention count — and counts intersection once per duplicate match;
    the default uses per-mention SET semantics (each name counted once per
    doc) because the multiplied counts measure nothing.

    ``multiplicity=True`` reproduces the reference's nested-loop numbers
    BIT-FOR-BIT (gemini_expansion.py:253-267) for anyone comparing against a
    reference run: per doc, hallucination = |ckip| × (# gemini mentions
    absent from the doc, duplicates kept), intersection = Σ over ckip
    mentions of the count of equal in-doc gemini mentions, gemini_count =
    Σ|gemini| − hallucination, union = ckip + gemini − intersection (so the
    pair-multiplied numbers can go negative on hallucination-heavy docs —
    faithfully)."""
    doc = F.col("trad_text")
    if multiplicity:
        # duplicates KEPT everywhere (the reference iterates raw lists)
        clean_g = F.filter("gemini_ner", lambda g: doc.contains(g))
        ck_n = F.size("ckip_entity").cast("long")
        gm_n = F.size("gemini_ner").cast("long")
        hall = ck_n * (gm_n - F.size(clean_g).cast("long"))
        inter = F.aggregate(
            "ckip_entity",
            F.lit(0).cast("long"),
            lambda acc, c: acc + F.size(F.filter(clean_g, lambda g: g == c)),
        )
        per_doc = expanded.filter(F.size("merge_label") > 0).select(
            ck_n.alias("_ck"), gm_n.alias("_gm"), hall.alias("_hall"), inter.alias("_inter")
        )
        return per_doc.agg(
            F.sum("_ck").cast("long").alias("ckip_count"),
            (F.sum("_gm") - F.sum("_hall")).cast("long").alias("gemini_count"),
            F.sum("_hall").cast("long").alias("gemini_hallucination"),
            F.sum("_inter").cast("long").alias("intersection"),
            (F.sum("_ck") + F.sum("_gm") - F.sum("_hall") - F.sum("_inter"))
            .cast("long")
            .alias("union_count"),
        )
    clean = F.filter("gemini_ner", lambda x: doc.contains(x))
    base = expanded.filter(F.size("merge_label") > 0).select(
        "ckip_entity",
        F.size("ckip_entity").alias("_ck"),
        F.size("gemini_ner").alias("_gm"),
        clean.alias("_clean"),
    ).select(
        "_ck",
        (F.col("_gm") - F.size("_clean")).alias("_hall"),
        F.size("_clean").alias("_gm_clean"),
        # intersection/union vs the CLEAN gemini set (the reference skips
        # hallucinated names before comparing, gemini_expansion.py:264-267);
        # both MEASURED, not derived, so a name that is simultaneously
        # hallucinated and lexically equal to a ckip form can't double-count
        F.size(F.array_intersect("ckip_entity", "_clean")).alias("_inter"),
        F.size(F.array_union("ckip_entity", "_clean")).alias("_union"),
    )
    return base.agg(
        F.sum("_ck").cast("long").alias("ckip_count"),
        F.sum("_gm_clean").cast("long").alias("gemini_count"),
        F.sum("_hall").cast("long").alias("gemini_hallucination"),
        F.sum("_inter").cast("long").alias("intersection"),
        F.sum("_union").cast("long").alias("union_count"),
    )
