"""NER-driven expansion stage (SURVEY §2.7 M7–M9, §2.6 F8–F10, §2.3 J3).

Reference flow (``sota_ner/ckip_expansion.py:236-244``): on docs with a
non-empty consensus — (1) person NER over the trad document, (2) density
classification with the per-doc work caps (≤105 extra pairs, ≤1.9 names/100
chars — the skew/fan-out guard), (3) candidate pairs minus already-labeled
pairs (anti-join) with both names present in the 4000-char doc, (4) one
batched 5-way relation prompt per doc for all its extra pairs, (5) merge with
consensus preferring consensus per pair + hallucination filter, (6) 1024-char
truncation-survival golden variant.

Spark shape: per-doc pair generation stays inside the pandas UDF (bounded to
105 pairs by F10 — this is why a quadratic pair self-join is never needed),
the batched pair scorer is one ``mapInPandas`` pass, and the merge/truncation
steps are JVM array expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.analysis import MAX_DOC_LENGTH, expansion_pairs
from ..functions.chinese import s2t
from ..functions.parse import parse_five_class_answers
from ..scorers import get_scorer
from .parse import TERNARY_T
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

PAIRS_DT = StructType(
    [
        StructField("density", StringType()),
        StructField(
            "extra_pairs",
            ArrayType(
                StructType(
                    [StructField("p1", StringType()), StructField("p2", StringType())]
                )
            ),
        ),
    ]
)


@pandas_udf(StringType())
def to_traditional_text(text: pd.Series) -> pd.Series:
    return text.map(lambda t: s2t(t) if t is not None else None)


@pandas_udf(PAIRS_DT)
def density_and_pairs(
    entities: pd.Series, gemini_trad: pd.Series, gpt_trad: pd.Series, trad_text: pd.Series
) -> pd.DataFrame:
    """F10 density + J3 anti-join of candidate pairs against already-labeled
    annotator pairs (reference ``ckip_expansion.py:62-97``)."""
    rows = []
    for ents, g, p, doc in zip(entities, gemini_trad, gpt_trad, trad_text):
        already = {
            (t["subj"], t["obj"])
            for t in (list(g) if g is not None else []) + (list(p) if p is not None else [])
        }
        ent_list = list(ents) if ents is not None else []
        density, extra = expansion_pairs(ent_list, already, doc if doc is not None else "")
        rows.append(
            {
                "density": density,
                "extra_pairs": [{"p1": a, "p2": b} for a, b in extra],
            }
        )
    return pd.DataFrame(rows)


def expansion_stage(consensus_df: DataFrame, scorer: str = "deterministic") -> DataFrame:
    """Input: consensus stage output (must already be filtered to
    ``size(consensus_label) > 0`` — reference ``ckip_expansion.py:238-239``).
    Adds: trad_text, ckip_entity, density, expansion_ternary,
    expansion_failed, merge_label, merge_label_1024."""
    mod = get_scorer(scorer)
    df = consensus_df.withColumn("trad_text", to_traditional_text(F.col("text")))

    # M7 person NER (batched scorer pass)
    ner_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in df.columns]
        + ["ckip_entity array<string>"]
    )

    def ner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf["ckip_entity"] = [mod.score_ner(t) for t in pdf["trad_text"]]
            yield pdf

    df = df.mapInPandas(ner, schema=ner_schema)

    df = df.withColumn(
        "_dp",
        density_and_pairs(
            F.col("ckip_entity"),
            F.col("gemini_ternary_trad"),
            F.col("gpt_ternary_trad"),
            F.col("trad_text"),
        ),
    )
    df = (
        df.withColumn("density", F.col("_dp.density"))
        .withColumn("extra_pairs", F.col("_dp.extra_pairs"))
        .drop("_dp")
    )

    # M9 batched 5-way pair classification (middle-density docs only)
    cls_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in df.columns]
        + [f"expansion_ternary {TERNARY_T}", "expansion_failed boolean"]
    )

    def classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ternaries, failed = [], []
            for density, pairs, doc in zip(
                pdf["density"], pdf["extra_pairs"], pdf["trad_text"]
            ):
                pairs = [(p["p1"], p["p2"]) for p in (list(pairs) if pairs is not None else [])]
                if density != "middle" or not pairs:
                    ternaries.append([])
                    failed.append(False)
                    continue
                answer = mod.score_expansion_pairs(doc, pairs)
                classes = parse_five_class_answers(answer, len(pairs))
                if classes is None:  # count mismatch → doc fails expansion
                    ternaries.append([])
                    failed.append(True)
                    continue
                ternaries.append(
                    [
                        {"subj": a, "obj": b, "rel": cls}
                        for (a, b), cls in zip(pairs, classes)
                        if cls != "沒有"
                    ]
                )
                failed.append(False)
            pdf["expansion_ternary"] = ternaries
            pdf["expansion_failed"] = failed
            yield pdf

    df = df.mapInPandas(classify, schema=cls_schema)

    # merge (reference merge_label :159-192): density-high docs dropped; keep
    # consensus triples whose names survive the hallucination check, then add
    # expansion triples for pairs not already covered.
    doc4000 = F.col("trad_text")
    kept_consensus = F.filter(
        F.col("consensus_label"),
        lambda t: doc4000.contains(t["subj"]) & doc4000.contains(t["obj"]),
    )
    covered = F.transform(kept_consensus, lambda t: F.struct(t["subj"].alias("p1"), t["obj"].alias("p2")))
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
