"""Cross-comparison / verification / consensus stage (SURVEY §2.4 A6, §2.5
U2/U3, §2.7 M5).

Reference flow (``CommonCrawl/data/train/postprecess.py:138-268`` +
``:26-81``): convert both annotators' class-valued triples to Traditional,
intersect them per doc (consensus), send each annotator's disagreed (xor)
triples to the *other* model for numbered 正確/錯誤 verification, and union
intersection + verified-pass triples into ``consensus_label`` with
trad-keyed dedup and self-pair drop.

Spark shape: trad-conversion is a pandas UDF; intersection/xor/union/dedup
are JVM-side array ops (``array_intersect`` / ``array_except`` /
``array_distinct`` / ``filter``) — whole-stage codegen, zero shuffles; only
the verify scorer crosses into Python, over the (small) subset of rows with
disagreements, in the same ``mapInPandas`` pass (no join back).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.chinese import s2t
from ..functions.parse import parse_verdicts
from ..scorers import get_scorer
from .parse import TERNARY_DT, TERNARY_T


@pandas_udf(TERNARY_DT)
def to_traditional_triples(ternary: pd.Series) -> pd.Series:
    """s2t-convert every field and re-canonicalize the pair (conversion can
    change codepoint order; the reference compensates by comparing with
    ``set()`` equality — re-sorting is the typed equivalent)."""
    out = []
    for triples in ternary:
        conv = []
        for t in triples if triples is not None else []:
            p1, p2, rel = s2t(t["subj"]), s2t(t["obj"]), s2t(t["rel"])
            lo, hi = sorted([p1, p2])
            conv.append({"subj": lo, "obj": hi, "rel": rel})
        out.append(conv)
    return pd.Series(out)


def consensus_stage(parsed: DataFrame, scorer: str = "deterministic") -> DataFrame:
    """+ per-annotator trad/checked/not_pass/verify_error columns and the
    merged ``consensus_label`` / ``consensus_entities``."""
    mod = get_scorer(scorer)
    df = parsed
    for ann in ("gemini", "gpt"):
        df = df.withColumn(f"{ann}_ternary_trad", to_traditional_triples(F.col(f"{ann}_ternary")))

    g, p = F.col("gemini_ternary_trad"), F.col("gpt_ternary_trad")
    df = (
        df.withColumn("gemini_correct", F.array_intersect(g, p))
        .withColumn("gemini_wrong", F.array_except(g, p))
        .withColumn("gpt_correct", F.array_intersect(p, g))
        .withColumn("gpt_wrong", F.array_except(p, g))
    )

    # verification of disagreed triples — wide mapInPandas pass (scorer only
    # touches rows that actually have xor triples)
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in df.columns]
        + [
            f"{ann}_{field} {typ}"
            for ann in ("gemini", "gpt")
            for field, typ in (
                ("pass", TERNARY_T),
                ("not_pass", TERNARY_T),
                ("verify_error", "boolean"),
            )
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for ann in ("gemini", "gpt"):
                passes, fails, errors = [], [], []
                for text, wrong in zip(pdf["text"], pdf[f"{ann}_wrong"]):
                    wrong = list(wrong) if wrong is not None else []
                    if not wrong:
                        passes.append([])
                        fails.append([])
                        errors.append(False)
                        continue
                    triples = [(t["subj"], t["obj"], t["rel"]) for t in wrong]
                    answer = mod.score_verify(text, triples)
                    verdicts = parse_verdicts(answer, len(triples))
                    if verdicts is None:  # 驗證過程有誤
                        passes.append([])
                        fails.append(wrong)
                        errors.append(True)
                    else:
                        passes.append([w for w, ok in zip(wrong, verdicts) if ok])
                        fails.append([w for w, ok in zip(wrong, verdicts) if not ok])
                        errors.append(False)
                pdf[f"{ann}_pass"] = passes
                pdf[f"{ann}_not_pass"] = fails
                pdf[f"{ann}_verify_error"] = errors
            yield pdf

    df = df.mapInPandas(verify, schema=out_schema)

    # checked_by = consensus hits + verified passes (reference :244-263);
    # consensus_label = trad-deduped union with self-pair drop (:26-81)
    for ann in ("gemini", "gpt"):
        df = df.withColumn(
            f"{ann}_checked", F.concat(F.col(f"{ann}_correct"), F.col(f"{ann}_pass"))
        )
    merged = F.array_distinct(F.concat(F.col("gemini_checked"), F.col("gpt_checked")))
    merged = F.filter(merged, lambda t: t["subj"] != t["obj"])
    df = df.withColumn("consensus_label", merged)
    df = df.withColumn(
        "consensus_entities",
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.col("consensus_label"), lambda t: F.array(t["subj"], t["obj"])
                )
            )
        ),
    )
    return df.drop("gemini_correct", "gpt_correct")
