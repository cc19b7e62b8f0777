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
the verify scorer crosses into Python (a struct-returning pandas UDF whose
inputs are just text + the two xor arrays), over the subset of rows with
disagreements — no join back, no passthrough serialization.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyspark.sql.types import BooleanType, StructField, StructType

from ..functions.chinese import s2t
from ..functions.parse import parse_verdicts
from ..scorers import get_scorer
from .parse import TERNARY_DT


def _trad_triples(triples) -> list[dict]:
    conv = []
    for t in triples if triples is not None else []:
        p1, p2, rel = s2t(t["subj"]), s2t(t["obj"]), s2t(t["rel"])
        lo, hi = sorted([p1, p2])
        conv.append({"subj": lo, "obj": hi, "rel": rel})
    return conv


_DUAL_TRAD_DT = StructType(
    [StructField("gemini", TERNARY_DT), StructField("gpt", TERNARY_DT)]
)


@pandas_udf(_DUAL_TRAD_DT)
def to_traditional_triples_dual(gemini: pd.Series, gpt: pd.Series) -> pd.DataFrame:
    """s2t-convert every field of both annotators' triple arrays (one fused
    Python node) and re-canonicalize the pair (conversion can change
    codepoint order; the reference compensates by comparing with ``set()``
    equality — re-sorting is the typed equivalent)."""
    return pd.DataFrame(
        {"gemini": [_trad_triples(g) for g in gemini], "gpt": [_trad_triples(p) for p in gpt]}
    )


def consensus_stage(
    parsed: DataFrame,
    scorer: str = "deterministic",
    strict_verify_failure: bool = False,
) -> DataFrame:
    """+ per-annotator trad/checked/not_pass/verify_error columns and the
    merged ``consensus_label`` / ``consensus_entities``.

    ``strict_verify_failure``: train semantics (False — unverifiable triples
    dropped per-triple, reference ``train/postprecess.py:36-44``) vs the
    test-corpus semantics (True — 驗證過程有誤 zeroes the whole document's
    label, reference ``test/postprecess_other.py:24-31``)."""
    mod = get_scorer(scorer)
    df = parsed.withColumn(
        "_trad", to_traditional_triples_dual(F.col("gemini_ternary"), F.col("gpt_ternary"))
    )
    for ann in ("gemini", "gpt"):
        df = df.withColumn(f"{ann}_ternary_trad", F.col(f"_trad.{ann}"))
    df = df.drop("_trad")

    g, p = F.col("gemini_ternary_trad"), F.col("gpt_ternary_trad")
    df = (
        df.withColumn("gemini_correct", F.array_intersect(g, p))
        .withColumn("gemini_wrong", F.array_except(g, p))
        .withColumn("gpt_correct", F.array_intersect(p, g))
        .withColumn("gpt_wrong", F.array_except(p, g))
    )

    # verification of disagreed triples — struct-returning pandas UDF: only
    # (text, wrong_g, wrong_p) cross into Python, and the scorer only touches
    # rows that actually have xor triples
    verify_dt = StructType(
        [
            StructField(f"{ann}_{field}", typ)
            for ann in ("gemini", "gpt")
            for field, typ in (
                ("pass", TERNARY_DT),
                ("not_pass", TERNARY_DT),
                ("verify_error", BooleanType()),
            )
        ]
    )

    def _verify_one(mod, text, wrong) -> tuple[list, list, bool]:
        wrong = list(wrong) if wrong is not None else []
        if not wrong:
            return [], [], False
        triples = [(t["subj"], t["obj"], t["rel"]) for t in wrong]
        answer = mod.score_verify(text, triples)
        verdicts = parse_verdicts(answer, len(triples))
        if verdicts is None:  # 驗證過程有誤
            return [], wrong, True
        return (
            [w for w, ok in zip(wrong, verdicts) if ok],
            [w for w, ok in zip(wrong, verdicts) if not ok],
            False,
        )

    @pandas_udf(verify_dt)
    def verify_udf(text: pd.Series, wrong_g: pd.Series, wrong_p: pd.Series) -> pd.DataFrame:
        rows = []
        for t, wg, wp in zip(text, wrong_g, wrong_p):
            gp, gn, ge = _verify_one(mod, t, wg)
            pp, pn, pe = _verify_one(mod, t, wp)
            rows.append(
                {
                    "gemini_pass": gp,
                    "gemini_not_pass": gn,
                    "gemini_verify_error": ge,
                    "gpt_pass": pp,
                    "gpt_not_pass": pn,
                    "gpt_verify_error": pe,
                }
            )
        return pd.DataFrame(rows)

    df = df.withColumn(
        "_verify", verify_udf(F.col("text"), F.col("gemini_wrong"), F.col("gpt_wrong"))
    )
    for ann in ("gemini", "gpt"):
        for field in ("pass", "not_pass", "verify_error"):
            df = df.withColumn(f"{ann}_{field}", F.col(f"_verify.{ann}_{field}"))
    df = df.drop("_verify")

    # checked_by = consensus hits + verified passes (reference :244-263);
    # consensus_label = trad-deduped union with self-pair drop (:26-81)
    for ann in ("gemini", "gpt"):
        df = df.withColumn(
            f"{ann}_checked", F.concat(F.col(f"{ann}_correct"), F.col(f"{ann}_pass"))
        )
    merged = F.array_distinct(F.concat(F.col("gemini_checked"), F.col("gpt_checked")))
    merged = F.filter(merged, lambda t: t["subj"] != t["obj"])
    if strict_verify_failure:
        any_err = F.col("gemini_verify_error") | F.col("gpt_verify_error")
        merged = F.when(any_err, F.slice(merged, 1, 0)).otherwise(merged)
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
