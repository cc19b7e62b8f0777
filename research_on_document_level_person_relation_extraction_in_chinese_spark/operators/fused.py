"""Fused Python nodes for the end-to-end pipeline.

Each pipelined Python node in a Spark stage gets its own worker process per
concurrent task, and cold worker creation is paid per (node × core). Measured
on local[32]: a 6-node chain costs ~60 s of pure spawn overhead before any
work happens. The pipeline therefore fuses Python work into the minimum
number of Arrow crossings:

  node 1: detection scoring + triple parse (M1/M2 + F1/F2)
  node 2: trad conversion + cross-comparison + verification (F6 + U2/U3 + M5)
  node 3: NER + density + pair expansion scoring (M7–M9, in expansion.py)

Everything else (taxonomy remap, consensus merge/dedup, hallucination filter,
truncation, explode/distinct, joins) stays JVM-side. The standalone operators
in annotate.py / parse.py / consensus.py implement the same stages unfused
(one concern per node) and share every kernel function with these — the
parity gate runs over the fused pipeline.

Set-op semantics here replicate Spark's ``array_intersect``/``array_except``
(left-to-right order, distinct) so the fused and unfused consensus stages are
interchangeable; both mirror the reference's ``set()``-equality comparison
(``CommonCrawl/data/train/postprecess.py:168-188``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, IntegerType, StringType, StructField, StructType

from ..functions.chinese import s2t
from ..functions.parse import parse_verdicts
from ..scorers import get_scorer
from .parse import PARSED_DT, TERNARY_DT, _parse_cell

def _annotate_parse_dt(annotators: tuple[str, ...]) -> StructType:
    return StructType(
        [
            StructField(f"{ann}_{part}", typ)
            for ann in annotators
            for part, typ in (
                ("has_relation", StringType()),
                ("output", StringType()),
                ("attempts", IntegerType()),
                ("parsed", PARSED_DT),
            )
        ]
    )


def make_annotate_parse_udf(
    scorer: str = "deterministic",
    tolerant: bool = True,
    annotators: tuple[str, ...] = ("gemini", "gpt"),
):
    """Node 1: all requested annotators scored AND parsed in one Arrow
    crossing (2 by default; M3 ``taide`` / M4 ``fewshot`` variants compose a
    3+-annotator shape)."""
    mod = get_scorer(scorer)

    # the retry/re-instruction loop (M1) surfaces its attempt counter when
    # the scorer provides it; plain (status, output) scorers report 1
    with_attempts = getattr(mod, "score_detect_with_attempts", None)

    @pandas_udf(_annotate_parse_dt(annotators))
    def annotate_parse_udf(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            row = {}
            for ann in annotators:
                if with_attempts is not None:
                    status, output, attempts = with_attempts(t, ann)
                else:
                    status, output = mod.score_detect(t, ann)
                    attempts = 1
                row[f"{ann}_has_relation"] = status
                row[f"{ann}_output"] = output
                row[f"{ann}_attempts"] = attempts
                row[f"{ann}_parsed"] = _parse_cell(output, status, tolerant)
            rows.append(row)
        return pd.DataFrame(rows)

    return annotate_parse_udf


def annotate_parse_stage(
    docs: DataFrame,
    scorer: str = "deterministic",
    tolerant: bool = True,
    annotators: tuple[str, ...] = ("gemini", "gpt"),
) -> DataFrame:
    udf = make_annotate_parse_udf(scorer, tolerant, annotators)
    df = docs.withColumn("_ap", udf(F.col("text")))
    for ann in annotators:
        df = df.withColumn(f"{ann}_has_relation", F.col(f"_ap.{ann}_has_relation"))
        df = df.withColumn(f"{ann}_output", F.col(f"_ap.{ann}_output"))
        df = df.withColumn(f"{ann}_attempts", F.col(f"_ap.{ann}_attempts"))
        for field in ("ternary", "relations", "entities", "parse_error"):
            df = df.withColumn(f"{ann}_{field}", F.col(f"_ap.{ann}_parsed.{field}"))
    return df.drop("_ap")


_CONSENSUS_DT = StructType(
    [
        StructField("gemini_ternary_trad", TERNARY_DT),
        StructField("gpt_ternary_trad", TERNARY_DT),
        StructField("gemini_checked", TERNARY_DT),
        StructField("gpt_checked", TERNARY_DT),
        StructField("gemini_not_pass", TERNARY_DT),
        StructField("gpt_not_pass", TERNARY_DT),
        StructField("gemini_verify_error", BooleanType()),
        StructField("gpt_verify_error", BooleanType()),
    ]
)


def _trad(triples) -> list[tuple[str, str, str]]:
    out = []
    for t in triples if triples is not None else []:
        p1, p2, rel = s2t(t["subj"]), s2t(t["obj"]), s2t(t["rel"])
        lo, hi = sorted([p1, p2])
        tup = (lo, hi, rel)
        if tup not in out:
            out.append(tup)
    return out


def _as_dicts(triples) -> list[dict]:
    return [{"subj": s, "obj": o, "rel": r} for s, o, r in triples]


def make_consensus_udf(scorer: str = "deterministic"):
    """Node 2: trad conversion, intersect/xor (array_intersect/array_except
    semantics), and verification of disagreed triples."""
    mod = get_scorer(scorer)

    @pandas_udf(_CONSENSUS_DT)
    def consensus_udf(text: pd.Series, g_tern: pd.Series, p_tern: pd.Series) -> pd.DataFrame:
        rows = []
        for t, g, p in zip(text, g_tern, p_tern):
            gt, pt = _trad(g), _trad(p)
            gset, pset = set(gt), set(pt)
            row = {"gemini_ternary_trad": _as_dicts(gt), "gpt_ternary_trad": _as_dicts(pt)}
            for ann, mine, theirs in (("gemini", gt, pset), ("gpt", pt, gset)):
                correct = [x for x in mine if x in theirs]
                wrong = [x for x in mine if x not in theirs]
                passed, failed, err = [], [], False
                if wrong:
                    answer = mod.score_verify(t, wrong)
                    verdicts = parse_verdicts(answer, len(wrong))
                    if verdicts is None:  # 驗證過程有誤
                        failed, err = wrong, True
                    else:
                        passed = [w for w, ok in zip(wrong, verdicts) if ok]
                        failed = [w for w, ok in zip(wrong, verdicts) if not ok]
                row[f"{ann}_checked"] = _as_dicts(correct + passed)
                row[f"{ann}_not_pass"] = _as_dicts(failed)
                row[f"{ann}_verify_error"] = err
            rows.append(row)
        return pd.DataFrame(rows)

    return consensus_udf


def fused_consensus_stage(parsed: DataFrame, scorer: str = "deterministic") -> DataFrame:
    """Same output contract as operators.consensus.consensus_stage (minus the
    intermediate wrong/pass columns); merge/dedup/entities stay JVM-side."""
    udf = make_consensus_udf(scorer)
    df = parsed.withColumn(
        "_cons", udf(F.col("text"), F.col("gemini_ternary"), F.col("gpt_ternary"))
    )
    for field in _CONSENSUS_DT.fieldNames():
        df = df.withColumn(field, F.col(f"_cons.{field}"))
    df = df.drop("_cons")

    merged = F.array_distinct(F.concat(F.col("gemini_checked"), F.col("gpt_checked")))
    merged = F.filter(merged, lambda t: t["subj"] != t["obj"])
    df = df.withColumn("consensus_label", merged)
    return df.withColumn(
        "consensus_entities",
        F.array_distinct(
            F.flatten(
                F.transform(F.col("consensus_label"), lambda t: F.array(t["subj"], t["obj"]))
            )
        ),
    )
