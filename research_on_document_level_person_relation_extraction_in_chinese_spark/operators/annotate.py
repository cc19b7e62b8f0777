"""Detection/annotation stage (SURVEY §2.7 M1–M4).

The reference calls an LLM once per document with the detection prompt and
fans out over API-key threads (``CommonCrawl/multi_thread_gemini_api.py:46-58``)
— its manual ``repartition(n) + mapPartitions``. Here the batched scorer runs
inside a struct-returning **scalar pandas UDF** (ArrowEvalPython): only the
``text`` column crosses into Python — passthrough columns (url, …) stay in
the JVM row, which matters because Arrow→pandas materializes a Python object
per cell. Both annotators run in the SAME UDF (one Python node; worker
startup is paid per node × partition).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from ..scorers import get_scorer

ANNOTATORS = ("gemini", "gpt")

_ANNOTATE_DT = StructType(
    [
        StructField(name, StringType())
        for ann in ANNOTATORS
        for name in (f"{ann}_has_relation", f"{ann}_output")
    ]
)


def make_annotate_udf(scorer: str = "deterministic", annotators=ANNOTATORS):
    mod = get_scorer(scorer)

    @pandas_udf(_ANNOTATE_DT)
    def annotate_udf(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            row = {}
            for ann in annotators:
                status, output = mod.score_detect(t, ann)
                row[f"{ann}_has_relation"] = status
                row[f"{ann}_output"] = output
            rows.append(row)
        return pd.DataFrame(rows)

    return annotate_udf


def annotate(docs: DataFrame, annotators=ANNOTATORS, scorer: str = "deterministic") -> DataFrame:
    """docs(url, text, ...) → + {ann}_has_relation, {ann}_output per annotator."""
    udf = make_annotate_udf(scorer, annotators)
    df = docs.withColumn("_ann", udf(F.col("text")))
    for ann in annotators:
        for field in ("has_relation", "output"):
            df = df.withColumn(f"{ann}_{field}", F.col(f"_ann.{ann}_{field}"))
    return df.drop("_ann")
