"""Triple-parse stage (SURVEY §2.6 F1/F2) as vectorized pandas UDFs.

The reference mutates JSON-string columns per row (``postprecess.py:208-267``);
here the parse kernel runs over Arrow batches and emits real nested types:
``ternary array<struct<subj,obj,rel>>``, ``relations array<string>``,
``entities array<string>``, ``parse_error boolean`` — no JSON-in-string.
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

from ..functions.parse import HAS_RELATION, check_detection_format, parse_triples

TERNARY_T = "array<struct<subj:string,obj:string,rel:string>>"
TERNARY_DT = ArrayType(
    StructType(
        [
            StructField("subj", StringType()),
            StructField("obj", StringType()),
            StructField("rel", StringType()),
        ]
    )
)
PARSED_DT = StructType(
    [
        StructField("ternary", TERNARY_DT),
        StructField("relations", ArrayType(StringType())),
        StructField("entities", ArrayType(StringType())),
        StructField("parse_error", BooleanType()),
    ]
)


def _parse_cell(output, has_relation, tolerant: bool):
    if has_relation != HAS_RELATION or output is None:
        return {"ternary": [], "relations": [], "entities": [], "parse_error": False}
    triples, relations, entities, err = parse_triples(output, tolerant=tolerant)
    return {
        "ternary": [{"subj": s, "obj": o, "rel": r} for s, o, r in triples],
        "relations": relations,
        "entities": entities,
        "parse_error": err,
    }


@pandas_udf(PARSED_DT)
def _parse_tolerant(output: pd.Series, has_relation: pd.Series) -> pd.DataFrame:
    rows = [_parse_cell(o, h, True) for o, h in zip(output, has_relation)]
    return pd.DataFrame(rows)


@pandas_udf(PARSED_DT)
def _parse_strict(output: pd.Series, has_relation: pd.Series) -> pd.DataFrame:
    rows = [_parse_cell(o, h, False) for o, h in zip(output, has_relation)]
    return pd.DataFrame(rows)


@pandas_udf(BooleanType())
def format_ok(output: pd.Series) -> pd.Series:
    """F2 — detection-answer well-formedness (drives format-error counters)."""
    return output.map(check_detection_format)


def parse_stage(annotated: DataFrame, annotators=("gemini", "gpt"), tolerant: bool = True) -> DataFrame:
    """+ {ann}_ternary / {ann}_relations / {ann}_entities / {ann}_parse_error.

    ``tolerant`` selects the parse-kernel variant (test/inference path strips
    quotes + accepts ``，``; train path is comma-only — SURVEY §7.3 risk 1).
    """
    udf = _parse_tolerant if tolerant else _parse_strict
    df = annotated
    for ann in annotators:
        parsed = udf(F.col(f"{ann}_output"), F.col(f"{ann}_has_relation"))
        df = df.withColumn(f"_{ann}_parsed", parsed)
        for field in ("ternary", "relations", "entities", "parse_error"):
            df = df.withColumn(f"{ann}_{field}", F.col(f"_{ann}_parsed.{field}"))
        df = df.drop(f"_{ann}_parsed")
    return df
