"""F7 — the JSON encode/decode boundary (reference uses
``json.dumps(ensure_ascii=False)`` / ``json.loads`` per cell, e.g.
``postprecess.py:36,45``, ``sota_ner/ckip_expansion.py:59``).

Inside the pipeline everything is native nested types; this module is the
CSV-compat EXPORT/IMPORT edge only: ternary/entity arrays ⇄ JSON strings.
Spark's ``to_json`` emits raw UTF-8 (the ``ensure_ascii=False`` behavior),
so exported CSVs are byte-compatible with the reference's column format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.parse import TERNARY_T


def export_csv_compat(df: DataFrame, array_cols: list[str]) -> DataFrame:
    """Nested-typed columns → JSON-in-string columns (the reference's CSV
    column format); everything else passes through."""
    out = df
    for c in array_cols:
        out = out.withColumn(c, F.to_json(F.col(c)))
    return out


def import_csv_compat(df: DataFrame, col_types: dict[str, str]) -> DataFrame:
    """JSON-in-string columns → nested types. ``col_types`` maps each column
    name to its DDL type string (e.g. ``{"merge_label": TERNARY_T}``);
    columns not listed pass through unchanged."""
    out = df
    for c, t in col_types.items():
        out = out.withColumn(c, F.from_json(F.col(c), t))
    return out


def ternary_json_roundtrip(col) -> Column:
    """to_json → from_json round trip expression for a ternary column (used
    by the round-trip test; identity on well-typed data)."""
    return F.from_json(F.to_json(col), TERNARY_T)
