"""Snapshot diff — incremental maintenance primitive for the materialized
KG tables (SURVEY §7.1 T6 writes node/edge snapshots; a production
pipeline re-runs over a growing crawl and needs "what changed since the
last snapshot" without re-reading either snapshot twice).

``snapshot_diff(old, new, keys, compare)`` → one row per key present in
either snapshot, with status:

- ``added``    — key only in ``new``
- ``removed``  — key only in ``old``
- ``changed``  — key in both, any compare column differs
- ``same``     — key in both, all compare columns equal (kept so the diff
  doubles as a reconciliation audit; filter it out for a changelog)

plus ``<col>_old`` / ``<col>_new`` for every compare column.

Scale shape: ONE full-outer shuffle join on the key columns — the minimum
possible data movement for a diff (each side is read once; at 10^12 edges
both snapshots are bucketed by the same key so the join is co-located and
shuffle-free). Null-safe equality (``<=>``) keeps NULL compare values from
mis-classifying as changed. No collect, no window, no skew-prone key
(the diff key is the edge identity, which build_edges already de-hotted
by resolving mentions to person ids).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str],
) -> DataFrame:
    """Full-outer key diff of two snapshots (see module docstring)."""
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_old") for c in compare],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_new") for c in compare],
        F.lit(1).alias("_in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"_ko_{k}"].eqNullSafe(n[f"_kn_{k}"]) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    any_change = (
        reduce(
            lambda a, b: a | b,
            [~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")) for c in compare],
        )
        if compare
        else F.lit(False)
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
        *[F.col(f"{c}_old") for c in compare],
        *[F.col(f"{c}_new") for c in compare],
    )
