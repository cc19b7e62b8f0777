"""Exact order statistics WITHOUT a global sort — iterative histogram
narrowing (the classic distributed selection algorithm; what
``approxQuantile`` refuses to promise, done exactly).

A global ``ORDER BY`` of 10^12 rows is a full-data range shuffle; the
median needs no such thing: each round is ONE bounded, partial-aggregated
histogram over the candidate range (≤ ``buckets`` rows collected, like the
taxonomy map), the target bucket's bounds become the next round's range,
and after O(log_buckets N) scans the survivor set is small enough for a
single TakeOrdered. Total data movement: a few histogram tables plus one
bucket's worth of rows — never a corpus-wide sort.

Bucketing uses the SAME floor expression for counting and for the
narrowing filter (``bucket == b``, never a float range test), so boundary
rounding can't drop or double-count a value between rounds.

The driver's ``exact_median`` query is value-gated against DuckDB's
row_number definition of the median (avg of the two middle order
statistics) — the oracle checks the VALUE, not the algorithm, which is the
point: same answer, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kth_smallest(
    vals: DataFrame,
    k: int,
    col: str = "x",
    buckets: int = 1024,
    take_threshold: int = 100_000,
    max_rounds: int = 10,
) -> float:
    """The k-th smallest (1-based) value of ``vals[col]`` (non-null doubles).

    Narrows [lo, hi] by histogram until ≤ ``take_threshold`` candidates
    remain, then resolves the remaining rank with one TakeOrdered of at
    most ``local rank`` rows."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    frame = vals.select(F.col(col).alias("x")).where(F.col("x").isNotNull())
    stats = frame.agg(
        F.count("*").alias("n"), F.min("x").alias("lo"), F.max("x").alias("hi")
    ).first()
    n, lo, hi = int(stats["n"]), stats["lo"], stats["hi"]
    if k > n:
        raise ValueError(f"k={k} > {n} rows")
    rank = k
    for _ in range(max_rounds):
        if lo == hi:
            return float(lo)
        cnt_check = frame.count()
        if cnt_check <= take_threshold:
            break
        width = (hi - lo) / buckets
        # clamp BOTH ends: after a narrowing round the recomputed lo/hi are
        # float arithmetic, and a boundary value may land a hair outside
        bucket = F.greatest(
            F.least(
                F.floor((F.col("x") - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(buckets - 1),
            ),
            F.lit(0),
        )
        hist = dict(
            (int(r["b"]), int(r["c"]))
            for r in frame.groupBy(bucket.alias("b")).agg(F.count("*").alias("c")).collect()
        )
        cum = 0
        for b in range(buckets):
            c = hist.get(b, 0)
            if cum + c >= rank:
                rank -= cum
                frame = frame.where(bucket == b)
                lo = lo + b * width if b > 0 else lo
                hi = lo + width if b < buckets - 1 else hi
                break
            cum += c
        else:  # pragma: no cover - unreachable (ranks always land)
            raise AssertionError("rank walked past the histogram")
    rows = frame.orderBy("x").limit(rank).agg(F.max("x").alias("v")).first()
    return float(rows["v"])


def exact_median(
    df: DataFrame, col: str, buckets: int = 1024, take_threshold: int = 100_000
) -> DataFrame:
    """One row ``(n, median)`` — median = avg of the two middle order
    statistics (equal for odd n), computed via :func:`kth_smallest` (no
    global sort anywhere in the plan)."""
    vals = df.select(F.col(col).cast("double").alias("x")).where(
        F.col("x").isNotNull()
    )
    vals = vals.persist()
    try:
        n = vals.count()
        if n == 0:
            raise ValueError("exact_median over an empty column")
        k1, k2 = (n + 1) // 2, (n + 2) // 2
        v1 = kth_smallest(vals, k1, buckets=buckets, take_threshold=take_threshold)
        v2 = (
            v1
            if k2 == k1
            else kth_smallest(vals, k2, buckets=buckets, take_threshold=take_threshold)
        )
    finally:
        vals.unpersist()
    med = (v1 + v2) / 2.0
    return df.sparkSession.createDataFrame(
        [(n, round(med, 4))], "n bigint, median double"
    )
