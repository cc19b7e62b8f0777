"""grouped_exact_median (operators/quantiles.py): fuzz vs a plain-Python
per-group sort across shapes that stress each path — forced narrowing
rounds, tiny groups under the threshold, duplicate-heavy groups that
collapse to lo == hi, negative/float values, singleton groups — plus the
no-broadcast join path."""

import random

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.quantiles import (
    grouped_exact_median,
)


def _expect(rows):
    by = {}
    for k, x in rows:
        by.setdefault(k, []).append(x)
    out = {}
    for k, xs in by.items():
        xs.sort()
        n = len(xs)
        v1, v2 = xs[(n - 1) // 2], xs[n // 2]
        out[k] = (n, round((v1 + v2) / 2, 4))
    return out


def _check(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k long, x double")
    got = {
        r["k"]: (r["n"], r["median"])
        for r in grouped_exact_median(df, "k", "x", **kw).collect()
    }
    assert got == _expect(rows)


def test_forced_rounds_many_groups(spark):
    rng = random.Random(7)
    rows = [(i % 13, rng.uniform(-1e4, 1e4)) for i in range(6000)]
    _check(spark, rows, buckets=16, take_threshold=32)


def test_duplicate_heavy_and_tiny_groups(spark):
    rng = random.Random(8)
    rows = (
        [(1, 42.0)] * 500                      # range collapses to lo == hi
        + [(2, float(rng.choice([1, 2, 3]))) for _ in range(400)]
        + [(3, 5.5)]                           # singleton
        + [(4, x) for x in (9.0, -3.0)]        # even tiny group
    )
    _check(spark, rows, buckets=8, take_threshold=16)


def test_no_broadcast_path(spark):
    rng = random.Random(9)
    rows = [(i % 5, rng.gauss(0, 100)) for i in range(2000)]
    _check(spark, rows, buckets=8, take_threshold=64, broadcast_state=False)


def test_integer_like_and_negative_ranges(spark):
    rows = [(k, float(v)) for k in range(4) for v in range(-50, 50)]
    _check(spark, rows, buckets=4, take_threshold=10)


def test_float_bucket_boundaries(spark):
    """r5-advice nit: values sitting EXACTLY on (and 1 ulp around) float
    bucket boundaries must not be double-counted between the narrowing
    rounds' count-below bookkeeping and the range membership. The r6 scheme
    (whole-group clamped classification + min/max refinement) is immune by
    construction; this pins it."""
    import math

    lo, hi, buckets = 0.1, 0.7, 8
    width = (hi - lo) / buckets
    edges = [lo + b * width for b in range(buckets + 1)]
    rows = []
    k = 0
    for e in edges:
        for v in (math.nextafter(e, -math.inf), e, math.nextafter(e, math.inf)):
            rows.append((k, v))
            rows.append((k, v))  # duplicated so ties straddle edges too
    # pad so the group exceeds the threshold and rounds actually run
    rows += [(k, lo + (i / 97.0) * (hi - lo)) for i in range(97)]
    _check(spark, rows, buckets=buckets, take_threshold=8)


def test_massive_tie_resolves_without_collect(spark):
    """A group that is one giant tie (plus noise) must resolve via the
    lo == hi literal path the moment the chosen bucket's min == max."""
    rows = [(1, 7.25)] * 5000 + [(1, 1.0), (1, 99.0)] + [(2, float(i)) for i in range(300)]
    _check(spark, rows, buckets=4, take_threshold=8)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz(spark, seed):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(rng.choice([2, 7, 20])), rng.choice(
            [rng.uniform(-1, 1), float(rng.randrange(5)), rng.uniform(1e5, 1e6)]
        ))
        for _ in range(rng.randrange(500, 3000))
    ]
    _check(spark, rows, buckets=rng.choice([4, 16, 64]), take_threshold=rng.choice([8, 100]))
