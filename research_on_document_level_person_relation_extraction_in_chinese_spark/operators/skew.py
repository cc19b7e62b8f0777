"""Skew-handling utilities (SURVEY §4 custom item 1).

Hot keys (common Chinese surnames in the linking block join; hot users in
event joins) overload single shuffle partitions. Two complementary tools:

- AQE skew-join splitting is ON session-wide (session.py) — the first line
  of defense, runtime and transparent.
- ``salted_join`` handles the case AQE cannot: a hot-key **aggregation or
  non-splittable join side** — the left (big, skewed) side gets a random
  salt in [0, n_salt), the right (small) side is replicated n_salt×, the
  join runs on (key, salt) so each hot key spreads over n_salt partitions.
  Results are identical to the unsalted join (verified by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted and the
    small side replicated ``n_salt``× — hot keys spread over n_salt shuffle
    partitions. Deterministic salt (hash of the full row is unnecessary —
    a uniform pseudo-random derived from a monotonically increasing id keeps
    the spread even regardless of key distribution).

    Only join types where the replicated small side cannot surface unmatched
    rows are allowed: right/full outer joins would return each unmatched
    small-side row ``n_salt`` times, breaking the identical-results contract.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r} "
            "(outer joins would replicate unmatched small-side rows)"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_big.join(replicated_small, on=[key, "_salt"], how=how)
    return out.drop("_salt")
