"""Count-Min sketch (Cormode & Muthukrishnan 2005) over token streams —
the bounded-state frequency sketch a 100-TB curation pass uses where exact
per-token counts would shuffle the whole vocabulary (stopword discovery,
boilerplate-token detection, hot-key pre-screens for salting decisions).

Scale shape: the sketch is ``d × width`` counters REGARDLESS of corpus
size — the only state that moves is bounded. Building it is one
partial-aggregated groupBy over a constant-factor-``d`` explode (map-side
combine caps every task's shuffle contribution at d×width rows); the
estimate join probes the tiny sketch table (AQE broadcasts it from its
runtime size). Estimates never undercount: est(t) = min_j sketch[j][h_j(t)]
≥ true(t), with the classic (ε, δ) bound width = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Deterministic and DuckDB-replayable by construction: the d row hashes are
the md5 scheme of ``dedup.shingle_hash`` over ``"<j>:<token>"``, so the
oracle rebuilds the identical sketch cell-for-cell.

Candidate generation at scale: a production heavy-hitter pass takes
per-partition local top-m tokens as candidates and CM-estimates them (no
global exact groupBy). The ``countmin_audit`` query here deliberately runs
the EXACT top-k beside the sketch to measure the overcount — it is the
correctness audit for the sketch path, not the scale path itself.

Reference anchor: the reference engine keeps no sketches (accuracy-only
research pipeline); this extends the curation suite the same way
``operators/dsir.py`` does, under the driver's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hash
from .dsir import WORD_SPLIT


def _tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per token occurrence (lowercased word tokens, with
    multiplicity — CM counts a stream, not a set)."""
    ws = F.filter(F.split(F.lower(F.col(text_col)), WORD_SPLIT), lambda w: w != "")
    return docs.select(F.explode(ws).alias("token"))


def _bucket(token: Column, j: int, width: int) -> Column:
    return shingle_hash(F.concat(F.lit(f"{j}:"), token)) % width


def countmin_sketch(
    tokens: DataFrame, d: int = 4, width: int = 256, token_col: str = "token"
) -> DataFrame:
    """Token stream → the ``(j, bucket, cnt)`` sketch table (≤ d×width rows,
    the bounded shuffle contract above)."""
    buckets = F.array(*[_bucket(F.col(token_col), j, width) for j in range(d)])
    return (
        tokens.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    d: int = 4,
    width: int = 256,
    token_col: str = "token",
) -> DataFrame:
    """Per-candidate CM point estimate: min over the d probed cells.
    ``d``/``width`` must match the sketch build — the probe recomputes the
    same md5 buckets."""
    buckets = F.array(*[_bucket(F.col(token_col), j, width) for j in range(d)])
    probes = candidates.select(
        token_col, F.posexplode(buckets).alias("j", "bucket")
    )
    return (
        probes.join(sketch, on=["j", "bucket"])
        .groupBy(token_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def countmin_audit(
    docs: DataFrame,
    d: int = 4,
    width: int = 256,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Exact top-``k`` tokens (ties to the lexicographically smaller token)
    with their CM estimates and the collision overcount — the value gate for
    the sketch (``overcount ≥ 0`` always; small width forces visible
    collisions so the audit is non-trivial)."""
    toks = _tokens(docs, text_col)
    sketch = countmin_sketch(toks, d, width)
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("token"))
        .limit(k)
    )
    est = countmin_estimate(top.select("token"), sketch, d, width)
    return top.join(est, on="token").select(
        "token",
        "exact_count",
        "est_count",
        (F.col("est_count") - F.col("exact_count")).alias("overcount"),
    )
