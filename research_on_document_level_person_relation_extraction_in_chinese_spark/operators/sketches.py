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
from .spread import spread_scan as _spread_scan


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
    collisions so the audit is non-trivial).

    Plan shape (r6): ONE scan of the corpus into the vocab-bounded
    ``(token, cnt)`` word-count table (managed persist), from which the
    sketch (Σcnt per probed cell — identical values to summing the raw
    stream), the exact top-k, and the probe estimates all derive. The r5
    shape scanned + exploded the corpus twice (sketch build AND exact
    groupBy); a CM cell count is a sum over token multiplicities either way,
    so folding via the per-token counts is value-identical and moves d×
    less data through the sketch shuffle."""
    from .persistpool import persist_scan

    token_counts = persist_scan(
        _tokens(docs, text_col)
        .groupBy("token")
        .agg(F.count("*").alias("_cnt"))
    )
    buckets = F.array(*[_bucket(F.col("token"), j, width) for j in range(d)])
    sketch = (
        token_counts.select(F.posexplode(buckets).alias("j", "bucket"), "_cnt")
        .groupBy("j", "bucket")
        .agg(F.sum("_cnt").alias("cnt"))
    )
    top = (
        token_counts.select("token", F.col("_cnt").alias("exact_count"))
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


# --- HyperLogLog ----------------------------------------------------------

#: md5-derived hash width used by HLL (shingle_hash's 15 hex digits, unmodded)
_HLL_HASH_BITS = 60


def _hash60(key: Column) -> Column:
    """The raw 60-bit md5 integer (``shingle_hash`` WITHOUT the mod-P
    reduction — HLL needs the uniform bit field, not a residue)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hll_registers(keys: DataFrame, key_col: str = "key", p: int = 8) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) over a key stream →
    ``(bucket, rho)`` with ``rho`` the max first-one position — ≤ 2^p rows
    REGARDLESS of stream size (the cardinality counterpart of
    ``countmin_sketch``'s bounded-state contract; registers from shards
    merge by max, so the sketch is trivially distributive)."""
    m = 1 << p
    w_bits = _HLL_HASH_BITS - p
    h = _hash60(F.col(key_col))
    # top 60-p bits via shift — double division would lose bits above 2^53
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + 1
    )
    return (
        keys.select((h % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One-row cardinality estimate from the register table.

    The register sum Σ2^(−M_j) is computed in EXACT integer arithmetic
    (each term scaled by 2^(w_bits+1) is a power of two that fits a
    BIGINT, so the sum is order-independent — no floating-point
    summation-order noise between engines or between runs); the classic
    small-range correction (E ≤ 2.5 m with empty registers →
    m·ln(m/V)) uses the same libm ``ln`` both engines call."""
    m = 1 << p
    w_bits = _HLL_HASH_BITS - p
    k = w_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << k)
    agg = registers.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - rho)")).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    s_int = F.coalesce(F.col("s_present"), F.lit(0)) + (
        F.lit(m) - F.col("n_present")
    ) * F.lit(1 << k)
    v_zero = F.lit(m) - F.col("n_present")
    e_raw = F.lit(alpha * m * m) * F.lit(scale) / s_int.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        F.col("n_present").cast("long").alias("n_registers"),
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_distinct_audit(
    docs: DataFrame, n: int = 3, p: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word ``n``-gram cardinality: HLL estimate beside the exact
    count → one row ``(n_registers, hll_estimate, n_exact, rel_err_pct)``.
    The exact side is the audit (like ``countmin_audit``); the sketch side
    is the 100-TB path — per-shard registers merged by max, never a
    corpus-wide distinct shuffle.

    Plan shape (r6): ONE scan → gram distinct → ONE register aggregate that
    carries a per-bucket distinct count beside max(rho), so ``n_exact`` is
    Σcnt over the ≤2^p register rows — no second corpus scan and no separate
    count_distinct shuffle. Value-identical to the r5 shape: a register's
    max-rho over the multiset equals its max-rho over the distinct set
    (duplicate grams hash identically), and Σ per-bucket distinct counts IS
    the distinct cardinality. md5 work drops from every occurrence to every
    distinct gram."""
    from .curation import split_words, word_ngrams_from_words

    m = 1 << p
    w_bits = _HLL_HASH_BITS - p
    # n-gram array build + explode is the CPU term; a single-row-group scan
    # would run it on one task (measured 35 s at a 4× synthetic scale vs
    # ~1 s spread — operators/spread.py); the word array is hoisted to its
    # own projection (split once per doc, not once per gram position —
    # see word_ngrams_from_words)
    grams = (
        _spread_scan(docs)
        .select(split_words(F.col(text_col)).alias("_w"))
        .select(F.explode(word_ngrams_from_words(F.col("_w"), n)).alias("gram"))
        .distinct()
    )
    h = _hash60(F.col("gram"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + 1
    )
    registers = (
        grams.select((h % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"), F.count("*").alias("_dc"))
    )
    k = w_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << k)
    agg = registers.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - rho)")).alias("s_present"),
        F.count("*").alias("n_present"),
        F.sum("_dc").cast("long").alias("n_exact"),
    )
    s_int = F.coalesce(F.col("s_present"), F.lit(0)) + (
        F.lit(m) - F.col("n_present")
    ) * F.lit(1 << k)
    v_zero = F.lit(m) - F.col("n_present")
    e_raw = F.lit(alpha * m * m) * F.lit(scale) / s_int.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        F.col("n_present").cast("long").alias("n_registers"),
        F.round(est, 4).alias("hll_estimate"),
        "n_exact",
        F.round(
            (F.round(est, 4) - F.col("n_exact"))
            / F.col("n_exact").cast("double")
            * 100.0,
            2,
        ).alias("rel_err_pct"),
    )
