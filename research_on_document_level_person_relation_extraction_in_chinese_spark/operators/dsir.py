"""DSIR-style data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score every
raw document by the log-likelihood ratio of a TARGET hashed-n-gram
distribution against the RAW distribution, then keep the high scorers — the
standard recipe for steering a 100-TB crawl toward a small high-quality
target corpus.

Scale shape — two bounded aggregates and a pure map, no joins:

1. features: lowercase word unigrams + bigrams hashed into ``n_buckets``
   buckets, built per row with codegen HOFs (split/filter/zip_with/
   transform) — no explode until the count step;
2. distributions: ONE partial-aggregated groupBy over the exploded buckets
   computing raw and target counts together — map-side combine caps the
   shuffle at ``n_buckets`` rows per map task, and the result table is
   keyspace-bounded (≤ ``n_buckets`` rows) regardless of corpus size;
3. weights: the add-1-smoothed log-ratio array lives on the driver
   (``n_buckets`` doubles — bounded, like the taxonomy map) and ships back
   as ONE SQL-text literal, so scoring is a shuffle-free projection: each
   doc folds its own feature buckets through ``element_at`` on the literal.

Selection here is a fixed threshold on the 6-dp-rounded score (kept iff
score > 0, i.e. the doc looks more target than raw); a production run would
threshold on a sampled score quantile — the same map-only shape.

The whole recurrence is DuckDB-replayable: the word split is a shared
regex, the bucket hash is the md5 scheme of ``dedup.shingle_hash``, the
driver computes the log-ratio weights with the same libm ``log`` the oracle's
``ln`` calls, and each doc's fold visits features in text order on both
engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hash

WORD_SPLIT = "[^a-z0-9]+"


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), WORD_SPLIT), lambda w: w != "")


def feature_buckets(text: Column, n_buckets: int = 512) -> Column:
    """Hashed unigram+bigram feature buckets of ``text`` (array<long>, with
    multiplicity — DSIR scores count repeats), in text order: unigrams first,
    then bigrams, so the scoring fold is order-identical across engines."""
    ws = _words(text)
    n = F.size(ws)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(ws, bigrams)
    return F.transform(grams, lambda g: shingle_hash(g) % n_buckets)


def dsir_scores(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc DSIR log-likelihood-ratio scores against the ``target``
    subset (a boolean Column over ``docs``), plus the keep verdict.

    Output: (id, n_feats, dsir_score, kept) — score = Σ_features
    log((tgt_b+1)/(tgt_total+B)) − log((raw_b+1)/(raw_total+B)), rounded to
    6 dp; kept = 1 iff the rounded score > 0."""
    from .persistpool import persist_scan
    from .spread import spread_scan

    # the feature pass below is ~200 md5 calls per doc; spread a
    # single-row-group scan so it parallelizes (operators/spread.py)
    docs = spread_scan(docs)
    fb = docs.select(
        F.col(id_col),
        feature_buckets(F.col(text_col), n_buckets).alias("fb"),
        target.cast("int").alias("_tgt"),
    )
    # the md5-heavy feature pass is consumed twice (distribution aggregate
    # collect + final scoring projection) — managed persist so the hash work
    # runs once, not once per consumer (guide §5; r6: 3.3 s → ~2 s)
    fb = persist_scan(fb)
    # one aggregate for BOTH distributions; ≤ n_buckets result rows
    cnt = (
        fb.select(F.explode("fb").alias("b"), "_tgt")
        .groupBy("b")
        .agg(F.count("*").alias("rc"), F.sum("_tgt").alias("tc"))
        .collect()
    )
    raw = {int(r["b"]): int(r["rc"]) for r in cnt}
    tgt = {int(r["b"]): int(r["tc"]) for r in cnt}
    raw_tot = float(sum(raw.values()))
    tgt_tot = float(sum(tgt.values()))
    weights = [
        math.log((tgt.get(b, 0) + 1.0) / (tgt_tot + n_buckets))
        - math.log((raw.get(b, 0) + 1.0) / (raw_tot + n_buckets))
        for b in range(n_buckets)
    ]
    # ONE SQL-text literal (single py4j call; repr round-trips each double)
    lr = F.expr("array(" + ",".join(f"{w!r}D" for w in weights) + ")")
    score = F.round(
        F.aggregate(
            F.transform(F.col("fb"), lambda b: F.element_at(lr, b.cast("int") + 1)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    return fb.select(
        F.col(id_col),
        F.size("fb").cast("long").alias("n_feats"),
        score.alias("dsir_score"),
    ).withColumn("kept", (F.col("dsir_score") > 0).cast("int"))
