"""BM25 full-text ranking (Robertson & Zaragoza 2009, the Lucene/
Elasticsearch scoring kernel) over the documents table — the retrieval
primitive a curation pipeline uses for query-anchored corpus slices
("give me the k docs most about X") and decontamination triage.

Scale shape — two scans, zero shuffles in the scoring path:

1. STATS scan: one partial-aggregated ``agg`` computes N, total token
   count, and each query term's document frequency (per-term ``tf > 0``
   flags summed map-side) — the result is |q|+2 numbers, collected like
   the taxonomy map;
2. SCORE scan: idf/avgdl ship back as plain Python floats folded into ONE
   map-only projection (per-term tf via ``size(filter(ws, …))`` — no
   explode, no groupBy), then the global top-k is ``orderBy().limit(k)``
   which Spark executes as TakeOrderedAndProject (per-partition heaps +
   driver merge of k rows, never a full sort shuffle).

At 100 TB nothing here is key-skewed: both scans are embarrassingly
parallel and the only data movement is k rows to the driver.

IDF is the Lucene variant ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
positive). Scores are summed in query-term order on both engines and
rounded to 6 dp — the DuckDB oracle replays the identical fold.

Reference anchor: the reference repo has no retrieval operator (its
corpus is pre-selected); this extends the curation suite under the
driver's training-data mandate, like ``operators/dsir.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dsir import WORD_SPLIT


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), WORD_SPLIT), lambda w: w != "")


def _tf(ws: Column, term: str) -> Column:
    return F.size(F.filter(ws, lambda w: w == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 against ``query_terms`` →
    ``(doc_id, n_terms_hit, bm25)``, ties broken by ``doc_id`` ascending.
    Documents matching no query term are excluded (score 0 by definition)."""
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")
    from .persistpool import persist_scan
    from .spread import spread_scan

    # tokenization is the CPU term; spread a single-row-group scan so the
    # persisted (dl, tf_i) frame builds in parallel (operators/spread.py)
    docs = spread_scan(docs)
    ws = _words(F.col(text_col))
    # ONE tokenization pass (r6): the per-doc (dl, tf_i) frame is computed
    # once and managed-persisted; the stats aggregate AND the scoring
    # projection both read it — the r5 shape split+filtered the text twice
    # (stats scan + score scan). df_i = Σ(tf_i > 0) is value-identical to
    # summing the per-doc flags.
    scored = persist_scan(
        docs.select(
            F.col(id_col),
            F.size(ws).alias("dl"),
            *[_tf(ws, t).cast("double").alias(f"tf{i}") for i, t in enumerate(query_terms)],
        )
    )
    stats_row = scored.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("tl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    ).first()
    n = int(stats_row["n"])
    if n == 0:
        raise ValueError("bm25_topk over an empty corpus")
    avgdl = float(stats_row["tl"]) / n
    idf = [
        math.log(1.0 + (n - int(stats_row[f"df{i}"]) + 0.5) / (int(stats_row[f"df{i}"]) + 0.5))
        for i in range(len(query_terms))
    ]
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    score = F.lit(0.0)
    hits = F.lit(0)
    for i in range(len(query_terms)):
        tf = F.col(f"tf{i}")
        score = score + F.lit(idf[i]) * tf * F.lit(k1 + 1.0) / (tf + norm)
        hits = hits + (tf > 0).cast("int")
    return (
        scored.select(
            F.col(id_col),
            hits.alias("n_terms_hit"),
            F.round(score, 6).alias("bm25"),
        )
        .where(F.col("n_terms_hit") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )
