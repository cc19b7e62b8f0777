"""Join-based exact-match evaluation (SURVEY §2.4 A4).

The reference accumulates TP/FN/FP with per-doc nested loops over canonical
triples (``evalute.py:10-68`` ternary, ``:70-134`` pair, ``:136-164`` entity)
and derives micro P/R/F1 (``:166-185``). Exploded + deduped, those loops are
exactly one full-outer join on the canonical key and three conditional
counts — a single shuffle, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEYS = ["url", "subj", "obj", "rel"]
PAIR_KEYS = ["url", "subj", "obj"]
ENTITY_KEYS = ["url", "entity"]


def exact_match_prf(pred: DataFrame, gold: DataFrame, keys: list[str]) -> dict:
    """Micro P/R/F1 of distinct ``keys`` tuples (set semantics per doc, like
    the reference's per-doc set matching)."""
    p = pred.select(keys).distinct().withColumn("_p", F.lit(1))
    g = gold.select(keys).distinct().withColumn("_g", F.lit(1))
    agg = (
        p.join(g, on=keys, how="full_outer")
        .agg(
            F.count(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1)).alias("tp"),
            F.count(F.when(F.col("_p").isNotNull() & F.col("_g").isNull(), 1)).alias("fp"),
            F.count(F.when(F.col("_p").isNull() & F.col("_g").isNotNull(), 1)).alias("fn"),
        )
        .collect()[0]
    )
    tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def evaluate_triples(pred: DataFrame, gold: DataFrame) -> dict:
    """Ternary exact match (reference ``evalute_ternary``)."""
    return exact_match_prf(pred, gold, TRIPLE_KEYS)


def evaluate_pairs(pred: DataFrame, gold: DataFrame) -> dict:
    """Person-pair match ignoring the relation (reference ``evalute_ner_pair``)."""
    return exact_match_prf(pred, gold, PAIR_KEYS)


def evaluate_entities(pred: DataFrame, gold: DataFrame) -> dict:
    """Entity match (reference ``evalute_entity``); inputs exploded to
    (url, entity)."""
    return exact_match_prf(pred, gold, ENTITY_KEYS)


def triples_to_entities(triples: DataFrame) -> DataFrame:
    return (
        triples.select("url", F.explode(F.array("subj", "obj")).alias("entity"))
        .distinct()
    )
