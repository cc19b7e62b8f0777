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


def evaluate_re_micro(pairs: DataFrame, pred_col: str, actual_col: str) -> dict:
    """Micro-averaged RE classification score over single-label pair rows
    (reference ``evalute.py:200-218`` ``evalute_re`` — sklearn micro
    precision/recall/F1 on two label columns; for single-label data micro
    P = R = F1 = accuracy). One aggregation, no driver-side data."""
    row = pairs.agg(
        F.count("*").alias("n"),
        F.sum((F.col(pred_col) == F.col(actual_col)).cast("int")).alias("n_correct"),
    ).collect()[0]
    n, correct = int(row["n"]), int(row["n_correct"] or 0)
    acc = correct / n if n else 0.0
    return {"n": n, "n_correct": correct, "precision": acc, "recall": acc, "f1": acc}


def kfold_prf(pred: DataFrame, gold: DataFrame, k: int = 5, keys: list[str] | None = None) -> dict:
    """A5 — k-fold mean ± SEM of exact-match P/R/F1 (reference
    ``evalute.py:230-234,257-280``; folds built like ``t5_finetune_fold.py``
    but assigned by url-hash so the split is deterministic under any
    partitioning). SEM uses sample std (ddof=1) like ``scipy.stats.sem``."""
    import math

    keys = keys or TRIPLE_KEYS
    fold_col = F.pmod(F.xxhash64("url"), F.lit(k))
    per_fold = []
    for i in range(k):
        res = exact_match_prf(
            pred.where(fold_col == i), gold.where(fold_col == i), keys
        )
        per_fold.append(res)

    def mean_sem(metric: str) -> dict:
        vals = [f[metric] for f in per_fold]
        mean = sum(vals) / k
        var = sum((v - mean) ** 2 for v in vals) / (k - 1)
        return {"mean": mean, "sem": math.sqrt(var / k)}

    return {
        "folds": per_fold,
        "precision": mean_sem("precision"),
        "recall": mean_sem("recall"),
        "f1": mean_sem("f1"),
    }
