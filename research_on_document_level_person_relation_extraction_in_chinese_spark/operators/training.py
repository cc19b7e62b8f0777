"""Training-data preparation operators (SURVEY §2.7 training ops, entry
point C): the pair-exploded RE table with negative sampling, the NER↔RE
regroup join, and the deterministic train/valid split.

Reference semantics:
- ``t5_finetune_re.py:71-126``: docs with non-empty ``merge_label_1024`` →
  labels = golden triples + ALL unlabeled CKIP pairs surviving in the
  trad doc[:1024] as class 沒有 → shuffled → exploded one row per pair with
  ``id = f"{doc}_{count+1}"``, ``ner_label=[p1,p2]``, ``re_label``.
- ``postprecess.py:302-317`` (``ner_re_merge``): pair-level predictions
  regrouped to document granularity by splitting the id — here a plain
  ``groupBy(url).agg(collect_list(...))`` (J4).
- ``CommonCrawl/data/train/postprecess.py:15-24`` (``split``): 90/10 split
  with a fixed seed — here a hash-mod split on url (deterministic under any
  partitioning, no global sample state; the reference's pandas
  ``sample(random_state=22)`` is machine-local and not reproducible in a
  distributed setting).
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.analysis import generate_pairs
from .parse import TERNARY_DT


def make_training_labels_udf(max_length: int = 1024, seed: int = 22):
    @pandas_udf(TERNARY_DT)
    def labels_udf(
        merge_1024: pd.Series, entities: pd.Series, trad_text: pd.Series, url: pd.Series
    ) -> pd.Series:
        out = []
        for labels, ents, doc, u in zip(merge_1024, entities, trad_text, url):
            labels = [
                (t["subj"], t["obj"], t["rel"])
                for t in (list(labels) if labels is not None else [])
            ]
            doc = (doc or "")[:max_length]
            already = {(s, o) for s, o, _ in labels}
            for pair in generate_pairs(list(ents) if ents is not None else []):
                if pair not in already and pair[0] in doc and pair[1] in doc:
                    labels.append((pair[0], pair[1], "沒有"))
            rng = random.Random(f"{seed}:{u}")
            rng.shuffle(labels)
            out.append([{"subj": s, "obj": o, "rel": r} for s, o, r in labels])
        return pd.Series(out)

    return labels_udf


def re_training_pairs(expanded: DataFrame, max_length: int = 1024, seed: int = 22) -> DataFrame:
    """Pair-exploded RE training table:
    (pair_id, url, subj, obj, re_label, text)."""
    udf = make_training_labels_udf(max_length, seed)
    labeled = (
        expanded.filter(F.size("merge_label_1024") > 0)
        .withColumn(
            "_labels",
            udf(F.col("merge_label_1024"), F.col("ckip_entity"), F.col("trad_text"), F.col("url")),
        )
    )
    return labeled.select(
        "url",
        F.substring("trad_text", 1, max_length).alias("text"),
        F.posexplode("_labels").alias("pos", "t"),
    ).select(
        F.concat_ws("_", F.col("url"), (F.col("pos") + 1).cast("string")).alias("pair_id"),
        "url",
        F.col("t.subj").alias("subj"),
        F.col("t.obj").alias("obj"),
        F.col("t.rel").alias("re_label"),
        "text",
    )


def ner_re_merge(pairs: DataFrame, pred_col: str = "re_label") -> DataFrame:
    """Regroup pair-level predictions to document granularity (J4):
    (url, ner_re_ternary array<struct<subj,obj,rel>>)."""
    return (
        pairs.groupBy("url")
        .agg(
            F.collect_list(
                F.struct(
                    F.least("subj", "obj").alias("subj"),
                    F.greatest("subj", "obj").alias("obj"),
                    F.col(pred_col).alias("rel"),
                )
            ).alias("ner_re_ternary")
        )
    )


def train_valid_split(df: DataFrame, valid_fraction: float = 0.1, key: str = "url"):
    """Deterministic split via hash-mod on the key (P7 analog)."""
    buckets = max(int(round(1 / valid_fraction)), 2)
    is_valid = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)) == 0
    return df.where(~is_valid), df.where(is_valid)
