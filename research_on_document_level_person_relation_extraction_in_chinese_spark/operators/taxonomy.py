"""Relation-taxonomy stage (SURVEY §2.7 M6 + §2.3 J2).

The reference collects the global distinct set of free-text relation words
(A1), has the LLM classify each into the 4-class taxonomy, memoizes the map
as JSON, and rewrites every triple's relation through it
(``CommonCrawl/data/train/postprecess.py:270-347,91-128``).

Scale shape: the distinct-relation set is tiny by construction (it is the
model's label vocabulary), so we (a) aggregate it with a distinct over the
exploded relation columns — the pipeline's only global barrier — and
(b) rewrite triples **map-side** with a map-literal ``transform`` expression:
no explode/groupBy round-trip, no shuffle, stays inside whole-stage codegen.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..scorers import get_scorer


def build_taxonomy(parsed: DataFrame, annotators=("gemini", "gpt"), scorer: str = "deterministic") -> dict[str, str]:
    """Global distinct relation words → {raw: class} map (driver-side dict;
    bounded small — the reference memoizes the identical structure)."""
    mod = get_scorer(scorer)
    cols = [f"{ann}_relations" for ann in annotators]
    distinct_rows = (
        parsed.select(F.explode(F.flatten(F.array(*[F.col(c) for c in cols]))).alias("raw"))
        .distinct()
        .collect()
    )
    raws = sorted(r["raw"] for r in distinct_rows)
    return mod.score_taxonomy(raws)


def remap_relations(parsed: DataFrame, taxonomy: dict[str, str], cols=("gemini_ternary", "gpt_ternary")) -> DataFrame:
    """Rewrite each ternary array's ``rel`` through the taxonomy map and
    re-dedup (two raw words in one class may collapse). Unknown words → 其他
    (the reference's fallback class)."""
    if taxonomy:
        map_lit = F.create_map(*[F.lit(x) for x in chain.from_iterable(taxonomy.items())])
    else:
        map_lit = F.create_map()
    df = parsed
    for col in cols:
        remapped = F.array_distinct(
            F.transform(
                F.col(col),
                lambda t: F.struct(
                    t["subj"].alias("subj"),
                    t["obj"].alias("obj"),
                    F.coalesce(map_lit[t["rel"]], F.lit("其他")).alias("rel"),
                ),
            )
        )
        df = df.withColumn(col, remapped)
    return df
