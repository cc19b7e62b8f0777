"""Entity linking & canonicalization (SURVEY §7.1 T5 — our addition per the
north rule: blocking + pairwise similarity + connected components).

Person mentions (NER surface forms: canonical names, simplified-script
spellings, title-suffixed aliases) are normalized (title strip + s2t),
blocked, pairwise-matched within blocks via a self-join, and merged with an
iterative DataFrame connected-components loop (small-star/large-star style
min-label propagation with per-iteration localCheckpoint — GraphFrames-like,
no external dependency).

Scale notes: blocks are keyed on (surname, name length, 2nd char) — the extra
character *refines* hot-surname blocks (陳/林/王 skew) without losing recall
because our similarity requires equal normalized names, which share every
refined key. For fuzzier similarity, drop the refinement and rely on
``spark.sql.adaptive.skewJoin`` + key salting (union of salted off-diagonal
blocks); the block self-join below is written so the block key is pluggable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..scorers.rules import TITLES

_TITLE_PATTERN = "(" + "|".join(TITLES) + ")$"


def normalize_mention(col):
    """Strip trailing title suffixes (博士/教授/先生/老師); input is already
    Traditional (expansion stage runs NER over trad text)."""
    return F.regexp_replace(col, _TITLE_PATTERN, "")


def mention_table(expanded: DataFrame) -> DataFrame:
    """(mention, norm, n_docs) from the NER entity arrays."""
    return (
        expanded.select("url", F.explode("ckip_entity").alias("mention"))
        .groupBy("mention")
        .agg(F.countDistinct("url").alias("n_docs"))
        .withColumn("norm", normalize_mention(F.col("mention")))
    )


def mention_edges(mentions: DataFrame, refine_blocks: bool = True) -> DataFrame:
    """Blocked self-join producing similarity edges (src, dst) between
    distinct surface mentions that normalize to the same person."""
    block = F.concat_ws(
        "|",
        F.substring("norm", 1, 1),
        F.length("norm").cast("string"),
        *([F.substring("norm", 2, 1)] if refine_blocks else []),
    )
    m = mentions.select("mention", "norm").withColumn("block", block)
    a = m.alias("a")
    b = m.alias("b")
    return (
        a.join(b, on="block")
        .where(F.col("a.mention") < F.col("b.mention"))
        .where(F.col("a.norm") == F.col("b.norm"))  # pairwise similarity rule
        .select(F.col("a.mention").alias("src"), F.col("b.mention").alias("dst"))
    )


def connected_components(vertices: DataFrame, edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """Min-label propagation over string vertex ids → (id, component).

    Iterative DataFrame joins with ``localCheckpoint`` per round to cut the
    growing lineage (SURVEY §4 custom item 2). Converges in O(diameter)
    rounds; alias graphs are near-stars so 2–3 rounds in practice.
    """
    labels = vertices.select(F.col("id"), F.col("id").alias("component"))
    bidir = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    bidir = bidir.localCheckpoint(eager=False)
    for _ in range(max_iter):
        neighbor_min = (
            bidir.join(labels, on=[bidir.dst == labels.id])
            .select(F.col("src").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def link_entities(expanded: DataFrame) -> DataFrame:
    """→ (mention, norm, n_docs, component) — the alias-resolution table."""
    mentions = mention_table(expanded)
    edges = mention_edges(mentions)
    comps = connected_components(
        mentions.select(F.col("mention").alias("id")), edges
    )
    return mentions.join(
        comps.withColumnRenamed("id", "mention"), on="mention", how="left"
    ).withColumn("component", F.coalesce("component", "mention"))
