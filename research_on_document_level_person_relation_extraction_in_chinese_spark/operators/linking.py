"""Entity linking & canonicalization (SURVEY §7.1 T5 — our addition per the
north rule: blocking + pairwise similarity + connected components).

Person mentions (NER surface forms: canonical names, simplified-script
spellings, title-suffixed aliases) are normalized (title strip + s2t),
blocked, pairwise-matched within blocks via a self-join, and merged with an
iterative DataFrame connected-components loop (alternating large-star /
small-star with per-iteration localCheckpoint — GraphFrames-like, no
external dependency, O(log n) rounds on any graph shape).

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


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """(src > dst) direction, self-loops dropped, deduped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every node connects its strictly-larger neighbors to its
    minimum neighborhood label (Kiveris et al., "Connected Components in
    MapReduce and Beyond", op. large-star). Keeps the (src > dst) canon."""
    bidir = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = bidir.groupBy("src").agg(F.min("dst").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("src"))
    return (
        bidir.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), m.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: every node links all its smaller neighbors (and itself)
    to the minimum of them. Input/output in (src > dst) canon."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("_mn"))
    relink = (
        edges.join(mins, "src")
        .where(F.col("dst") != F.col("_mn"))
        .select(F.col("dst").alias("src"), F.col("_mn").alias("dst"))
    )
    self_link = mins.select("src", F.col("_mn").alias("dst"))
    return relink.union(self_link).where(F.col("src") != F.col("dst")).distinct()


def _edges_equal(a: DataFrame, b: DataFrame) -> bool:
    """Exact set equality of two (already deduped, localCheckpointed) edge
    frames — a probabilistic checksum could collide and declare convergence
    one round early, silently splitting an entity."""
    if a.count() != b.count():
        return False
    return a.exceptAll(b).limit(1).count() == 0


def connected_components(vertices: DataFrame, edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Alternating large-star/small-star connected components over string
    vertex ids → (id, component) where component = the component's minimum
    id (Kiveris et al. — O(log n) rounds even on long chains, vs the
    O(diameter) of plain min-label propagation).

    Iterative DataFrame joins with ``localCheckpoint`` per round to cut the
    growing lineage (SURVEY §4 custom item 2). Raises if the edge set has
    not reached a fixpoint within ``max_iter`` rounds — unconverged labels
    would silently split entities."""
    e = _canonical_edges(edges).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        prev_e = e
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        if _edges_equal(e, prev_e):
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star rounds"
        )
    # fixpoint edges form stars: src (child) → dst (component root)
    roots = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    return (
        vertices.select("id")
        .join(roots, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )


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
