"""Graph materialization (SURVEY §7.1 T6): Iceberg-style node/edge tables.

``nodes(person_id, canonical_name, aliases, n_docs)`` and
``edges(subj_id, obj_id, rel, n_docs, example_urls)`` — the knowledge graph
the whole pipeline exists to produce. Person ids are deterministic
(xxhash64 of the canonical name) so re-runs and resumes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_nodes(linked: DataFrame) -> DataFrame:
    """linked = (mention, norm, n_docs, component) → person nodes."""
    return (
        linked.groupBy("component")
        .agg(
            F.min("norm").alias("canonical_name"),
            F.sort_array(F.collect_set("mention")).alias("aliases"),
            F.sum("n_docs").alias("n_mention_docs"),
        )
        .withColumn("person_id", F.xxhash64("canonical_name"))
        .select(
            "person_id",
            "canonical_name",
            "aliases",
            F.col("n_mention_docs").alias("n_docs"),
        )
    )


def build_edges(triples: DataFrame, linked: DataFrame, nodes: DataFrame) -> DataFrame:
    """triples(url, subj, obj, rel) + alias table → id-keyed relation edges.

    Scale shape: the mention→person resolve table is NOT broadcast-hinted —
    at web scale (10^12 docs) the distinct-mention table is itself huge
    (10^8–10^9 Chinese name surface forms), and an explicit ``F.broadcast``
    would bypass the AQE size threshold ``session.py`` relies on and OOM
    executors. Both resolution joins are plain equi-joins on the mention
    key: AQE promotes them to broadcast at runtime ONLY when the resolve
    side is measured small (the common sub-web-scale case), and falls back
    to a shuffled join otherwise. ``test_plans_explain`` asserts the plan
    carries no mandatory broadcast hint.
    """
    canon = linked.groupBy("component").agg(F.min("norm").alias("canonical_name"))
    resolve = (
        linked.select("mention", "component")
        .join(canon, on="component")
        .withColumn("person_id", F.xxhash64("canonical_name"))
        .select("mention", "person_id")
    )
    resolved = (
        triples.join(resolve.withColumnRenamed("mention", "subj"), on="subj", how="left")
        .withColumnRenamed("person_id", "subj_id")
        .join(resolve.withColumnRenamed("mention", "obj"), on="obj", how="left")
        .withColumnRenamed("person_id", "obj_id")
        .withColumn("subj_id", F.coalesce("subj_id", F.xxhash64("subj")))
        .withColumn("obj_id", F.coalesce("obj_id", F.xxhash64("obj")))
    )
    return (
        resolved.groupBy("subj_id", "obj_id", "rel")
        .agg(
            F.countDistinct("url").alias("n_docs"),
            F.slice(F.sort_array(F.collect_set("url")), 1, 3).alias("example_urls"),
        )
    )


def check_graph_consistency(nodes: DataFrame, edges: DataFrame) -> dict:
    """Edge endpoints ⊆ nodes (plus orphan count for triples whose persons
    never appeared as NER mentions)."""
    ids = nodes.select(F.col("person_id").alias("pid"))
    endpoints = (
        edges.select(F.col("subj_id").alias("pid"))
        .union(edges.select(F.col("obj_id").alias("pid")))
        .distinct()
    )
    dangling = endpoints.join(ids, on="pid", how="left_anti").count()
    return {"n_nodes": nodes.count(), "n_edges": edges.count(), "dangling_endpoints": dangling}


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-7,
    check_every: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Distributed PageRank over the person graph → (id, rank), sum(rank)=1.

    Downstream KG analytics ("most central persons"): classic power iteration
    with dangling-mass redistribution, expressed as DataFrame joins like the
    connected-components loop in ``operators/linking.py`` (GraphFrames-style,
    no external dependency).

    Scale shape: per iteration ONE shuffle join (contributions grouped on
    ``dst``) against a rank table bounded by the vertex count; ``outdeg`` and
    the static dangling-vertex set are computed once; ``localCheckpoint``
    truncates lineage so 20 iterations don't stack 20 plans; convergence is
    polled every ``check_every`` rounds (each poll is an extra action — at
    10^9 vertices you raise ``check_every`` rather than pay it per round).
    The per-iteration dangling-mass aggregate ships one double to the driver.
    With ``weight``, contributions are weight-proportional (e.g. ``n_docs``
    co-occurrence counts from ``build_edges``).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    v = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = v.count()
    if n == 0:
        return v.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.sum("w").alias("deg")).localCheckpoint()
    dangling_v = v.join(outdeg, v.id == outdeg.src, "left_anti").localCheckpoint()

    ranks = v.withColumn("rank", F.lit(1.0 / n))
    for i in range(max_iter):
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") * F.col("w") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        d_mass = (
            dangling_v.join(ranks.select("id", "rank"), "id")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        new = (
            v.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(d_mass / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            delta = (
                new.join(ranks.select("id", F.col("rank").alias("old")), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                .first()[0]
            )
            ranks = new
            if delta is not None and delta < tol:
                break
        else:
            ranks = new
    return ranks
