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

    The mention→person map is small relative to the corpus (bounded by the
    distinct-person count), so both resolution joins are broadcast — no
    shuffle of the triple table.
    """
    canon = linked.groupBy("component").agg(F.min("norm").alias("canonical_name"))
    resolve = (
        linked.select("mention", "component")
        .join(canon, on="component")
        .withColumn("person_id", F.xxhash64("canonical_name"))
        .select("mention", "person_id")
    )
    rb = F.broadcast(resolve)
    resolved = (
        triples.join(rb.withColumnRenamed("mention", "subj"), on="subj", how="left")
        .withColumnRenamed("person_id", "subj_id")
        .join(rb.withColumnRenamed("mention", "obj"), on="obj", how="left")
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
