"""End-to-end KG-construction pipeline (SURVEY §3 entry-point B shape).

docs(url, warc_ts, html, text, lang)
  → zh filter → annotate (2 scorers, one pass) → parse → taxonomy barrier →
    remap → consensus (+verify) → expansion (NER + pair classify) → merge →
    triples → entity linking → graph nodes/edges.

Everything up to entity linking is narrow (zero shuffles — one scan, chained
mapInPandas/UDF projections); the only wide operations in the whole plan are
the tiny taxonomy distinct, the linking self-join, and the final graph
groupBys. That is what makes the plan scale linearly with corpus size.

With a ``StageCatalog`` the annotated/consensus/expanded stage tables are
checkpointed with lineage manifests + counters and a re-run resumes from the
last complete stage (the reference's per-stage CSV rewrite, done right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.expansion import expansion_stage
from ..operators.fused import annotate_parse_stage, fused_consensus_stage
from ..operators.graph import build_edges, build_nodes
from ..operators.linking import link_entities
from ..operators.taxonomy import build_taxonomy, remap_relations
from ..sources.catalog import StageCatalog


#: bounded managed-persist pool: at most ONE expansion frame's annotate scan
#: is cached at a time — each expanded_frame(cache=True) call evicts the
#: previous call's block before persisting its own (round-2 verdict: a
#: long-lived driver looping extract_triples(cache=True) used to accumulate
#: storage blocks without bound).
_MANAGED_PERSISTS: list[DataFrame] = []


def _persist_managed(df: DataFrame) -> DataFrame:
    """Persist ``df`` after unpersisting any frame a previous
    ``expanded_frame(cache=True)`` call left cached. Callers that need two
    expansion frames alive simultaneously must pass ``cache=False`` and
    manage persistence themselves (the documented contract)."""
    while _MANAGED_PERSISTS:
        stale = _MANAGED_PERSISTS.pop()
        try:
            stale.unpersist()
        except Exception:
            pass  # session of the stale frame may already be stopped
    p = df.persist()
    _MANAGED_PERSISTS.append(p)
    return p


def expanded_frame(
    docs: DataFrame,
    scorer: str = "deterministic",
    cache: bool = True,
    ner_sources: tuple[str, ...] = ("ckip",),
    annotators: tuple[str, ...] = ("gemini", "gpt"),
    strict_verify_failure: bool = False,
) -> DataFrame:
    """zh docs → fully expanded document frame (annotate → parse → taxonomy →
    consensus → expansion → merge labels), uncheckpointed. ``ner_sources``
    selects the expansion NER variants (ckip / gemini / union golden column
    families — reference README.md cols 20–31). ``annotators`` selects the
    detection models (k-annotator consensus; must include gemini + gpt —
    the expansion stage's already-labeled anti-join reads their trad
    columns, reference ``ckip_expansion.py:71-76``). ``strict_verify_failure``
    switches consensus to the test-corpus whole-doc-zeroing semantics."""
    if not {"gemini", "gpt"} <= set(annotators):
        raise ValueError("annotators must include 'gemini' and 'gpt'")
    zh = docs.filter(F.col("lang") == "zh").select("url", "text")
    parsed = annotate_parse_stage(zh, scorer=scorer, annotators=annotators)
    if cache:
        # parsed is consumed twice (taxonomy barrier + main chain); persisting
        # avoids re-running the scorer scan per job. The checkpointed
        # (StageCatalog) path is the 100-TB equivalent — a stage table on
        # disk instead of executor memory. Managed: the previous call's
        # cached frame is evicted (bounded storage across repeated calls).
        parsed = _persist_managed(parsed)
    taxonomy = build_taxonomy(parsed, annotators=annotators, scorer=scorer)  # global barrier (tiny)
    remapped = remap_relations(
        parsed, taxonomy, cols=tuple(f"{ann}_ternary" for ann in annotators)
    )
    # r6: docs where EVERY annotator's ternary is empty/null provably yield
    # an empty consensus_label (checked = correct+passed ⊆ mine = [] for all
    # annotators, in both verify-failure modes), and the chain filters those
    # out right after the consensus node — so drop them BEFORE the Arrow
    # crossing: the consensus UDF's input (and its text payload) shrinks to
    # the ~45% relation-bearing docs, value-identically (guide §4: pass the
    # Python boundary only the rows the function can affect).
    any_nonempty = None
    for ann in annotators:
        c = F.size(F.col(f"{ann}_ternary")) > 0
        any_nonempty = c if any_nonempty is None else (any_nonempty | c)
    cons = fused_consensus_stage(
        remapped.where(any_nonempty),
        scorer=scorer,
        annotators=annotators,
        strict_verify_failure=strict_verify_failure,
    )
    cons_docs = cons.filter(F.size("consensus_label") > 0)
    return expansion_stage(cons_docs, scorer=scorer, ner_sources=ner_sources)


def triples_from_expanded(expanded: DataFrame) -> DataFrame:
    """merge_label arrays → exploded (url, subj, obj, rel) triple table."""
    return (
        expanded.filter(F.size("merge_label") > 0)
        .select("url", F.explode("merge_label").alias("t"))
        .select("url", "t.subj", "t.obj", "t.rel")
        .distinct()
    )


def extract_triples(
    docs: DataFrame,
    scorer: str = "deterministic",
    cache: bool = True,
    annotators: tuple[str, ...] = ("gemini", "gpt"),
    strict_verify_failure: bool = False,
) -> DataFrame:
    """Flagship query: all person-relation triples in the corpus.
    ``cache=False`` for callers that loop (streaming foreachBatch) — avoids
    accumulating persisted blocks across invocations."""
    return triples_from_expanded(
        expanded_frame(
            docs,
            scorer,
            cache=cache,
            annotators=annotators,
            strict_verify_failure=strict_verify_failure,
        )
    )


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    catalog: StageCatalog | None = None,
    scorer: str = "deterministic",
    resume: bool = True,
    with_metrics: bool = True,
    with_replay: bool = False,
) -> dict:
    """Full run incl. linking + graph; returns stage DataFrames + metrics.

    With ``catalog``: each listed stage is materialized once (parquet
    bucketed by url-hash + manifest with lineage/counters); a re-run with
    ``resume=True`` reads completed stages instead of recomputing.
    ``with_replay`` adds entry point C (per-pair RE replay) as a further
    checkpointable stage over the expanded frame.
    """
    metrics: dict = {}

    def checkpoint(name: str, df_fn, inputs: list[str], metric_fn=None) -> DataFrame:
        if catalog is None:
            return df_fn()
        if resume and catalog.has_stage(name):
            return catalog.read_stage(spark, name)
        df = df_fn()
        if with_metrics and metric_fn:
            # persist across metrics + write so the stage (incl. its scorer
            # scan) computes ONCE, not once per action
            df = df.persist()
            try:
                stage_metrics = metric_fn(df)
                metrics[name] = stage_metrics
                catalog.write_stage(df, name, inputs=inputs, metrics=stage_metrics)
            finally:
                df.unpersist()
        else:
            catalog.write_stage(df, name, inputs=inputs, metrics={})
        return catalog.read_stage(spark, name)

    zh = docs.filter(F.col("lang") == "zh").select("url", "text")

    def detect_metrics(df: DataFrame) -> dict:
        rows = (
            df.groupBy("gemini_has_relation", "gpt_has_relation").count().collect()
        )
        out: dict = {"n_docs": 0}
        for r in rows:
            out["n_docs"] += r["count"]
            out[f"gemini={r['gemini_has_relation']},gpt={r['gpt_has_relation']}"] = r["count"]
        # M1 retry loop: docs whose answer needed re-instruction retries
        retry = df.agg(
            *[
                F.sum((F.col(f"{ann}_attempts") > 1).cast("int")).alias(ann)
                for ann in ("gemini", "gpt")
            ]
        ).collect()[0]
        for ann in ("gemini", "gpt"):
            out[f"{ann}_retried_docs"] = int(retry[ann] or 0)
        return out

    parsed = checkpoint(
        "annotated",
        lambda: annotate_parse_stage(zh, scorer=scorer),
        ["web_pages"],
        detect_metrics,
    )
    taxonomy = build_taxonomy(parsed, scorer=scorer)
    metrics["taxonomy"] = {"n_distinct_relations": len(taxonomy)}
    remapped = remap_relations(parsed, taxonomy)

    def consensus_metrics(df: DataFrame) -> dict:
        row = df.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("consensus_label")).alias("n_consensus_triples"),
            F.sum(F.col("gemini_verify_error").cast("int")).alias("gemini_verify_errors"),
            F.sum(F.col("gpt_verify_error").cast("int")).alias("gpt_verify_errors"),
            F.sum(F.col("gemini_parse_error").cast("int")).alias("gemini_parse_errors"),
            F.sum(F.col("gpt_parse_error").cast("int")).alias("gpt_parse_errors"),
        ).collect()[0]
        return {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}

    cons = checkpoint(
        "consensus",
        lambda: fused_consensus_stage(remapped, scorer=scorer),
        ["annotated"],
        consensus_metrics,
    )
    cons_docs = cons.filter(F.size("consensus_label") > 0)

    def expansion_metrics(df: DataFrame) -> dict:
        rows = df.groupBy("density").count().collect()
        out = {f"density_{r['density']}": r["count"] for r in rows}
        agg = df.agg(
            F.sum(F.size("expansion_ternary")).alias("n_expansion_triples"),
            F.sum(F.col("expansion_failed").cast("int")).alias("expansion_failures"),
            F.sum(F.size("merge_label")).alias("n_merged_triples"),
        ).collect()[0]
        out.update({k: int(v or 0) for k, v in agg.asDict().items()})
        return out

    expanded = checkpoint(
        "expanded",
        lambda: expansion_stage(cons_docs, scorer=scorer),
        ["consensus"],
        expansion_metrics,
    )

    triples = triples_from_expanded(expanded)
    linked = link_entities(expanded)
    nodes = build_nodes(linked)
    edges = build_edges(triples, linked, nodes)
    if catalog is not None:
        catalog.write_stage(triples, "triples", inputs=["expanded"])
        catalog.write_stage(nodes, "nodes", inputs=["expanded"], bucket_col="person_id")
        catalog.write_stage(edges, "edges", inputs=["expanded"], bucket_col="subj_id")

    result = {
        "annotated": parsed,
        "consensus": cons,
        "expanded": expanded,
        "triples": triples,
        "linked": linked,
        "nodes": nodes,
        "edges": edges,
        "metrics": metrics,
    }

    if with_replay:
        from ..operators.re_replay import re_replay_stage, replay_triples

        def replay_metrics(df: DataFrame) -> dict:
            row = df.agg(
                F.count("*").alias("n_docs"),
                F.sum("mt5_pairs_scored").alias("n_pairs_scored"),
                F.sum("mt5_pairs_skipped").alias("n_pairs_skipped"),
                F.sum((F.col("mt5_has_relation") == "有").cast("int")).alias("n_positive_docs"),
            ).collect()[0]
            return {k: int(v or 0) for k, v in row.asDict().items()}

        replayed = checkpoint(
            "re_replay",
            lambda: re_replay_stage(expanded, scorer=scorer),
            ["expanded"],
            replay_metrics,
        )
        result["re_replay"] = replayed
        result["replay_triples"] = replay_triples(replayed, "mt5")

    return result
