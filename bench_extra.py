"""Extra benchmarks for the optimization round (guide §1.4: noop-sink
isolation). NOT part of the driver contract — bench.py stays frozen.

Modes:
  python bench_extra.py queries <name> [<name> ...]   # best-of-N noop timing
  python bench_extra.py kg [n_docs]                   # stage-isolated KG pipeline
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import _noop_run, _warmup  # noqa: E402
from research_on_document_level_person_relation_extraction_in_chinese_spark import (  # noqa: E402
    get_spark,
)


def _timed(label: str, fn, repeats: int) -> dict:
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    return {"label": label, "best": min(samples), "samples": samples}


def run_queries(spark, sf_dir: str, names: list[str], repeats: int) -> None:
    qs = entry_mod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        r = _timed(name, lambda: _noop_run(qs[name](spark, sf_dir)), repeats)
        print(json.dumps(r), flush=True)
        time.sleep(1)


def run_kg(spark, n_docs: int, repeats: int) -> None:
    from pyspark.sql import functions as F

    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.expansion import (
        expansion_stage,
    )
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.fused import (
        annotate_parse_stage,
        fused_consensus_stage,
    )
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.taxonomy import (
        build_taxonomy,
        remap_relations,
    )
    from research_on_document_level_person_relation_extraction_in_chinese_spark.plans.pipeline import (
        extract_triples,
        triples_from_expanded,
    )
    from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.corpus import (
        generate_corpus,
    )

    corpus = generate_corpus(spark, n_docs, seed=42).localCheckpoint()
    corpus.count()
    zh = corpus.filter(F.col("lang") == "zh").select("url", "text")

    def stage_annotate():
        _noop_run(annotate_parse_stage(zh))

    def stage_full_uncached():
        extract_triples(corpus, cache=False).count()

    def stage_full_cached():
        extract_triples(corpus, cache=True).count()

    for label, fn in (
        ("annotate_parse_noop", stage_annotate),
        ("extract_triples_cached", stage_full_cached),
        ("extract_triples_uncached", stage_full_uncached),
    ):
        spark.sparkContext.setJobDescription(f"bench_extra:kg:{label}")
        print(json.dumps(_timed(label, fn, repeats)), flush=True)
        time.sleep(1)

    # finer split under cache=True: taxonomy barrier job vs main chain
    parsed = annotate_parse_stage(zh).persist()
    t0 = time.perf_counter()
    taxonomy = build_taxonomy(parsed)
    t_tax = time.perf_counter() - t0  # triggers the annotate scan + distinct
    remapped = remap_relations(parsed, taxonomy)
    cons = fused_consensus_stage(remapped)
    cons_docs = cons.filter(F.size("consensus_label") > 0)

    t0 = time.perf_counter()
    _noop_run(cons_docs)
    t_cons = time.perf_counter() - t0

    expanded = expansion_stage(cons_docs)
    t0 = time.perf_counter()
    _noop_run(expanded)
    t_exp = time.perf_counter() - t0

    t0 = time.perf_counter()
    triples_from_expanded(expanded).count()
    t_tri = time.perf_counter() - t0
    parsed.unpersist()
    print(
        json.dumps(
            {
                "taxonomy_barrier_incl_annotate_scan": round(t_tax, 3),
                "consensus_from_cached": round(t_cons, 3),
                "expansion_from_cached_incl_consensus": round(t_exp, 3),
                "triples_distinct_incl_chain": round(t_tri, 3),
            }
        ),
        flush=True,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, cpus)
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "kg":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        run_kg(spark, n_docs, repeats)
    else:
        run_queries(spark, sf_dir, sys.argv[2:], repeats)


if __name__ == "__main__":
    main()
