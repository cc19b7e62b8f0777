#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: ≥0.8 throughput scaling
efficiency from N to 4N parallelism, evidenced as local[N] vs local[4N]).

Methodology (documented in BENCH/BASELINE.md):
- Input prep (synthetic corpus → parquet) happens once and is not measured —
  matching the 100-TB reality of reading an existing Iceberg table.
- Two measured jobs: the KG triple-extraction pipeline (Python-scorer-heavy)
  and the MinHash-LSH dedup query (JVM/codegen-heavy) over a synthetic
  open-vocabulary near-dup table big enough that shuffle/compute dominates
  planning (round-2 verdict: the 5k-doc sf0.1 fixture left the LSH job
  planning-bound, so its efficiency measured Amdahl on fixed overhead).
- The sandbox shares CPUs with other tenants (load average 2–8 from outside
  this session), so runs at the two levels are INTERLEAVED (N, 4N, N, 4N, …)
  and best-of-R is reported per level, which bounds the influence of load
  spikes on either side.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from research_on_document_level_person_relation_extraction_in_chinese_spark import (  # noqa: E402
    get_spark,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.plans.pipeline import (  # noqa: E402
    extract_triples,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    generate_open_vocab_docs,
)
from bench import _warmup  # noqa: E402


def prepare_corpus(n_docs: int, out_dir: str, partitions: int, lsh_docs: int, lsh_dir: str) -> None:
    spark = get_spark("scale-prep")
    spark.sparkContext.setLogLevel("ERROR")
    generate_corpus(spark, n_docs, seed=42, partitions=partitions).write.mode(
        "overwrite"
    ).parquet(out_dir)
    generate_open_vocab_docs(spark, lsh_docs, partitions=partitions).write.mode(
        "overwrite"
    ).parquet(lsh_dir)
    spark.stop()


def run_once(cores: int, corpus_dir: str, lsh_dir: str) -> dict:
    spark = get_spark(f"scale{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, cores)

    docs = spark.read.parquet(corpus_dir)
    n_docs = docs.count()
    t0 = time.perf_counter()
    n_triples = extract_triples(docs).count()
    kg_sec = time.perf_counter() - t0
    spark.catalog.clearCache()

    # the synthetic open-vocab table is written with many splits (prepare
    # step), so the shingle/minhash compute parallelizes like a real corpus;
    # verify='inverted' pins the documented 100-TB contract
    dd = spark.read.parquet(lsh_dir)
    t0 = time.perf_counter()
    n_pairs = minhash_lsh_pairs(
        dd, n=3, k=8, bands=None, threshold=0.8, verify="inverted"
    ).count()
    lsh_sec = time.perf_counter() - t0
    spark.stop()
    return {
        "kg_sec": round(kg_sec, 2),
        "kg_docs_per_sec": round(n_docs / kg_sec, 1),
        "kg_triples_per_sec": round(n_triples / kg_sec, 1),
        "lsh_sec": round(lsh_sec, 2),
        "lsh_pairs": n_pairs,
    }


def _burn_chunk(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def burn(procs: int, total_iters: int = 120_000_000) -> float:
    """Host-ceiling probe: fixed TOTAL pure-CPU work split over ``procs``
    Python processes. The 1-vs-4-proc time ratio is the best parallel
    efficiency this host can physically deliver AT THAT MOMENT (tenant load
    included) — the normalizer for the Spark numbers."""
    import multiprocessing as mp

    chunk = total_iters // procs
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        pool.map(_burn_chunk, [chunk] * procs)
    return time.perf_counter() - t0


def main() -> None:
    n_docs = int(os.environ.get("SCALING_DOCS", "200000"))
    lsh_docs = int(os.environ.get("SCALING_LSH_DOCS", "60000"))
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    lo_cores = int(os.environ.get("SCALING_N", "2"))
    hi_cores = int(os.environ.get("SCALING_4N", "8"))
    ratio = hi_cores / lo_cores

    tmp = tempfile.mkdtemp(prefix="scaling_corpus_")
    lsh_tmp = tempfile.mkdtemp(prefix="scaling_lsh_")
    try:
        prepare_corpus(n_docs, tmp, max(hi_cores * 4, 32), lsh_docs, lsh_tmp)
        lo_runs, hi_runs, burns = [], [], []
        for _ in range(repeats):  # interleaved A/B with adjacent ceiling probes
            b_lo = burn(lo_cores)
            lo_runs.append(run_once(lo_cores, tmp, lsh_tmp))
            b_hi = burn(hi_cores)
            hi_runs.append(run_once(hi_cores, tmp, lsh_tmp))
            burns.append(
                {
                    "n_sec": round(b_lo, 2),
                    "4n_sec": round(b_hi, 2),
                    "ceiling_eff": round((b_lo / b_hi) / ratio, 3),
                }
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(lsh_tmp, ignore_errors=True)

    def best(runs, key):
        return min(r[key] for r in runs)

    result = {
        "n_docs": n_docs,
        "lsh_docs": lsh_docs,
        "n_cores": lo_cores,
        "4n_cores": hi_cores,
    }
    result["host_ceiling"] = {
        "per_repeat": burns,
        "best_eff": max(b["ceiling_eff"] for b in burns),
    }
    for job, key in (("kg", "kg_sec"), ("lsh", "lsh_sec")):
        lo_best, hi_best = best(lo_runs, key), best(hi_runs, key)
        speedup = lo_best / hi_best
        eff = speedup / ratio
        # per-repeat normalization: Spark efficiency ÷ the host efficiency
        # measured adjacent to the SAME pair of runs
        per_repeat = [
            {
                "spark_eff": round((lo[key] / hi[key]) / ratio, 3),
                "of_ceiling": round(
                    ((lo[key] / hi[key]) / ratio) / b["ceiling_eff"], 3
                ),
            }
            for lo, hi, b in zip(lo_runs, hi_runs, burns)
        ]
        result[job] = {
            "n_best_sec": lo_best,
            "4n_best_sec": hi_best,
            "n_runs": [r[key] for r in lo_runs],
            "4n_runs": [r[key] for r in hi_runs],
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(eff, 3),
            "per_repeat": per_repeat,
            "best_of_ceiling": max(p["of_ceiling"] for p in per_repeat),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
