#!/usr/bin/env python
"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Packages the engine for cluster submission and runs the full KG pipeline
with stage checkpoints + lineage under ``--out``:

    zip -r /tmp/engine.zip research_on_document_level_person_relation_extraction_in_chinese_spark
    spark-submit --py-files /tmp/engine.zip scripts/run_pipeline.py \
        --docs 4000 --out /tmp/kg_run --seed 42

On a real cluster, point ``--input`` at the web_pages Iceberg/parquet table
instead of generating a synthetic corpus.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="existing web_pages parquet/Iceberg path")
    ap.add_argument("--docs", type=int, default=2000, help="synthesize N docs if no --input")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True, help="stage-catalog root directory")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    # spark-submit supplies master/conf; fall back to local for direct runs
    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    from research_on_document_level_person_relation_extraction_in_chinese_spark.plans.pipeline import (
        run_pipeline,
    )
    from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.catalog import (
        StageCatalog,
    )
    from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.corpus import (
        generate_corpus,
    )

    docs = (
        spark.read.parquet(args.input)
        if args.input
        else generate_corpus(spark, args.docs, seed=args.seed)
    )
    catalog = StageCatalog(args.out)
    result = run_pipeline(spark, docs, catalog=catalog, resume=not args.no_resume)
    summary = {
        "n_triples": result["triples"].count(),
        "n_nodes": result["nodes"].count(),
        "n_edges": result["edges"].count(),
        "metrics": result["metrics"],
        "lineage": catalog.lineage("expanded"),
    }
    print(json.dumps(summary, ensure_ascii=False, indent=1))


if __name__ == "__main__":
    main()
