"""Streaming exact dedup for continuously arriving documents.

The reference is batch-only (its corpus was deduped offline by CCNet before
extraction ran — SURVEY §1.3); this is the streaming face of that step for
a crawl that arrives continuously: md5 content digest →
``dropDuplicatesWithinWatermark`` keyed on the digest, so two copies of the
same text arriving within the watermark horizon emit once.

Scale shape: state is ONE row per distinct digest seen inside the horizon
and Spark evicts it as event time passes ``digest_ts + delay`` — bounded by
arrival rate × horizon, not by corpus size (a plain streaming
``dropDuplicates(["digest"])`` would pin every digest ever seen in state
forever and OOM a 100-TB ingest). Duplicates farther apart than the horizon
are the batch layer's job (``operators/dedup.py`` exact/near-dup passes run
on the accumulated corpus) — the same lambda split real crawl pipelines
use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_STREAM_SCHEMA = "doc_id long, ts timestamp, text string, source string"


def dedup_docs(docs: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Digest-keyed exact dedup. Streaming: first arrival per digest within
    the watermark horizon wins (state auto-evicted). Batch: the equivalent
    min-``(ts, doc_id)`` first occurrence per digest — the test oracle."""
    keyed = docs.withColumn("digest", F.md5(F.col("text")))
    if docs.isStreaming:
        return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["digest"]
        )
    firsts = keyed.groupBy("digest").agg(
        F.min(F.struct("ts", "doc_id")).alias("f")
    )
    return (
        keyed.join(firsts, "digest")
        .where((F.col("f.ts") == F.col("ts")) & (F.col("f.doc_id") == F.col("doc_id")))
        .drop("f")
    )


def stream_dedup_docs(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
) -> None:
    """Drain ``input_dir`` (parquet doc files) through the streaming dedup
    into a parquet sink, exactly-once (checkpointed file-source offsets, one
    file per micro-batch so arrival order is deterministic in tests)."""
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    out = dedup_docs(stream, watermark)
    (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_dir)
        .start()
        .awaitTermination()
    )
