"""S3 — CCNet JSONL scan (reference ``CommonCrawl/gemini_api.py:19-26``,
``CommonCrawl/azure_gpt.py:37-44``: one JSON object per line with
``url`` / ``title`` / ``raw_content``).

An explicit schema skips Spark's sampling-based schema inference pass (one
full extra read of the data at 100 TB) and makes malformed lines surface as
a ``_corrupt_record`` column instead of silently widening types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..operators import textstats as T

CCNET_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("raw_content", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def read_ccnet_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """CCNet shard(s) → (url, title, raw_content); malformed lines dropped
    (the reference's line loop would raise — we count them out instead)."""
    df = spark.read.schema(CCNET_SCHEMA).option("mode", "PERMISSIVE").json(path)
    return df.where(
        F.col("_corrupt_record").isNull() & F.col("url").isNotNull()
    ).select("url", "title", "raw_content")


def ccnet_to_docs(df: DataFrame) -> DataFrame:
    """JSONL rows → the pipeline's document shape (url, text, lang); lang via
    the n-gram language-ID heuristic (S2 analog — CCNet shards are already
    language-split in production, so this is the fallback path)."""
    return df.select(
        "url",
        F.col("raw_content").alias("text"),
        T.lang_id(F.col("raw_content")).alias("lang"),
    )
