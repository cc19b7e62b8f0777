"""Structured-Streaming windowed aggregation with late-data handling.

The reference is batch-only; this is the streaming face of the engine's
aggregation operators for continuously arriving event data: file-source
stream → event-time watermark → tumbling-window counts per key, exactly-once
into the sink. The same aggregation expressed in batch SQL is the test
oracle (``tests/test_multimodal_streaming.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window counts per event_type (works on both batch
    and streaming frames; the watermark bounds state for streams)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
):
    """Drain ``input_dir`` (parquet event files) through the watermarked
    windowed aggregation into a parquet sink, exactly-once."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    agg = windowed_event_counts(stream, window, watermark)
    query = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_dir)
        .start()
    )
    query.awaitTermination()
    return query
