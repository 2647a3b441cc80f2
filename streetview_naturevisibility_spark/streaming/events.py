"""Structured Streaming over the events table.

The reference is a restartable batch pipeline (SURVEY.md §2.10) — its
streaming-adjacent semantics (incremental append + resume) live in
operators/resume.py. This module adds the engine's genuine streaming
surface for event tables:

- ``windowed_counts``: tumbling-window aggregation with a watermark for
  late data;
- ``stream_events_availablenow``: file-source stream over the events
  parquet with Trigger.AvailableNow — processes everything present,
  then stops; checkpointed, so re-runs are incremental (the streaming
  twin of the batch resume layer);
- ``page_scores_stream``: the per-point scoring stage as an incremental
  micro-batch pipeline (stateless UDF chain — identical results to the
  batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-type counts + sums with late-data watermark.
    Works on both batch and streaming frames."""
    # watermarks require TIMESTAMP (tz); session tz is pinned UTC so the
    # NTZ->TZ cast is deterministic
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    w = F.window(F.col("ts"), window)
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_dedup_events(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    key: str = "event_id",
    watermark: str = "2 hours",
) -> None:
    """Stateful streaming dedup: drop duplicate keys across micro-batches
    (state bounded by the event-time watermark). The streaming twin of
    the batch dedup-by-id (reference O4) for continuously-appended
    shards."""
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicates([key, "ts"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_within_watermark(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    key: str = "event_id",
    watermark: str = "2 hours",
) -> None:
    """Streaming dedup for RETRY-DELIVERED duplicates: the same key
    re-arriving with a slightly different event time (publisher retry,
    at-least-once sources). ``dropDuplicates([key, ts])`` misses those
    (the jittered ts makes the composite key unique);
    ``dropDuplicatesWithinWatermark`` keys on ``key`` alone and keeps
    state only within the watermark delay, so state stays bounded while
    catching any duplicate whose event times land within the delay of
    each other. First-seen row wins (arrival order within a
    micro-batch)."""
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark([key])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_content(
    spark: SparkSession,
    docs_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "24 hours",
) -> None:
    """Streaming EXACT content dedup: drop re-crawled byte-identical
    documents by content digest as shards arrive (the streaming twin of
    ``dedup.exact_dedup``). Without an event-time column the digest
    state is unbounded (correct but growing); pass ``ts_col`` to bound
    state with ``dropDuplicatesWithinWatermark`` — duplicates arriving
    within the watermark delay collapse, older re-crawls are treated as
    fresh (the standard trade)."""
    schema = spark.read.parquet(docs_path).schema
    stream = spark.readStream.schema(schema).parquet(docs_path).withColumn(
        "_digest", F.md5(F.col(text_col))
    )
    if ts_col is not None:
        stream = (
            stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_digest"])
        )
    else:
        stream = stream.dropDuplicates(["_digest"])
    q = (
        stream.drop("_digest")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_events_availablenow(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    schema: StructType | None = None,
    window: str = "1 hour",
) -> None:
    """Incremental windowed aggregation: read the events parquet as a
    file stream, aggregate, sink to parquet, stop when caught up.
    Re-running with the same checkpoint processes only new files."""
    if schema is None:
        schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = windowed_counts(stream, window=window)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
