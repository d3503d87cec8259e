"""Structured Streaming variants of the crawl dataflow (SURVEY §2.7).

The reference is a continuous stateful loop (worker threads popping a Redis
queue until a 30 s idle timeout). The batch wave loop in plans/crawler.py is
the deterministic-ordering re-expression; this module provides the streaming
re-expression for deployments that want continuous draining instead of
discrete waves:

  * ``frontier_stream`` — ``readStream`` over the frontier table's parquet
    log: new snapshot files are discovered as micro-batches (the Redis LPUSH
    analog), throttled by ``maxFilesPerTrigger``.
  * ``drain_frontier`` — foreachBatch processor applying the same politeness
    rank + dedup kernels per micro-batch; ``availableNow`` trigger gives the
    "run until queue empty then stop" session semantics (queue_timeout
    analog, lib/polipus.rb:46-48) with exactly-once sink checkpointing.
  * ``streaming_metrics`` — the S10 counters as a windowed streaming agg
    with a watermark (late fetch results tolerated up to the watermark).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polipus_spark.catalog import SnapshotTable


def frontier_stream(
    spark: SparkSession,
    frontier: SnapshotTable,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming view of the frontier log (new snapshot files = new URLs)."""
    schema = frontier.read().schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{frontier.path}/snap-*")
    )


def drain_frontier(
    spark: SparkSession,
    frontier: SnapshotTable,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drain pending frontier rows continuously; each micro-batch runs the
    caller's kernel (politeness pop + fetch join + ...). availableNow ⇒
    process everything committed so far, then stop (session semantics)."""
    stream = frontier_stream(spark, frontier)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


def streaming_metrics(events: DataFrame, window: str = "5 minutes",
                      watermark: str = "10 minutes") -> DataFrame:
    """S10/A3 as a streaming windowed aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


def ingest_documents_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming ingest of a documents directory: new parquet files are
    discovered as micro-batches — the continuous-crawl → curation handoff."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def streaming_dedup_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Incremental exact dedup on ingest: ``dropDuplicates`` on md5(text)
    keeps one doc per content hash ACROSS micro-batches (state store holds
    the seen-hash set; exactly-once via the sink checkpoint). The streaming
    analog of ``dedup.dedup_exact`` — arriving duplicates of any
    previously-ingested doc are dropped, so the parquet sink only ever
    appends novel content. ``availableNow`` drains the backlog then stops.
    """
    deduped = (
        docs_stream.withColumn("_text_md5", F.md5(F.col(text_col)))
        .dropDuplicates(["_text_md5"])
        .drop("_text_md5")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
