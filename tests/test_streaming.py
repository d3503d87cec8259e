"""Structured Streaming variants: frontier drain + windowed metrics."""

import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from polipus_spark.catalog import SnapshotCatalog
from polipus_spark.config import CrawlOptions
from polipus_spark.operators.frontier import Frontier
from polipus_spark.streaming.waves import drain_frontier, streaming_metrics


def test_drain_frontier_available_now(spark, work_dir):
    from tests.test_queue import PUSH_SCHEMA, _urls_df

    fr = Frontier(SnapshotCatalog(spark, work_dir), CrawlOptions())
    fr.push(_urls_df(spark, [f"http://h.example.com/p/{i}" for i in range(20)]),
            wave=0, next_seq=0)
    fr.push(_urls_df(spark, [f"http://h.example.com/q/{i}" for i in range(10)]),
            wave=1, next_seq=20)

    seen_batches = []

    def process(batch_df, batch_id):
        seen_batches.append(batch_df.count())

    q = drain_frontier(spark, fr.table, process, tempfile.mkdtemp())
    q.awaitTermination(120)
    assert sum(seen_batches) == 30  # every pushed row drained exactly once


def test_streaming_metrics_window(spark):
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    src = spark.readStream.format("rate").option("rowsPerSecond", "50").load() \
        .select(F.col("timestamp").alias("ts"),
                F.when(F.col("value") % 2 == 0, "fetch").otherwise("error").alias("event_type"),
                F.col("value").cast("double"))
    agg = streaming_metrics(src, window="10 seconds", watermark="10 seconds")
    q = (agg.writeStream.outputMode("update").format("memory")
         .queryName("m_out").start())
    try:
        q.processAllAvailable()
        import time
        time.sleep(2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM m_out").collect()
        assert {r["event_type"] for r in rows} <= {"fetch", "error"}
    finally:
        q.stop()
