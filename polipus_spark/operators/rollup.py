"""Hypertable-style continuous aggregate: a persisted time-bucketed rollup
plus a raw tail, merged at query time.

The TimescaleDB continuous-aggregate / materialized-view pattern on plain
parquet: historical events are aggregated ONCE into per-(bucket, key)
partial aggregates written ``partitionBy(bucket)`` — the time-partitioned
layout IS the hypertable index, so a range query's bucket predicate becomes
static partition pruning and the scan reads only the queried buckets'
directories. Fresh events past the rollup watermark stay raw; a range
query aggregates the (small) raw tail and MERGES it with the pre-aggregated
buckets by re-aggregating the partials (counts and sums compose; this is
why the rollup stores sum/count, not avg).

At 100 TB: the rollup is ~|buckets|·|keys| rows (thousands), the tail is
one watermark-interval of raw data, and the historical raw events are
never re-scanned by queries — the rollup replaces an O(corpus) aggregation
with an O(buckets-in-range) read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cents(value_col: str):
    return F.round(F.col(value_col) * 100).cast("bigint")


def build_time_rollup(
    events: DataFrame,
    rollup_dir: str,
    ts_col: str = "es",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket_s: int = 3600,
) -> None:
    """Aggregate events into per-(bucket, key) partials, partitioned by
    bucket (bucket = epoch-second floor — the hypertable chunk key)."""
    from polipus_spark.partitioning import spread

    (
        spread(events)
        .withColumn("bucket",
                    (F.floor(F.col(ts_col) / bucket_s) * bucket_s).cast("bigint"))
        .groupBy("bucket", key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(value_col)).cast("bigint").alias("sum_value_cents"),
        )
        .write.mode("overwrite").partitionBy("bucket").parquet(rollup_dir)
    )


def rollup_range_agg(
    spark,
    rollup_dir: str,
    raw_tail: DataFrame,
    split_es: int,
    from_es: int,
    to_es: int,
    ts_col: str = "es",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket_s: int = 3600,
) -> DataFrame:
    """Aggregate [from_es, to_es) per key: pre-aggregated buckets below the
    ``split_es`` watermark ∪ raw tail above it, re-aggregated. All three
    boundaries must be bucket-aligned (asserted) so a bucket is never half
    rolled-up. Result equals the direct aggregation over raw events —
    which is exactly what the DuckDB oracle checks."""
    for b in (split_es, from_es, to_es):
        if b % bucket_s:
            raise ValueError(f"boundary {b} not aligned to bucket_s={bucket_s}")
    rolled = (
        spark.read.parquet(rollup_dir)
        .where((F.col("bucket") >= from_es)
               & (F.col("bucket") < min(to_es, split_es)))
        .select(key_col, "n_events", "sum_value_cents")
    )
    tail = (
        raw_tail
        .where((F.col(ts_col) >= max(from_es, split_es))
               & (F.col(ts_col) < to_es))
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(value_col)).cast("bigint").alias("sum_value_cents"),
        )
    )
    return (
        rolled.unionByName(tail)
        .groupBy(key_col)
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value_cents").cast("bigint").alias("sum_value_cents"),
        )
    )


def refresh_rollup(
    spark,
    rollup_dir: str,
    new_events: DataFrame,
    ts_col: str = "es",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket_s: int = 3600,
) -> list[int]:
    """Incremental continuous-aggregate refresh — the materialized-view
    maintenance step: aggregate the NEW batch into per-(bucket, key)
    partials, merge them with the EXISTING partials of only the touched
    buckets (partials compose: counts and sums add), and rewrite JUST
    those bucket directories via dynamic partition overwrite. Untouched
    bucket partitions are never read and never rewritten, so refresh
    cost is ∝ the batch's time span, never ∝ history — at 100 TB a
    day's ingest updates a day's buckets while years of rollup sit
    still. Returns the touched bucket keys (driver-side list, bounded by
    batch-span/bucket_s — the same bounded-collect class as the
    politeness budget frame).
    """
    from polipus_spark.partitioning import spread

    # materialize the (bucket-span-sized) batch partials once: they feed
    # BOTH the touched-bucket probe and the merge union (each reference
    # otherwise re-aggregates the batch scan)
    batch = (
        spread(new_events)
        .withColumn("bucket",
                    (F.floor(F.col(ts_col) / bucket_s) * bucket_s).cast("bigint"))
        .groupBy("bucket", key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(value_col)).cast("bigint").alias("sum_value_cents"),
        )
        .localCheckpoint(eager=True)
    )
    touched = sorted(r["bucket"] for r in batch.select("bucket").distinct().collect())
    if not touched:
        return []
    old = (
        spark.read.parquet(rollup_dir)
        .where(F.col("bucket").isin(touched))
        .select("bucket", key_col, "n_events", "sum_value_cents")
    )
    merged = (
        old.unionByName(batch.select("bucket", key_col, "n_events",
                                     "sum_value_cents"))
        .groupBy("bucket", key_col)
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value_cents").cast("bigint").alias("sum_value_cents"),
        )
    )
    # the merge reads the same path the overwrite rewrites — materialize
    # the (touched-buckets-sized) result first to break the file lineage
    # (Spark rejects a self-overwriting path-based write otherwise)
    merged = merged.localCheckpoint(eager=True)
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        (merged.write.mode("overwrite").partitionBy("bucket")
         .parquet(rollup_dir))
    finally:
        spark.conf.set(mode_key, prev)
    return touched
