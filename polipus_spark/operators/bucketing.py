"""Bucketed table layout: shuffle-free co-located joins.

The 100 TB join lever the planner cannot conjure at read time: two fact
tables written with ``bucketBy(N, key)`` on the SAME key and bucket count
hash-partition their files identically ON DISK, so a later equi-join on
that key needs NO Exchange on either side — Catalyst recognizes the
matching ``HashPartitioning(key, N)`` output partitioning from the scan
itself. For a repeatedly-joined pair (orders ⨝ lineitem every run, the
page store ⨝ frontier every wave) this converts the dominant per-query
shuffle into a one-time write-side cost.

Pinned by test: joining two co-bucketed tables (broadcast disabled)
plans a SortMergeJoin with ZERO Exchange operators, while the same join
over plain parquet shuffles both sides.

Spark specifics this module pins down:

* Native parquet bucketing (no Hive metastore needed) via
  ``saveAsTable`` — the in-memory catalog records the bucket spec; a
  bare ``.parquet(path)`` write CANNOT carry one.
* ``sortBy(key)`` inside each bucket: with one file per bucket the scan
  is also sort-order-aware and the merge join's per-partition sort is
  elided.
* The bucket count is the join parallelism floor — pick it for the
  TARGET scale (e.g. 4096 at 100 TB), not the test scale; more
  executors than buckets idle, fewer just queue.

Reference analog: the reference's single Redis queue has no layout
concept at all (lib/polipus/queue_overflow.rb manages size, not
placement); this is the storage-layout layer a distributed engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted within buckets) by ``key``.

    ``path`` makes the table external (data outside the warehouse dir);
    ``mode=overwrite`` keeps the entry idempotent across runs."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back THROUGH THE CATALOG — ``spark.table``
    is what carries the bucket spec into the plan; reading the parquet
    files by path would silently drop it (and the shuffle saving)."""
    return spark.table(table)
