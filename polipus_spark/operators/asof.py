"""Time-series joins Spark lacks natively: backward as-of and range join.

For every left row, find the LATEST right row with ``right.ts <= left.ts``
within the same key group (market-data "last quote before trade",
telemetry "config active at event time", attribution "most recent view
before click").

Scale shape — the union-window formulation, NOT a range join:

  * tag both sides, union, ONE shuffle on the keys, ONE per-key sort on
    (ts, side), then a running ``last(right_payload, ignorenulls=True)``
    over an unbounded-preceding window;
  * cost is a single exchange + sort of |L| + |R| rows — compare a range
    self-join's candidate blowup (per-key |L|·|R| before the argmax) or a
    per-key Python loop. Hot keys cost one task's sort, exactly like any
    keyed window (salt upstream if one key dominates);
  * equal timestamps: right rows sort BEFORE left rows (side 0 < 1), so a
    same-instant right row IS visible to the left row — the ``<=``
    convention, matching DuckDB's ASOF JOIN, which is the oracle.

Right rows must be unique per (keys, ts) — pre-aggregate if not (the
match would otherwise be ambiguous in ANY engine's as-of semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join → all ``left`` columns plus ``payload_cols`` from
    the latest right row with ``right.ts_col <= left.ts_col`` per keys
    (NULL payload when no right row precedes)."""
    left_cols = [c for c in left.columns]
    rpay_t = right.select(F.struct(*payload_cols).alias("_r")).schema["_r"].dataType
    lrow_t = left.select(F.struct(*left_cols).alias("_l")).schema["_l"].dataType
    l2 = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left_cols).alias("_l"),
        F.lit(None).cast(rpay_t).alias("_r"),
    )
    r2 = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lrow_t).alias("_l"),
        F.struct(*payload_cols).alias("_r"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_asof", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        *[F.col(f"_asof.{c}").alias(c) for c in payload_cols],
    )


def gap_fill(
    df: DataFrame,
    keys: list[str],
    bucket_col: str,
    count_cols: list[str],
    locf_cols: list[str],
    step: int = 1,
) -> DataFrame:
    """Densify a per-(keys, bucket) aggregate onto the full bucket grid and
    forward-fill: every key series gets one row per bucket from the GLOBAL
    min to max bucket (``step`` apart); in gap rows, ``count_cols`` become
    0 and each ``locf_cols`` value carries the last observed value for
    that series (NULL before the series' first observation). The
    timeseries gap-fill + LOCF primitive (TimescaleDB ``time_bucket_gapfill``
    + ``locf``) the hypertable rollup family needs for plotting/joining
    regular grids.

    Scale shape: the bounds are a 1-row agg (broadcast); the grid is
    distinct-keys × sequence-explode — |K|·(range/step) rows generated
    parallel by key, NEVER collected; one left equi-join shuffle on
    (keys, bucket) and one keyed window sort. All linear in grid size;
    grid size itself is the user's contract (pick ``step`` so
    range/step ≈ the points a consumer can plot, not raw event count).
    """
    bounds = df.agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = (
        df.select(*keys)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
            ).alias(bucket_col),
        )
    )
    filled = grid.join(df, [*keys, bucket_col], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = filled.select(
        *keys,
        bucket_col,
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in count_cols
        ],
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"{c}_locf")
            for c in locf_cols
        ],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of points to the intervals CONTAINING them (inclusive
    both ends) → points.* + intervals.* rows, one per containing interval.

    The both-sides-large, no-equi-key case that naively plans as a
    BroadcastNestedLoop/cartesian with a theta predicate. Instead: bin
    time into ``bucket_width``-wide buckets, explode each interval to
    every bucket it overlaps, equi-join on the point's single bucket, and
    post-filter exact containment. A (point, interval) pair can only meet
    in the point's one bucket, so no dedup is needed. Shuffle traffic is
    |P| + |I|·(interval_width/bucket_width + 1) rows — pick bucket_width
    near the typical interval width; never |P|·|I|. Time columns must be
    numeric (epoch seconds/micros); column names must be disjoint."""
    pb = points.withColumn("_bkt", F.floor(F.col(ts_col) / bucket_width))
    ib = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(F.floor(F.col(start_col) / bucket_width),
                             F.floor(F.col(end_col) / bucket_width))),
    )
    return (
        pb.join(ib, "_bkt")
        .where(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("_bkt")
    )
