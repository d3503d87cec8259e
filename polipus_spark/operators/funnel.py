"""Event-sequence analytics: funnel levels and retention cohorts.

The two classic product-analytics operators over an event stream — the
ClickHouse ``windowFunnel`` / ``retention`` pair — re-expressed Spark-first:

* :func:`funnel_levels` — per user, how many steps of an ordered
  event-type sequence were completed inside a time window anchored at the
  first step. ONE shuffle: groupBy(user) → sorted event array → a single
  Column ``aggregate`` fold computes the greedy chain (earliest eligible
  event per level, which is provably the max-level chain for a window
  anchored at min(step1)). No self-joins, no per-step passes.
* :func:`retention_cohorts` — users bucketed by the week of their first
  event; per (cohort week, week offset) distinct-user counts. Two keyed
  aggregations plus one user-keyed equi-join.

All arithmetic is integer-exact (epoch microseconds, day counts), so both
operators carry DuckDB oracles.

Scale posture: both shuffle only on narrow user keys; funnel's per-user
array is bounded by one user's event count (event time series per entity,
the same envelope as sessionization), and retention's join is a user-keyed
equi-join between two pre-aggregated (hence combiner-shrunk) frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    window_sec: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth: ``(user_id, level, t1_us)`` for every user
    with at least one ``steps[0]`` event.

    Semantics (ClickHouse ``windowFunnel`` strict-order-free variant,
    pinned greedy): ``t1`` is the user's earliest ``steps[0]`` event; level
    k+1 is reached by the earliest ``steps[k]`` event strictly after the
    level-k event and within ``window_sec`` of ``t1``. Greedy-earliest is
    optimal here: the window is anchored at ``t1``, so taking the minimum
    eligible timestamp at each level never forecloses a deeper chain.

    Ties on timestamp break by a deterministic event-id ordering when the
    frame has an ``event_id`` column (both engines sort identically).
    """
    if not steps:
        raise ValueError("steps must be a non-empty event-type sequence")
    order_cols = [F.col("_us")]
    ev_cols = [
        # cast: parquet event times are TIMESTAMP_NTZ; the session runs in
        # UTC, so the cast to TIMESTAMP is value-identical and unix_micros
        # stays exact
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(type_col).alias("_et"),
    ]
    if "event_id" in events.columns:
        order_cols.append(F.col("event_id"))
    w_us = window_sec * 1_000_000
    arr = (
        events.where(F.col(type_col).isin(steps))
        .select(F.col(user_col).alias("user_id"), *ev_cols,
                *([F.col("event_id")] if "event_id" in events.columns else []))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(*[c.alias(f"_o{i}") for i, c in
                               enumerate(order_cols)], F.col("_et"))
                )
            ).alias("_evts")
        )
    )

    def _fold(acc: Column, e: Column) -> Column:
        ts = e["_o0"]
        # start the chain at the earliest step-0 event
        start = (acc["level"] == 0) & (e["_et"] == steps[0])
        out = F.when(
            start,
            F.struct(
                F.lit(1).alias("level"), ts.alias("t1"), ts.alias("tlast")
            ),
        )
        # extend: level L -> L+1 on steps[L], strictly later, inside window
        for lvl in range(1, len(steps)):
            out = out.when(
                (acc["level"] == lvl)
                & (e["_et"] == steps[lvl])
                & (ts > acc["tlast"])
                & (ts <= acc["t1"] + w_us),
                F.struct(
                    F.lit(lvl + 1).alias("level"),
                    acc["t1"].alias("t1"),
                    ts.alias("tlast"),
                ),
            )
        return out.otherwise(acc)

    init = F.struct(
        F.lit(0).alias("level"),
        F.lit(0).cast("bigint").alias("t1"),
        F.lit(0).cast("bigint").alias("tlast"),
    )
    res = F.aggregate(F.col("_evts"), init, _fold)
    return (
        arr.select(
            "user_id",
            res["level"].cast("int").alias("level"),
            res["t1"].cast("bigint").alias("t1_us"),
        )
        .where(F.col("level") >= 1)
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: ``(cohort_week, week_offset, n_users)``.

    cohort_week = Monday of the user's first event week (ISO weeks in both
    engines); week_offset = whole weeks between an active week and the
    cohort week. Counts are distinct users, integer-exact; cohort_week is
    emitted as a yyyy-MM-dd string so the cross-engine hash is stable.
    """
    firsts = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("_cw")
    )
    active = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("_aw"),
        )
        .distinct()
    )
    return (
        active.join(firsts, "user_id")
        .select(
            F.date_format("_cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("_aw", "_cw") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )
