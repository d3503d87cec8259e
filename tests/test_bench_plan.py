"""Plan-shape + parity pins for the bench's frontier hot path.

The r5 two-phase budgeted pop is a correctness-critical optimization of
the HEADLINE measurement (and the production A6 configuration): a literal
pre-cap above the window lets Catalyst insert a map-side WindowGroupLimit,
then the exact per-host budget column filter runs on the survivors. These
tests pin (a) that the partial limit is actually in the physical plan —
if a Spark upgrade or a plan change drops it, the scaling evidence
silently degrades — and (b) that the two-phase result is row-identical to
the one-phase column-only filter.
"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fixture_base(spark):
    import bench

    return bench.prepare_fixture(60_000, spark)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_budgeted_is_two_phase(spark, fixture_base):
    import bench

    q = bench.build_frontier_query(spark, fixture_base, variant="budgeted")
    assert "WindowGroupLimit" in _plan(q), (
        "budgeted variant lost its map-side partial window limit — the "
        "literal pre-cap must sit directly above the window"
    )


def test_budgeted_pop_stays_one_phase(spark, fixture_base):
    """The skew legs measure the general no-finite-bound path where
    host-salting is the only skew lever; a pre-cap sneaking in would
    absorb the skew the leg exists to measure."""
    import bench

    q = bench.build_frontier_query(
        spark, fixture_base, variant="budgeted_pop")
    assert "WindowGroupLimit" not in _plan(q)


def test_two_phase_budgeted_parity(spark, fixture_base):
    """Two-phase == one-phase, row for row: rebuild the one-phase plan by
    filtering the pre-capped variant's own building blocks without the
    literal cap, and compare scheduled counts."""
    import bench
    from polipus_spark.functions.urls import host_salt, url_host
    from pyspark.sql import Window

    two = bench.build_frontier_query(
        spark, fixture_base, variant="budgeted").collect()[0]["n"]

    fr = spark.read.parquet(os.path.join(fixture_base, "frontier"))
    seen = spark.read.parquet(os.path.join(fixture_base, "seen"))
    budgets = spark.read.parquet(os.path.join(fixture_base, "budgets"))
    enriched = (
        fr.withColumn("host2", url_host(F.col("url")))
        .withColumn("hs", host_salt(F.col("url"), 8))
    )
    w = Window.partitionBy("hs").orderBy(
        "priority", "depth", "discovery_ts", "seq")
    ranked = enriched.withColumn("_rank", F.row_number().over(w))
    one = (
        ranked.join(F.broadcast(budgets),
                    ranked["host2"] == budgets["host"], "left")
        .where(F.col("_rank") <= F.greatest(
            F.lit(1), F.floor(F.coalesce(F.col("budget"), F.lit(1600))
                              / F.lit(8))))
        .join(seen, F.col("url") == seen["seen_url"], "left_anti")
        .count()
    )
    assert two == one


def test_events_topk_per_group_uses_window_group_limit(spark):
    """The grouped top-k entry must compile to a map-side WindowGroupLimit
    (literal rank limit): the shuffle carries ~k rows per (task, group),
    not the whole events table."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["events_topk_per_group"](
        spark, "/root/testdata/sf0.01")
    assert "WindowGroupLimit" in _plan(df)
