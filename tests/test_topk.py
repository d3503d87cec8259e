"""exact_top_k (operators/topk.py): the scale-safe replacement for
orderBy().limit(k) on the frontier caps (O3/O4). Equivalence with the
naive sort-limit is the whole contract — these tests pin it on every code
path (direct gate, two-phase, n<=k early return, escalation-sized samples,
descending keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polipus_spark.operators.topk import exact_top_k


@pytest.fixture(scope="module")
def frame(spark):
    # deterministic synthetic frontier-ish frame: low-cardinality coarse
    # keys (like priority/depth/wave) + a unique tiebreak, shuffled layout
    return spark.range(0, 20_000).select(
        (F.col("id") % 3).cast("int").alias("priority"),
        (F.col("id") % 7).cast("int").alias("depth"),
        (F.col("id") % 11).cast("bigint").alias("discovery_ts"),
        F.col("id").alias("seq"),
    ).repartition(8).persist()


ORDER = ["priority", "depth", "discovery_ts", "seq"]


def _naive(df, cols, k):
    return [tuple(r) for r in df.orderBy(*cols).limit(k).collect()]


@pytest.mark.parametrize("k", [1, 100, 1_000, 7_919])
def test_two_phase_equals_sort_limit(frame, k):
    got = exact_top_k(frame, ORDER, k, force_two_phase=True)
    assert sorted(tuple(r) for r in got.collect()) == sorted(_naive(frame, ORDER, k))


def test_n_smaller_than_k_returns_all(frame):
    got = exact_top_k(frame, ORDER, 1_000_000, force_two_phase=True)
    assert got.count() == frame.count()


def test_descending_key(frame):
    got = exact_top_k(frame, [(-F.col("seq")).alias("_neg")], 500,
                      force_two_phase=True)
    assert sorted(r["seq"] for r in got.collect()) == list(range(19_500, 20_000))


def test_small_sample_escalation(frame):
    # sample_target smaller than k forces the escalation/fallback logic
    got = exact_top_k(frame, ORDER, 5_000, sample_target=100,
                      force_two_phase=True)
    assert sorted(tuple(r) for r in got.collect()) == sorted(_naive(frame, ORDER, 5_000))


def test_direct_gate_path(frame):
    got = exact_top_k(frame, ORDER, 50)  # below gate → plain sort-limit
    assert sorted(tuple(r) for r in got.collect()) == sorted(_naive(frame, ORDER, 50))


def test_columns_preserved_no_internal_keys(frame):
    got = exact_top_k(frame, ORDER, 100, force_two_phase=True)
    assert got.columns == frame.columns


def test_null_keys_fall_back_to_sort_limit(spark, frame):
    """r3 review fix: NULL key values must produce the SAME result as the
    plain sort-limit path (nulls-first), not be silently dropped by the
    threshold filter or crash the driver-side sample sort."""
    withnull = frame.union(
        spark.createDataFrame(
            [(None, 0, 0, 10**9)],
            "priority int, depth int, discovery_ts bigint, seq bigint",
        )
    )
    got = exact_top_k(withnull, ORDER, 500, force_two_phase=True)
    nullsafe = lambda rows: sorted(  # noqa: E731
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is None, v if v is not None else 0) for v in t),
    )
    assert nullsafe(got.collect()) == \
        nullsafe(withnull.orderBy(*ORDER).limit(500).collect())
    # the null-key row ranks first under nulls-first ordering
    assert any(r["priority"] is None for r in got.collect())


def test_persisted_list_receives_handle(frame):
    handles = []
    got = exact_top_k(frame, ORDER, 1_000, force_two_phase=True,
                      persisted=handles)
    assert got.count() == 1_000
    assert len(handles) == 1 and handles[0].is_cached
    handles[0].unpersist()
