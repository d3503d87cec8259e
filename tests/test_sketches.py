"""Sketch estimator sanity: parity with DuckDB is pinned by the oracle
entries (tools/oracle_check.py / test_entry.py); these tests pin the
ESTIMATOR guarantees — the part parity alone can't see (an estimator
that's deterministically wrong in both engines would still hash-match)."""

import pyspark.sql.functions as F
import pytest

from polipus_spark.functions.sketches import (
    CMS_D,
    CMS_W,
    binned_quantiles,
    cms_build,
    cms_estimate,
    hll_distinct,
    kmv_distinct,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def _key():
    return F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type"))


def test_hll_within_rse_band(spark, events):
    true_n = events.select(_key().alias("k")).distinct().count()
    est = hll_distinct(events, _key()).collect()[0]["est_distinct_x4"] / 10_000
    # raw HLL relative standard error is 1.04/sqrt(64) ≈ 13%; allow 4 sigma
    assert true_n * 0.5 < est < true_n * 1.5, (true_n, est)


def test_kmv_close_and_threshold_path(spark, events):
    true_n = events.select(_key().alias("k")).distinct().count()
    row = kmv_distinct(events, _key(), k=64).collect()[0]
    est = row["est_distinct_x4"] / 10_000
    # KMV RSE ≈ 1/sqrt(k-2) ≈ 13% at k=64; allow 4 sigma
    assert true_n * 0.5 < est < true_n * 1.5, (true_n, est)
    assert row["n_hashes"] == min(64, true_n)
    # force the HLL-threshold prefilter path with a tiny k: the filter must
    # not change the answer, only the scanned volume
    unfiltered = (
        events.select(F.conv(F.substring(F.md5(_key()), 1, 15), 16, 10)
                      .cast("bigint").alias("h"))
        .dropDuplicates(["h"]).orderBy("h").limit(4).collect()
    )
    filtered = kmv_distinct(events, _key(), k=4).collect()[0]
    assert filtered["kth_min_hash"] == unfiltered[-1]["h"]


def test_kmv_empty_and_all_null_inputs(spark, events):
    """Empty (or all-null-key) input: the HLL pre-pass estimate is NULL
    (sum over zero buckets) — kmv must return a 0-count row, not raise
    TypeError on the driver-side integer division."""
    empty = events.where(F.lit(False))
    row = kmv_distinct(empty, _key(), k=16).collect()[0]
    assert row["n_hashes"] == 0
    nulls = spark.createDataFrame([(None,), (None,)], "k string")
    row = kmv_distinct(nulls, F.col("k"), k=16).collect()[0]
    assert row["n_hashes"] == 0


def test_cms_never_underestimates(spark, events):
    key = F.col("user_id").cast("string")
    sketch = cms_build(events, key)
    assert sketch.count() <= CMS_D * CMS_W
    truth = events.groupBy(key.alias("uid")).agg(F.count("*").alias("tc"))
    est = cms_estimate(sketch, truth, F.col("uid"))
    joined = truth.join(est, truth["uid"] == est["probe_key"]).select("tc", "cms_count")
    n_rows = events.count()
    for r in joined.collect():
        # CMS is one-sided: estimate >= truth, overshoot bounded in
        # expectation by d collisions of n/w each; 4 sigma slack
        assert r["cms_count"] >= r["tc"]
        assert r["cms_count"] - r["tc"] <= 16 * n_rows // CMS_W + 4


def test_binned_quantiles_near_exact(spark, events):
    rows = binned_quantiles(events, F.col("value")).collect()
    assert [r["q_bps"] for r in rows] == [5000, 9500, 9900]
    vals = sorted(r["value"] for r in events.select("value").collect())
    lo, hi = vals[0], vals[-1]
    bin_w = (hi - lo) / 1024
    for r in rows:
        exact = vals[min(len(vals) - 1, (r["q_bps"] * len(vals) + 9999) // 10_000 - 1)]
        est = r["est_value_x4"] / 10_000
        assert abs(est - exact) <= 2 * bin_w + 1e-9, (r["q_bps"], est, exact)


def test_hll_distinct_by_merge_equals_global(spark):
    """The '__all__' row — merged from per-group registers, never from raw
    keys — must equal hll_distinct run globally on the same key (register
    max is associative), and per-group estimates track true cardinalities
    within HLL error (m=64 → ~13%)."""
    from pyspark.sql import functions as F

    from polipus_spark.functions.sketches import hll_distinct, hll_distinct_by

    rows = [(f"u{i % 97}", "a" if i % 3 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "uid string, grp string")
    by = {r["grp"]: r["est_distinct_x4"]
          for r in hll_distinct_by(df, F.col("grp"), F.col("uid")).collect()}
    glob = hll_distinct(df, F.col("uid")).collect()[0]["est_distinct_x4"]
    assert by["__all__"] == glob
    # both groups see the SAME 97 distinct uids (gcd(3, 97) = 1 sweeps all
    # residues), so their registers — and estimates — are identical, and
    # merging two identical register sets changes nothing
    assert by["a"] == by["b"] == by["__all__"]


def test_quantiles_by_merge_equals_global(spark, events):
    """The '__all__' rows — merged by per-bin SUM of the group histograms
    on the shared global grid, never a re-bin of the raw rows — must
    equal binned_quantiles run globally on the same column (histogram
    addition is associative), and every per-group estimate stays within
    the grid's error bound of that group's exact quantile."""
    from polipus_spark.functions.sketches import quantiles_by

    by = quantiles_by(events, F.col("event_type"), F.col("value")).collect()
    merged = {r["q_bps"]: (r["bin_idx"], r["est_value_x4"])
              for r in by if r["grp"] == "__all__"}
    glob = {r["q_bps"]: (r["bin_idx"], r["est_value_x4"])
            for r in binned_quantiles(events, F.col("value")).collect()}
    assert merged == glob

    vals = sorted(r["value"] for r in events.select("value").collect())
    lo, hi = vals[0], vals[-1]
    bin_w = (hi - lo) / 1024
    per_grp = {}
    for r in events.select("event_type", "value").collect():
        per_grp.setdefault(r["event_type"], []).append(r["value"])
    for r in by:
        if r["grp"] == "__all__":
            continue
        gv = sorted(per_grp[r["grp"]])
        exact = gv[min(len(gv) - 1,
                       (r["q_bps"] * len(gv) + 9999) // 10_000 - 1)]
        est = r["est_value_x4"] / 10_000
        assert abs(est - exact) <= 2 * bin_w + 1e-9, (
            r["grp"], r["q_bps"], est, exact)


def test_cms_estimate_by_merge_equals_global(spark, events):
    """The '__all__' row — merged by cell-wise counter SUM of the group
    sketches, never a recount — must give exactly the estimates of
    cms_build+cms_estimate run globally on the same key, and every
    estimate is an upper bound on the true count."""
    from polipus_spark.functions.sketches import cms_estimate_by

    probes = ["1", "2", "3", "7", "42"]
    key = F.col("user_id").cast("string")
    by = cms_estimate_by(events, F.col("event_type"), key, probes).collect()
    merged = {r["probe_key"]: r["cms_count"]
              for r in by if r["grp"] == "__all__"}
    sketch = cms_build(events, key)
    pdf = spark.createDataFrame([(p,) for p in probes], "uid string")
    glob = {r["probe_key"]: r["cms_count"]
            for r in cms_estimate(sketch, pdf, F.col("uid"))
            .withColumnRenamed("probe_key", "probe_key").collect()}
    assert merged == glob

    truth = {str(r["user_id"]): r["n"]
             for r in events.groupBy("user_id").agg(F.count("*").alias("n"))
             .collect()}
    for r in by:
        if r["grp"] != "__all__":
            continue
        assert r["cms_count"] >= truth.get(r["probe_key"], 0)
