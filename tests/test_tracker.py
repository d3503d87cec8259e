"""J1-J4 — url_tracker_spec.rb ports for all three tracker modes,
plus Bloom FPR bound and cuckoo delete semantics."""

import pytest
from pyspark.sql import functions as F

from polipus_spark.catalog import SnapshotCatalog
from polipus_spark.operators.tracker import (
    BloomTracker,
    CuckooTracker,
    ExactTracker,
    make_tracker,
)

URL = "http://www.asd.com/"
OTHER = "http://www.google.com/"


@pytest.mark.parametrize("mode", ["exact", "bloom", "cuckoo"])
def test_visit_then_visited(spark, work_dir, mode):
    """url_tracker_spec.rb:16-28: visit → visited? true; unseen → false."""
    cat = SnapshotCatalog(spark, work_dir)
    kw = {"capacity": 10_000, "n_buckets": 4} if mode != "exact" else {}
    if mode == "bloom":
        kw["error_rate"] = 0.01
    t = make_tracker(cat, mode, **kw)
    assert not t.is_visited(spark, URL)
    t.visit(spark, URL)
    assert t.is_visited(spark, URL)
    assert not t.is_visited(spark, OTHER)


def test_exact_remove(spark, work_dir):
    cat = SnapshotCatalog(spark, work_dir)
    t = ExactTracker(cat)
    t.visit(spark, URL)
    t.remove(spark, [URL])
    assert not t.is_visited(spark, URL)
    t.visit(spark, URL)  # re-add after remove works
    assert t.is_visited(spark, URL)


def test_cuckoo_remove(spark, work_dir):
    """J3: deletable tracker (reference bloom exposes remove,
    bloomfilter.rb:18-20; plain Bloom can't — cuckoo can)."""
    cat = SnapshotCatalog(spark, work_dir)
    t = CuckooTracker(cat, capacity=10_000, n_buckets=4)
    t.visit(spark, URL)
    t.visit(spark, OTHER)
    t.remove(spark, URL)
    assert not t.is_visited(spark, URL)
    assert t.is_visited(spark, OTHER)


def test_bloom_no_false_negatives_and_fpr_bound(spark, work_dir):
    """All inserted keys must probe true; FPR on fresh keys ≤ ~3× nominal."""
    cat = SnapshotCatalog(spark, work_dir)
    t = BloomTracker(cat, capacity=5_000, error_rate=0.01, n_buckets=4)
    ins = spark.createDataFrame([(f"http://h{i % 13}.com/p/{i}",) for i in range(3000)],
                                "key string")
    t.mark_seen(ins, "key")
    probe_in = t.probe(ins, "key")
    assert probe_in.where(~F.col("_seen")).count() == 0  # no false negatives
    fresh = spark.createDataFrame([(f"http://fresh{i}.org/x/{i}",) for i in range(3000)],
                                  "key string")
    fp = t.probe(fresh, "key").where(F.col("_seen")).count()
    assert fp / 3000 <= 0.03


def test_tracker_batch_filter_unseen(spark, work_dir):
    cat = SnapshotCatalog(spark, work_dir)
    t = ExactTracker(cat)
    batch1 = spark.createDataFrame([(f"u{i}",) for i in range(50)], "key string")
    t.mark_seen(batch1, "key")
    batch2 = spark.createDataFrame([(f"u{i}",) for i in range(30, 80)], "key string")
    out = t.filter_unseen(batch2, "key")
    assert sorted(r["key"] for r in out.collect()) == sorted(f"u{i}" for i in range(50, 80))


def test_clear(spark, work_dir):
    cat = SnapshotCatalog(spark, work_dir)
    t = ExactTracker(cat)
    t.visit(spark, URL)
    t.clear()
    assert not t.is_visited(spark, URL)


def test_exact_incremental_probe_after_compaction(spark, work_dir):
    """The exact tracker's resolved view must be computed from the last
    compacted snapshot plus the since-compaction DELTA only (r5 review
    #7) — not a window over the full log — and must stay value-identical
    through adds, removes, compaction, re-adds, and post-compaction
    removes."""
    cat = SnapshotCatalog(spark, work_dir)
    t = ExactTracker(cat)
    mk = lambda urls: spark.createDataFrame([(u,) for u in urls], "key string")  # noqa: E731
    t.mark_seen(mk(["a", "b", "c"]), "key")
    t.remove(spark, ["b"])
    t.compact()

    # no delta after the base: the probe plan is a direct base read — no
    # MoR window at all
    plan = t._current()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert t.seen_keys() == {"a", "c"}

    # delta: re-add the removed key, remove a compacted key, add a new one
    t.mark_seen(mk(["b", "d"]), "key")
    t.remove(spark, ["a"])
    cur = t._current()
    plan = cur._jdf.queryExecution().executedPlan().toString()
    # exactly ONE MoR window — over the delta, not the full log
    assert plan.count("RunningWindowFunction") <= 1
    assert t.seen_keys() == {"b", "c", "d"}
    urls = spark.createDataFrame([(u,) for u in ["a", "b", "c", "d", "e"]],
                                 "url string")
    probe = t.probe(urls, "url")
    got = {r["url"]: r["_seen"] for r in probe.collect()}
    assert got == {"a": False, "b": True, "c": True, "d": True, "e": False}

    # second compaction folds the delta in; probe again windowless
    t.compact()
    plan = t._current()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert t.seen_keys() == {"b", "c", "d"}
