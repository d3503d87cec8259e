"""Snapshot catalog: commits, MoR upserts, lineage, rollback, resume reads."""

from pyspark.sql import functions as F

from polipus_spark.catalog import SnapshotCatalog


def test_append_and_read(spark, work_dir):
    t = SnapshotCatalog(spark, work_dir).table("t")
    t.append(spark.createDataFrame([(1, "a")], "id int, v string"), wave=0)
    t.append(spark.createDataFrame([(2, "b")], "id int, v string"), wave=1)
    assert t.read().count() == 2
    assert t.read(as_of=1).count() == 1  # time travel


def test_merge_on_read_latest(spark, work_dir):
    t = SnapshotCatalog(spark, work_dir).table("t")
    t.append(spark.createDataFrame([("k1", 1), ("k2", 1)], "k string, w int"), wave=1)
    t.append(spark.createDataFrame([("k2", 2)], "k string, w int"), wave=2)
    latest = {r["k"]: r["w"] for r in t.read_latest_by(["k"]).collect()}
    assert latest == {"k1": 1, "k2": 2}


def test_rollback_and_lineage(spark, work_dir):
    t = SnapshotCatalog(spark, work_dir).table("t")
    t.append(spark.createDataFrame([(1,)], "id int"), wave=0, metrics={"n": 1})
    t.append(spark.createDataFrame([(2,)], "id int"), wave=1)
    assert [s["wave"] for s in t.lineage()] == [0, 1]
    t.rollback(1)
    assert t.read().count() == 1
    assert t.lineage()[-1]["metrics"] == {"n": 1}


def test_empty_table_schema(spark, work_dir):
    t = SnapshotCatalog(spark, work_dir).table("t")
    t.append(spark.createDataFrame([(1,)], "id int"), wave=0)
    t.rollback(0)
    df = t.read()  # empty but schema known
    assert df.count() == 0 and "id" in df.columns


def test_overwrite_compaction(spark, work_dir):
    t = SnapshotCatalog(spark, work_dir).table("t")
    t.append(spark.createDataFrame([(1,)], "id int"), wave=0)
    t.append(spark.createDataFrame([(2,)], "id int"), wave=1)
    t.overwrite(t.read().where(F.col("id") == 2).drop("_v"))
    assert [r["id"] for r in t.read().collect()] == [2]
    assert len(t.lineage()) == 1
