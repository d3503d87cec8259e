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

# ----------------------------------------------------------- changelog (CDF)

def _chg(t, frm, to=None):
    rows = t.changelog(["k"], from_version=frm, to_version=to).collect()
    return {r["k"]: r["_change"] for r in rows}


def test_changelog_insert_update_unchanged(spark, work_dir):
    t = SnapshotCatalog(spark, work_dir).table("t")
    v1 = t.append(spark.createDataFrame([("k1", 1), ("k2", 1)], "k string, w int"))
    t.append(spark.createDataFrame([("k2", 2), ("k3", 1)], "k string, w int"))
    assert _chg(t, v1) == {"k2": "update", "k3": "insert"}  # k1 unchanged


def test_changelog_net_change_and_bounded_window(spark, work_dir):
    """Two upserts of the same key net to ONE update row; to_version bounds
    the window (changes after it are invisible)."""
    t = SnapshotCatalog(spark, work_dir).table("t")
    v1 = t.append(spark.createDataFrame([("k1", 1)], "k string, w int"))
    t.append(spark.createDataFrame([("k1", 2)], "k string, w int"))
    v3 = t.append(spark.createDataFrame([("k1", 3)], "k string, w int"))
    t.append(spark.createDataFrame([("k9", 1)], "k string, w int"))
    rows = t.changelog(["k"], from_version=v1, to_version=v3).collect()
    assert len(rows) == 1
    assert rows[0]["k"] == "k1" and rows[0]["_change"] == "update"
    assert rows[0]["w"] == 3  # the new-side resolved row, not an intermediate


def test_changelog_delete_and_reinsert(spark, work_dir):
    t = SnapshotCatalog(spark, work_dir).table("t")
    v1 = t.append(spark.createDataFrame(
        [("k1", 1, False), ("k2", 1, False)], "k string, w int, _deleted boolean"))
    v2 = t.append(spark.createDataFrame(
        [("k1", 1, True)], "k string, w int, _deleted boolean"))
    assert _chg(t, v1) == {"k1": "delete"}
    t.append(spark.createDataFrame(
        [("k1", 5, False)], "k string, w int, _deleted boolean"))
    assert _chg(t, v2) == {"k1": "insert"}  # tombstone -> live = re-insert
    assert _chg(t, v1) == {"k1": "update"}  # net across delete+reinsert


def test_changelog_from_zero_is_all_live_inserts(spark, work_dir):
    t = SnapshotCatalog(spark, work_dir).table("t")
    t.append(spark.createDataFrame(
        [("k1", 1, False), ("k2", 1, True)], "k string, w int, _deleted boolean"))
    assert _chg(t, 0) == {"k1": "insert"}  # tombstoned key never emits


def test_changelog_refuses_compacted_window(spark, work_dir):
    import pytest

    t = SnapshotCatalog(spark, work_dir).table("t")
    v1 = t.append(spark.createDataFrame([("k1", 1)], "k string, w int"))
    t.append(spark.createDataFrame([("k2", 1)], "k string, w int"))
    t.overwrite(t.read_latest_by(["k"]).drop("_v"), op="compact")
    with pytest.raises(ValueError, match="predates the oldest retained"):
        t.changelog(["k"], from_version=v1)
