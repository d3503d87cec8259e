"""Snapshot-versioned table store — the Iceberg stand-in.

The production design (SURVEY §1.1) keeps all crawl state in Iceberg tables
(frontier / pages / url_seen / metrics) so every wave is one atomic snapshot
commit and a crawl resumes exactly from the last committed snapshot. This
container has no Iceberg runtime jar, so this module implements the same
contract on plain parquet:

  * a table = directory of immutable snapshot dirs + one JSON **manifest**
    listing committed snapshots (version, op, parent, wave, metrics, schema);
  * a write = parquet dir + atomic manifest swap (``os.replace``) — a crash
    between the two leaves an orphan dir that is simply never read, which is
    exactly Iceberg's commit model;
  * reads see only manifest-committed snapshots → snapshot isolation;
  * **merge-on-read**: appends carry a ``_v`` (snapshot version) column;
    ``read_latest_by(key)`` resolves the newest row per key at read time —
    the MoR analog of ``MERGE INTO pages ON uuid`` (SURVEY S5) without
    rewriting history every wave (an O(total) rewrite per wave would never
    survive 100 TB);
  * lineage: every manifest entry records parent version, the logical wave,
    and operator metrics (north_rule: "checkpointed per-partition frontier
    snapshots with lineage and fetch/enqueue/dedup-hit metrics").

Swapping in real Iceberg = replacing this class with ``spark.table(...)`` /
``MERGE INTO`` / ``CALL rollback_to_snapshot`` — callers only use the
contract below.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

V_COL = "_v"


class SnapshotTable:
    def __init__(self, spark: SparkSession, base_path: str, name: str):
        self.spark = spark
        self.name = name
        self.path = os.path.join(base_path, name)
        os.makedirs(self.path, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_manifest.json")

    def _manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": [], "schema": None}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit_manifest(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    # -- introspection ------------------------------------------------------
    def current_version(self) -> int:
        snaps = self._manifest()["snapshots"]
        return snaps[-1]["version"] if snaps else 0

    def lineage(self) -> list[dict]:
        return self._manifest()["snapshots"]

    def exists(self) -> bool:
        return bool(self._manifest()["snapshots"])

    # -- writes -------------------------------------------------------------
    def append(
        self,
        df: DataFrame,
        op: str = "append",
        wave: int | None = None,
        metrics: dict[str, Any] | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        manifest = self._manifest()
        version = (manifest["snapshots"][-1]["version"] if manifest["snapshots"] else 0) + 1
        snap_dir = os.path.join(self.path, f"snap-{version:06d}")
        out = df.withColumn(V_COL, F.lit(version))
        if partition_by:
            # Cluster files by the bucket key (Iceberg bucket-partitioning
            # analog). Deliberately NOT hive-style partitionBy directories:
            # multi-snapshot reads need one flat layout per snapshot root.
            out = out.repartition(*[F.col(c) for c in partition_by])
        out.write.mode("overwrite").parquet(snap_dir)
        manifest["snapshots"].append(
            {
                "version": version,
                "op": op,
                "parent": version - 1,
                "wave": wave,
                "ts": time.time(),
                "dir": snap_dir,
                "metrics": metrics or {},
            }
        )
        if manifest["schema"] is None:
            manifest["schema"] = out.schema.jsonValue()
        self._commit_manifest(manifest)
        return version

    def overwrite(self, df: DataFrame, op: str = "overwrite", wave: int | None = None) -> int:
        """Full replacement (compaction / truncate-and-load)."""
        manifest = self._manifest()
        version = (manifest["snapshots"][-1]["version"] if manifest["snapshots"] else 0) + 1
        snap_dir = os.path.join(self.path, f"snap-{version:06d}")
        out = df.withColumn(V_COL, F.lit(version))
        out.write.mode("overwrite").parquet(snap_dir)
        manifest["snapshots"] = [
            {
                "version": version,
                "op": op,
                "parent": 0,
                "wave": wave,
                "ts": time.time(),
                "dir": snap_dir,
                "metrics": {},
            }
        ]
        manifest["schema"] = out.schema.jsonValue()
        self._commit_manifest(manifest)
        return version

    def compact(
        self,
        key_cols: list[str],
        order_extra: list[str] | None = None,
        wave: int | None = None,
    ) -> None:
        """Rewrite the append log as its resolved merge-on-read view — ONE
        snapshot, one row per key. Without this, ``read_latest_by`` windows
        over every append ever made: after W waves the per-wave MoR
        resolution shuffles W appends' worth of rows (Iceberg analog:
        ``rewrite_data_files`` + snapshot expiry).

        Call only at a wave commit point and pass that ``wave``: the single
        compacted snapshot carries it, so ``rollback`` to any committed wave
        keeps the compacted state while still dropping any later
        uncommitted snapshots."""
        if not self.exists():
            return
        self.overwrite(
            self.read_latest_by(key_cols, order_extra=order_extra),
            op="compact", wave=wave,
        )

    def vacuum(self) -> None:
        """Delete snapshot dirs no longer referenced by the manifest
        (orphans from compaction/overwrite/rollback). Only safe when no live
        DataFrame still lazily references the old dirs — the crawler calls
        it between waves, after all per-wave frames are unpersisted."""
        live = {s["dir"] for s in self._manifest()["snapshots"]}
        for entry in os.listdir(self.path):
            p = os.path.join(self.path, entry)
            if entry.startswith("snap-") and os.path.isdir(p) and p not in live:
                shutil.rmtree(p, ignore_errors=True)

    def truncate(self) -> None:
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)

    def rollback(self, to_version: int) -> None:
        """Drop snapshots after ``to_version`` (Iceberg rollback_to_snapshot)."""
        manifest = self._manifest()
        manifest["snapshots"] = [s for s in manifest["snapshots"] if s["version"] <= to_version]
        self._commit_manifest(manifest)

    # -- reads --------------------------------------------------------------
    def read(self, as_of: int | None = None) -> DataFrame:
        """Union of committed snapshots (≤ as_of). Empty table → empty DF."""
        manifest = self._manifest()
        snaps = manifest["snapshots"]
        if as_of is not None:
            snaps = [s for s in snaps if s["version"] <= as_of]
        dirs = [s["dir"] for s in snaps]
        if not dirs:
            if manifest["schema"] is not None:
                schema = T.StructType.fromJson(manifest["schema"])
                return self.spark.createDataFrame([], schema)
            raise ValueError(f"table {self.name} is empty and has no schema yet")
        # mergeSchema: snapshots written across sessions may differ in
        # columns (e.g. `spans` vs `spans_z` when compress_body was toggled
        # on an existing store) — without it one side's column silently
        # disappears from the union. Schema-evolution reads are exactly
        # what an Iceberg-style table must survive.
        return self.spark.read.option("mergeSchema", "true").parquet(*dirs)

    def read_latest_by(self, key_cols: list[str], order_extra: list[str] | None = None,
                       as_of: int | None = None) -> DataFrame:
        """Merge-on-read: newest row per key (upsert resolution at read time)."""
        df = self.read(as_of=as_of)
        order = [F.col(V_COL).desc()] + [F.col(c).desc() for c in (order_extra or [])]
        w = Window.partitionBy(*key_cols).orderBy(*order)
        return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")

    def is_empty(self) -> bool:
        return not self.exists()


class SnapshotCatalog:
    """Namespace of SnapshotTables under one base directory (one crawl job)."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.spark, self.base_path, name)

    def drop_all(self) -> None:
        shutil.rmtree(self.base_path, ignore_errors=True)
        os.makedirs(self.base_path, exist_ok=True)
