"""JSONL / CSV corpus interchange (export + re-import).

Training-data pipelines move corpora between engines as line-delimited
JSON; CSV shows up at the edges (spreadsheets, legacy ETL). These helpers
pin ONE canonical option set per format so export and re-import are
lossless round trips — verified by the ``io_jsonl_roundtrip`` /
``io_csv_roundtrip`` oracle entries, which push strings containing
quotes, commas, newlines, and non-ASCII through a full write+read cycle
and hash-compare against the original table.

Scale notes:

* JSONL is the scale path: line-delimited and splittable, so a 100 TB
  export reads back with one input split per file block; schema is
  supplied explicitly on read (schema-on-read inference would be a full
  extra pass and can widen types).
* CSV with embedded newlines requires ``multiLine=true``, and a quoted
  newline can straddle a byte-range split — Spark then gives up
  splitting and reads EACH FILE single-threaded. Parallelism becomes
  the file count, so exports keep the writer's partitioning (one file
  per task). Prefer JSONL for anything wide; CSV is compatibility.
* Writes go through the normal committer (exactly-once per output dir
  with ``mode=overwrite``), and both formats spill nothing to the
  driver — export is a pure executor-side sink.

Reference analog: the reference engine persists pages to pluggable
stores (storage/*.rb) but has no corpus export/import; this is curation-
layer plumbing the training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["export_jsonl", "read_jsonl", "export_csv", "read_csv",
           "export_orc", "read_orc"]


def export_jsonl(df: DataFrame, path: str) -> None:
    """Write ``df`` as line-delimited JSON (one object per line, UTF-8)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a JSONL directory with an explicit schema (no inference pass)."""
    return spark.read.schema(schema).json(path)


def export_csv(df: DataFrame, path: str) -> None:
    """Write ``df`` as RFC-4180 CSV: header row, quoted fields, embedded
    quotes doubled (``escape='"'``) so any reader that speaks the RFC can
    consume the export."""
    (df.write.mode("overwrite")
     .option("header", True)
     .option("escape", '"')
     .csv(path))


def export_orc(df: DataFrame, path: str) -> None:
    """Write ``df`` as ORC — the columnar interchange with the Hive/Trino
    world (Spark ships the reader/writer natively). Same splittable,
    predicate-pushdown-friendly posture as parquet."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC directory (self-describing schema — no inference pass
    needed, unlike the text formats)."""
    return spark.read.orc(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read an :func:`export_csv` directory back with an explicit schema.

    ``multiLine=true`` because quoted fields may contain newlines — see
    the module docstring for the splittability cost this carries."""
    return (spark.read.schema(schema)
            .option("header", True)
            .option("escape", '"')
            .option("multiLine", True)
            .csv(path))
