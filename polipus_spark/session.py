"""SparkSession factory tuned for the crawl workload.

Local-mode testing uses local[N]; the same settings are what we would
submit with ``spark-submit --py-files polipus_spark.zip`` on a real
cluster (north_rule). AQE is on so skewed joins re-plan at runtime;
Arrow is on because every Python-side kernel is a vectorized pandas UDF
(no per-row Python anywhere in the pipeline).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package for worker shipment (the --py-files artifact).

    Driver-side ``sys.path`` tweaks don't reach Python workers; on a real
    cluster this zip is what ``spark-submit --py-files polipus_spark.zip``
    distributes. Locally we addPyFile it so the library works from any cwd.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "polipus_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "polipus_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    return out


def build_session(
    app_name: str = "polipus_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", mem)
        # Pre-size the heap: a lazily-grown multi-GB heap on a virtualized
        # host causes first-touch page-fault storms — measured 10-20×
        # run-to-run variance on identical jobs until -Xms was pinned.
        .config("spark.driver.extraJavaOptions", f"-Xms{mem}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(_package_zip())
    return spark
