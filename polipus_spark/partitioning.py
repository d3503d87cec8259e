"""Scale-adaptive input spreading for CPU-dense operators.

Small parquet inputs (one row group ⇒ one scan split) serialize every
downstream per-row computation onto a single core: a 6 MB documents file
feeds md5/shingle/cosine work that is thousands of CPU cycles per byte, so
the scan's byte-based split sizing is the wrong parallelism signal
(optimization guide §2.5 "input skew — repartition immediately after the
read", §1.2 "choose a partitioning that avoids skew").

``spread`` widens such inputs to the cluster's core count with one cheap
round-robin exchange of the (tiny) input bytes. It is a NO-OP whenever the
input already carries at least ``defaultParallelism`` partitions — at real
scale (100 TB ⇒ ~10⁵ splits) the condition never fires, so no extra
exchange is added where the scan already parallelizes. The target derives
from the cluster (``sparkContext.defaultParallelism``), never a constant,
so local[N] and a real cluster each spread to their own width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Round-robin ``df`` to ``defaultParallelism * multiple`` partitions
    iff it currently has fewer — parallelism insurance for CPU-dense
    per-row work downstream of a narrow scan. Row content is unchanged;
    safe wherever results don't depend on physical row placement."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiple
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
