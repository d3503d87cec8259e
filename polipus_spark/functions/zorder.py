"""Z-order (Morton) clustering keys for multi-dimensional data skipping.

The lakehouse OPTIMIZE ZORDER trick (Delta/Iceberg): interleave the bits
of two scan dimensions into one key, range-partition + sort files by it,
and parquet min-max statistics prune on BOTH dimensions at once — a range
predicate on either column touches O(sqrt(files)) instead of all of them.

``zorder_key`` is a pure Column bit fold (no UDF, exact integers, DuckDB-
oracle-able); ``cluster_by_zorder`` applies it: repartitionByRange on the
key + sortWithinPartitions, which is exactly the file layout a 100 TB
store wants before handing parquet row-group pruning the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative ints, ``bits`` bits each →
    one bigint (``a`` owns even bit positions, ``b`` odd). Values are
    masked to ``bits`` bits (callers bucket/hash wider domains first —
    masking, not clamping, keeps the key uniform under hashed inputs).
    ``bits <= 31`` keeps the result inside a positive int64.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    am = a.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    bm = b.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("bigint")
    one = F.lit(1)
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(am, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bm, i).bitwiseAND(one), 2 * i + 1)
        )
    return out


def zorder_key_py(a: int, b: int, bits: int = 16) -> int:
    """Scalar reference of :func:`zorder_key` (tests / oracle checks)."""
    a &= (1 << bits) - 1
    b &= (1 << bits) - 1
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def zorder_key_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL expression (unrolled OR of
    shift/mask terms) — the DuckDB oracle for :func:`zorder_key`."""
    mask = (1 << bits) - 1
    am = f"(CAST({a_expr} AS BIGINT) & {mask})"
    bm = f"(CAST({b_expr} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame, a: Column, b: Column, n_partitions: int, bits: int = 16
) -> DataFrame:
    """Lay the frame out for two-dimensional min-max pruning: range-
    partition on the Morton key and sort within partitions, so every
    output file owns a compact Z-curve segment (tight min/max envelopes
    on BOTH source columns)."""
    return (
        df.withColumn("_zkey", zorder_key(a, b, bits))
        .repartitionByRange(n_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
    )
