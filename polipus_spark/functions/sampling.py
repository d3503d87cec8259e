"""Deterministic sampling operators for training-data mixing.

A 100 TB corpus pipeline doesn't sample with ``rand()`` — runs must be
reproducible and resumable, so membership has to be a pure function of the
row key. Both operators hash the id with md5 (the engine-portable hash used
across this repo) into [0, 10000) basis points and keep rows under the
stratum's rate. Map-only: no shuffle, fused into the scan, and the SAME
rows are kept at any parallelism or on any re-run. Exactly reproducible in
ANSI SQL, so every entry is DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BPS = 10_000  # basis points: rates are integers per ten-thousand


def hash_bps(id_col: Column, salt: str = "") -> Column:
    """Deterministic [0, 10000) bucket from md5(salt || id) — 28 hex bits,
    far above the modulus, so bucket occupancy is uniform to ~1e-5."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 7), 16, 10).cast("bigint"), F.lit(BPS)
    )


def bernoulli_sample(
    df: DataFrame, rate_bps: int, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~rate_bps/10000 of rows, deterministically by id hash."""
    return df.where(hash_bps(F.col(id_col), salt) < F.lit(rate_bps))


def stratified_sample(
    df: DataFrame,
    stratum: Column,
    rates_bps: dict[str, int],
    default_bps: int = 0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (data-mixing weights).

    ``rates_bps`` maps stratum value → keep rate in basis points; strata
    absent from the map use ``default_bps``. The rate lookup is a CASE
    expression (broadcast-free, codegen) and membership is the same id hash
    as :func:`bernoulli_sample` — so nested samples are consistent: a 10%
    sample is a subset of the same stratum's 50% sample.
    """
    rate = F.lit(default_bps)
    for value, bps in sorted(rates_bps.items()):
        rate = F.when(stratum == F.lit(value), F.lit(bps)).otherwise(rate)
    return df.where(hash_bps(F.col(id_col), salt) < rate)
