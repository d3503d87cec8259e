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


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    dim: int = 256,
    scale: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed-feature importance weights for data selection — the integer
    form of DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"). Every word hashes into one of ``dim`` buckets
    (the same 28-bit-md5 bucketing as ``text.hash_embed``); the target
    corpus and the raw corpus each induce a bucket-count distribution, and
    a document's weight is

        weight = Σ_b f_doc[b] · (target_count[b] · scale) // raw_count[b]

    — per-bucket target/raw ratios in fixed-point basis points instead of
    DSIR's log-likelihood ratio, so the whole computation is exact int64
    and the DuckDB oracle hash-matches. Ranking by ``weight / n_words``
    (caller-side exact ratio) then keeping top-k IS importance resampling
    with a hard cut. ``raw_count[b] >= f_doc[b] > 0`` for every bucket a
    document touches, so the division is always defined.

    Scale posture: the two distribution tables are <= ``dim`` rows however
    big the corpora are (map-side-combined aggregations over the hashed
    explode), so the ratio table BROADCASTS onto the per-doc bucket counts;
    the only data-sized exchange is the per-(id, bucket) combine. Linear
    end to end, no pairwise anything.
    """
    def _buckets(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), r"\s+"),
                        lambda w: w != "",
                    ),
                    lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10)
                    .cast("bigint") % F.lit(dim),
                )
            ).alias("b"),
        )

    raw_counts = (
        _buckets(docs).groupBy("b").agg(F.count("*").alias("raw_n"))
    )
    target_counts = (
        _buckets(target).groupBy("b").agg(F.count("*").alias("tgt_n"))
    )
    ratio = (
        raw_counts.join(target_counts, "b", "left")
        .select(
            "b",
            F.expr(f"div(coalesce(tgt_n, 0) * {scale}, raw_n)")
            .cast("bigint").alias("ratio_bps"),
        )
    )
    doc_b = _buckets(docs).groupBy("id", "b").agg(F.count("*").alias("f"))
    return (
        doc_b.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(F.sum(F.col("f") * F.col("ratio_bps")).alias("weight"))
        .join(
            docs.select(F.col(id_col).alias("id")), "id", "right"
        )
        .select(
            F.col("id").alias(id_col),
            F.coalesce("weight", F.lit(0)).cast("bigint").alias("weight"),
        )
    )


def epoch_allocation(
    df: DataFrame,
    stratum_col: str,
    weights_bps: dict[str, int],
    total: int,
) -> DataFrame:
    """Exact integer apportionment of a training-epoch document budget
    across strata — the planning step BETWEEN mixing weights and the
    deterministic samplers above: given per-domain weights in basis
    points (must sum to exactly 10,000) and a total budget, emit per
    stratum ``(n_avail, alloc_docs, shortfall)`` such that
    ``Σ alloc_docs == total`` exactly.

    Method: largest-remainder (Hamilton) apportionment —
    ``base = (total·w) div 10000``, the ``total − Σ base`` leftover seats
    go to the largest ``(total·w) mod 10000`` remainders, ties broken by
    stratum ascending. All int64; no floating normalization, so the
    DuckDB oracle hash-matches bit-for-bit. ``shortfall`` flags strata
    whose allocation exceeds availability (redistribution is a policy
    choice left to the caller — under-weighted domains usually absorb it
    by raising epochs-per-doc, not by silently re-weighting).

    Scale posture: one map-side-combined groupBy(stratum) count, then the
    apportionment windows run over |strata| rows — thousands of domains
    at most, a broadcast-sized frame by construction; the 100 TB input is
    touched exactly once by the count scan.
    """
    from pyspark.sql import Window

    if sum(weights_bps.values()) != BPS:
        raise ValueError(f"weights_bps must sum to {BPS}")
    w_expr = F.lit(0)
    for value, bps in sorted(weights_bps.items()):
        w_expr = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(bps)
        ).otherwise(w_expr)
    # Every weighted stratum must enter the apportionment even with ZERO
    # rows in df (r5 advisor): a missing stratum's base/remainder
    # otherwise never forms, inflating the leftover so Σ alloc_docs can
    # fall short of total and zero-weight strata can win +1 seats. Union
    # in explicit zero-count rows for the weighted strata; observed rows
    # dominate via the max (n_avail ≥ 0).
    weighted = df.sparkSession.createDataFrame(
        [(str(v), 0) for v in sorted(weights_bps)],
        schema="_wv string, n_avail long",
    ).select(
        F.col("_wv").cast(df.schema[stratum_col].dataType).alias(stratum_col),
        "n_avail",
    )
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count("*").alias("n_avail"))
        .unionByName(weighted)
        .groupBy(stratum_col)
        .agg(F.max("n_avail").alias("n_avail"))
        .withColumn("_w", w_expr.cast("bigint"))
        .withColumn("_base", F.expr(f"div({total} * _w, {BPS})"))
        .withColumn("_rem", (F.lit(total) * F.col("_w")) % F.lit(BPS))
    )
    all_w = Window.partitionBy()
    rank_w = Window.partitionBy().orderBy(
        F.col("_rem").desc(), F.col(stratum_col)
    )
    return (
        counts.withColumn("_leftover", F.lit(total) - F.sum("_base").over(all_w))
        .withColumn("_rk", F.row_number().over(rank_w))
        .select(
            stratum_col,
            "n_avail",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_leftover"), 1).otherwise(0)
            ).cast("bigint").alias("alloc_docs"),
        )
        .withColumn(
            "shortfall",
            F.greatest(
                F.col("alloc_docs") - F.col("n_avail"), F.lit(0).cast("bigint")
            ),
        )
    )


def epoch_take(
    df: DataFrame,
    stratum_col: str,
    weights_bps: dict[str, int],
    total: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Execute an :func:`epoch_allocation` plan: EXACTLY
    ``min(alloc_docs, n_avail)`` rows per stratum, selected by the same
    deterministic md5 rank as :func:`balanced_sample` — so the epoch's
    member set is a pure function of (weights, total, salt). Within a
    stratum the take is prefix-nested (rank is budget-independent), but
    across budgets a stratum's allocation itself is NOT monotone in
    ``total`` — largest-remainder apportionment has the Alabama paradox,
    so a +1 budget step can shrink one stratum's take by a row; callers
    needing strict nesting should fix per-stratum counts and use
    :func:`balanced_sample`-style rank cuts directly. The allocation
    frame is |strata| rows
    and broadcasts; the per-stratum row_number pays the same one-shuffle
    sort as balanced_sample (same prefilter optimization applies when a
    stratum vastly exceeds its allocation)."""
    from pyspark.sql import Window

    alloc = epoch_allocation(df, stratum_col, weights_bps, total).select(
        stratum_col, "alloc_docs"
    )
    rank_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(alloc), stratum_col)
        .where(F.col("_rk") <= F.col("alloc_docs"))
        .drop("_rk", "alloc_docs")
    )


def balanced_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Equalize class sizes: keep EXACTLY min-class-count rows per stratum.

    The rebalancing step of a training mix (downsample every class to the
    rarest class's size). Selection is a deterministic md5 rank within
    each stratum — (md5(salt||id) asc, id asc) — so the same rows survive
    on every run, at any parallelism, and the kept set for a given class
    is stable as OTHER classes grow. The floor count arrives via a
    broadcast 1-row min — never a driver-side collect.

    Scale note: the per-stratum row_number is a sort of each class — the
    one operator here that pays at 100 TB. It shuffles once on the
    stratum key; if the majority class dominates a partition, pre-filter
    with :func:`hash_bps` to a few× the target before ranking (an
    over-sample that preserves exactness as long as the prefilter keeps
    ≥ min-count rows per class) or salt the sort. Kept exact here —
    correctness first, the prefilter is the documented optimization."""
    from pyspark.sql import Window

    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    floor_n = counts.agg(F.min("_n").alias("_m"))
    rank_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(floor_n))
        .where(F.col("_rk") <= F.col("_m"))
        .drop("_rk", "_m")
    )
