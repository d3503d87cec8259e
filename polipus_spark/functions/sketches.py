"""Distributed sketch operators: the classic 100 TB OLAP estimators.

Counting distinct URLs seen, spotting heavy-hitter hosts, and estimating
value quantiles are THE queries a crawl/corpus pipeline runs constantly at
scales where exact answers need a full shuffle of the key space. Each
sketch here is a one-pass, map-side-combining aggregation whose state is
tiny (KBs) and mergeable across partitions — the Spark plan is
groupBy(small bucket id) partial-agg → final-agg, never a distinct or a
sort over the raw keys.

Unlike library sketches (HyperLogLog++ in ``approx_count_distinct``,
GKQuantile in ``percentile_approx``), every estimator below is built from
md5-derived hashes and integer arithmetic, so the SAME numbers fall out of
a DuckDB SQL oracle — the estimates are deterministically reproducible
across engines, which makes them auditable (and driver-hashable) instead
of implementation-defined.

Determinism rules (shared with the rest of the repo, see text.py):
* hash = first 15 hex digits of md5 → 60-bit non-negative BIGINT
  (`CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` on the DuckDB side);
* 60-bit values NEVER pass through doubles (2^60 > 2^53): bucket/remainder
  splits use pmod and shiftright, both exact on BIGINT;
* cross-row float sums are forbidden — the HLL harmonic sum is computed in
  exact integer arithmetic (terms scaled to 2^52) and only the final
  single division is floating point;
* estimates are emitted floor-scaled by 10^4 as BIGINTs so value-hash
  comparison is exact.

Estimator references (public): KMV — Bar-Yossef et al. 2002; HLL —
Flajolet/Fusy/Gandouet/Meunier 2007; CMS — Cormode & Muthukrishnan 2005.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polipus_spark.partitioning import spread

# 60-bit hash space: md5's first 15 hex digits. Matches the idiom used by
# minhash/simhash (dedup.py) so the DuckDB oracles share one casting trick.
HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)

# estimates are emitted as floor(value * SCALE) BIGINTs (exact cross-engine)
SCALE = 10_000

# HLL: m = 2^P buckets; bucket = hash mod m, rho = leading-zero count of
# the remaining high (60-P) bits + 1. alpha_64 per Flajolet et al. 2007.
HLL_P = 6
HLL_M = 1 << HLL_P
RHO_SHIFT = 52
HLL_ALPHA = 0.709

# CMS: depth-4 / width-256 bounds overestimation at ~2e/w of the stream
# length per probe with probability 1 - e^-d.
CMS_D = 4
CMS_W = 256

QUANTILE_BINS = 1024


def hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint (conv base16→10)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hll_distinct(df: DataFrame, key: Column) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate (m=64 buckets).

    Scale shape: ONE groupBy over at most m=64 bucket ids with a max()
    partial agg — per-partition state is 64 small ints, merged with max;
    nothing about the input size reaches the shuffle. This is the sketch
    ``approx_count_distinct`` runs under the hood, laid out as an
    auditable dataflow with engine-portable numbers.

    Raw Flajolet estimator (no small/large-range correction): use where
    n_distinct >> 2.5*m; cross-engine parity holds regardless. Returns one
    row (n_buckets_seen, harmonic_sum_scaled, est_distinct_x4) — the
    harmonic sum Σ 2^-rho_max is kept exact as Σ 2^(52 - rho_max) in
    BIGINT (rho_max ≤ 55 < 52 never underflows... rho_max ≤ 60-P+1 = 55,
    and 52 - 55 < 0 cannot occur because rho_max ≤ 52 would be needed —
    see rho clamp below), so float associativity never enters.
    """
    h = hash60(key)
    v = F.shiftright(h, HLL_P)  # high 54 bits, exact on bigint
    # rho = leading zeros of the 54-bit v, +1 = 55 - bit_length(v); v=0 → 55.
    # Clamped to RHO_SHIFT so the exact-integer term 2^(52-rho) stays ≥ 1
    # (P(rho > 52) ≈ 2^-52 — unreachable for md5 test data, clamp is for
    # estimator safety, and the clamp is mirrored in the SQL oracle).
    bit_len = F.length(F.conv(v, 10, 2))
    rho = F.least(
        F.lit(RHO_SHIFT),
        F.when(v == 0, F.lit(HASH_BITS - HLL_P + 1)).otherwise(
            F.lit(HASH_BITS - HLL_P + 1) - bit_len
        ),
    )
    regs = (
        df.select((h % F.lit(HLL_M)).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    agg = regs.agg(
        F.count("*").alias("n_buckets_seen"),
        # shiftleft() the builtin only takes a literal shift — the
        # column-dependent shift needs the SQL form
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_SHIFT} - rho_max)")).alias("s_seen"),
    )
    # empty buckets contribute 2^-0 = 1 each → 2^52 in scaled units
    harmonic = F.col("s_seen") + (F.lit(HLL_M) - F.col("n_buckets_seen")) * F.lit(
        1 << RHO_SHIFT
    ).cast("bigint")
    est = F.floor(
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        / (harmonic / F.lit(float(1 << RHO_SHIFT)))
        * F.lit(SCALE)
    ).cast("bigint")
    return agg.select(
        F.col("n_buckets_seen"),
        harmonic.alias("harmonic_sum_scaled"),
        est.alias("est_distinct_x4"),
    )


def kmv_distinct(df: DataFrame, key: Column, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count estimate: the k smallest DISTINCT
    60-bit hashes of the key; estimate = (k-1) / (kth_min / 2^60).

    Scale shape — sketch-guided two-pass: KMV needs the k smallest
    *distinct* hashes, and a naive distinct() shuffles the whole key
    space. Instead, pass 1 runs :func:`hll_distinct` (no shuffle, one
    bounded row collected) to estimate n; the kth-smallest distinct hash
    then concentrates below ≈ 2^60 · k/n, so pass 2 filters
    h ≤ 2^60 · 8k/n_est BEFORE the distinct — the filter is a pushed-down
    map-side predicate and the surviving set is ~8k hashes regardless of
    input size (P(kth_min above 8× its expectation) < e^-k by Chernoff;
    if n_est ≤ 8k the filter is a no-op and the input is small anyway).
    The same threshold logic runs in the SQL oracle, so the composed
    pipeline — not just the estimator — is what parity pins.

    Returns one row: (n_hashes, kth_min_hash, est_distinct_x4).
    """
    est_row = hll_distinct(df, key).collect()[0]  # 1 row, bounded
    # est_distinct_x4 is NULL on an empty / all-null-key input (sum over
    # zero buckets); treat that as 0 distinct so the threshold pass is a
    # no-op instead of a TypeError.
    n_est = max(1, (est_row["est_distinct_x4"] or 0) // SCALE)
    h = hash60(key)
    # null keys hash to NULL — they carry no distinct value and would
    # otherwise survive dropDuplicates as one spurious row
    hashes = spread(df).select(h.alias("h")).where(F.col("h").isNotNull())
    if n_est > 8 * k:
        # integer threshold: (2^60 / n_est) * 8k, computed without doubles
        threshold = ((1 << HASH_BITS) // n_est) * 8 * k
        hashes = hashes.where(F.col("h") <= F.lit(threshold))
    topk = hashes.dropDuplicates(["h"]).orderBy("h").limit(k)
    return topk.agg(
        F.count("*").alias("n_hashes"),
        F.max("h").alias("kth_min_hash"),
        F.floor(
            (F.count("*") - F.lit(1))
            / (F.max("h") / F.lit(HASH_SPACE))
            * F.lit(SCALE)
        ).cast("bigint").alias("est_distinct_x4"),
    )


def _cms_coords(key: Column) -> list[Column]:
    """The d (row, bucket) cells a key maps to; row i salts the md5."""
    return [
        F.struct(
            F.lit(i).alias("row"),
            (hash60(F.concat(F.lit(f"cms{i}:"), key)) % F.lit(CMS_W)).alias("bucket"),
        )
        for i in range(CMS_D)
    ]


def cms_build(df: DataFrame, key: Column) -> DataFrame:
    """Count-min sketch counters: one groupBy over (row, bucket) — at most
    d·w = 1024 cells regardless of input size, combining map-side. The
    materialized sketch is KB-sized and broadcastable."""
    return (
        spread(df).select(F.explode(F.array(*_cms_coords(key))).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, key: Column) -> DataFrame:
    """Point-estimate each probe key's count from the sketch: compute the
    d cell coordinates per probe, broadcast-join the ≤1024-cell sketch,
    take min(cnt) per key. Probe-side only shuffles the (tiny) probe set
    for its own groupBy."""
    coords = probes.select(
        key.alias("probe_key"), F.explode(F.array(*_cms_coords(key))).alias("rb")
    ).select(
        "probe_key", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return (
        coords.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("probe_key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def binned_quantiles(
    df: DataFrame,
    value: Column,
    q_bps: tuple[int, ...] = (5000, 9500, 9900),
    n_bins: int = QUANTILE_BINS,
) -> DataFrame:
    """Histogram-sketch quantiles of a numeric column (q in basis points).

    Scale shape: two map-side-combining aggs — global (min, max, count),
    then per-bin counts over ≤ ``n_bins`` keys — plus a window over the
    ≤1024-row bin table. Error bound is (max-min)/n_bins per quantile and
    there is NO sort of the data (contrast a percentile_exact, which
    shuffles and sorts every row of the group).

    Determinism: the bin index divides doubles but each row's result is a
    single IEEE expression evaluated identically by DuckDB; the target
    rank ceil(q·n) is computed in pure integers ((q_bps·n + 9999) div
    10^4); the estimate alone is floor-scaled to a BIGINT. Returns one row
    per quantile: (q_bps, bin_idx, cum_lo, in_bin, est_value_x4).
    """
    df = spread(df)  # per-row bin math; widen narrow scans
    stats = df.agg(
        F.min(value).alias("lo"), F.max(value).alias("hi"), F.count("*").alias("n")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(n_bins)
    rows = df.crossJoin(F.broadcast(stats)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint"))
        .otherwise(F.least(
            F.lit(n_bins - 1).cast("bigint"),
            F.floor((value - F.col("lo")) / width).cast("bigint"),
        )).alias("bin"),  # hi == lo guard: 0-width grid => NaN bin (r5 advisor)
        "lo",
        "hi",
        "n",
    )
    bins = rows.groupBy("bin", "lo", "hi", "n").agg(F.count("*").alias("c"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = bins.withColumn("cum_lo", F.coalesce(F.sum("c").over(w), F.lit(0)))
    qdf = cum.sparkSession.createDataFrame([(q,) for q in q_bps], "q_bps int")
    joined = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "rank",
        # explicit floor(): Spark's double→bigint cast truncates but
        # DuckDB's ROUNDS — floor() spells the same semantics in both
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor((F.col("q_bps") * F.col("n") + F.lit(SCALE - 1)) / F.lit(SCALE)).cast("bigint"),
        ),
    )
    hit = joined.where(
        (F.col("cum_lo") < F.col("rank"))
        & (F.col("cum_lo") + F.col("c") >= F.col("rank"))
    )
    est = (
        F.col("lo")
        + F.col("bin") * width
        + width * (F.col("rank") - F.col("cum_lo")) / F.col("c")
    )
    return hit.select(
        F.col("q_bps"),
        F.col("bin").alias("bin_idx"),
        F.col("cum_lo"),
        F.col("c").alias("in_bin"),
        F.floor(est * F.lit(SCALE)).cast("bigint").alias("est_value_x4"),
    ).orderBy("q_bps")


def hll_distinct_by(
    df: DataFrame, group: Column, key: Column, all_label: str = "__all__"
) -> DataFrame:
    """Grouped HLL distinct estimates PLUS a merged total — the property
    that makes sketches the 100 TB answer, demonstrated in-plan: the
    ``all_label`` row's registers are the per-bucket max over the GROUP
    registers (sketch merge), never a recount of the raw keys, yet its
    estimate equals :func:`hll_distinct` run globally on the same key
    (register max is associative — pinned by test and oracle).

    Output: ``(grp, n_buckets_seen, est_distinct_x4)`` — one row per group
    value plus the merged row. Scale shape: ONE groupBy over
    (n_groups × 64) registers, then a 64-row merge; input size never
    reaches a shuffle.
    """
    h = hash60(key)
    v = F.shiftright(h, HLL_P)
    bit_len = F.length(F.conv(v, 10, 2))
    rho = F.least(
        F.lit(RHO_SHIFT),
        F.when(v == 0, F.lit(HASH_BITS - HLL_P + 1)).otherwise(
            F.lit(HASH_BITS - HLL_P + 1) - bit_len
        ),
    )
    regs = (
        df.select(
            group.cast("string").alias("grp"),
            (h % F.lit(HLL_M)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("rho_max").alias("rho_max"))
        .select(F.lit(all_label).alias("grp"), "bucket", "rho_max")
    )
    agg = (
        regs.unionByName(merged)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_buckets_seen"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_SHIFT} - rho_max)")
            ).alias("s_seen"),
        )
    )
    harmonic = F.col("s_seen") + (
        F.lit(HLL_M) - F.col("n_buckets_seen")
    ) * F.lit(1 << RHO_SHIFT).cast("bigint")
    est = F.floor(
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        / (harmonic / F.lit(float(1 << RHO_SHIFT)))
        * F.lit(SCALE)
    ).cast("bigint")
    return agg.select(
        "grp",
        F.col("n_buckets_seen").cast("bigint").alias("n_buckets_seen"),
        est.alias("est_distinct_x4"),
    )


def quantiles_by(
    df: DataFrame,
    group: Column,
    value: Column,
    q_bps: tuple[int, ...] = (5000, 9500, 9900),
    n_bins: int = QUANTILE_BINS,
    all_label: str = "__all__",
) -> DataFrame:
    """Grouped histogram-sketch quantiles PLUS a merged total — the
    quantile counterpart of :func:`hll_distinct_by`, with mergeability
    demonstrated in-plan: every group bins its values on ONE SHARED
    global (min, max) grid, so the ``all_label`` row's histogram is the
    per-bin SUM of the group histograms (sketch merge — counts are
    associative), never a re-bin of the raw rows, yet its estimates
    equal :func:`binned_quantiles` run globally on the same column
    (pinned by test and oracle).

    Output: one row per (grp, q_bps) plus the merged rows —
    ``(grp, q_bps, bin_idx, est_value_x4)``. Scale shape: one global
    (min, max) agg (broadcast back), ONE groupBy over
    (n_groups × ≤n_bins) histogram keys, a ≤n_bins-row merge, and
    per-group windows over the bin table — the raw rows never sort and
    never shuffle beyond the histogram combine. The shared grid is the
    price of mergeability (a per-group grid would be tighter per group
    but its histograms could not merge); error stays (max-min)/n_bins.
    """
    df = spread(df)  # per-row bin math; widen narrow scans
    stats = df.agg(F.min(value).alias("lo"), F.max(value).alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(n_bins)
    rows = df.crossJoin(F.broadcast(stats)).select(
        group.cast("string").alias("grp"),
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint"))
        .otherwise(F.least(
            F.lit(n_bins - 1).cast("bigint"),
            F.floor((value - F.col("lo")) / width).cast("bigint"),
        )).alias("bin"),  # hi == lo guard: 0-width grid => NaN bin (r5 advisor)
        "lo",
        "hi",
    )
    bins = rows.groupBy("grp", "bin", "lo", "hi").agg(F.count("*").alias("c"))
    merged = (
        bins.groupBy("bin", "lo", "hi")
        .agg(F.sum("c").alias("c"))
        .select(F.lit(all_label).alias("grp"), "bin", "lo", "hi", "c")
    )
    allb = bins.unionByName(merged)
    w_n = Window.partitionBy("grp")
    w_cum = (
        Window.partitionBy("grp").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = allb.withColumn("n", F.sum("c").over(w_n)).withColumn(
        "cum_lo", F.coalesce(F.sum("c").over(w_cum), F.lit(0))
    )
    qdf = cum.sparkSession.createDataFrame([(q,) for q in q_bps], "q_bps int")
    joined = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "rank",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(
                (F.col("q_bps") * F.col("n") + F.lit(SCALE - 1)) / F.lit(SCALE)
            ).cast("bigint"),
        ),
    )
    hit = joined.where(
        (F.col("cum_lo") < F.col("rank"))
        & (F.col("cum_lo") + F.col("c") >= F.col("rank"))
    )
    est = (
        F.col("lo")
        + F.col("bin") * width
        + width * (F.col("rank") - F.col("cum_lo")) / F.col("c")
    )
    return hit.select(
        "grp",
        F.col("q_bps"),
        F.col("bin").alias("bin_idx"),
        F.floor(est * F.lit(SCALE)).cast("bigint").alias("est_value_x4"),
    )


def cms_estimate_by(
    df: DataFrame,
    group: Column,
    key: Column,
    probes: list[str],
    all_label: str = "__all__",
) -> DataFrame:
    """Grouped count-min estimates PLUS a merged total — the third
    mergeability mechanism in this module, demonstrated in-plan: HLL
    merges registers by MAX, the quantile histograms by bin SUM, and CMS
    by CELL-WISE COUNTER SUM — the ``all_label`` row's sketch is the sum
    of the group sketches (counters add), never a recount of the raw
    keys, yet its estimates equal :func:`cms_build`+:func:`cms_estimate`
    run globally (pinned by test and oracle).

    Output: one row per (grp, probe_key) — ``(grp, probe_key,
    cms_count)``. Scale shape: ONE groupBy over (n_groups × ≤d·w) cells,
    a ≤d·w-cell merge, then the probe set (a literal list) broadcast-
    joined against the cell tables; the raw rows never shuffle beyond
    the cell combine. Estimates are upper bounds with the usual CMS
    guarantee per sketch (error ∝ that sketch's total count / w)."""
    cells = (
        spread(df).select(
            group.cast("string").alias("grp"),
            F.explode(F.array(*_cms_coords(key))).alias("rb"),
        )
        .groupBy("grp", F.col("rb.row").alias("row"),
                 F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    merged = (
        cells.groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit(all_label).alias("grp"), "row", "bucket", "cnt")
    )
    allc = cells.unionByName(merged)
    pdf = df.sparkSession.createDataFrame(
        [(p,) for p in probes], "probe_key string")
    coords = pdf.select(
        "probe_key",
        F.explode(F.array(*_cms_coords(F.col("probe_key")))).alias("rb"),
    ).select("probe_key", F.col("rb.row").alias("row"),
             F.col("rb.bucket").alias("bucket"))
    grps = allc.select("grp").distinct()
    return (
        grps.crossJoin(F.broadcast(coords))
        .join(allc, ["grp", "row", "bucket"], "left")
        .groupBy("grp", "probe_key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
             .cast("bigint").alias("cms_count"))
    )
