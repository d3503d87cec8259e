"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "frontier_urls_scheduled_deduped_per_sec", "value": N,
   "unit": "sec", "queries": {...per-query seconds...}, "sf": ...,
   "scaling": {...local[8] vs local[32] frontier throughput...}}

The headline metric is the BASELINE.json one: URLs scheduled+deduped per
second on a synthetic Zipf-skewed frontier — one full scheduling pass =
salted window-rank politeness pop + exact anti-join dedup against a seen
set (the per-wave hot path of the crawl engine). Scaling evidence (north
rule: N → 4N cluster) is gathered by running the identical job at
``local[8]`` and ``local[32]`` on identical input and reporting throughput
at both plus efficiency = (thr_hi / thr_lo) / (cores_hi / cores_lo).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_FRONTIER_URLS (default 2_000_000),
BENCH_SKIP_SCALING=1 to skip the two-level run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FRONTIER = int(os.environ.get("BENCH_FRONTIER_URLS", "8000000"))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def prepare_fixture(n_urls: int) -> tuple[str, str]:
    """Materialize the synthetic frontier + seen-set to parquet ONCE so both
    parallelism levels run the identical job on the identical input (the
    north-rule two-cluster-size protocol). Cached per n_urls."""
    import tempfile

    base = os.path.join(tempfile.gettempdir(), f"polipus_bench_{n_urls}")
    fr_dir, seen_dir = os.path.join(base, "frontier"), os.path.join(base, "seen")
    if os.path.exists(os.path.join(base, "_DONE")):
        return fr_dir, seen_dir
    from polipus_spark.functions.urls import host_salt
    from polipus_spark.sources.corpus import synthetic_frontier

    spark = build(CPUS)
    fr = synthetic_frontier(spark, n_urls, n_hosts=2000, n_partitions=64)
    fr = fr.withColumn("host_salt", host_salt(F.col("url"), salt_factor=8))
    fr.write.mode("overwrite").parquet(fr_dir)
    # seen set: every other URL (50% dedup hit rate on the popped stream)
    spark.read.parquet(fr_dir).where(F.col("seq") % 2 == 0).select(
        F.col("url").alias("seen_url")
    ).write.mode("overwrite").parquet(seen_dir)
    spark.stop()
    with open(os.path.join(base, "_DONE"), "w") as f:
        f.write("ok")
    return fr_dir, seen_dir


def frontier_schedule_dedup(spark: SparkSession, fr_dir: str, seen_dir: str) -> tuple[int, float]:
    """One frontier scheduling pass over the parquet fixture:
    salted window-rank politeness pop (budget 200/salt) → exact anti-join
    dedup vs the seen set. Returns (n_scheduled, elapsed_sec)."""
    fr = spark.read.parquet(fr_dir)
    seen = spark.read.parquet(seen_dir)
    w = Window.partitionBy("host_salt").orderBy("priority", "depth", "discovery_ts", "seq")
    popped = fr.withColumn("_rank", F.row_number().over(w)).where(F.col("_rank") <= 200)
    t0 = time.time()
    n = popped.join(seen, popped["url"] == seen["seen_url"], "left_anti").count()
    return n, time.time() - t0


def run_queries(spark: SparkSession) -> dict[str, float]:
    """Headline per-operator timings at SF_DIR (force with .count())."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    headline = [
        "o1_frontier_pop", "j4_exact_tracker", "x2_link_extract",
        "text_quality", "text_fingerprint", "dedup_exact", "dedup_simhash",
        "dedup_minhash_lsh", "dedup_ngram_jaccard", "sim_bruteforce_topk",
        "sim_ivf_assign", "events_sessionize", "tpch_q1_style",
    ]
    out: dict[str, float] = {}
    for name in headline:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 3)
    return out


def build(cores: int) -> SparkSession:
    from polipus_spark.session import build_session

    return build_session(app_name=f"bench_{cores}", cores=cores,
                         shuffle_partitions=cores * 2)


def timed_frontier_run(cores: int, n_urls: int, reps: int = 3) -> tuple[int, float]:
    """Fresh session per parallelism level; one warm-up (JIT/codegen), then
    the median of ``reps`` timed passes over the same parquet fixture."""
    import statistics

    fr_dir, seen_dir = prepare_fixture(n_urls)
    spark = build(cores)
    try:
        frontier_schedule_dedup(spark, fr_dir, seen_dir)  # warm-up
        times, n = [], 0
        for _ in range(reps):
            n, t = frontier_schedule_dedup(spark, fr_dir, seen_dir)
            times.append(t)
        return n, statistics.median(times)
    finally:
        spark.stop()


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result: dict = {"metric": "frontier_urls_scheduled_deduped_per_sec",
                    "unit": "sec", "sf": float(sf) if sf else None}

    n_hi, t_hi = timed_frontier_run(CPUS, N_FRONTIER)
    thr_hi = N_FRONTIER / t_hi
    result["value"] = round(thr_hi, 1)
    result["frontier_urls"] = N_FRONTIER
    result["scheduled_rows"] = n_hi
    result["elapsed_sec"] = round(t_hi, 3)

    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        lo_cores = max(CPUS // 4, 2)
        _, t_lo = timed_frontier_run(lo_cores, N_FRONTIER)
        thr_lo = N_FRONTIER / t_lo
        result["scaling"] = {
            "cores_lo": lo_cores, "throughput_lo": round(thr_lo, 1),
            "cores_hi": CPUS, "throughput_hi": round(thr_hi, 1),
            "efficiency": round((thr_hi / thr_lo) / (CPUS / lo_cores), 3),
        }

    spark = build(CPUS)
    result["queries"] = run_queries(spark)
    spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
