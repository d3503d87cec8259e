"""Wave-loop Spark-job-count regression gate (r2 VERDICT item 8).

The wave loop's efficiency discipline is structural: 2 metric aggregates
per wave (crawler.py process_wave), one fetch join, one store merge, one
frontier push — each a bounded number of Spark jobs. Nothing in the type
system stops a future change from sneaking a per-hop ``count()`` or an
extra driver collect into the hot path, so this test pins the job count of
a representative wave via the status tracker: if a change pushes a wave
over budget, it must either be justified (raise the budget in the same
commit, with a reason) or fixed.
"""

from __future__ import annotations

import tempfile

import pytest

from polipus_spark.config import CrawlOptions
from polipus_spark.plans.crawler import PolipusCrawler
from polipus_spark.sources.corpus import corpus_df, gen_corpus

# Measured 53 on a link-expanding wave over the redirect-chain corpus
# (wave 0: pop + revalidate + fetch with 5 bounded redirect hops — each a
# localCheckpoint + early-exit probe — store + extract + push + tracker).
# Budget = measured + slack; the point is catching MULTIPLICATIVE creep
# (per-row/per-link actions), not byte-exact pinning: jobs scale with
# redirect_limit (a constant), never with row count.
WAVE_JOB_BUDGET = 60


@pytest.fixture(scope="module")
def crawler(spark):
    docs = gen_corpus(n_hosts=2, max_docs_per_host=5)
    opts = CrawlOptions(depth_limit=2, obey_robots_txt=True, max_waves=4)
    return PolipusCrawler(
        spark, corpus_df(spark, docs), opts, tempfile.mkdtemp(prefix="jobbudget_")
    )


def test_wave_job_count_bounded(spark, crawler):
    sc = spark.sparkContext
    n = crawler.seed(["http://host0.example.com/", "http://host1.example.com/"],
                     wave=0, next_seq=0)
    sc.setJobGroup("wave_budget_probe", "job-count regression gate")
    try:
        m = crawler.process_wave(0, next_seq=n)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("wave_budget_probe")
    assert m["fetched"] > 0 and m["enqueued"] > 0  # a real, link-expanding wave
    assert len(jobs) <= WAVE_JOB_BUDGET, (
        f"wave used {len(jobs)} Spark jobs (budget {WAVE_JOB_BUDGET}) — "
        "a per-row/per-hop action crept into the wave hot path"
    )
