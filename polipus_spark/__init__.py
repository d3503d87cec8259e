"""polipus_spark — a from-scratch PySpark-native reimplementation of the
crawl dataflow of taganaka/polipus (reference: /root/reference, Ruby+Redis).

NOT a port: the reference's thread-per-worker pull loop over a Redis FIFO
queue is re-expressed as a wave-at-a-time (BFS level) DataFrame pipeline:

    frontier (snapshot table, bucketed by host_salt)
      → salted window-rank pop (politeness budget per host)
      → revalidate (robots / whitelist / blacklist / TTL)
      → exact anti-join vs pages (late dedup, seed bypass)
      → simulated fetch = join vs the `docs` corpus table
      → redirect resolution (bounded self-join loop)
      → upsert pages (merge-on-read append)
      → link extraction (Arrow pandas UDF over interleaved spans)
      → filter chain → Bloom/exact URL-seen anti-join
      → append frontier + mark seen (enqueue-time, like the reference)
      → append metrics, commit snapshot

All state lives in snapshot-versioned tables (see catalog.py) so crawls
resume exactly from the last committed wave.
"""

__version__ = "0.1.0"

from polipus_spark.config import CrawlOptions  # noqa: F401
