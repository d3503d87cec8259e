"""Structured Streaming variants of the crawl dataflow (SURVEY §2.7).

The reference is a continuous stateful loop (worker threads popping a Redis
queue until a 30 s idle timeout). The batch wave loop in plans/crawler.py is
the deterministic-ordering re-expression; this module provides the streaming
re-expression for deployments that want continuous draining instead of
discrete waves:

  * ``frontier_stream`` — ``readStream`` over the frontier table's parquet
    log: new snapshot files are discovered as micro-batches (the Redis LPUSH
    analog), throttled by ``maxFilesPerTrigger``.
  * ``drain_frontier`` — foreachBatch processor applying the same politeness
    rank + dedup kernels per micro-batch; ``availableNow`` trigger gives the
    "run until queue empty then stop" session semantics (queue_timeout
    analog, lib/polipus.rb:46-48) with exactly-once sink checkpointing.
  * ``streaming_metrics`` — the S10 counters as a windowed streaming agg
    with a watermark (late fetch results tolerated up to the watermark).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polipus_spark.catalog import SnapshotTable


def frontier_stream(
    spark: SparkSession,
    frontier: SnapshotTable,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming view of the frontier log (new snapshot files = new URLs)."""
    schema = frontier.read().schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{frontier.path}/snap-*")
    )


def drain_frontier(
    spark: SparkSession,
    frontier: SnapshotTable,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drain pending frontier rows continuously; each micro-batch runs the
    caller's kernel (politeness pop + fetch join + ...). availableNow ⇒
    process everything committed so far, then stop (session semantics)."""
    stream = frontier_stream(spark, frontier)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


def streaming_metrics(events: DataFrame, window: str = "5 minutes",
                      watermark: str = "10 minutes") -> DataFrame:
    """S10/A3 as a streaming windowed aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    per-user session ids across micro-batches.

    The per-group state is (last_ts, session_id) — a new session starts
    when the gap since the previous event exceeds ``gap_seconds``. This is
    the streaming twin of the batch ``events_sessionize`` oracle query
    (lag + cumsum): feed the same events through in arrival order and the
    session ids match (pinned by tests/test_streaming.py). State is held
    in the state store with an event-time timeout at last_ts + gap, so
    idle users' state is reclaimed instead of growing forever — the
    requirement for a continuous crawl/analytics deployment. After a
    user's state is reclaimed (only possible once the watermark has passed
    last_ts + gap, i.e. any later on-time event starts a new session
    anyway), the session-id counter restarts at 1 — ids are unique within
    a state lifetime, not globally across reclamations.

    Output rows stream per batch (Update mode): (user_id, event_id,
    session_id).
    """
    from typing import Any, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("session_id", LongType()),
    ])
    state_schema = StructType([
        StructField("last_ts", LongType()),
        StructField("session_id", LongType()),
    ])

    def _sessionize(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # idle past the watermark: reclaim, emit nothing
            state.remove()
            return
        (user_id,) = key
        last_ts, sess = state.get if state.exists else (None, 0)
        # Concatenate the group's Arrow chunks BEFORE sorting: a user with
        # more rows than the Arrow batch size arrives as multiple pdfs in
        # arbitrary order, and sorting each chunk independently while
        # threading (last_ts, sess) across them would regress last_ts and
        # mis-assign sessions (code-review r3 finding).
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            ts = pdf["ts"].astype("int64") // 10**9  # epoch seconds
            sessions = []
            for t in ts:
                if last_ts is None or t - last_ts > gap_seconds:
                    sess += 1
                last_ts = int(t)
                sessions.append(sess)
            yield pd.DataFrame({
                "user_id": [int(user_id)] * len(pdf),
                "event_id": pdf["event_id"].astype("int64").to_numpy(),
                "session_id": pd.Series(sessions, dtype="int64").to_numpy(),
            })
        state.update((last_ts, sess))
        # Reclaim idle users' state once the session gap has elapsed in
        # EVENT time: timeout at last_ts + gap, not watermark + gap — fresh
        # events run ahead of the watermark by up to the watermark delay,
        # so a watermark-relative timeout could evict a user whose next
        # event is < gap away and split one session in two (r3 ADVICE).
        # EventTimeTimeout requires a timestamp strictly beyond the current
        # watermark, hence the max() floor.
        state.setTimeoutTimestamp(
            max((last_ts + gap_seconds) * 1000, state.getCurrentWatermarkMs() + 1)
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize, out_schema, state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def ingest_documents_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming ingest of a documents directory: new parquet files are
    discovered as micro-batches — the continuous-crawl → curation handoff."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def streaming_dedup_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Incremental exact dedup on ingest: ``dropDuplicates`` on md5(text)
    keeps one doc per content hash ACROSS micro-batches (state store holds
    the seen-hash set; exactly-once via the sink checkpoint). The streaming
    analog of ``dedup.dedup_exact`` — arriving duplicates of any
    previously-ingested doc are dropped, so the parquet sink only ever
    appends novel content. ``availableNow`` drains the backlog then stops.
    """
    deduped = (
        docs_stream.withColumn("_text_md5", F.md5(F.col(text_col)))
        .dropDuplicates(["_text_md5"])
        .drop("_text_md5")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def neardedup_batch_processor(
    out_dir: str,
    store_dir: str,
    min_matches: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The per-micro-batch function behind
    :func:`streaming_neardedup_ingest`, exposed so its per-batch_id
    idempotence is directly testable: calling it twice with the same
    (batch_df, batch_id) — the ``foreachBatch`` retry case — must leave
    the sink and store byte-identical to one call."""
    import os

    from polipus_spark.functions.dedup import (
        incremental_dedup_pairs, lsh_candidate_pairs, minhash_signature_agg,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession

        def _has_data(d: str) -> bool:
            for _root, _dirs, files in os.walk(d):
                if any(not f.startswith(("_", ".")) for f in files):
                    return True
            return False

        b = batch_df.persist()
        try:
            if os.path.exists(store_dir) and _has_data(store_dir):
                store = (
                    spark.read.option("recursiveFileLookup", "true")
                    .parquet(store_dir)
                )
                hits = incremental_dedup_pairs(
                    spark, b, store_dir, min_matches=min_matches,
                    id_col=id_col, text_col=text_col, store_df=store,
                ).select(F.col("new_id").alias(id_col)).distinct()
                b2 = b.join(hits, id_col, "left_anti")
            else:
                b2 = b
            losers = lsh_candidate_pairs(b2, id_col=id_col, text_col=text_col) \
                .select(F.col("id_b").alias(id_col)).distinct()
            survivors = b2.join(losers, id_col, "left_anti").persist()
            (
                survivors.withColumn("ingest_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch").parquet(out_dir)
            )
            (
                minhash_signature_agg(survivors, id_col, text_col)
                .withColumn("ingest_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch").parquet(store_dir)
            )
            survivors.unpersist()
        finally:
            b.unpersist()

    return _process


def streaming_neardedup_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    min_matches: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Cross-batch NEAR-dup dedup on ingest — the streaming twin of
    ``dedup.incremental_dedup_pairs``.

    Each micro-batch (``foreachBatch``):

      1. probes the persisted minhash signature store — docs whose banded
         signature collides with ANY stored doc and agrees on
         ``min_matches`` of 16 positions are dropped (near-dups of
         anything ingested in ANY earlier batch, not just exact copies);
      2. drops within-batch band-collision losers (min-id survivor, the
         same policy as ``dedup.fuzzy_dedup``);
      3. writes the survivors to the parquet sink and their signatures
         to the store (both under this batch's ``ingest_batch=`` partition),
         so the NEXT batch probes against them.

    Consistency — idempotent per batch_id, hence effectively-once:
    ``foreachBatch`` is at-least-once, so BOTH writes are batch_id-scoped
    dynamic-partition overwrites (``ingest_batch={batch_id}``): a
    micro-batch retry recomputes the same survivor set (the store probe is
    self-match-excluded, so a failed attempt's own store partition never
    drops a survivor) and overwrites the same two partitions instead of
    appending duplicates. The probe reads the store with
    ``recursiveFileLookup`` so a root-level store pre-built by
    :func:`build_minhash_store` composes with the partitioned streaming
    appends. The store stays ~130 B/doc, probed by broadcast — the 100 TB
    posture of the batch operator, per micro-batch."""
    _process = neardedup_batch_processor(
        out_dir, store_dir, min_matches=min_matches,
        id_col=id_col, text_col=text_col,
    )
    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    window_sec: int,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of ``operators.funnel.funnel_levels``: per-user
    funnel depth maintained ACROSS micro-batches via
    ``applyInPandasWithState``.

    State per user = the batch fold's accumulator ``(level, t1_us,
    tlast_us)``; each micro-batch sorts its arriving step events and
    resumes the greedy chain exactly where the previous batch left it, so
    feeding the same events through in arrival order reproduces the batch
    operator row-for-row (pinned by test). Same in-order contract as
    ``streaming_sessionize``: an event arriving in a later batch than a
    chronologically-later event cannot retroactively rewrite a locked
    chain.

    Emits (user_id, level, t1_us) in Update mode — one refreshed row per
    user per batch that advanced it. State is reclaimed with an event-time
    timeout at ``t1 + window``: past the anchor window NOTHING can extend
    the chain (the level-k condition requires ts <= t1 + window), so the
    user's funnel is final and the store stays bounded by ACTIVE windows,
    not by users ever seen — the requirement for a continuous deployment.
    """
    from typing import Any, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )

    if not steps:
        raise ValueError("steps must be a non-empty event-type sequence")
    w_us = window_sec * 1_000_000
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("level", IntegerType()),
        StructField("t1_us", LongType()),
    ])
    state_schema = StructType([
        StructField("level", IntegerType()),
        StructField("t1_us", LongType()),
        StructField("tlast_us", LongType()),
    ])

    def _funnel(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # window closed: the chain is final
            state.remove()
            return
        (user_id,) = key
        level, t1, tlast = state.get if state.exists else (0, 0, 0)
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        us_col = pdf["ts"].astype("int64") // 1_000  # ns → µs
        advanced = False
        for us, et in zip(us_col, pdf["event_type"]):
            us = int(us)
            if level == 0 and et == steps[0]:
                level, t1, tlast = 1, us, us
                advanced = True
            elif (0 < level < len(steps) and et == steps[level]
                  and us > tlast and us <= t1 + w_us):
                level, tlast = level + 1, us
                advanced = True
        if advanced:
            yield pd.DataFrame({
                "user_id": [int(user_id)],
                "level": pd.Series([level], dtype="int32"),
                "t1_us": pd.Series([t1], dtype="int64"),
            })
        if level >= 1:
            # pre-anchor users store NOTHING (the greedy fold ignores
            # events before the anchor, so there is nothing to remember
            # and no timeout that would ever reclaim a level-0 entry)
            state.update((int(level), int(t1), int(tlast)))
            # event-time timeout at the window close (ms); the watermark
            # floor is required by EventTimeTimeout semantics
            state.setTimeoutTimestamp(
                max((t1 + w_us) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1)
            )

    return (
        events.where(F.col("event_type").isin(steps))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel, out_schema, state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
