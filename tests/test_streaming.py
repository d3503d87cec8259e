"""Structured Streaming variants: frontier drain + windowed metrics."""

import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from polipus_spark.catalog import SnapshotCatalog
from polipus_spark.config import CrawlOptions
from polipus_spark.operators.frontier import Frontier
from polipus_spark.streaming.waves import drain_frontier, streaming_metrics


def test_drain_frontier_available_now(spark, work_dir):
    from tests.test_queue import PUSH_SCHEMA, _urls_df

    fr = Frontier(SnapshotCatalog(spark, work_dir), CrawlOptions())
    fr.push(_urls_df(spark, [f"http://h.example.com/p/{i}" for i in range(20)]),
            wave=0, next_seq=0)
    fr.push(_urls_df(spark, [f"http://h.example.com/q/{i}" for i in range(10)]),
            wave=1, next_seq=20)

    seen_batches = []

    def process(batch_df, batch_id):
        seen_batches.append(batch_df.count())

    q = drain_frontier(spark, fr.table, process, tempfile.mkdtemp())
    q.awaitTermination(120)
    assert sum(seen_batches) == 30  # every pushed row drained exactly once


def test_streaming_metrics_window(spark):
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    src = spark.readStream.format("rate").option("rowsPerSecond", "50").load() \
        .select(F.col("timestamp").alias("ts"),
                F.when(F.col("value") % 2 == 0, "fetch").otherwise("error").alias("event_type"),
                F.col("value").cast("double"))
    agg = streaming_metrics(src, window="10 seconds", watermark="10 seconds")
    q = (agg.writeStream.outputMode("update").format("memory")
         .queryName("m_out").start())
    try:
        q.processAllAvailable()
        import time
        time.sleep(2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM m_out").collect()
        assert {r["event_type"] for r in rows} <= {"fetch", "error"}
    finally:
        q.stop()


def test_streaming_dedup_ingest(spark):
    """Micro-batched ingest dedup: duplicates arriving in LATER batches of
    a restarted stream are dropped by the checkpointed state — the sink
    holds one doc per content hash across the whole ingest history."""
    import os

    from polipus_spark.streaming.waves import (
        ingest_documents_stream, streaming_dedup_ingest,
    )

    base = tempfile.mkdtemp()
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    batch1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")], schema)
    batch1.write.mode("append").parquet(src)
    q = streaming_dedup_ingest(
        ingest_documents_stream(spark, src, schema), out, ckpt)
    q.awaitTermination(120)

    # duplicate of batch-1 content + one novel doc arrive later; restart
    spark.createDataFrame(
        [(4, "alpha text"), (5, "gamma text")], schema
    ).write.mode("append").parquet(src)
    q2 = streaming_dedup_ingest(
        ingest_documents_stream(spark, src, schema), out, ckpt)
    q2.awaitTermination(120)

    got = {r["text"] for r in spark.read.parquet(out).collect()}
    assert got == {"alpha text", "beta text", "gamma text"}
    assert spark.read.parquet(out).count() == 3


def test_streaming_neardedup_ingest(spark):
    """Cross-batch NEAR-dup streaming ingest: a later batch's paraphrase of
    an earlier batch's doc (one word changed — minhash agrees on ≥12/16
    positions, no exact-hash match) is dropped by the persisted signature
    store; novel docs survive; within-batch band-collision losers drop
    too; the store grows by exactly the survivors."""
    import os

    from polipus_spark.streaming.waves import (
        ingest_documents_stream, streaming_neardedup_ingest,
    )

    base = tempfile.mkdtemp()
    src, out, ckpt, store = (
        os.path.join(base, d) for d in ("src", "out", "ckpt", "store"))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    long_a = ("the quick brown fox jumps over the lazy dog near the quiet "
              "river bank every single morning before sunrise arrives while "
              "fishermen prepare their small wooden boats and seagulls circle "
              "slowly above the misty harbor waiting for the first catch of "
              "the day to surface from the cold green water below the pier")
    long_b = ("completely different content about distributed systems and "
              "columnar storage engines processing petabytes of data daily")
    spark.createDataFrame(
        [(1, long_a), (2, long_b)], schema).write.mode("append").parquet(src)
    q = streaming_neardedup_ingest(
        ingest_documents_stream(spark, src, schema), out, ckpt, store)
    q.awaitTermination(180)
    assert spark.read.parquet(out).count() == 2

    # one word changed: measured signature agreement 15/16 ≥ the 12 gate,
    # with a band collision — a true near-dup, not an exact copy
    near_a = long_a.replace("misty", "xyzzy")
    novel = ("entirely new prose describing alpine meadows and the slow "
             "migration of glaciers across ancient valleys over millennia")
    spark.createDataFrame(
        [(3, near_a), (4, novel)], schema).write.mode("append").parquet(src)
    q2 = streaming_neardedup_ingest(
        ingest_documents_stream(spark, src, schema), out, ckpt, store)
    q2.awaitTermination(180)

    ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert ids == {1, 2, 4}  # 3 caught by the store as a near-dup of 1
    assert spark.read.parquet(store).count() == 3  # one signature/survivor


def test_neardedup_batch_retry_is_idempotent(spark):
    """foreachBatch is at-least-once: replaying the SAME (batch, batch_id)
    — the retry case — must leave sink and store identical to one run
    (batch-scoped dynamic-partition overwrite, not append). Covers both
    retry orders: a fresh batch replayed, and a batch replayed AFTER its
    own first attempt already committed the store partition (the case
    where the probe sees the batch's own signatures)."""
    import os

    from polipus_spark.streaming.waves import neardedup_batch_processor

    base = tempfile.mkdtemp()
    out, store = os.path.join(base, "out"), os.path.join(base, "store")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    long_a = ("the quick brown fox jumps over the lazy dog near the quiet "
              "river bank every single morning before sunrise arrives while "
              "fishermen prepare their small wooden boats and seagulls circle "
              "slowly above the misty harbor waiting for the first catch")
    near_a = long_a.replace("misty", "foggy")  # in-batch near-dup pair
    novel = ("entirely new prose describing alpine meadows and the slow "
             "migration of glaciers across ancient valleys over millennia")
    batch = spark.createDataFrame(
        [(1, long_a), (2, near_a), (3, novel)], schema)
    proc = neardedup_batch_processor(out, store, min_matches=12)

    proc(batch, 0)
    first = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert first == [1, 3]  # 2 dropped as in-batch near-dup loser
    # retry AFTER commit: the store already holds this batch's survivors
    proc(batch, 0)
    again = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert again == first  # no duplicated sink rows, no mis-dropped doc
    assert spark.read.parquet(store).count() == 2  # one signature/survivor

    # a later batch still probes the (non-duplicated) store correctly
    batch2 = spark.createDataFrame(
        [(9, long_a.replace("quiet", "silent"))], schema)
    proc(batch2, 1)
    proc(batch2, 1)
    final = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert final == [1, 3]  # 9 is a near-dup of stored 1
    assert spark.read.parquet(store).count() == 2


def test_streaming_sessionize_stateful(spark):
    """applyInPandasWithState sessionization: per-user state (last_ts,
    session counter) carries ACROSS micro-batches — the streaming twin of
    the batch events_sessionize query. Two files, maxFilesPerTrigger=1 ⇒
    two micro-batches; sessions opened in batch 1 continue in batch 2 and
    a >gap silence opens a new one."""
    import datetime as dt
    import tempfile

    from polipus_spark.streaming.waves import streaming_sessionize

    base = dt.datetime(2024, 1, 1)
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
    ])

    def mk(rows):
        return spark.createDataFrame(
            [(base + dt.timedelta(seconds=s), e, u) for s, e, u in rows], schema
        )

    src = tempfile.mkdtemp(prefix="sess_src_")
    # batch 1: user 1 two events in one session; user 2 one event
    mk([(0, 1, 1), (100, 2, 1), (0, 10, 2)]).coalesce(1).write.mode(
        "append").parquet(src)
    # batch 2: user 1 continues <gap (same session) then >gap (new session);
    # user 2 silent 2000s > gap ⇒ new session
    mk([(200, 3, 1), (4000, 4, 1), (2000, 11, 2)]).coalesce(1).write.mode(
        "append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_sessionize(stream, gap_seconds=1800)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("sess_out").trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["event_id"]): r["session_id"]
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        q.stop()
    assert got == {
        (1, 1): 1, (1, 2): 1,   # batch 1, one session
        (1, 3): 1,              # batch 2: 100s gap — session continues
        (1, 4): 2,              # 3800s gap — new session
        (2, 10): 1,
        (2, 11): 2,             # 2000s > 1800s gap
    }


def test_streaming_sessionize_survives_watermark_lead(spark):
    """r3 ADVICE regression: the state timeout must be based on the GROUP'S
    clock (last_ts + gap), not watermark + gap. Fresh events run ahead of
    the watermark by the watermark delay, so the old watermark-relative
    timeout evicted users whose next event was < gap away — splitting one
    session and restarting the id counter. Here user 1 opens sessions 1-2
    in batch 1, sits silent while OTHER users advance the watermark past
    (initial watermark + gap) but NOT past (last_ts + gap), then returns
    within the gap: the event must continue session 2 (eviction would
    restart at 1)."""
    import datetime as dt
    import tempfile

    from polipus_spark.streaming.waves import streaming_sessionize

    base = dt.datetime(2024, 1, 1)
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
    ])

    def mk(rows):
        return spark.createDataFrame(
            [(base + dt.timedelta(seconds=s), e, u) for s, e, u in rows], schema
        )

    src = tempfile.mkdtemp(prefix="sess_wm_")
    # gap=300s, watermark delay=1800s. Batch watermarks (maxFilesPerTrigger=1):
    # during b1: 0; during b2: 0; during b3: 310; during b4: 320.
    mk([(100, 1, 1), (1000, 2, 1), (100, 10, 2)]).coalesce(1).write.mode(
        "append").parquet(src)
    mk([(2110, 11, 2)]).coalesce(1).write.mode("append").parquet(src)
    # b3: user 1 silent; watermark 310 > (0 + gap) would fire the OLD
    # timeout, but < last_ts+gap = 1300 so the fixed timeout holds state.
    mk([(2120, 12, 2)]).coalesce(1).write.mode("append").parquet(src)
    # b4: user 1 returns 290s after last_ts (< gap) — same session 2.
    mk([(1290, 3, 1)]).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_sessionize(stream, gap_seconds=300, watermark="30 minutes")
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("sess_wm_out").trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
        got = {
            (r["user_id"], r["event_id"]): r["session_id"]
            for r in spark.sql("SELECT * FROM sess_wm_out").collect()
        }
    finally:
        q.stop()
    assert got == {
        (1, 1): 1, (1, 2): 2,   # two sessions in batch 1 (900s > 300s gap)
        (1, 3): 2,              # 290s < gap: session 2 CONTINUES across b1->b4
        (2, 10): 1, (2, 11): 2, (2, 12): 2,
    }


def test_streaming_funnel_matches_batch(spark):
    """The stateful streaming funnel resumes the greedy chain across
    micro-batches and its final per-user rows equal the batch
    funnel_levels operator on the same events."""
    import datetime as dt
    import tempfile

    from polipus_spark.operators.funnel import funnel_levels
    from polipus_spark.streaming.waves import streaming_funnel

    base = dt.datetime(2024, 1, 1)
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ])

    def mk(rows):
        return spark.createDataFrame(
            [(base + dt.timedelta(seconds=s), e, u, et)
             for s, e, u, et in rows], schema)

    steps, window = ["view", "click", "purchase"], 3600
    # batch 1: u1 view+click; u2 view; u3 click only (no anchor)
    b1 = [(0, 1, 1, "view"), (600, 2, 1, "click"),
          (0, 10, 2, "view"), (0, 20, 3, "click")]
    # batch 2: u1 purchase inside window (level 3); u2 click OUTSIDE the
    # 1h window (stays level 1); u3 view (anchors now)
    b2 = [(1200, 3, 1, "purchase"), (5000, 11, 2, "click"),
          (100, 21, 3, "view")]

    src = tempfile.mkdtemp(prefix="funnel_src_")
    mk(b1).coalesce(1).write.mode("append").parquet(src)
    mk(b2).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_funnel(stream, steps, window_sec=window)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("funnel_out").trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
        rows = spark.sql(
            "SELECT * FROM funnel_out ORDER BY user_id, level").collect()
    finally:
        q.stop()
    # last (highest-level) row per user is the final funnel state
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["level"], r["t1_us"])

    batch = {r["user_id"]: (r["level"], r["t1_us"])
             for r in funnel_levels(mk(b1 + b2), steps, window_sec=window)
             .collect()}
    assert final == batch
    assert final[1][0] == 3 and final[2][0] == 1 and final[3][0] == 1
