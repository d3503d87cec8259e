"""Sequence packing: greedy first-fit correctness, budget respect,
determinism, and end-to-end from chunk_docs."""

from pyspark.sql import functions as F


def _chunks(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, chunk_id int, n_words int"
    )


def test_pack_greedy_budget_and_order(spark):
    from polipus_spark.functions.packing import pack_sequences

    # single bin so the greedy order is fully determined
    rows = [(1, 0, 100), (1, 1, 100), (1, 2, 100), (2, 0, 50), (2, 1, 300)]
    out = pack_sequences(_chunks(spark, rows), budget=256, n_bins=1).collect()
    got = {(r["doc_id"], r["chunk_id"]): r["seq_id"] for r in out}
    # order (1,0)(1,1)(1,2)(2,0)(2,1): 100+100=200 fits; +100 → new seq;
    # 100+50=150 fits; 300 > budget alone → its own seq
    assert got[(1, 0)] == got[(1, 1)]
    assert got[(1, 2)] == got[(2, 0)] != got[(1, 0)]
    assert got[(2, 1)] not in (got[(1, 0)], got[(1, 2)])
    assert len(out) == 5  # every chunk assigned exactly once


def test_pack_budget_never_exceeded_except_oversize(spark):
    from polipus_spark.functions.packing import pack_sequences

    rows = [(d, c, 37 + (d * 7 + c * 13) % 200) for d in range(20) for c in range(4)]
    out = pack_sequences(_chunks(spark, rows), budget=256, n_bins=8)
    sums = out.groupBy("seq_id").agg(
        F.sum("n_words").alias("w"), F.count("*").alias("n")
    ).collect()
    for r in sums:
        assert r["w"] <= 256 or r["n"] == 1
    # determinism at a different parallelism
    a = sorted((r["doc_id"], r["chunk_id"], r["seq_id"])
               for r in out.collect())
    b = sorted((r["doc_id"], r["chunk_id"], r["seq_id"])
               for r in pack_sequences(
                   _chunks(spark, rows).repartition(13), budget=256, n_bins=8
               ).collect())
    assert a == b


def test_pack_from_chunk_docs_and_efficiency(spark):
    from polipus_spark.functions.packing import pack_sequences, packing_efficiency
    from polipus_spark.functions.text import chunk_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_docs(docs, chunk=64, overlap=8)
    packed = pack_sequences(chunks, budget=256, n_bins=4)
    assert packed.count() == chunks.count()
    eff = packing_efficiency(packed, budget=256).collect()[0]
    assert eff["n_sequences"] > 0
    assert 50 <= eff["fill_pct"] <= 100  # greedy should fill reasonably


def test_packing_efficiency_empty_input(spark):
    """An empty packed frame reports exact zeros, not NULLs — a fully
    filtered-away corpus must not crash the curation script's report."""
    from pyspark.sql import functions as F  # noqa: F401

    from polipus_spark.functions.packing import (
        pack_sequences, packing_efficiency,
    )

    empty = spark.createDataFrame(
        [], "doc_id bigint, chunk_id int, text string, n_words int")
    row = packing_efficiency(
        pack_sequences(empty, budget=256), budget=256).collect()[0]
    assert (row["n_sequences"], row["total_words"], row["fill_pct"]) \
        == (0, 0, 0)
