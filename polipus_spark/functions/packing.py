"""Training sequence packing: fill fixed token budgets from chunk streams.

After chunking (text.chunk_docs), training pipelines pack chunks into
fixed-budget sequences to avoid padding waste. Packing is inherently
sequential (each placement depends on what is already packed), so it is
distributed the way real pipelines do it: chunks are hash-bucketed into
independent bins, and each bin packs ITS OWN chunks greedily inside one
Arrow ``applyInPandas`` group. Bins are embarrassingly parallel — linear
scale-out — and the packing-quality loss vs a global greedy pass is
negligible once every bin holds ≫ budget tokens.

Determinism: bin assignment is a pure hash of doc_id, and packing order
inside a bin is (doc_id, chunk_id) — the same rows produce the same
sequences at any parallelism, like everything else in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType,
)

# DataType objects, not DDL strings: worker-side re-import has no session.
_PACKED_SCHEMA = StructType([
    StructField("bin", IntegerType()),
    StructField("seq_id", LongType()),
    StructField("doc_id", LongType()),
    StructField("chunk_id", IntegerType()),
    StructField("n_words", IntegerType()),
])


def pack_sequences(
    chunks: DataFrame,
    budget: int = 256,
    n_bins: int = 64,
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    len_col: str = "n_words",
) -> DataFrame:
    """Greedy first-fit packing → (bin, seq_id, doc_id, chunk_id, n_words).

    Each output row is an input chunk with its assigned sequence; a
    sequence never exceeds ``budget`` words unless a single chunk alone is
    bigger (then it gets its own sequence). ``seq_id`` is globally unique:
    ``bin * 2^32 + local_seq``. One narrow shuffle on the bin key, then
    pure-pandas packing per bin.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["doc_id", "chunk_id"], kind="mergesort")
        seqs, fill = [], 0
        local = -1
        for n in pdf["n_words"]:
            n = int(n)
            if local < 0 or fill + n > budget:
                local += 1
                fill = 0
            fill += n
            seqs.append(local)
        b = int(pdf["bin"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame({
            "bin": pdf["bin"].astype("int32"),
            "seq_id": [(b << 32) + s for s in seqs],
            "doc_id": pdf["doc_id"].astype("int64"),
            "chunk_id": pdf["chunk_id"].astype("int32"),
            "n_words": pdf["n_words"].astype("int32"),
        })

    # bin = md5-derived hash of doc_id (NOT xxhash64): deterministic in any
    # engine, so the DuckDB oracle can replay the identical bin assignment
    # (r3: pack_sequences graduated from rows-only to hash-oracled).
    bin_hash = F.pmod(
        F.conv(F.substring(F.md5(F.col(doc_col).cast("string")), 1, 7), 16, 10)
        .cast("bigint"),
        F.lit(n_bins),
    )
    binned = chunks.select(
        bin_hash.cast("int").alias("bin"),
        F.col(doc_col).cast("long").alias("doc_id"),
        F.col(chunk_col).cast("int").alias("chunk_id"),
        F.col(len_col).cast("int").alias("n_words"),
    )
    return binned.groupBy("bin").applyInPandas(_pack, _PACKED_SCHEMA)


def packing_efficiency(packed: DataFrame, budget: int = 256) -> DataFrame:
    """(n_sequences, total_words, fill_pct): padding-waste report —
    fill_pct = 100·total_words / (n_sequences·budget)."""
    seqs = packed.groupBy("seq_id").agg(F.sum("n_words").alias("w"))
    # coalesce the empty-input case: zero sequences → sums are NULL and the
    # fill ratio divides 0/0 — report exact zeros instead (an empty corpus
    # packed is 0 sequences at 0% fill, not a crash downstream)
    return seqs.agg(
        F.count("*").alias("n_sequences"),
        F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("total_words"),
        F.coalesce(
            (F.sum(F.least(F.col("w"), F.lit(budget))) * 100 /
             (F.count("*") * budget)).cast("int"),
            F.lit(0),
        ).alias("fill_pct"),
    )
