"""Distributed BPE merge training — the tokenizer-training step of a
training-data pipeline, as iterative vocab-table dataflow.

Byte-pair encoding (Sennrich et al. 2016, public algorithm): start from
per-word character symbols, repeatedly merge the globally most frequent
adjacent symbol pair. The scale shape is the important part:

  * ONE corpus-proportional pass total — the word-count aggregation.
    Everything after runs on the VOCAB table (distinct words × count),
    which is ~10^5-10^6 rows no matter how many TB the corpus is
    (Heaps' law), so n_merges iterations cost n_merges tiny jobs, not
    n_merges corpus scans.
  * Each iteration is two map-side-combining aggregations over the vocab
    frame plus a 1-row driver collect (the argmax pair — bounded, like
    topk.py's threshold sample) and one Column ``replace``.
  * ``localCheckpoint`` per iteration keeps the plan flat (same pattern
    as kmeans_centroids / pq_train).

Symbol strings are stored paren-delimited — ``hello`` → ``(h)(e)(l)(l)(o)``
— so applying merge (l, l) is the LITERAL string replace
``(l)(l) → (ll)``: non-overlapping left-to-right scan is exactly BPE's
greedy merge order, every engine's ``replace`` implements it identically
(the DuckDB oracle replays it bit-for-bit), and no UDF is needed.
Words are lowercased and stripped to [a-z0-9] first so a symbol can never
contain a delimiter; no end-of-word marker is appended (documented
simplification — merges never cross word boundaries anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import words


def bpe_vocab(docs: DataFrame, text_col: str = "text",
              min_len: int = 2) -> DataFrame:
    """(s, cnt): paren-delimited character symbols per distinct word.

    The single corpus-proportional step of BPE training."""
    from polipus_spark.partitioning import spread

    return (
        spread(docs).select(F.explode(words(F.col(text_col))).alias("w"))
        .select(F.regexp_replace("w", "[^a-z0-9]", "").alias("w"))
        .where(F.length("w") >= min_len)
        .groupBy("w").agg(F.count("*").alias("cnt"))
        .select(F.regexp_replace("w", "(.)", r"($1)").alias("s"), "cnt")
    )


def _symbols(s: Column) -> Column:
    return F.regexp_extract_all(s, F.lit(r"\(([^)]*)\)"), 1)


def bpe_train(docs: DataFrame, n_merges: int = 8, text_col: str = "text",
              min_len: int = 2) -> DataFrame:
    """Train ``n_merges`` BPE merges → (merge_rank, lhs, rhs, pair_count).

    Deterministic: pair argmax breaks ties by (count DESC, left ASC,
    right ASC); the DuckDB oracle replays the identical unrolled
    iterations, so ranks, pairs, and counts hash-match."""
    spark = docs.sparkSession
    vocab = bpe_vocab(docs, text_col, min_len).localCheckpoint(eager=True)
    merges = []
    for rank in range(1, n_merges + 1):
        # bind the symbol array once per row (CSE trap: referencing the
        # regex extraction expression per pair index would re-extract)
        with_syms = vocab.select("cnt", _symbols(F.col("s")).alias("_sym")) \
            .where(F.size("_sym") >= 2)
        pairs = (
            with_syms.select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("_sym") - 1),
                        lambda j: F.struct(
                            F.element_at(F.col("_sym"), j).alias("l"),
                            F.element_at(F.col("_sym"), j + 1).alias("r"),
                        ),
                    )
                ).alias("_p"),
            )
            .groupBy(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"))
            .agg(F.sum("cnt").alias("pc"))
        )
        best = pairs.orderBy(F.col("pc").desc(), F.col("l").asc(),
                             F.col("r").asc()).limit(1).collect()
        if not best:
            break
        left, right, pc = best[0]["l"], best[0]["r"], best[0]["pc"]
        merges.append((rank, left, right, int(pc)))
        vocab = vocab.select(
            F.replace(
                F.col("s"),
                F.lit(f"({left})({right})"),
                F.lit(f"({left}{right})"),
            ).alias("s"),
            "cnt",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count long"
    )


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]],
                text_col: str = "text", min_len: int = 2) -> DataFrame:
    """Apply a trained merge list to the corpus → (word, pieces).

    One Column pipeline: wrap, replay every merge in rank order (each a
    literal replace — the same greedy scan as training), unwrap. Purely
    map-side; at 100 TB this is the tokenizer's segmentation pass."""
    s = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("word")), "[^a-z0-9]", ""),
        "(.)", r"($1)")
    for left, right in merges:
        s = F.replace(s, F.lit(f"({left})({right})"), F.lit(f"({left}{right})"))
    from polipus_spark.partitioning import spread

    return (
        spread(docs).select(F.explode(words(F.col(text_col))).alias("word"))
        .select(F.regexp_replace("word", "[^a-z0-9]", "").alias("word"))
        .where(F.length("word") >= min_len)
        .dropDuplicates(["word"])
        .select("word", _symbols(s).alias("pieces"))
    )
