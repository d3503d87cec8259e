"""Benchmark decontamination for training corpora.

Before training, every corpus is screened against the evaluation benchmarks:
a document sharing a long-enough word n-gram with any benchmark item is
contaminated and must be dropped (or flagged). The standard screen is
8-word-gram overlap.

Spark shape at 100 TB: the benchmark side is tiny (thousands of items), the
corpus side is everything — so the benchmark's n-gram hash set is BROADCAST
and the corpus-side explode joins against it map-side; the only shuffle is
the per-doc hit-count groupBy on the narrow doc-id key. N-grams are hashed
to 60-bit md5 ints before the join so the broadcast table stays a few MB at
any benchmark size (and the oracle reproduces the identical hash in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polipus_spark.functions.text import h60_str, word_ngrams


def ngram_hashes(
    df: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct 60-bit hashes of the word n-grams per row → (id, h)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    word_ngrams(F.col(text_col), n), lambda g: h60_str(g)
                )
            )
        ).alias("h"),
    )


def contamination_counts(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_contaminated): how many distinct doc n-grams appear in ANY
    benchmark item. Zero rows are kept (every doc gets a count)."""
    bench_h = (
        ngram_hashes(benchmark, n, bench_id_col, bench_text_col)
        .select("h").distinct()
    )
    doc_h = ngram_hashes(docs, n, id_col, text_col)
    hits = (
        doc_h.join(F.broadcast(bench_h), "h", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated", F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_hits: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop docs with more than ``max_hits`` overlapping n-grams."""
    counts = contamination_counts(docs, benchmark, n, id_col, text_col)
    keep = counts.where(F.col("n_contaminated") <= max_hits).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")
