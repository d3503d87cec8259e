"""BM25 lexical retrieval over the documents table — the sparse twin of
the dense ANN family (similarity.py), completing the retrieval surface a
curation pipeline needs (eval-set decontamination lookups, targeted data
selection, lexical near-search).

Scale shape: ONE corpus pass builds the postings (term, doc, tf) via
explode + map-side-combining groupBy; document lengths and per-term doc
frequencies are aggregations over the postings, and the query side is
tiny — query terms and the query-restricted df/idf table broadcast, so
scoring touches only the postings rows whose term appears in some query
(a broadcast semi-join prune of the corpus-proportional side). Per-score
parts fold in term order (`array_sort(collect_list(...))`), so exact
score ties are bitwise ties in any engine and the doc-id tiebreak is
deterministic — the same discipline as pq_topk's ADC sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import words


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id: str = "query_id",
    q_text: str = "text",
) -> DataFrame:
    """Top-k docs per query by BM25 → (query_id, doc_id, rank).

    idf = ln((N − df + ½)/(df + ½) + 1) (the always-positive Lucene
    variant); query terms are deduplicated. avgdl is computed as
    exact-integer sum(dl)/N in one division so every engine derives the
    identical double."""
    toks = (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(words(F.col(text_col))).alias("term"))
        .groupBy("id", "term").agg(F.count("*").alias("tf"))
    )
    dl = toks.groupBy("id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n"),
    )
    qt = queries.select(
        F.col(q_id).alias("query_id"),
        F.explode(F.array_distinct(words(F.col(q_text)))).alias("term"),
    )
    dfq = (
        toks.groupBy("term").agg(F.count("*").alias("df"))
        .join(F.broadcast(qt.select("term").distinct()), "term")
    )
    idf = F.log(
        ((F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
        + F.lit(1.0)
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                       + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    parts = (
        toks.join(F.broadcast(qt), "term")
        .join(dl, "id")
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "id", "term", (idf * tf_norm).alias("_part"))
    )
    scored = parts.groupBy("query_id", "id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "_part"))),
                lambda s: s["_part"],
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ).alias("_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("doc_id"),
                F.col("rank").cast("int").alias("rank"))
    )
