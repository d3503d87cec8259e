"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

  * **brute-force cosine top-k** — the correctness baseline: a crossJoin of
    queries × corpus with a JVM-side dot product (``F.zip_with`` +
    ``F.aggregate`` — no Python), window top-k per query. O(Q·N): fine when
    the query side is small and broadcastable.
  * **IVF (inverted-file) assignment** — the scale path: corpus vectors are
    assigned to their nearest of K centroids (one broadcast join against K
    rows); a query then probes only its centroid's partition, cutting the
    scan by ~K×. Centroid selection here is deterministic (first K corpus
    vectors by id) so results are reproducible and SQL-oracle-able; a
    k-means refinement would slot in without changing the dataflow.
  * **LSH (random hyperplane)** — sign-bit sketch, md5-derived hyperplanes,
    bucketed self-join for near-candidates; deterministic.

Similarity ordering uses exact float math in both engines but emitted
columns are ids/ranks (integers) so oracle hash-comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query → (query_id, neighbor_id, rank).

    Broadcast the query side (it is the small one); the corpus streams.
    Self-matches (same id) are excluded.
    """
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest deterministic centroid.

    Centroids = the first ``n_centroids`` corpus vectors by id (reproducible;
    swap in k-means output for quality without touching the dataflow).
    Output: (vec_id, centroid_id).
    """
    w_all = Window.orderBy(F.col(id_col))
    cents = (
        corpus.orderBy(F.col(id_col)).limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cent"))
    )
    scored = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")).crossJoin(
        F.broadcast(cents)
    ).withColumn("_sim", cosine(F.col("_v"), F.col("_cent")))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 8,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the query's ``n_probe`` nearest centroid partitions
    only — the candidate set shrinks ~(n_centroids/n_probe)×."""
    assign = ivf_assign(corpus, n_centroids, id_col, vec_col)
    corpus_p = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).join(assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")

    cents = (
        corpus.orderBy(F.col(id_col)).limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cent"))
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    q_probe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_sim_c", cosine(F.col("_qv"), F.col("_cent")))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_sim_c").desc(), F.col("centroid_id").asc()
    )
    q_probe = (
        q_probe.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "_qv", "centroid_id")
    )
    scored = (
        q_probe.join(corpus_p, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh_prefilter: bool = False,
    n_bits: int = 8,
    dim: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine > threshold).

    Baseline = full self-join with a JVM-side cosine (correct, O(n²) — fine
    when one side broadcasts). Scale path = ``use_lsh_prefilter``: only pairs
    sharing a hyperplane-sketch bucket are scored (recall < 1 by design,
    governed by n_bits)."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if use_lsh_prefilter:
        cand = lsh_bucket_candidates(corpus, n_bits, dim, id_col, vec_col)
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("_sim", cosine(F.col("_va"), F.col("_vb")))
        .where(F.col("_sim") > threshold)
        .select("id_a", "id_b")
    )


def hyperplane_bits(vec: Column, n_bits: int = 8, dim: int = 16) -> Column:
    """Random-hyperplane LSH sketch: bit j = sign(dot(v, h_j)) with
    h_j[d] = (md5-derived uniform in [-0.5, 0.5]). Deterministic."""
    import hashlib

    acc = F.lit(0)
    for j in range(n_bits):
        comps = [
            (int(hashlib.md5(f"hp{j}#{d}".encode()).hexdigest()[:15], 16) / float(2**60))
            - 0.5
            for d in range(dim)
        ]
        plane = F.array(*[F.lit(c) for c in comps])
        d = dot(vec, plane)
        acc = acc + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc.cast("bigint")


def lsh_bucket_candidates(
    corpus: DataFrame,
    n_bits: int = 8,
    dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate embedding candidates: same hyperplane sketch bucket."""
    sk = corpus.select(
        F.col(id_col).alias("id"), hyperplane_bits(F.col(vec_col), n_bits, dim).alias("bucket")
    )
    l, r = sk.alias("l"), sk.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )
