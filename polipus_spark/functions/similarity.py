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
    from polipus_spark.partitioning import spread

    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    c = spread(corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("_cv")))
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


def mips_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Maximum-inner-product top-k via the norm-augmentation reduction to
    cosine search (the classic MIPS→NNS transform): every corpus vector
    gains one dimension sqrt(M² − ‖x‖²) where M = max corpus norm, every
    query gains 0 — augmented norms are the constant M, so cosine ORDER
    in the augmented space equals inner-product order in the original.
    This is the transform that lets the whole cosine ANN stack (IVF, PQ,
    IVF-PQ, LSH) serve dot-product retrieval (the scoring used by
    DSSM-style retrievers) unchanged: at scale, swap this exact
    brute-force leg for ``ivf_topk``/``ivfpq_topk`` over the SAME
    augmented column. M² arrives as a broadcast 1-row max (no driver
    collect); output (query_id, neighbor_id, rank) with the same
    neighbor-id tie-break as every other search op."""
    c = corpus.select(F.col(c_id).alias("nid"),
                      F.transform(F.col(c_vec),
                                  lambda x: x.cast("double")).alias("_cv"))
    c = c.withColumn("_n2", dot(F.col("_cv"), F.col("_cv")))
    m2 = c.agg(F.max("_n2").alias("_m2"))
    aug_c = (
        c.crossJoin(F.broadcast(m2))
        .select(
            "nid",
            F.concat(
                F.col("_cv"),
                F.array(F.sqrt(F.greatest(F.col("_m2") - F.col("_n2"),
                                          F.lit(0.0)))),
            ).alias("_acv"),
        )
    )
    aug_q = queries.select(
        F.col(q_id).alias("qid"),
        F.concat(
            F.transform(F.col(q_vec), lambda x: x.cast("double")),
            F.array(F.lit(0.0)),
        ).alias("_aqv"),
    )
    return brute_force_topk(aug_q, aug_c, k=k, q_id="qid", q_vec="_aqv",
                            c_id="nid", c_vec="_acv")


def negative_mining(
    queries: DataFrame,
    corpus: DataFrame,
    k_exclude: int = 5,
    n_neg: int = 5,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    q_vec: str = "embedding",
    c_vec: str = "embedding",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training data:
    per query, EXCLUDE the ``k_exclude`` most-cosine-similar corpus
    vectors (the likely positives / near-duplicates a contrastive loss
    must not see as negatives) plus the query itself, then keep
    ``n_neg`` negatives by md5(query_id||neighbor_id) rank — the member
    set is a pure function of the inputs, so pair generation is
    reproducible and resumable across epochs.

    Output: (query_id, neighbor_id, neg_rank).

    Scale posture: the exclusion set is k_exclude rows per query
    (broadcast); candidate enumeration here is corpus × broadcast(query)
    — exact and oracle-able at test scale. At 100 TB one prefilters the
    corpus side with ``sampling.hash_bps`` on the pair key to ~a few ×
    n_neg expected survivors per query before scoring; the md5-rank
    selection is exactness-preserving under that prefilter as long as
    ≥ n_neg eligible candidates survive per query (same argument as
    balanced_sample's prefilter), because the kept set is the rank
    prefix of the SAME global hash order. Swap brute-force exclusion for
    ``ivf_topk`` at scale; its overfetch+re-rank output is the same
    (query_id, neighbor_id) frame."""
    top = brute_force_topk(queries, corpus, k=k_exclude,
                           q_id=q_id, q_vec=q_vec, c_id=c_id, c_vec=c_vec)
    q = queries.select(F.col(q_id).alias("query_id"))
    cand = (
        corpus.select(F.col(c_id).alias("neighbor_id"))
        .crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(top.select("query_id", "neighbor_id")),
              ["query_id", "neighbor_id"], "left_anti")
    )
    rk = F.md5(F.concat(F.col("query_id").cast("string"), F.lit("_"),
                        F.col("neighbor_id").cast("string")))
    w = Window.partitionBy("query_id").orderBy(rk, F.col("neighbor_id"))
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= n_neg)
        .select("query_id", "neighbor_id",
                F.col("neg_rank").cast("int").alias("neg_rank"))
    )


def seed_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed centroids: the first ``n_centroids`` vectors by id.

    Reproducible and SQL-oracle-able; feed to :func:`kmeans_centroids` for a
    quality refinement. Output: (centroid_id, _cent)."""
    return (
        corpus.orderBy(F.col(id_col)).limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cent"))
    )


def _assign_to(corpus_v: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, _v) × broadcast(centroids) → nearest-centroid argmax by cosine.

    One broadcast nested-loop over K centroid rows per vector — never a
    corpus shuffle; the window dedup keys on vec_id only (narrow)."""
    from polipus_spark.partitioning import spread

    # K cosines × dim interpreted ops per vector: CPU-dense per row, so a
    # one-row-group embeddings file must not serialize it on one core
    corpus_v = spread(corpus_v)
    scored = corpus_v.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", cosine(F.col("_v"), F.col("_cent"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "centroid_id")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed spherical k-means (Lloyd) over an array<float> column.

    Seeded from :func:`seed_centroids`, then ``n_iter`` iterations of:

      assign — broadcast crossJoin vs K centroid rows, argmax cosine
               (:func:`_assign_to`; the corpus never shuffles);
      update — ``posexplode`` the unit-normalized vectors → partial-agg
               ``avg`` per (centroid, dim) → re-assemble the mean array with
               ``array_sort(collect_list(struct))``. Two narrow shuffles on
               (centroid_id, pos) / centroid_id — K·dim rows, trivial.

    Vectors are unit-normalized once up front (spherical k-means: the mean
    of unit vectors points at the spherical centroid; cosine assignment is
    scale-invariant so the centroid needs no re-normalization). Empty
    clusters keep their previous centroid. The K-row centroid frame is
    eagerly localCheckpoint-ed per iteration so plan lineage stays flat
    instead of doubling per Lloyd step. Output: (centroid_id, _cent).
    """
    # _inv is one column per row; CollapseProject may inline it into each
    # array element, but the cache below materializes the collapsed plan
    # exactly once per row, so the recompute is a one-time cache-build cost.
    from polipus_spark.partitioning import spread

    unit = (
        spread(corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_raw")))
        .withColumn("_inv", F.lit(1.0) / norm(F.col("_raw")))
        .select(
            "vec_id",
            F.transform(F.col("_raw"), lambda x: x.cast("double") * F.col("_inv")).alias("_v"),
        )
        .persist()
    )
    cents = seed_centroids(corpus, n_centroids, id_col, vec_col).select(
        "centroid_id",
        F.transform(F.col("_cent"), lambda x: x.cast("double")).alias("_cent"),
    )
    for _ in range(max(n_iter, 0)):
        assign = _assign_to(unit, cents)
        means = (
            unit.join(assign, "vec_id")
            .select("centroid_id", F.posexplode("_v").alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("mean"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                    lambda s: s["mean"],
                ).alias("_new")
            )
        )
        cents = (
            cents.join(means, "centroid_id", "left")
            .select("centroid_id", F.coalesce("_new", "_cent").alias("_cent"))
            .localCheckpoint(eager=True)
        )
    unit.unpersist()
    return cents


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """Assign each vector to its nearest centroid → (vec_id, centroid_id).

    ``refine_iters=0`` (default) keeps the deterministic first-K-by-id seed
    centroids (reproducible, SQL-oracle-able); ``refine_iters>0`` runs that
    many Lloyd iterations of :func:`kmeans_centroids` first — same dataflow,
    better-balanced inverted lists.
    """
    if refine_iters > 0:
        cents = kmeans_centroids(corpus, n_centroids, refine_iters, id_col, vec_col)
    else:
        cents = seed_centroids(corpus, n_centroids, id_col, vec_col)
    corpus_v = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    return _assign_to(corpus_v, cents)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 8,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF search: probe the query's ``n_probe`` nearest centroid partitions
    only — the candidate set shrinks ~(n_centroids/n_probe)×.

    ``refine_iters>0`` swaps the deterministic seed centroids for k-means
    output (:func:`kmeans_centroids`) — better-balanced lists, same plan."""
    if refine_iters > 0:
        cents = kmeans_centroids(corpus, n_centroids, refine_iters, id_col, vec_col)
    else:
        cents = seed_centroids(corpus, n_centroids, id_col, vec_col)
    corpus_v = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    assign = _assign_to(corpus_v, cents)
    corpus_p = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).join(assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")

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


def knn_graph(
    corpus: DataFrame,
    n_centroids: int = 8,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kNN graph: every vector's top-``k`` cosine neighbors within its own
    inverted list (the n_probe=1 special case of :func:`ivf_topk` where the
    query side is the whole corpus).

    Semantics are EXACTLY ``ivf_topk(corpus, corpus, n_centroids, k,
    n_probe=1)`` — same seed centroids, same (cosine desc, id asc)
    ranking, self excluded — pinned by test. The execution differs: the
    all-pairs-within-list scoring that dominates (Σ|list|² cosines) runs
    as ONE normalized Arrow matmul per list inside applyInPandas instead
    of |list|² interpreted Column folds — the same kernel-vs-expression
    lesson as lsh_band_rows (r5 bench gotchas). Plan: assignment is a
    broadcast argmax (no corpus shuffle), then ONE groupBy(centroid_id)
    exchange; list width n/K is the quadratic term — at 100 TB you raise
    ``n_centroids`` to cap it, exactly like the IVF serving path."""
    from pyspark.sql import types as T

    cents = seed_centroids(corpus, n_centroids, id_col, vec_col)
    corpus_v = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    lists = corpus_v.join(_assign_to(corpus_v, cents), "vec_id")

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("rank", T.IntegerType()),
    ])

    def _topk(_key, pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        V = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(V, axis=1)
        nrm[nrm == 0] = 1.0
        S = (V / nrm[:, None]) @ (V / nrm[:, None]).T
        q_out, n_out, r_out = [], [], []
        for i in range(len(ids)):
            mask = np.arange(len(ids)) != i
            cand = np.nonzero(mask)[0]
            # (score desc, neighbor id asc): lexsort keys are last-primary
            order = cand[np.lexsort((ids[cand], -S[i, cand]))][:k]
            for r, j in enumerate(order, 1):
                q_out.append(int(ids[i]))
                n_out.append(int(ids[j]))
                r_out.append(r)
        return pd.DataFrame(
            {"query_id": q_out, "neighbor_id": n_out, "rank": r_out})

    return lists.groupBy("centroid_id").applyInPandas(_topk, out_schema)


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool | None = None,
    n_bands: int = 16,
    bits_per_band: int = 8,
    dim: int = 64,
    use_lsh_prefilter: bool | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine > threshold).

    **Default = banded-LSH prefilter** (the scale path): only pairs sharing at
    least one hyperplane-sketch band bucket are cosine-scored. Candidates grow
    with bucket collisions, not n² — survives 100 TB. Recall < 1 by design,
    governed by (n_bands, bits_per_band): P(candidate) = 1-(1-p^b)^L with
    p = 1 - angle/pi. The defaults (L=16 bands × b=8 bits) are tuned for the
    default threshold 0.9: recall ~0.996 there, while unrelated pairs
    (cosine ≲ 0.2) collide <10% — measured 7.1% on the sf0.01 embeddings vs
    40% for (L=8, b=4). Lower thresholds need coarser bands: (L=8, b=4)
    gives ~0.84 recall at cosine 0.5 (what the oracle entry uses).

    ``exact=True`` = full O(n²) self-join with a JVM-side cosine — the
    correctness baseline / oracle mode only, never the scale path.

    .. deprecated:: r2 renamed ``use_lsh_prefilter`` (old default False =
       exact) to ``exact`` AND flipped the default to the LSH path. Passing
       the old keyword still works but warns, so stale call sites surface
       loudly instead of silently changing semantics (r2 ADVICE)."""
    if use_lsh_prefilter is not None:
        import warnings

        if exact is not None:
            raise ValueError(
                "near_dup_pairs: pass either exact= or the deprecated "
                "use_lsh_prefilter=, not both — refusing to guess which "
                "explicit request wins"
            )
        warnings.warn(
            "near_dup_pairs(use_lsh_prefilter=...) is deprecated — pass "
            "exact=<bool> instead (note: the DEFAULT also changed from the "
            "exact O(n²) scan to the banded-LSH prefilter)",
            DeprecationWarning,
            stacklevel=2,
        )
        exact = not use_lsh_prefilter
    exact = bool(exact)
    # Per-vector norms are attached to the (linear) sides, so the per-PAIR
    # verify is one dot fold instead of dot + two norm folds (r6; the
    # division dot/(na·nb) is the same expression values as cosine() —
    # norm is a pure function of the array, so moving it off the pair
    # loop is bit-exact).
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
                      ).withColumn("_na", norm(F.col("_va")))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
                      ).withColumn("_nb", norm(F.col("_vb")))
    sim = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        return (
            pairs.withColumn("_sim", sim)
            .where(F.col("_sim") > threshold)
            .select("id_a", "id_b")
        )
    # Banded path (r6 shape): candidate enumeration AND the cosine verify
    # run inside one per-bucket Arrow kernel — the old shape shuffled
    # every raw candidate through a pre-verify distinct (81M rows at
    # sf1.0, 135 s) and then re-attached both vectors by id join before
    # an interpreted per-pair cosine fold. The kernel replicates the
    # Column fold BIT-exactly (float32 elementwise products, sequential
    # float64 accumulation over dims — see _seq_dot_f32), so the pair
    # set is unchanged; the closing distinct sees verified survivors
    # only (≤ n_bands copies of each).
    sk = lsh_band_rows(corpus, n_bands, bits_per_band, dim, id_col, vec_col,
                       with_all=True)
    members = sk.join(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v")),
        "id",
    )
    return _bucket_cosine_pairs(members, ["band", "bucket"], threshold,
                                canonical_band=True)


def _seq_dot_f32(V, lo, hi, blk_cols=None):
    """Bit-exact numpy replica of the Column cosine fold's dot for a
    float32 row block against all rows: Spark's
    ``aggregate(zip_with(a, b, (x, y) -> x*y), 0.0D, acc + v)`` multiplies
    in FLOAT32 and accumulates left-to-right in FLOAT64 — so the products
    are formed in f32 and summed sequentially over dims in f64 (one
    vectorized add per dim, which IS the sequential order per pair)."""
    import numpy as np

    n, d = V.shape
    S = np.zeros((hi - lo, n), dtype=np.float64)
    for j in range(d):
        S += (V[lo:hi, j:j + 1] * V[None, :, j]).astype(np.float64)
    return S


def _bucket_cosine_pairs(members: DataFrame, keys: list[str],
                         threshold: float,
                         carry: tuple[str, ...] = (),
                         canonical_band: bool = False) -> DataFrame:
    """(id_a < id_b) pairs with cosine > threshold among rows sharing a
    bucket key — one groupBy + per-bucket numpy kernel, emitting only
    verified survivors. Bit-equal to the Column-fold cosine (see
    :func:`_seq_dot_f32`; norms use the same f32-square /
    sequential-f64-sum shape). Pair work is Σ|bucket|² either way; blocks
    bound kernel memory. ``carry`` names group-key columns replicated
    onto the output rows.

    Dedup across buckets: with ``canonical_band=True`` (requires
    ``band`` in keys and an ``all_buckets`` member column) a pair is
    emitted ONLY from the first band where its buckets match — no
    post-hoc distinct exchange over the (potentially huge) pair stream.
    Without it the group keys must partition the members (e.g. cluster
    ids), so each pair appears exactly once anyway."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField("id_a", T.LongType()),
         T.StructField("id_b", T.LongType())]
        + [T.StructField(c, members.schema[c].dataType) for c in carry]
    )
    thr = threshold
    member_struct = (F.struct("id", "_v", "all_buckets") if canonical_band
                     else F.struct("id", "_v"))
    extra = ("band",) if canonical_band and "band" not in carry else ()
    # ONE JVM aggregate builds the member lists; the kernel is mapInPandas
    # over BUCKET ROWS (per-batch Python overhead, not per-group — many
    # tiny buckets would pay ~0.2 ms of applyInPandas setup each)
    grouped = (
        members.groupBy(*keys)
        .agg(F.collect_list(member_struct).alias("_ms"))
        .where(F.size("_ms") > 1)
        .select(*extra, *carry, "_ms")
    )

    def _kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            frames = []
            for ridx in range(len(pdf)):
                ms = pdf["_ms"].iloc[ridx]
                B = len(ms)
                ids = np.fromiter((m["id"] for m in ms), dtype=np.int64,
                                  count=B)
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                V = np.stack([np.asarray(m["_v"], dtype=np.float32)
                              for m in ms])[order]
                if canonical_band:
                    band = int(pdf["band"].iloc[ridx])
                    AB = np.stack([np.asarray(m["all_buckets"],
                                              dtype=np.int64)
                                   for m in ms])[order]
                P = V * V  # f32 squares, exactly the fold's v*v
                # one vectorized add per dim = the fold's sequential f64
                # order (np.add.reduce/np.sum use pairwise summation)
                n2 = np.zeros(B, dtype=np.float64)
                for j in range(P.shape[1]):
                    n2 += P[:, j].astype(np.float64)
                nrm = np.sqrt(n2)
                ia, ib = [], []
                blk = max(1, (1 << 23) // max(B, 1))
                for lo in range(0, B, blk):
                    hi = min(lo + blk, B)
                    S = _seq_dot_f32(V, lo, hi)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        sim = S / (nrm[lo:hi, None] * nrm[None, :])
                    mask = sim > thr
                    mask &= np.arange(B)[None, :] > \
                        np.arange(lo, hi)[:, None]
                    ii, jj = np.nonzero(mask)
                    if not len(ii):
                        continue
                    if canonical_band and band > 0:
                        nodup = np.ones(len(ii), dtype=bool)
                        for b2 in range(band):
                            nodup &= AB[lo + ii, b2] != AB[jj, b2]
                        ii, jj = ii[nodup], jj[nodup]
                    ia.append(ids[lo + ii])
                    ib.append(ids[jj])
                if not ia:
                    continue
                out = pd.DataFrame({"id_a": np.concatenate(ia),
                                    "id_b": np.concatenate(ib)})
                for c in carry:
                    out[c] = pdf[c].iloc[ridx]
                frames.append(out)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return grouped.mapInPandas(_kernel, out_schema)


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_centroids: int | None = 8,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_size: int = 4096,
    hot_cluster_cap: int | None = None,
    n_bands: int = 16,
    bits_per_band: int = 8,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: pairwise cosine only WITHIN
    k-means clusters → (id_a < id_b, centroid_id).

    The pattern from "SemDeDup" (Abbas et al. 2023): cluster the embedding
    space (K clusters), then compare pairs only inside each cluster —
    pairwise work drops from n² to Σ_k n_k², i.e. ~n²/K for balanced
    clusters, and each cluster's comparison is an independent partition of
    the equi-join on centroid_id (embarrassingly parallel, no global
    shuffle of pair candidates). Recall loss = near-dup pairs straddling a
    cluster boundary — the same trade banded-LSH makes per band.
    Deterministic: seed centroids (or Lloyd-refined with ``refine_iters``)
    are reproducible, so the pair set is a pure function of the data.

    Two 100 TB guards (r3 VERDICT #4):

    * ``n_centroids=None`` derives K = ceil(n / target_cluster_size), so
      per-cluster pair work (~target²) and join parallelism (= K) both
      hold constant as the corpus grows instead of K being a fixed 8.
    * ``hot_cluster_cap`` (default 4·target_cluster_size) bounds skew:
      clusters larger than the cap — the n_k² hot spots a Zipfian corpus
      always has — fall back to banded-LSH *within* the cluster
      (:func:`lsh_band_rows` keyed by (centroid, band, bucket)), so their
      pair work tracks bucket collisions, never n_k². Pairs from hot
      clusters are LSH-recall (≥99% at the default banding for 0.9-cosine
      dups); small clusters stay exact.
    """
    if hot_cluster_cap is None:
        hot_cluster_cap = 4 * target_cluster_size
    if n_centroids is None:
        n = corpus.count()
        n_centroids = max(1, -(-n // target_cluster_size))
    assign = ivf_assign(corpus, n_centroids, id_col, vec_col, refine_iters)
    # Materialize (vec_id, _v, _nrm, centroid_id) ONCE: the frame feeds
    # five consumers (cold a/b, hot band rows, hot vector lookups, the
    # size rollup) and each plan reference used to re-run the whole
    # k-means assignment (guide §7.2). Norms ride along so the per-PAIR
    # verify below is one dot fold — dot/(na·nb) is value-identical to
    # cosine() since norm is a pure per-vector function.
    base = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
        .withColumn("_nrm", norm(F.col("_v")))
        .join(assign, "vec_id")
        .localCheckpoint(eager=True)
    )
    # K-row cluster-size frame → broadcast hot/cold routing
    sizes = base.groupBy("centroid_id").agg(F.count("*").alias("_csz"))
    v = base.join(F.broadcast(sizes), "centroid_id")
    cold = v.where(F.col("_csz") <= hot_cluster_cap)
    hot = v.where(F.col("_csz") > hot_cluster_cap)

    # cold clusters: enumeration + cosine verify inside one per-cluster
    # kernel (bit-equal to the Column fold — _bucket_cosine_pairs) instead
    # of a within-cluster self-join scoring Σn_k² interpreted folds
    pairs = _bucket_cosine_pairs(
        cold.select(F.col("vec_id").alias("id"), "_v", "centroid_id"),
        ["centroid_id"], threshold, carry=("centroid_id",),
    ).select("id_a", "id_b", "centroid_id")
    sim = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))

    sk = lsh_band_rows(hot, n_bands, bits_per_band, dim,
                       id_col="vec_id", vec_col="_v")
    # band rows re-keyed by cluster: candidates must share (cluster, band,
    # bucket) — the join key cardinality is K·L·2^b, not K, so hot-cluster
    # parallelism recovers too. In-bucket combinations come from one
    # groupBy (no sketch self-join); duplicates verify ~1.3× and the
    # distinct runs over verified survivors only.
    ctr = hot.select("vec_id", "centroid_id")
    skc = sk.join(ctr, sk["id"] == ctr["vec_id"]).select(
        "id", "centroid_id", "band", "bucket"
    )
    hot_cand = _in_bucket_pairs(skc, ["centroid_id", "band", "bucket"],
                                carry=("centroid_id",))
    va = hot.select(F.col("vec_id").alias("id_a"), F.col("_v").alias("_va"),
                    F.col("_nrm").alias("_na"))
    vb = hot.select(F.col("vec_id").alias("id_b"), F.col("_v").alias("_vb"),
                    F.col("_nrm").alias("_nb"))
    hot_pairs = (
        hot_cand.join(va, "id_a").join(vb, "id_b")
        .where(sim > threshold)
        .select("id_a", "id_b", "centroid_id")
        .distinct()
    )
    # cost telemetry for the hot/cold split (r4 VERDICT #8): stash the
    # lazy ingredients so semantic_dedup_report can price this exact run
    # without re-deriving the routing. No action happens here — reading
    # the report is one extra (tiny: K-row + pair-count) job, on demand.
    global _LAST_SEMANTIC_RUN
    _LAST_SEMANTIC_RUN = {
        "n_centroids": n_centroids,
        "hot_cluster_cap": hot_cluster_cap,
        "sizes": sizes,
        "cold_pairs": pairs,
        "hot_pairs": hot_pairs,
    }
    return pairs.unionByName(hot_pairs)


_LAST_SEMANTIC_RUN: dict | None = None


def semantic_dedup_report() -> dict:
    """One-line cost telemetry for the MOST RECENT
    :func:`semantic_dedup_pairs` plan built in this process: K, hot-cluster
    count (clusters routed to the LSH fallback), and the pair counts from
    the exact vs LSH paths — the numbers that diagnose a hot/cold-split
    regression from a bench log (r4 verdict #8: the +2.16 s sf0.1
    regression was this split paying for scale safety; make that visible,
    not inferred). Runs two small jobs (a K-row aggregate and the two pair
    counts); call it AFTER the main result is consumed so the work is warm.
    """
    if _LAST_SEMANTIC_RUN is None:
        raise RuntimeError("no semantic_dedup_pairs run in this process")
    r = _LAST_SEMANTIC_RUN
    hot_n = r["sizes"].where(
        F.col("_csz") > r["hot_cluster_cap"]).count()
    return {
        "n_centroids": r["n_centroids"],
        "hot_cluster_cap": r["hot_cluster_cap"],
        "hot_clusters": hot_n,
        "exact_pairs": r["cold_pairs"].count(),
        "lsh_pairs": r["hot_pairs"].count(),
    }


def hyperplane_components(band: int, bit: int, dim: int) -> list[float]:
    """Deterministic md5-derived hyperplane h[(band,bit)] ∈ [-0.5, 0.5]^dim.

    Module-level so the DuckDB oracle SQL can inline the identical constants
    (both engines then dot in double precision — bit-identical buckets)."""
    import hashlib

    return [
        (int(hashlib.md5(f"hp{band}:{bit}#{d}".encode()).hexdigest()[:15], 16)
         / float(2**60)) - 0.5
        for d in range(dim)
    ]


def hyperplane_bits(vec: Column, n_bits: int = 8, dim: int = 64, band: int = 0) -> Column:
    """Random-hyperplane LSH sketch for one band: bit j = sign(dot(v, h_j)).

    ``dim`` MUST equal the embedding length: ``zip_with`` pads unequal arrays
    with nulls, which would null the dot product (guarded via slice)."""
    acc = F.lit(0)
    for j in range(n_bits):
        plane = F.array(*[F.lit(c) for c in hyperplane_components(band, j, dim)])
        d = dot(F.slice(vec, 1, dim), plane)
        acc = acc + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc.cast("bigint")


def band_sketches(
    vec: Column, n_bands: int = 16, bits_per_band: int = 8, dim: int = 64
) -> Column:
    """array<struct<band:int, bucket:bigint>> — one sketch per band.

    Banding is what makes hyperplane LSH usable for near-dup recall: a single
    b-bit bucket has P = p^b of catching a pair (~0.2 at cosine 0.5); L
    independent bands lift that to 1-(1-p^b)^L. Same construction as the
    MinHash banding in dedup.py, same explode/self-join shape downstream.

    .. warning:: REFERENCE/PARITY PATH ONLY. Each bit is a ``zip_with`` +
       ``aggregate`` lambda over a ``dim``-element literal array, so the
       full sketch is n_bands × bits_per_band × dim literal leaves — at the
       default (16, 8, 64) that's ~8,200 leaves, and Catalyst spends
       minutes analyzing it (then exceeds the codegen limit and evaluates
       interpreted). :func:`lsh_band_rows` computes the identical buckets
       in one Arrow numpy kernel (``V @ H.T``) and is what
       :func:`lsh_bucket_candidates` uses; this Column form stays as the
       executable spec the kernel is tested against (bit-equality pinned by
       tests/test_pipeline_ops.py)."""
    return F.array(*[
        F.struct(
            F.lit(band).alias("band"),
            hyperplane_bits(vec, bits_per_band, dim, band=band).alias("bucket"),
        )
        for band in range(n_bands)
    ])


def hyperplane_matrix(n_bands: int, bits_per_band: int, dim: int):
    """The (n_bands·bits_per_band) × dim hyperplane matrix H as float64
    numpy — row (band·bits_per_band + j) is ``hyperplane_components(band,
    j, dim)``, the same constants the Column path and the DuckDB oracle
    inline."""
    import numpy as np

    return np.array(
        [
            hyperplane_components(band, j, dim)
            for band in range(n_bands)
            for j in range(bits_per_band)
        ],
        dtype=np.float64,
    )


def lsh_band_rows(
    corpus: DataFrame,
    n_bands: int = 16,
    bits_per_band: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_all: bool = False,
) -> DataFrame:
    """(id, band, bucket) hyperplane-LSH sketch rows — the scale path.
    ``with_all=True`` adds an ``all_buckets`` array (every band's bucket,
    ~8 B × n_bands per row) so per-bucket consumers can decide
    membership of OTHER bands locally (canonical-band dedup).

    One Arrow ``mapInPandas`` kernel computes ALL n_bands·bits_per_band sign
    bits per vector as a single matmul ``V @ H.T`` (H from
    :func:`hyperplane_matrix`), then packs bits into per-band bucket ints.
    Replaces the :func:`band_sketches` Column expression, whose ~8,200
    literal leaves cost Catalyst minutes of analysis per query and fall
    back to interpreted eval (r3 VERDICT: 283 s at sf0.01 vs 0.3 s oracle).
    The kernel is a map-only pass — no shuffle; bit-equality with the
    Column spec (and hence the DuckDB oracle, which inlines the identical
    constants and also dots in float64) is pinned by tests. Vectors shorter
    than ``dim`` are zero-padded (the Column path nulls the whole dot and
    yields bucket 0 for them — don't feed short vectors to either path).
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    H_T = hyperplane_matrix(n_bands, bits_per_band, dim).T  # (dim, B)
    src = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
    out_fields = [
        src.schema["id"],
        StructField("band", IntegerType()),
        StructField("bucket", LongType()),
    ]
    if with_all:
        from pyspark.sql.types import ArrayType

        out_fields.append(StructField("all_buckets", ArrayType(LongType())))
    out_schema = StructType(out_fields)
    nb, bpb, d = n_bands, bits_per_band, dim

    def _kernel(batches):
        import numpy as np
        import pandas as pd

        weights = 1 << np.arange(bpb, dtype=np.int64)  # bit j -> 2^j
        bands = np.arange(nb, dtype=np.int32)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.zeros((n, d), dtype=np.float64)
            for i, v in enumerate(pdf["_v"].values):
                a = np.asarray(v, dtype=np.float64)[:d]
                V[i, : len(a)] = a
            bits = (V @ H_T) > 0.0  # (n, nb*bpb) sign bits
            buckets = bits.reshape(n, nb, bpb).astype(np.int64) @ weights
            out = {
                "id": pdf["id"].values.repeat(nb),
                "band": np.tile(bands, n),
                "bucket": buckets.reshape(-1),
            }
            if with_all:
                rows = buckets.tolist()
                out["all_buckets"] = [r for r in rows for _ in range(nb)]
            yield pd.DataFrame(out)

    return src.mapInPandas(_kernel, out_schema)


def lsh_bucket_candidates(
    corpus: DataFrame,
    n_bands: int = 16,
    bits_per_band: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate embedding candidates: pairs sharing ≥1 band bucket.

    Arrow-kernel sketch rows (:func:`lsh_band_rows`) → equi-join on
    (band, bucket) → distinct pairs. The join is an equi-join Catalyst
    shuffles on the narrow (band, bucket) key; candidate volume ∝ bucket
    collisions, never n²."""
    sk = lsh_band_rows(corpus, n_bands, bits_per_band, dim, id_col, vec_col)
    return _in_bucket_pairs(sk, ["band", "bucket"]).distinct()


def _in_bucket_pairs(sk: DataFrame, keys: list[str],
                     carry: tuple[str, ...] = ()) -> DataFrame:
    """Ordered (id_a < id_b) pairs of ``sk.id`` sharing a bucket key —
    ONE groupBy over the sketch rows instead of a bucket self-join (r6):
    the self-join's two plan references each re-ran the upstream sketch
    kernel (guide §7.2 duplicated subtrees) and shuffled the rows twice.
    NOT distinct — a pair repeats once per shared bucket; callers dedupe
    where needed (cheapest AFTER any verify filter). ``carry`` names key
    columns to keep on the output rows. Pair work is Σ|bucket|² either
    way; the two-step explode streams combinations without materializing a
    bucket's full pair array."""
    grouped = (
        sk.groupBy(*keys)
        .agg(F.sort_array(F.collect_list("id")).alias("_ids"))
        .where(F.size("_ids") > 1)
    )
    return (
        grouped.select(*carry, F.posexplode("_ids").alias("_i", "id_a"), "_ids")
        .select(
            *carry, "id_a",
            F.explode(
                F.slice(F.col("_ids"), F.col("_i") + 2,
                        F.greatest(F.size("_ids") - F.col("_i") - 1, F.lit(0)))
            ).alias("id_b"),
        )
    )


def _int8_cols(vec_col: str) -> tuple[Column, Column]:
    """(q array<int>, scale double) Columns for symmetric per-vector int8
    quantization of ``vec_col`` — shared by :func:`quantize_int8` and the
    quantized IVF index build."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, F.abs))

    # Bind v and max|v| as higher-order lambda VARIABLES before the
    # per-element division: referencing the max_abs *expression* inside the
    # transform lambda made CollapseProject inline a full array_max pass
    # into every element (O(dim²) interpreted ops per row — the same
    # Catalyst common-subexpression trap as minhash_signature's; r6).
    def _q(vb: Column) -> Column:
        return F.element_at(
            F.transform(
                F.array(F.array_max(F.transform(vb, F.abs))),
                lambda mb: F.when(
                    mb > 0,
                    F.transform(
                        vb, lambda x: F.floor(x * 127.0 / mb + 0.5).cast("int")
                    ),
                ).otherwise(F.transform(vb, lambda x: F.lit(0))),
            ),
            1,
        )

    q = F.element_at(F.transform(F.array(v), _q), 1)
    return q, max_abs


def quantize_int8(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization for embedding storage:
    q_i = floor(127·v_i/max|v| + 0.5), scale carried as max|v|.

    4× smaller at rest than float32 (16× vs float64) — at 100 TB the
    embedding table's scan time drops proportionally and an int8 dot is
    SIMD-friendlier. floor(+0.5) not round(): both engines define floor
    identically on IEEE doubles, so the DuckDB oracle is bit-exact, where
    round() half-case conventions differ. Zero vectors quantize to zeros.
    Output: (vec_id, q array<int>, scale double).
    """
    from polipus_spark.partitioning import spread

    q, max_abs = _int8_cols(vec_col)
    return spread(corpus).select(
        F.col(id_col).alias("vec_id"),
        q.alias("q"),
        max_abs.alias("scale"),
    )


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int = 8,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: bool = False,
) -> None:
    """Materialize an IVF index: centroids + the corpus partitioned BY LIST.

    ``vectors/`` is written ``partitionBy("centroid_id")`` — the physical
    layout IS the inverted file. A probe then reads only its lists via
    Spark's dynamic partition pruning (the broadcast probe side prunes the
    scan at runtime — see :func:`ivf_topk_indexed`), so query I/O is
    ~n_probe/K of the corpus instead of a full scan. Build cost: one
    assignment pass + one shuffled write.

    ``quantized=True`` additionally stores int8 codes + per-vector scale
    (:func:`_int8_cols`) beside the float column. Parquet is columnar, so
    a probe's scoring pass reads ONLY (vec_id, q, scale) — ~4× fewer scan
    bytes than float32, 16× vs these float64 test arrays — and the float
    column is touched only for the tiny exact re-rank fetch
    (:func:`ivf_topk_indexed` with ``quantized=True``). That combination —
    list-pruned partitions × pruned columns × exact float re-rank of a
    k·overfetch candidate set — is the actual 100 TB ANN serving layout.
    """
    if refine_iters > 0:
        cents = kmeans_centroids(corpus, n_centroids, refine_iters, id_col, vec_col)
    else:
        cents = seed_centroids(corpus, n_centroids, id_col, vec_col)
    cents.select("centroid_id", F.col("_cent").alias("centroid")).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/centroids")
    corpus_v = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    assign = _assign_to(corpus_v, cents)
    vec = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    if quantized:
        q, scale = _int8_cols("embedding")
        vec = vec.select("vec_id", "embedding", q.alias("q"), scale.alias("scale"))
    (
        vec.join(assign, "vec_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{index_dir}/vectors")
    )


def ivf_topk_indexed(
    spark,
    queries: DataFrame,
    index_dir: str,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: bool = False,
    overfetch: int = 8,
) -> DataFrame:
    """Top-k search against a :func:`build_ivf_index` index.

    The query→centroid probe frame is tiny and broadcast; its equi-join
    with the list-partitioned vectors table triggers dynamic partition
    pruning — the parquet scan materializes only the probed
    ``centroid_id=`` directories. Same output contract as
    :func:`ivf_topk`: (query_id, neighbor_id, rank).

    ``quantized=True`` (needs an index built with ``quantized=True``) scans
    only the int8 (vec_id, q, scale) columns for scoring — cosine is
    invariant to the per-vector scale, so the int8 codes rank directly —
    keeps the best ``k·overfetch`` candidates per query, then re-ranks just
    those against the float column (a second, DPP- and id-pruned read) in
    exact float. Results match the float path whenever the true top-k
    survive the int8 prefilter; int8 cosine error is ~1e-3 while the
    synthetic corpus' neighbor gaps at rank k·overfetch are ~1e-1, and the
    oracle entry pins EXACT equality with the un-quantized SQL."""
    cents = spark.read.parquet(f"{index_dir}/centroids").select(
        "centroid_id", F.col("centroid").alias("_cent")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "_sim_c", cosine(F.col("_qv"), F.col("_cent"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_sim_c").desc(), F.col("centroid_id").asc()
    )
    probe = (
        scored.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "_qv", "centroid_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    if quantized:
        codes = spark.read.parquet(f"{index_dir}/vectors").select(
            F.col("vec_id").alias("neighbor_id"),
            F.transform(F.col("q"), lambda x: x.cast("double")).alias("_qc"),
            "centroid_id",
        )
        approx = (
            codes.join(F.broadcast(probe), "centroid_id")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("_sim", cosine(F.col("_qv"), F.col("_qc")))
            .withColumn("_arn", F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_sim").desc(), F.col("neighbor_id").asc())))
            .where(F.col("_arn") <= k * overfetch)
            .select("query_id", "_qv", "centroid_id", "neighbor_id")
        )
        # exact float re-rank: second read is still DPP-pruned to the probed
        # lists AND filtered to the candidate ids (broadcast semi-shape join)
        floats = spark.read.parquet(f"{index_dir}/vectors").select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("_cv"),
            "centroid_id",
        )
        cand = floats.join(
            F.broadcast(approx), ["centroid_id", "neighbor_id"]
        ).withColumn("_sim", cosine(F.col("_qv"), F.col("_cv")))
    else:
        vectors = spark.read.parquet(f"{index_dir}/vectors").select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("_cv"),
            "centroid_id",
        )
        cand = (
            vectors.join(F.broadcast(probe), "centroid_id")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("_sim", cosine(F.col("_qv"), F.col("_cv")))
        )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


# --- product quantization (r4) -------------------------------------------

def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _pq_subrows(corpus: DataFrame, m: int, sub: int,
                id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, subspace, _sv): one row per vector per subspace slice."""
    from polipus_spark.partitioning import spread

    corpus = spread(corpus)  # the Lloyd passes iterate on these rows
    structs = [
        F.struct(
            F.lit(j).alias("subspace"),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("_sv"),
        )
        for j in range(m)
    ]
    return corpus.select(
        F.col(id_col).alias("vec_id"), F.explode(F.array(*structs)).alias("_s")
    ).select(
        "vec_id",
        F.col("_s.subspace").alias("subspace"),
        F.transform(F.col("_s._sv"), lambda x: x.cast("double")).alias("_sv"),
    )


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train product-quantization codebooks → (subspace, code_id, _cent).

    The FAISS-IVFPQ codebook layout re-expressed as ONE grouped dataflow:
    instead of m separate k-means jobs (m × n_iter passes over the corpus),
    the vectors explode to (vec_id, subspace, subvector) rows and all m
    subspaces train simultaneously — each Lloyd iteration is a single
    broadcast join against the m·K codebook rows (argmin L2 per
    (vec_id, subspace)) plus one narrow (subspace, code, pos) avg shuffle.
    n_iter passes total, independent of m. Seeding is deterministic (the
    first K vectors by id seed every subspace), so codebooks are
    reproducible and SQL-oracle-able; empty codes keep their previous
    centroid, exactly like :func:`kmeans_centroids`."""
    dim = corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rows = _pq_subrows(corpus, m, sub, id_col, vec_col).persist()
    seed_ids = corpus.select(F.col(id_col).alias("vec_id")).orderBy("vec_id").limit(n_codes)
    cents = (
        rows.join(F.broadcast(seed_ids), "vec_id")
        .select("subspace", F.col("vec_id").alias("code_id"),
                F.col("_sv").alias("_cent"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy(
        F.col("_d").asc(), F.col("code_id").asc()
    )
    for _ in range(max(n_iter, 0)):
        assigned = (
            rows.join(F.broadcast(cents), "subspace")
            .withColumn("_d", _sq_dist(F.col("_sv"), F.col("_cent")))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("subspace", "code_id", "_sv")
        )
        means = (
            assigned.select("subspace", "code_id",
                            F.posexplode("_sv").alias("pos", "val"))
            .groupBy("subspace", "code_id", "pos")
            .agg(F.avg("val").alias("mean"))
            .groupBy("subspace", "code_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                    lambda s: s["mean"],
                ).alias("_new")
            )
        )
        cents = (
            cents.join(means, ["subspace", "code_id"], "left")
            .select("subspace", "code_id",
                    F.coalesce("_new", "_cent").alias("_cent"))
            .localCheckpoint(eager=True)
        )
    rows.unpersist()
    return cents


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors → (vec_id, codes array<int>, subspace order).

    One broadcast join against the m·K codebook rows, argmin L2 per
    (vector, subspace), codes reassembled in subspace order. At 100 TB the
    codes table is the serving artifact: m bytes per vector instead of
    4·dim — a 64-dim float corpus compresses 64× at m=4."""
    sub_len = codebooks.select(F.size("_cent").alias("s")).first()["s"]
    rows = _pq_subrows(corpus, m, sub_len, id_col, vec_col)
    w = Window.partitionBy("vec_id", "subspace").orderBy(
        F.col("_d").asc(), F.col("code_id").asc()
    )
    return (
        rows.join(F.broadcast(codebooks), "subspace")
        .withColumn("_d", _sq_dist(F.col("_sv"), F.col("_cent")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "code_id"))),
                lambda s: s["code_id"],
            ).alias("codes")
        )
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    m: int,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k → (query_id,
    neighbor_id, rank).

    The PQ serving path: per query, a distance table of dot(q_subvector,
    codebook centroid) over all (subspace, code) cells — Q·m·K rows, tiny,
    broadcast — then each corpus vector's score is the sum of its m table
    lookups. The corpus side touches ONLY the codes column (m small ints
    per vector): the float embeddings are never read at query time.

    Exact-tie determinism: vectors sharing all m codes get bitwise-equal
    scores (the per-(query,vec) sum left-folds the parts in subspace
    order), so the vec_id tiebreak resolves identically in any engine —
    scores are deliberately not emitted."""
    sub_len = codebooks.select(F.size("_cent").alias("s")).first()["s"]
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    qsub = _pq_subrows(q, m, sub_len, "query_id", "_qv").withColumnRenamed(
        "vec_id", "query_id"
    )
    table = (
        qsub.join(F.broadcast(codebooks), "subspace")
        .select("query_id", "subspace", "code_id",
                dot(F.col("_sv"), F.col("_cent")).alias("_part"))
    )
    scored = (
        codes.select("vec_id", F.posexplode("codes").alias("subspace", "code_id"))
        .join(F.broadcast(table), ["subspace", "code_id"])
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("subspace", "_part"))),
                    lambda s: s["_part"],
                ),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ).alias("_score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# --- IVF-PQ: the composed 100 TB ANN layout (r4) ---------------------------

def build_ivfpq_index(
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int = 8,
    m: int = 4,
    n_codes: int = 4,
    n_iter: int = 2,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize a FAISS-style IVF-PQ index: coarse centroids + per-list
    PQ codes over RESIDUALS.

    Layout on disk:

      * ``centroids/`` — the K coarse centroids (the probe set);
      * ``codebooks/`` — m·n_codes PQ centroids trained on the residuals
        ``x − c_coarse(x)`` (:func:`pq_train` over the residual column —
        residual quantization is what makes PQ sharp inside a list, since
        residuals are centered near zero);
      * ``vectors/`` — ``partitionBy(centroid_id)``: per vector the m PQ
        codes, the precomputed double-precision norm (ADC scores dot
        products; cosine needs ‖x‖ and the codes can't recover it), AND
        the float embedding — parquet is columnar, so the ADC pass reads
        only (vec_id, codes, nrm) ≈ m+9 bytes/vector while the float
        column is touched only by the exact re-rank fetch.

    Query cost at 100 TB: DPP prunes to n_probe/K of the lists, the ADC
    scan reads ~2 % of the pruned bytes (codes+norm vs float), and the
    float read is k·overfetch rows per query."""
    if refine_iters > 0:
        cents = kmeans_centroids(corpus, n_centroids, refine_iters, id_col, vec_col)
    else:
        cents = seed_centroids(corpus, n_centroids, id_col, vec_col)
    cents.select("centroid_id", F.col("_cent").alias("centroid")).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/centroids")
    cents_d = cents.select(
        "centroid_id",
        F.transform("_cent", lambda x: x.cast("double")).alias("_cd"),
    )
    corpus_v = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    assign = _assign_to(corpus_v, cents)
    res = (
        corpus_v.join(assign, "vec_id")
        .join(F.broadcast(cents_d), "centroid_id")
        .select(
            "vec_id",
            F.zip_with(
                F.transform("_v", lambda x: x.cast("double")),
                F.col("_cd"),
                lambda x, c: x - c,
            ).alias("_res"),
        )
    )
    # residuals feed BOTH the PQ training loop and the encode pass (and
    # spread() inside _pq_subrows probes partitioning) — materialize once
    res = res.localCheckpoint(eager=True)
    books = pq_train(res, m=m, n_codes=n_codes, n_iter=n_iter,
                     id_col="vec_id", vec_col="_res")
    books.write.mode("overwrite").parquet(f"{index_dir}/codebooks")
    codes = pq_encode(res, books, m, id_col="vec_id", vec_col="_res")
    (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            norm(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias("nrm"),
        )
        .join(codes, "vec_id")
        .join(assign, "vec_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{index_dir}/vectors")
    )


def ivfpq_topk(
    spark,
    queries: DataFrame,
    index_dir: str,
    m: int,
    k: int = 5,
    n_probe: int = 2,
    overfetch: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a :func:`build_ivfpq_index` index → (query_id, neighbor_id,
    rank).

    Three stages, each reading the minimum bytes:

      1. **probe** — cosine vs the K coarse centroids, keep n_probe lists
         per query (broadcast; triggers DPP on the vectors scan);
      2. **ADC** — per (query, probed list) the FULL query vector's m
         subvectors dot every codebook centroid → a Q·n_probe·m·K lookup
         table (broadcast); each candidate's approximate cosine is
         (dot(q, c_coarse) + Σⱼ table[j, code_j]) / ‖x‖ — computed from
         the codes+norm columns ONLY, summed in subspace order so exact
         ties (vectors sharing a list and all m codes — their stored
         scores differ only by norm) resolve identically in any engine;
         keep k·overfetch per query;
      3. **re-rank** — exact float cosine over the surviving candidates
         (a second DPP- and id-pruned read of the float column).
    """
    books = spark.read.parquet(f"{index_dir}/codebooks").select(
        "subspace", "code_id", F.col("_cent").alias("_bc")
    )
    sub_len = books.select(F.size("_bc").alias("s")).first()["s"]
    cents = spark.read.parquet(f"{index_dir}/centroids").select(
        "centroid_id", F.col("centroid").alias("_cent")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_sim_c").desc(), F.col("centroid_id").asc()
    )
    probe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_sim_c", cosine(F.col("_qv"), F.col("_cent")))
        .withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= n_probe)
        .select(
            "query_id", "centroid_id", "_qv",
            # ADC table dots the FULL query vector against the codebook:
            # score = dot(q, c) + dot(q, r̂). Slicing the query residual
            # here instead would add a candidate-dependent −dot(c, r̂)
            # term that biases the overfetch cut and lowers recall.
            F.transform("_qv", lambda x: x.cast("double")).alias("_qd"),
            dot(
                F.transform("_qv", lambda x: x.cast("double")),
                F.transform("_cent", lambda x: x.cast("double")),
            ).alias("_qc_dot"),
        )
    )
    qsub = probe.select(
        "query_id", "centroid_id",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("subspace"),
                     F.slice(F.col("_qd"), j * sub_len + 1, sub_len).alias("_sv"))
            for j in range(m)
        ])).alias("_s"),
    ).select("query_id", "centroid_id",
             F.col("_s.subspace").alias("subspace"),
             F.col("_s._sv").alias("_sv"))
    table = qsub.join(F.broadcast(books), "subspace").select(
        "query_id", "centroid_id", "subspace", "code_id",
        dot(F.col("_sv"), F.col("_bc")).alias("_part"),
    )
    codes = spark.read.parquet(f"{index_dir}/vectors").select(
        F.col("vec_id").alias("neighbor_id"), "codes", "nrm", "centroid_id"
    )
    adc = (
        codes.join(F.broadcast(probe.select("query_id", "centroid_id", "_qc_dot")),
                   "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "centroid_id", "neighbor_id", "nrm", "_qc_dot",
                F.posexplode("codes").alias("subspace", "code_id"))
        .join(F.broadcast(table),
              ["query_id", "centroid_id", "subspace", "code_id"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.first("centroid_id").alias("centroid_id"),
            ((F.first("_qc_dot") + F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("subspace", "_part"))),
                    lambda s: s["_part"],
                ),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )) / F.first("nrm")).alias("_approx"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("_approx").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        adc.withColumn("_arn", F.row_number().over(wa))
        .where(F.col("_arn") <= k * overfetch)
        .join(F.broadcast(probe.select("query_id", "_qv").dropDuplicates(["query_id"])),
              "query_id")
        .select("query_id", "centroid_id", "neighbor_id", "_qv")
    )
    floats = spark.read.parquet(f"{index_dir}/vectors").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_cv"),
        "centroid_id",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        floats.join(F.broadcast(cand), ["centroid_id", "neighbor_id"])
        .withColumn("_sim", cosine(F.col("_qv"), F.col("_cv")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )
