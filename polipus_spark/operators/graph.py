"""Iterative graph dataflow: PageRank as join+agg rounds, integer-exact.

The relational PageRank (no GraphX, no RDDs): each iteration joins the
rank frame to the edge list on src, floor-divides rank by out-degree,
sums contributions per dst, and recombines with the teleport term and the
dangling-node mass. At scale this is one equi-join + one aggregation per
iteration — both partial-aggregated map-side — over frames partitioned by
node id; ``localCheckpoint`` per round keeps lineage flat exactly like
kmeans_centroids / bpe_train.

All arithmetic is SCALED-INTEGER: ranks live as ``rank_scaled = r·SCALE``
BIGINTs, every division is an explicit floor, and the damping factor is
the rational ``damp_num/damp_den``. Within the 2^53 double-exactness
bound every engine computes bit-identical values (IEEE division is
correctly rounded, floor of it is deterministic), so the DuckDB oracle
hash-matches exactly — no float-tolerance hand-waving in an iterative
fixpoint. The two driver-side scalars (node count, per-round dangling
mass) are 1-row aggregates — bounded, like topk.py's threshold sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over the UNDIRECTED graph of
    ``edges`` (src, dst) → (node, n_tri), nodes in ≥1 triangle only.

    Degree-oriented enumeration (the standard distributed formulation):
    canonicalize to unique undirected edges, orient every edge from the
    endpoint with the smaller (degree, id) to the larger, build wedges by
    self-joining oriented edges on their source, and close each wedge with
    an equi-join back to the oriented edge set. Orientation bounds every
    node's out-degree by O(sqrt(m)) — the wedge fan-out is m^1.5 worst
    case instead of sum(deg^2), which is what makes the plan survive
    power-law degree skew (a 10^7-degree hub contributes wedges only
    through its LOW-degree neighbours). Two equi-join shuffles + one
    count agg; no theta join, no cartesian anywhere.

    Counts are exact integers, so the DuckDB oracle (same CTE chain)
    hash-matches bit-for-bit."""
    e = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select(F.col("a"), F.col("b").alias("x"), F.col("db").alias("dx"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = o1.join(o2, "a").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    tris = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
    ).select(F.col("a"), F.col("x"), F.col("y"))
    return (
        tris.select(
            F.explode(F.array(F.col("a"), F.col("x"), F.col("y"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_tri"))
    )


def clustering_coefficients(edges: DataFrame, scale: int = 10_000) -> DataFrame:
    """Per-node local clustering coefficient over the undirected graph of
    ``edges``: cc = 2·triangles(node) / (deg·(deg−1)), emitted as the
    floor-scaled integer ``cc_scaled = (2·n_tri·scale) div (deg·(deg−1))``
    alongside the exact ``deg`` and ``n_tri`` — every output column is a
    BIGINT, so the DuckDB oracle hash-matches bit-for-bit. Nodes with
    deg < 2 have no defined coefficient and are excluded (the standard
    convention); nodes in no triangle report 0.

    One extra degree aggregation + a left join over triangle_counts —
    inherits its m^1.5 skew bound; no new anti-pattern."""
    e = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    tri = triangle_counts(edges)
    return (
        deg.where(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_tri"),
            F.expr(
                f"div(2 * coalesce(n_tri, 0) * {scale}, deg * (deg - 1))"
            ).cast("bigint").alias("cc_scaled"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """(node, rank_scaled) after ``n_iter`` rounds over distinct (src, dst)
    edges. Dangling mass is redistributed uniformly; teleport term is
    ``(1-d)/N``. ``sum(rank_scaled) ≈ scale`` (up to floor losses)."""
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    n = nodes.count()
    base = ((scale * (damp_den - damp_num)) // damp_den) // n
    r = nodes.select("node", F.lit(scale // n).cast("bigint").alias("rank_scaled"))
    for _ in range(max(n_iter, 0)):
        contribs = (
            e.join(r.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank_scaled") / F.col("deg"))
                 .cast("bigint").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_cs"))
        )
        dang = (
            r.join(F.broadcast(deg.select(F.col("src").alias("node"))),
                   "node", "left_anti")
            .agg(F.coalesce(F.sum("rank_scaled"), F.lit(0))
                 .cast("bigint").alias("_dm"))
        )
        r = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(damp_num)
                        * (F.coalesce(F.col("_cs"), F.lit(0))
                           + F.floor(F.col("_dm") / F.lit(n)).cast("bigint"))
                        / F.lit(damp_den)
                    ).cast("bigint")
                ).alias("rank_scaled"),
            )
            .localCheckpoint(eager=True)
        )
    return r
