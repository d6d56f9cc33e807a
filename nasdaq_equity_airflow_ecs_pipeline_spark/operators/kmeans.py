"""Distributed Lloyd's k-means over an embedding column — the iterative
IVF-centroid trainer (the contract's ivf queries use fixed seed
centroids; this is how production centroids are actually fit).

Iteration shape: assign (broadcast centroids, narrow pass over vectors,
min over (dist, cid) struct) -> recenter (posexplode dims, ONE groupBy
(cid, dim) shuffle, re-assemble arrays). The driver loop only chains
lazy plans; with ``materialize_each_iter`` the per-iteration result is
collected (k rows — tiny) and re-broadcast, keeping the plan depth
constant for large iteration counts.

Determinism: init = the k lowest-id vectors; means are
decimal-routed sums / counts so recentering is partition-order-free
(functions/stable.py discipline applied to vector math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import ivf_assign


def _recenter(df: DataFrame, assigned: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Element-wise cluster means: one shuffle keyed by (cid, dim)."""
    joined = assigned.select(id_col, "centroid_id").join(df, id_col)
    dims = joined.select(
        "centroid_id", F.posexplode(vec_col).alias("dim", "x")
    )
    per_dim = dims.groupBy("centroid_id", "dim").agg(
        (
            F.sum(F.col("x").cast("decimal(27,8)")).cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    return per_dim.groupBy("centroid_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("centroid_vec")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize_each_iter: bool = True,
) -> DataFrame:
    """Fit k centroids; returns (centroid_id, centroid_vec, n_members).

    centroid_id is the init vector's id (stable across runs)."""
    spark = df.sparkSession
    centroids = (
        df.orderBy(F.asc(id_col))
        .limit(k)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec"))
    )
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, id_col, vec_col)
        centroids = _recenter(df, assigned, id_col, vec_col)
        if materialize_each_iter:
            rows = centroids.collect()  # k rows — broadcast-sized
            centroids = spark.createDataFrame(
                [(r["centroid_id"], [float(x) for x in r["centroid_vec"]]) for r in rows],
                "centroid_id bigint, centroid_vec array<double>",
            )
    final_assign = ivf_assign(df, centroids, id_col, vec_col)
    sizes = final_assign.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n_members"))
    return centroids.join(sizes, "centroid_id", "left").select(
        "centroid_id", "centroid_vec", F.coalesce("n_members", F.lit(0)).alias("n_members")
    )
