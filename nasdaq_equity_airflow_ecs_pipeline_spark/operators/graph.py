"""Connected components over a pair graph — the clustering step that
turns near-duplicate PAIRS into dedup GROUPS (keep one canonical doc per
component).

Algorithm: iterative minimum-label propagation on DataFrames. Each
vertex starts labeled with itself; every round each vertex takes the
min label among itself and its neighbors; stop when no label changes.
Rounds needed = graph diameter — near-dup components are tiny cliques
(diameter 1-2), so this converges in 2-3 rounds at any corpus size.
Per round: one groupBy shuffle keyed by vertex. The classic large-graph
alternative (alternating large/small-star, Kiveris et al.) drops in
behind the same signature if components with large diameters appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(vertex, component) — component = min vertex id reachable.

    ``edges`` is undirected input (each pair once). Isolated vertices
    don't appear (callers union them back as their own component)."""
    spark = edges.sparkSession
    fwd = edges.select(F.col(src).alias("v"), F.col(dst).alias("n"))
    undirected = fwd.unionByName(
        edges.select(F.col(dst).alias("v"), F.col(src).alias("n"))
    )
    labels = undirected.select("v").distinct().withColumn("label", F.col("v"))
    for _ in range(max_iter):
        neighbor_min = (
            undirected.join(labels.withColumnRenamed("v", "n"), "n")
            .groupBy("v")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "v", "left")
            .select("v", F.least("label", F.coalesce("nmin", "label")).alias("label"))
        )
        # converged when no vertex changed label this round
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "v")
            .filter(F.col("a.label") != F.col("b.label"))
            .limit(1)
            .count()
        )
        # materialize: k rows per vertex set is fine to cache per round
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full-corpus dedup assignment: every doc gets a cluster id (the min
    doc_id of its near-dup component; singletons are their own cluster)
    and a keep flag for the canonical survivor."""
    comps = connected_components(pairs)
    out = docs.select(id_col).join(
        comps.withColumnRenamed("vertex", id_col), id_col, "left"
    )
    cluster = F.coalesce("component", F.col(id_col))
    return out.select(
        id_col,
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("is_canonical"),
    )
