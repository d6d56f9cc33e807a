"""Connected components over a pair graph — the clustering step that
turns near-duplicate PAIRS into dedup GROUPS (keep one canonical doc per
component).

Two algorithms behind one signature:

- **Min-label propagation** (default): every round each vertex takes the
  min label among itself and its neighbors; stop when nothing changes.
  Rounds needed = graph diameter — near-dup components are tiny cliques
  (diameter 1-2), so this converges in 2-3 rounds at any corpus size.
  Per round: one groupBy shuffle keyed by vertex.
- **Alternating large-star / small-star** (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14): restructures the edge
  set toward stars rooted at component minima; converges in O(log n)
  rounds REGARDLESS of diameter. This is the fallback when real corpora
  produce chained near-dup components (doc A ~ B ~ C ~ ... chains) whose
  diameter exceeds the propagation budget — ``connected_components``
  switches to it automatically if label propagation exhausts
  ``max_iter`` without converging.
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
    don't appear (callers union them back as their own component).
    Falls back to the star algorithm on non-convergence (see module
    docstring)."""
    spark = edges.sparkSession
    # Materialize the edge set ONCE: callers pass a lazy plan (for dedup
    # clusters it's the whole MinHash+LSH pipeline) and every round joins
    # against it twice (neighbor-min + convergence count) — without this
    # the upstream lineage re-executes 2x per round.
    edges = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)
    fwd = edges.select(F.col("s").alias("v"), F.col("d").alias("n"))
    undirected = fwd.unionByName(
        edges.select(F.col("d").alias("v"), F.col("s").alias("n"))
    )
    labels = undirected.select("v").distinct().withColumn("label", F.col("v"))
    changed = 1
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
    if changed != 0:
        # diameter > max_iter: labels are not components yet — restart
        # with the O(log n)-round star algorithm instead of returning
        # silently-wrong partial labels (edges already checkpointed above,
        # now under canonical names s/d)
        return connected_components_star(edges, "s", "d")
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    Each round:
      large-star: for every vertex u, hang every neighbor v > u off
        m = min(neighbors(u) + [u]).
      small-star: for every vertex u, hang every neighbor v <= u (and u
        itself) off that same minimum.
    The edge set monotonically restructures into stars rooted at each
    component's minimum; both steps are one groupBy + one join — no
    collect, no degree blowup (edges emitted <= edges in). Converges in
    O(log n) rounds on any topology, so a 10^6-long chain needs ~20
    rounds where label propagation would need 10^6."""

    def _canon(e: DataFrame) -> DataFrame:
        # undirected edge set, canonical (big, small), self-loops dropped
        return (
            e.filter(F.col("u") != F.col("w"))
            .select(
                F.greatest("u", "w").alias("u"), F.least("u", "w").alias("w")
            )
            .distinct()
        )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        # neighbors of u (both orientations for large-star; canonical
        # orientation u>w already lists every smaller neighbor under u)
        nb = (
            e.unionByName(e.select(F.col("w").alias("u"), F.col("u").alias("w")))
            if large
            else e
        )
        m = nb.groupBy("u").agg(
            F.least(F.min("w"), F.first("u")).alias("m")
        )
        joined = nb.join(m, "u")
        if large:
            out = joined.filter(F.col("w") > F.col("u")).select(
                F.col("w").alias("u"), F.col("m").alias("w")
            )
        else:
            out = (
                joined.select(F.col("w").alias("u"), F.col("m").alias("w"))
                .unionByName(
                    joined.select(F.col("u"), F.col("m").alias("w")).distinct()
                )
            )
        return _canon(out)

    # materialize once: each _star references its input twice (min-agg +
    # join back), so an unmaterialized caller plan would execute 4x in
    # the first round alone
    e = _canon(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
    ).localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_rounds):
        e = _star(_star(e, large=True), large=False)
        e = e.localCheckpoint(eager=True)
        # convergence = edge set unchanged (order-free signature);
        # decimal sum — a plain long sum of 64-bit hashes overflows
        # under ANSI mode
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "w").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # stars: every non-root u carries (u, root); roots label themselves
    members = e.select(F.col("u").alias("vertex"), F.col("w").alias("component"))
    roots = (
        members.select(F.col("component").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    return members.unionByName(roots)


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


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over a
    SYMMETRIC directed edge list (src, dst) — the graph-quality metric
    behind community detection and spam-graph pruning.

    Algorithm (node-iterator on canonical edges): orient every edge
    a < b, then a triangle a < b < c is exactly one path (a,b),(b,c)
    closed by (a,c) — each triangle is found ONCE, no post-division by
    3 or 6. Two hash joins on the canonical edge set; per-node counts
    come from exploding each found triangle to its three corners.

    Clustering coefficient: 2*T(v) / (deg(v) * (deg(v)-1)) with the
    undirected degree; isolated-pair nodes (deg 1) report 0.0.

    Scale: the canonical edge table is joined twice on its key columns —
    both joins shuffle on a single bigint key and skew only where a
    vertex's degree is huge (the same high-degree hazard every triangle
    algorithm has; the standard mitigation, dropping super-nodes above a
    degree cap, composes as a filter on `deg` before the joins).
    """
    from pyspark import StorageLevel

    # canon feeds THREE join legs and deg one more scan — materialize it
    # once or the (possibly expensive) edge-derivation lineage runs four
    # times; same persist discipline as boilerplate_flags/substring dedup
    canon = (
        edges.filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        canon.select(F.col("src").alias("node"))
        .unionAll(canon.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e1 = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    tcount = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    return (
        deg.join(tcount, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.when(
                F.col("deg") > 1,
                F.lit(2.0)
                * F.coalesce("n_tri", F.lit(0)).cast("double")
                / (
                    F.col("deg").cast("double")
                    * (F.col("deg").cast("double") - F.lit(1.0))
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )
