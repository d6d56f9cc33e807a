"""Fixed-iteration PageRank in scaled-integer (fixed-point) arithmetic.

Why fixed-point: a distributed PageRank that sums double contributions
is nondeterministic across partitionings (FP addition is not
associative) and can never be compared bit-for-bit against another
engine. Ranks here are BIGINTs scaled by 10^12; every operation is
integer multiply / integer divide / integer sum — exact, associative,
and reproducible on any engine and any partitioning. With damping 0.85
expressed as the rational 17/20, one iteration is:

    rank'(v) = (3 * SCALE) div (20 * n)                 # (1-d)/n
             + (17 * sum over in-edges of contrib) div 20
    contrib(u) = rank(u) div outdeg(u)

The `div` truncation loses < 1 unit per op — at SCALE=10^12 the
relative error is ~1e-12 per iteration, far below anything a float
implementation guarantees.

Scale shape: per iteration one join (edges x ranks, hash on src — ranks
is the small side at web-graph fan-outs and is broadcast when it fits)
and one hash-agg on dst. Degrees are computed once. The node count is a
1-row aggregate joined by broadcast, never a driver collect, so the
whole plan stays lazy/distributed. At 1000 executors the edge table
partitioning is reused across iterations (same key), and each round's
lineage is cut with localCheckpoint to stop plan growth — the same
treatment `operators/graph.py` applies to label propagation.

Reference parity: the reference has no graph op at all (it is a
row-level OHLCV ETL: /root/reference/glue/jobs/build_stock_fact_table.py
plus build_stock_aggregations.py rollups);
this is part of the engine-extension surface (SURVEY.md section 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 10^12 fixed-point scale


def co_order_edges(lineitem: DataFrame) -> DataFrame:
    """Directed edge list (src, dst) between distinct parts that appear
    in the same order (both directions, so the graph is symmetric).
    Self-join on the order key: per-order line counts are small and
    bounded (TPC-H <= 7), so the pair expansion is linear in orders."""
    a = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank_fixed_point(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Ranks after `iters` rounds over a directed edge list.

    Returns (node, rank_scaled) with rank_scaled a BIGINT in units of
    1/SCALE. Nodes are every vertex that appears as a source (symmetric
    edge sets make that "every vertex"); dangling mass is not
    redistributed (matches the unrolled SQL oracle exactly).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n1 = nodes.agg(F.count(F.lit(1)).alias("n"))  # 1-row, broadcast below

    # init: rank = SCALE div n
    ranks = (
        nodes.join(F.broadcast(n1))
        .select(
            "node",
            "deg",
            F.expr(f"{SCALE} div n").alias("rank"),
            "n",
        )
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.select(
                    F.col("node").alias("src"),
                    F.expr("rank div deg").alias("c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            ranks.select("node", "deg", "n")
            .join(contrib, "node", "left")
            .select(
                "node",
                "deg",
                "n",
                (
                    F.expr(f"(3 * {SCALE}) div (20 * n)")
                    + F.expr("(17 * coalesce(in_sum, 0)) div 20")
                ).alias("rank"),
            )
        )
        # cut lineage so the iteration-k plan doesn't re-run rounds 1..k-1
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("rank").alias("rank_scaled"))
