"""Z-order (Morton) clustering for multi-column data-skipping layouts.

At 100 TB, scan pruning is the cheapest query accelerator there is: if
files are range-clustered on ONE column, min/max file statistics prune
scans filtered on that column but no other. Interleaving the bits of two
(or more) columns into a Morton code and range-partitioning on it gives
every interleaved column locality simultaneously — the same layout
Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's sort-order rewrite produce.
This operator is the relational core of that rewrite: compute the code,
assign range buckets (the would-be files), and report per-bucket min/max
spans as the data-skipping proof.

Everything is integer bit arithmetic (shift/mask/sum) on JVM built-ins —
deterministic, engine-portable, whole-stage-codegen'd; the bucket
assignment uses an exact pre-computed quantile split rather than
``ntile`` so results are partitioning-invariant.

Scale notes: the Morton code is a per-row map-side expression (no
shuffle); bucket boundaries come from one small aggregate over the code
(exact at testdata scale; at 100 TB swap in ``approx_percentile`` — the
boundaries only steer layout, their exactness is not a correctness
matter); the final ``repartitionByRange`` is the one unavoidable shuffle
any clustering rewrite pays.  The bucket ASSIGNMENT is driven by at most
``n_buckets - 1`` range boundaries — bounded by construction, collected
as k-row metadata (the k-means-centroid class) and baked into a pure
column expression, never a per-distinct-code map (which could reach
2^(2*bits) rows and blow any broadcast).  This matches Iceberg's
sort-order rewrite, whose metadata is file-count-bounded, never per-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per column; 2 columns -> 32-bit Morton code


def morton_code(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1. Values are masked to
    ``bits`` (callers rank/normalize first when domains exceed it)."""
    terms = []
    for i in range(bits):
        xbit = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        terms.append(
            xbit * F.lit(1 << (2 * i)) + ybit * F.lit(1 << (2 * i + 1))
        )
    code = terms[0]
    for t in terms[1:]:
        code = code + t
    return code


def zorder_layout(
    df: DataFrame,
    col_x: str,
    col_y: str,
    n_buckets: int,
    bits: int = ZBITS,
) -> DataFrame:
    """Assign each row a Z-order bucket (its would-be output file).

    Adds ``zcode`` (Morton code of the two columns masked to ``bits``)
    and ``zbucket`` (0..n_buckets-1, equi-depth on the code). Bucket
    boundaries are exact type-1 quantiles of the code distribution, so
    the assignment is a pure deterministic function of the input set.

    How the assignment scales: equi-depth bucket of code z is
    ``f(z) = min(floor(below(z) * n_buckets / total), n_buckets - 1)``
    where ``below(z)`` counts rows with a strictly smaller code.  Since
    ``f`` is non-decreasing in z, it is fully described by its at most
    ``n_buckets - 1`` step positions ``boundary_b = min{z : f(z) >= b}``,
    and ``f(z) = #{b : boundary_b <= z}``.  We compute the cumulative
    counts distributed (one hash-agg + one window over the |distinct
    code| aggregate), reduce them to the <= n_buckets achieved step
    positions, collect THOSE (k-row metadata, the k-means-centroid
    class), and assign buckets with a pure whole-stage-codegen'd column
    expression.  Nothing per-distinct-code is ever broadcast or joined —
    at dense code spaces (2^(2*bits) distinct values) the old per-code
    bucket map would exceed any broadcast budget; the boundary list
    cannot, by construction.

    The counts frame is persisted only for the duration of the (eager)
    boundary computation and released before this function returns, so
    no cache ever outlives the call.  Rows whose clustering columns are
    null get a null ``zbucket`` (they carry no range information — a
    writer routes them to a dedicated null file) and do not participate
    in the equi-depth boundary computation.
    """
    mask = (1 << bits) - 1
    coded = df.withColumn(
        "zcode",
        morton_code(
            F.col(col_x).cast("long").bitwiseAND(F.lit(mask)),
            F.col(col_y).cast("long").bitwiseAND(F.lit(mask)),
            bits,
        ),
    )
    # One small aggregate: |distinct codes| rows (<= 2^(2*bits), ~65k in
    # practice).  persist() so the full Morton-coded scan lineage
    # evaluates once across the two actions below, then release.
    # Null codes (null clustering column) are excluded: they carry no
    # range position, and a lone null group would otherwise surface as a
    # null step boundary (driver TypeError in the suffix-min walk).
    counts = (
        coded.filter(F.col("zcode").isNotNull())
        .groupBy("zcode")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    counts = counts.persist()
    try:
        total_row = counts.agg(F.sum("__n").alias("__t")).collect()
        total = total_row[0]["__t"] or 0
        if total == 0:
            return coded.withColumn("zbucket", F.lit(None).cast("int"))
        # Unpartitioned window: all distinct codes funnel through ONE
        # task, but the input is the counts aggregate — bounded by
        # |distinct codes|, not by |df|. Acceptable.
        w_cum = F.sum("__n").over(
            Window.orderBy("zcode").rowsBetween(Window.unboundedPreceding, -1)
        )
        achieved = (
            counts.withColumn("__below", F.coalesce(w_cum, F.lit(0)))
            .withColumn(
                "__fb",
                F.least(
                    F.floor(
                        F.col("__below") * n_buckets / F.lit(total)
                    ).cast("int"),
                    F.lit(n_buckets - 1),
                ),
            )
            # <= n_buckets rows by construction: __fb ranges over
            # 0..n_buckets-1, one row per achieved value.
            .groupBy("__fb")
            .agg(F.min("zcode").alias("__minz"))
            .collect()
        )
    finally:
        counts.unpersist()
    # boundary_b = min{z : f(z) >= b} = suffix-min of the achieved step
    # positions over fb >= b.  Walk descending once; buckets that no code
    # reaches simply contribute no boundary (and so are never assigned —
    # exactly the old per-code map's behavior).
    pairs = sorted((r["__fb"], r["__minz"]) for r in achieved)
    suffix_min: dict[int, int] = {}
    running = None
    for fb, minz in reversed(pairs):
        running = minz if running is None else min(running, minz)
        suffix_min[fb] = running
    # two-pointer walk over the sorted achieved steps: O(n_buckets + k)
    # (a per-b scan would be quadratic in the file count at scale)
    boundaries = []
    idx = 0
    for b in range(1, n_buckets):
        while idx < len(pairs) and pairs[idx][0] < b:
            idx += 1
        if idx == len(pairs):
            break
        boundaries.append(suffix_min[pairs[idx][0]])
    if boundaries:
        # flat literal-array + higher-order filter: ONE plan node of
        # constant depth regardless of n_buckets (a reduce()-built chain
        # of nested Adds is n_buckets deep and overflows the analyzer
        # stack at file-count-sized bucket counts)
        barr = F.array(*[F.lit(int(v)) for v in boundaries])
        bucket_expr = F.size(F.filter(barr, lambda b: F.col("zcode") >= b))
    else:
        bucket_expr = F.lit(0)
    return coded.withColumn(
        "zbucket",
        F.when(F.col("zcode").isNotNull(), bucket_expr).cast("int"),
    )


def zorder_skipping_stats(
    layout: DataFrame, col_x: str, col_y: str
) -> DataFrame:
    """Per-bucket min/max spans of both clustered columns — the file
    statistics a data-skipping reader would consult. Tight spans on BOTH
    columns (vs a single-column sort, which is tight on one and full-
    range on the other) are the measurable win of the Z-layout."""
    return layout.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(col_x).alias("x_min"),
        F.max(col_x).alias("x_max"),
        F.min(col_y).alias("y_min"),
        F.max(col_y).alias("y_max"),
    )
