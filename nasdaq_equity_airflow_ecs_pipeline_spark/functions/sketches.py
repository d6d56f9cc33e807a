"""Approximate aggregates for 100 TB cardinalities.

Exact COUNT(DISTINCT) over a high-cardinality key is a full dedup
shuffle; exact percentiles need a global sort. The approximate forms are
single-pass, mergeable sketches (HyperLogLog++ / KLL-style quantile
summaries) that partial-aggregate map-side like any algebraic function —
constant memory per group, one narrow shuffle of sketch bytes.

These wrap Spark built-ins (JVM-side, codegen-friendly) with the error
contracts spelled out; tests pin observed error against exact results.
The built-in sketch results are intentionally NOT in the DuckDB oracle
gate — two engines' HLL/KLL internals differ by design. The KMV sketch
below is the exception: built on a portable md5 hash, it is
deterministic across engines and IS oracle-checked (q_distinct_kmv).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count; relative standard deviation ``rsd``
    (default 5%; smaller rsd = bigger sketch, ~1.04/sqrt(m))."""
    return F.approx_count_distinct(col, rsd=rsd)


def approx_quantiles(col: Column | str, probs: list[float], accuracy: int = 10_000) -> Column:
    """Approximate quantiles; rank error <= 1/accuracy of the row count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(float(p)) for p in probs]), F.lit(accuracy)
    )


def approx_median(col: Column | str, accuracy: int = 10_000) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(c, F.lit(0.5), F.lit(accuracy))


# ----------------------------------------------------------- KMV sketch
KMV_BITS = 60
KMV_SPACE = float(1 << KMV_BITS)  # 2^60, exactly representable in double


def kmv_hash(col: Column | str) -> Column:
    """Portable 60-bit uniform hash (top 15 hex chars of md5) — the same
    construction `operators/lsh.py` uses, so Spark and any SQL engine
    with md5 produce identical values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def kmv_distinct(df, group_cols: list[str], value_col: str, k: int = 64):
    """K-minimum-values distinct-count estimate per group.

    Unlike HLL, KMV with a fixed hash is fully DETERMINISTIC — the same
    inputs give the same estimate on any engine and any partitioning, so
    it sits inside the exact-match oracle gate (the HLL wrapper above
    cannot). Estimator: with h_(k) the k-th smallest distinct hash value
    normalized to [0,1), E = (k-1) / (h_(k)/2^60); groups with fewer
    than k distinct values report the exact count.

    Plan: one hash-agg dedups (group, hash) with map-side combine, then
    a per-group sort of the DISTINCT hash set takes the k smallest —
    the window sort is over d distinct values per group, not rows. At
    100 TB the same shape holds; if d itself is huge the k smallest
    survive any per-partition pre-prune (min-k is algebraic), which
    Spark's TopK/AQE handles without code changes.
    """
    from pyspark.sql import Window

    hashed = (
        df.select(*group_cols, kmv_hash(value_col).alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .drop("_dup")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    kd = F.lit(float(k))
    return topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
    ).select(
        *group_cols,
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            (kd - F.lit(1.0))
            / (F.col("h_k").cast("double") / F.lit(KMV_SPACE))
        )
        .alias("distinct_est"),
    )


# ----------------------------------------------------- count-min sketch
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket(col: Column | str, seed: int, width: int = CMS_WIDTH) -> Column:
    """Portable bucket index for hash row ``seed``: the KMV md5
    construction over 'seed|value', mod width — identical on any engine
    with md5 (DuckDB twin: ``('0x' || substr(md5(...), 1, 15))::BIGINT %
    width``)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), c.cast("string"))), 1, 15),
        16, 10,
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def cms_build(
    df,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
):
    """Count-min counter matrix as a (row_i, bucket, cnt) frame —
    depth*width rows max, regardless of input size.

    Like KMV (and unlike HLL), the fixed portable hash makes the sketch
    fully DETERMINISTIC: same inputs -> bit-identical counters on any
    engine/partitioning, so it sits inside the exact-match oracle gate.
    The counters are an algebraic SUM, so Spark partial-aggregates
    map-side and the shuffle moves at most depth*width partial rows per
    task — the sketch is mergeable by construction (union two sketches =
    sum matching cells), which is what makes it a 100 TB operator: build
    per partition/day/shard, merge by addition, never rescan.

    Point-query guarantee: est >= true count, and with prob 1-(1/2)^depth
    the overestimate is < 2N/width (N = total count).
    """
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        cms_bucket(value_col, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.row_i").alias("row_i"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    counters,
    probes,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
):
    """Estimate counts for each distinct probe value: min over the
    depth counters the value hashes to. ``counters`` is cms_build's
    output (broadcast-sized: <= depth*width rows); the join is therefore
    a broadcast hash join against the probe set, no shuffle of probes."""
    pb = probes.select(value_col).distinct()
    cells = pb.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        cms_bucket(value_col, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(value_col, F.col("rb.row_i").alias("row_i"), F.col("rb.bucket").alias("bucket"))
    return (
        cells.join(F.broadcast(counters), ["row_i", "bucket"])
        .groupBy(value_col)
        .agg(F.min("cnt").alias("est_n"))
    )


# ---------------------------------------- histogram quantile sketch
def hist_build(
    df: "DataFrame",
    group_cols: list[str],
    value_col: str,
    width: float,
) -> "DataFrame":
    """Fixed-grid histogram sketch: (groups..., bucket, n) with
    ``bucket = floor(value / width)``.

    The distributed-quantile path at 100 TB: state is bounded by
    value-range/width (input-size-independent), partials merge by
    summing ``n`` (map-side combine does the heavy lifting), and —
    unlike t-digest/KLL — the sketch is DETERMINISTIC (no sampling, no
    order dependence), so it is exactly reproducible cluster-to-laptop
    and DuckDB-oracle-checkable. Accuracy: any quantile estimate is
    within one bucket width of an exact interpolated quantile."""
    b = F.floor(F.col(value_col) / F.lit(width)).cast("long")
    return df.groupBy(*group_cols, b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )


def hist_quantiles(
    hist: "DataFrame",
    group_cols: list[str],
    width: float,
    qs: list[float],
) -> "DataFrame":
    """Quantile estimates from a ``hist_build`` sketch (or a sum-merge of
    many): per group and q, find the bucket holding the nearest-rank
    order statistic (1-based ``r = max(1, ceil(q*N))``) in the
    cumulative histogram and place the estimate proportionally inside
    it. PROVABLE bound: the exact order statistic x_(r) lies in the
    picked bucket, so |estimate - x_(r)| < width always (an interpolated
    quantile can additionally differ by the gap between adjacent order
    statistics — a data property no bounded sketch controls). Integer
    ranks/counts end in ONE fixed-order double expression, so results
    are bit-identical cross-engine."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    c = hist.select(
        *group_cols,
        "bucket",
        "n",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("n_rows"),
    )
    c = c.withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in qs])))
    r = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("q") * F.col("n_rows").cast("double")).cast("long"),
    )
    cand = c.withColumn("r", r).filter(F.col("cum") >= F.col("r"))
    pick = cand.groupBy(*group_cols, "q").agg(
        F.min_by(
            F.struct("bucket", "n", "cum", "r", "n_rows"), F.col("bucket")
        ).alias("s")
    )
    est = F.col("s.bucket").cast("double") * F.lit(width) + F.lit(width) * (
        (F.col("s.r") - (F.col("s.cum") - F.col("s.n"))).cast("double")
        / F.col("s.n").cast("double")
    )
    return pick.select(
        *group_cols,
        "q",
        est.alias("est_quantile"),
        F.col("s.n_rows").alias("n_rows"),
    )


# ------------------------------------------------- deterministic HLL
HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_REST_BITS = KMV_BITS - HLL_P  # 52 hash bits feed the rank
HLL_RHO_MAX = HLL_REST_BITS + 1  # rho of an all-zero rest
# alpha_256 and the numerator computed ONCE in Python (IEEE doubles);
# the SQL oracle embeds repr() of the same values so both engines
# evaluate the identical literal
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_MAX)


def hll_registers(df, group_cols: list[str], value_col: str):
    """Per-group HyperLogLog register state (Flajolet et al. 2007) from
    the portable 60-bit md5 hash: bucket = low HLL_P bits, rho = count
    of leading zeros in the remaining HLL_REST_BITS bits + 1 (computed
    as HLL_RHO_MAX - length(bin(rest)) — integer/string ops only, no
    libm), register = MAX(rho).

    This is the sketch's 100 TB story: MAX per (group, bucket) is
    algebraic, so map-side combine reduces every partition to <= m
    rows per group before the shuffle, and register frames from
    disjoint corpus slices merge by the same MAX — the state a
    production pipeline persists per partition/day and folds at read
    time.
    """
    h = kmv_hash(value_col)
    rest = F.shiftright(h, HLL_P)
    rho = F.when(rest == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(rest))
    )
    return (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(HLL_M)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_distinct(df, group_cols: list[str], value_col: str):
    """Deterministic HyperLogLog distinct-count estimate per group.

    Engine-exactness: every term of the harmonic sum is the INTEGER
    2^(HLL_RHO_MAX - m_j) (a bigint shift, exact and order-independent
    under addition); absent buckets contribute 2^HLL_RHO_MAX each; the
    only float op is the final single divide of the Python-computed
    literal numerator by the bigint sum (one IEEE op each side). The
    raw estimator is used as-is: HLL's linear-counting small-range
    correction needs ln() (libm, not engine-exact), and the
    small-distinct regime is served exactly by :func:`kmv_distinct` —
    a documented scope cut, not an approximation bug. Unlike
    ``approx_distinct`` (Spark's native HLL++, seed- and
    implementation-defined), this estimate is bit-identical on any
    engine with md5.
    """
    regs = hll_registers(df, group_cols, value_col)
    per = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m_j)")
        ).alias("_sum_obs"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    total = F.col("_sum_obs") + (
        F.lit(HLL_M).cast("bigint") - F.col("n_buckets")
    ) * F.lit(1 << HLL_RHO_MAX).cast("bigint")
    return per.select(
        *group_cols,
        (F.lit(HLL_NUM) / total.cast("double")).alias("distinct_est"),
        F.col("n_buckets"),
    )
