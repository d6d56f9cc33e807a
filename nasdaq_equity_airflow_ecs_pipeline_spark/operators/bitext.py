"""Margin-based bitext mining (Artetxe & Schwenk, ACL 2019, "Margin-
based Parallel Corpus Mining with Multilingual Sentence Embeddings";
the LASER / CCMatrix / NLLB mining recipe): candidate translation
pairs score by the RATIO margin

    margin(x, y) = cos(x, y) /
        (avg cos of x's k-NN / 2 + avg cos of y's k-NN / 2)

— raw cosine over the average similarity of each side's neighborhood,
so a pair only wins when it is MUTUALLY exceptional, which kills the
hub problem (a vector close to everything) that a plain cosine
threshold cannot.

Fixed-point discipline: cosines come from the repo's deterministic
sequential-fold double arithmetic (operators/similarity.py — bit-
identical to DuckDB's left-to-right fold), then quantize ONCE to
BIGINT (floor(cos * 1e12)); every downstream sum/rank/division is
exact integer arithmetic, so neighborhood sums are order-free (a
float sum of k cosines would depend on aggregation order) and the
margin is ``cos_q * 2k * 1e6 div (ksum_x + ksum_y)``. Non-positive
cosines are dropped before ranking (margin mining only concerns
similar pairs), keeping every operand positive so Spark's truncating
``div`` and DuckDB's floor ``//`` agree.

Two pairing paths, one margin core (:func:`bitext_margin`):

- :func:`bitext_mine` — EXACT all-pairs: the quadratic validation
  twin (the embedding_neardup_pairs class). Correctness baseline.
- :func:`bitext_mine_ivf` — the scale path: both sides assign to a
  shared centroid table (one broadcast join each, the ivf_assign
  machinery), candidates are CLUSTER-equi-joined src x tgt pairs, and
  the margin's k-NN statistics are computed over the same candidate
  set (cluster-restricted neighborhoods — the approximate-kNN form
  production miners run). Work is sum_c |src_c| * |tgt_c| instead of
  |src| * |tgt|.

Output: the "max" mining strategy — per src vector its best-margin
candidate, kept when margin_x1e6 >= the threshold.

Reference parity: the reference is a row-level OHLCV ETL with no
embedding surface; engine-extension surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm2, ivf_assign

COSQ_SCALE = 10**12
MARGIN_SCALE = 1_000_000
BITEXT_K = 4
BITEXT_MARGIN_MIN_X1E6 = 1_050_000  # margin >= 1.05


def _cos_q_prenorm(a, b, anorm, bnorm):
    """cos_q over pre-computed per-vector norms: the pair stage folds
    ONE zip_with (the dot product) instead of three — sqrt(norm2) is a
    per-row projection on each side below the join, so it is computed
    n+m times, not n*m. Bit-identical: same IEEE doubles in the same
    ``dot / (sqrt(n2a) * sqrt(n2b))`` expression, just evaluated once
    per vector."""
    return F.floor(_dot(a, b) / (anorm * bnorm) * F.lit(COSQ_SCALE)).cast(
        "bigint"
    )


def bitext_margin(
    pairs: DataFrame,
    k: int = BITEXT_K,
    margin_min_x1e6: int = BITEXT_MARGIN_MIN_X1E6,
) -> DataFrame:
    """The margin core over a candidate frame (src_id, tgt_id, cos_q >
    0): forward/backward k-NN ranks, order-free integer neighborhood
    sums via partition windows, the ratio margin, and the per-src
    best-margin selection — no joins back to the vectors.

    Window specs are grouped by partition key (both tgt-keyed windows,
    then all three src-keyed ones) so the candidate frame crosses the
    network exactly twice: one Exchange on tgt_id, one on src_id; the
    final best-margin window rides the src_id partitioning already in
    place (a Sort, no third Exchange). Interleaving the specs — the
    naive spelling — costs five Exchanges for the same result, since
    each rank/sum pair alternates partition keys."""
    wf = Window.partitionBy("src_id").orderBy(F.desc("cos_q"), F.asc("tgt_id"))
    wb = Window.partitionBy("tgt_id").orderBy(F.desc("cos_q"), F.asc("src_id"))
    bsum = F.sum(
        F.when(F.col("brank") <= k, F.col("cos_q"))
    ).over(Window.partitionBy("tgt_id"))
    fsum = F.sum(
        F.when(F.col("frank") <= k, F.col("cos_q"))
    ).over(Window.partitionBy("src_id"))
    cand = (
        pairs.withColumn("brank", F.row_number().over(wb))
        .withColumn("bsum", bsum)
        .withColumn("frank", F.row_number().over(wf))
        .withColumn("fsum", fsum)
        .filter((F.col("frank") <= k) | (F.col("brank") <= k))
        .withColumn(
            "margin_x1e6",
            F.expr(
                f"(cos_q * {2 * k} * {MARGIN_SCALE}) "
                f"div greatest(fsum + bsum, 1)"
            ).cast("bigint"),
        )
    )
    wm = Window.partitionBy("src_id").orderBy(
        F.desc("margin_x1e6"), F.asc("tgt_id")
    )
    return (
        cand.withColumn("mrank", F.row_number().over(wm))
        .filter(
            (F.col("mrank") == 1)
            & (F.col("margin_x1e6") >= margin_min_x1e6)
        )
        .select(
            "src_id", "tgt_id", F.col("cos_q").alias("cos_x1e12"),
            "margin_x1e6",
        )
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = BITEXT_K,
    margin_min_x1e6: int = BITEXT_MARGIN_MIN_X1E6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs margin mining — the quadratic validation twin."""
    s = src.select(
        F.col(id_col).alias("src_id"),
        F.col(vec_col).alias("sv"),
        F.sqrt(_norm2(F.col(vec_col))).alias("snr"),
    )
    t = tgt.select(
        F.col(id_col).alias("tgt_id"),
        F.col(vec_col).alias("tv"),
        F.sqrt(_norm2(F.col(vec_col))).alias("tnr"),
    )
    pairs = (
        s.crossJoin(t)
        .select(
            "src_id",
            "tgt_id",
            _cos_q_prenorm(
                F.col("sv"), F.col("tv"), F.col("snr"), F.col("tnr")
            ).alias("cos_q"),
        )
        .filter(F.col("cos_q") > 0)
    )
    return bitext_margin(pairs, k, margin_min_x1e6)


def bitext_mine_ivf(
    src: DataFrame,
    tgt: DataFrame,
    centroids: DataFrame,
    k: int = BITEXT_K,
    margin_min_x1e6: int = BITEXT_MARGIN_MIN_X1E6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-bucketed margin mining: both sides assign to the shared
    centroid table (broadcast, k-row artifact), candidates and k-NN
    neighborhoods restrict to same-cluster pairs."""
    sa = src.join(
        ivf_assign(src, centroids, id_col=id_col, vec_col=vec_col).select(
            id_col, "centroid_id"
        ),
        id_col,
    ).select(
        F.col(id_col).alias("src_id"),
        F.col(vec_col).alias("sv"),
        F.sqrt(_norm2(F.col(vec_col))).alias("snr"),
        F.col("centroid_id").alias("cid"),
    )
    ta = tgt.join(
        ivf_assign(tgt, centroids, id_col=id_col, vec_col=vec_col).select(
            id_col, "centroid_id"
        ),
        id_col,
    ).select(
        F.col(id_col).alias("tgt_id"),
        F.col(vec_col).alias("tv"),
        F.sqrt(_norm2(F.col(vec_col))).alias("tnr"),
        F.col("centroid_id").alias("cid"),
    )
    pairs = (
        sa.join(ta, "cid")
        .select(
            "src_id",
            "tgt_id",
            _cos_q_prenorm(
                F.col("sv"), F.col("tv"), F.col("snr"), F.col("tnr")
            ).alias("cos_q"),
        )
        .filter(F.col("cos_q") > 0)
    )
    return bitext_margin(pairs, k, margin_min_x1e6)
