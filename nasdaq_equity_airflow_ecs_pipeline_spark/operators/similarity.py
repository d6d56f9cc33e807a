"""Embedding similarity search: brute-force cosine top-k (correctness
baseline) and IVF-bucketed search (the scale path).

Vectors are ``array<float>`` columns; all arithmetic happens in double
via sequential folds (``F.aggregate``/``zip_with``) — deterministic IEEE
order, bit-identical to a single-threaded oracle looping left-to-right.

Scale shape: brute force is O(n) per query — fine for one query vector
against 100 TB *if* the scan is columnar and the top-k is a partial
aggregate (Spark's TakeOrderedAndProject does partial per-partition
top-k, so only k rows per partition reach the driver-side merge). For
many-query workloads, IVF: assign vectors to nearest centroid once (one
broadcast join), then probe only matching buckets — turning n_q * n into
n_q * (n / n_centroids) with the bucket join hash-partitioned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_norm2(a)) * F.sqrt(_norm2(b)))


def _pair_d2(a: Column, b: Column) -> Column:
    """Squared L2 between two vector columns as the same sequential
    zip_with/aggregate fold everywhere (one spelling keeps the
    oracle-parity arithmetic in one place)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against one query vector (the exact
    baseline every ANN variant is measured against)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def cosine_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Brute-force cosine top-k per query for a (small) query workload
    frame — the batch twin of :func:`cosine_topk` and the semantic leg
    of hybrid retrieval (operators/retrieval.py).

    Scale shape: the query frame broadcasts (q rows — a workload, not a
    corpus); one narrow pass scores q * n pairs; top-k is a row_number
    window partitioned by query (q partitions, never a global sort).
    The corpus is scanned once regardless of q."""
    scored = df.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec)).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


# Measured crossover for the assignment inner loop (EXPLAIN.md "IVF
# assignment: Arrow vs codegen by dimensionality"): at 64-dim the
# zip_with/aggregate codegen path wins (5.7 s vs 7.7 s, 200k x k=800);
# at 768-dim it collapses (139 s vs 1.4 s at 100k x k=256 — zip_with
# materializes a dim-length array per (vector, centroid) pair and the
# fold is interpreted per element). 128 is a conservative midpoint:
# everything measured at or below 64 favours codegen, everything at or
# above 768 favours Arrow by ~100x; contract/test corpora are 64-dim so
# "auto" never flips the bit-exact oracle path there.
IVF_ARROW_MIN_DIM = 128


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    mode: str = "codegen",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2).

    Broadcast the (small) centroid table, one narrow pass over the
    vectors, min over a (distance, centroid) struct — no shuffle of the
    big side. This is the IVF build step; at 100 TB the result is written
    partitioned by centroid so probes prune partitions.

    ``mode`` picks the inner-loop implementation:

    - ``"codegen"`` (default): the zip_with/aggregate expression fold —
      deterministic sequential IEEE order, bit-identical to the DuckDB
      oracle. The contract path.
    - ``"arrow"``: :func:`ivf_assign_arrow` — one numpy matrix product
      per Arrow batch. ~100x faster at production embedding widths
      (measured 768-dim, EXPLAIN.md) but numpy pairwise summation may
      differ in the last ulp near exact ties.
    - ``"auto"``: probe the centroid width (a k-row metadata job) and
      take Arrow at >= ``IVF_ARROW_MIN_DIM`` dims, codegen below. Use in
      production index builds where the width is data-dependent; the
      64-dim contract corpora stay on codegen under this rule.
    """
    if mode not in ("codegen", "arrow", "auto"):
        raise ValueError(f"ivf_assign mode must be codegen|arrow|auto, got {mode!r}")
    if mode == "auto":
        probe = centroids.select(F.size(centroid_vec).alias("d")).first()
        dim = probe["d"] if probe is not None else 0
        mode = "arrow" if dim >= IVF_ARROW_MIN_DIM else "codegen"
    if mode == "arrow":
        return ivf_assign_arrow(df, centroids, id_col, vec_col, centroid_id, centroid_vec)
    pairs = df.crossJoin(F.broadcast(centroids))
    d2 = _pair_d2(F.col(vec_col), F.col(centroid_vec))
    scored = pairs.select(
        F.col(id_col),
        F.struct(d2.alias("d2"), F.col(centroid_id).alias("cid")).alias("sc"),
    )
    best = scored.groupBy(id_col).agg(F.min("sc").alias("best"))
    return best.select(
        F.col(id_col),
        F.col("best.cid").alias(centroid_id),
        F.col("best.d2").alias("dist2"),
    )


def ivf_search(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """IVF probe: rank centroids against the query driver-side-free (a
    broadcastable ``nprobe`` shortlist), keep only vectors assigned to
    those centroids, brute-force cosine inside the probed buckets.

    Scans n * (nprobe / n_centroids) of the data instead of n — with the
    assignment table partitioned by centroid, the non-probed partitions
    are pruned at the source. Recall < 1.0 by construction; the
    brute-force path is the ground truth it is measured against."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    assigned = ivf_assign(df, centroids, id_col, vec_col, centroid_id, centroid_vec)
    cd2 = _pair_d2(F.col(centroid_vec), q)
    probed = (
        centroids.select(F.col(centroid_id), cd2.alias("qd2"))
        .orderBy(F.asc("qd2"), F.asc(centroid_id))
        .limit(nprobe)
        .select(centroid_id)
    )
    candidates = (
        df.join(assigned, id_col)
        .join(F.broadcast(probed), centroid_id)
    )
    return (
        candidates.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_search_quantized(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 2,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """IVF probe over int8-quantized inverted lists + exact re-score.

    The 100 TB memory shape: probed buckets are scanned as int8 codes +
    one scale per vector (4x fewer bytes than float32 — the dominant cost
    of a probe is reading the inverted lists), candidates ranked by the
    approximate score scale * (q_codes . query), and only the top
    ``k * oversample`` shortlist touches the full-precision vectors for
    an exact cosine re-score. Same result columns as :func:`ivf_search`;
    with int8's <0.4% per-element error and any sane oversample the
    shortlist contains the true top-k, so outputs match the
    full-precision probe (asserted in tests, not assumed).

    Quantization inline (operators/quantize.py arithmetic, packed form):
    at scale the codes come precomputed from the index build — pass
    ``df`` already carrying (qvec, qscale) columns to skip the inline
    step."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    assigned = ivf_assign(df, centroids, id_col, vec_col, centroid_id, centroid_vec)
    cd2 = _pair_d2(F.col(centroid_vec), q)
    probed = (
        centroids.select(F.col(centroid_id), cd2.alias("qd2"))
        .orderBy(F.asc("qd2"), F.asc(centroid_id))
        .limit(nprobe)
        .select(centroid_id)
    )
    if "qvec" in df.columns and "qscale" in df.columns:
        coded = df
    else:
        vecd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
        amax = F.array_max(F.transform(vecd, F.abs))
        scale = amax / F.lit(127.0)
        qvec = F.when(scale == 0.0, F.transform(vecd, lambda v: F.lit(0))).otherwise(
            F.transform(
                vecd,
                lambda v: F.greatest(
                    F.lit(-127),
                    F.least(F.lit(127), F.floor(v / scale + F.lit(0.5))),
                ).cast("int"),
            )
        )
        coded = df.select(
            F.col(id_col), F.col(vec_col), qvec.alias("qvec"), scale.alias("qscale")
        )
    candidates = coded.join(assigned, id_col).join(F.broadcast(probed), centroid_id)
    approx = (
        F.col("qscale")
        * F.aggregate(
            F.zip_with(F.col("qvec"), q, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    ).alias("approx_dot")
    shortlist = (
        candidates.select(F.col(id_col), F.col(vec_col), approx)
        .orderBy(F.desc("approx_dot"), F.asc(id_col))
        .limit(k * oversample)
    )
    return (
        shortlist.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_planes(
    n_planes: int, dim: int, seed: int = 42
) -> list[list[float]]:
    """Deterministic random hyperplanes (numpy PCG64 stream is
    version-stable), shared with the oracle-SQL generator."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((n_planes, dim))]


def embedding_neardup_lsh(
    df: DataFrame,
    threshold: float,
    bands: int = 4,
    planes_per_band: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane LSH — the scale path
    the quadratic ``embedding_neardup_pairs`` baseline validates.

    sign(v . r) agrees for two vectors with prob 1 - angle/pi, so a band
    of b sign-bits collides with p^b and any-of-B bands with
    1-(1-p^b)^B — tune (bands, planes_per_band) to the target recall at
    the threshold.

    Plan shape (bucket-local vectorized verify): ONE Arrow-batched numpy
    matmul computes all band signatures; vectors shuffle WITH their band
    rows (replication factor = bands) into per-bucket groups; each bucket
    runs a numpy pairwise-cosine block and emits only pairs within 1e-6
    of the threshold — so candidate pairs never materialize as rows (the
    naive expand-distinct-join plan shuffles O(sum bucket^2) candidate
    rows; this emits only ~matches, 1000x fewer at sf0.1). Survivors are
    deduped across bands and re-scored with the EXACT sequential-fold
    cosine (bit-identical to the single-threaded oracle), so the numpy
    pre-filter affects nothing but speed: numpy's pairwise summation
    differs from the sequential fold by <= ~1e-13 relative, 7 orders of
    magnitude inside the 1e-6 margin — LSH affects recall only, never
    precision.

    100 TB note: bucket groups are processed independently (applyInPandas
    over (band, bucket-hash)), so the operator scales with the number of
    buckets; a pathologically hot bucket is O(bucket^2) like any LSH —
    widen planes_per_band (more, smaller buckets) before salting.
    """
    planes = hyperplane_planes(bands * planes_per_band, dim, seed)

    import numpy as np
    import pandas as pd

    P_T = np.array(planes, dtype=np.float64).T  # (dim, n_planes)

    def _band_hashes(embs):  # pd.Series -> pd.Series (hints would be
        # stringified by `from __future__ import annotations`, which
        # pandas_udf's signature inspection rejects)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        bits = (V @ P_T) >= 0  # (n, bands * planes_per_band)
        return pd.Series([
            [
                "".join("1" if b else "0" for b in row[i * planes_per_band:(i + 1) * planes_per_band])
                for i in range(bands)
            ]
            for row in bits
        ])

    band_hashes = F.pandas_udf(_band_hashes, "array<string>")

    rows = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("_v"),
        F.posexplode(band_hashes(F.col(vec_col))).alias("band", "bh"),
    )

    margin = float(threshold) - 1e-6

    def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        """Tiled pairwise verify: peak memory is one (tile x n) block, NOT
        the full n x n cosine matrix — a hot bucket degrades to more tiles
        (linear slowdown), never to an O(bucket^2) allocation (a 31k-row
        bucket would otherwise need a 7.7 GB matrix per task; with 32
        concurrent tasks that is an instant OOM at scale)."""
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        order = np.argsort(pdf["id"].to_numpy())
        ids = pdf["id"].to_numpy()[order]
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf["_v"].to_numpy()[order]])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        # ~32 MB of C-block per task regardless of bucket size
        tile = max(64, 4_000_000 // n)
        out_a, out_b = [], []
        for i0 in range(0, n - 1, tile):
            i1 = min(i0 + tile, n)
            C = Vn[i0:i1] @ Vn.T  # (tile, n)
            ia, ib = np.nonzero(C >= margin)
            ga = ia + i0
            keep = ib > ga  # upper triangle only, in global coordinates
            out_a.append(ids[ga[keep]])
            out_b.append(ids[ib[keep]])
        return pd.DataFrame({
            "id_a": np.concatenate(out_a) if out_a else np.array([], dtype="int64"),
            "id_b": np.concatenate(out_b) if out_b else np.array([], dtype="int64"),
        })

    matches = (
        rows.groupBy("band", "bh")
        .applyInPandas(_bucket_pairs, "id_a long, id_b long")
        .distinct()
    )

    normed = df.select(
        F.col(id_col), F.col(vec_col),
        F.sqrt(_norm2(F.col(vec_col))).alias("_n"),
    )
    va = normed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_n").alias("_na")
    )
    vb = normed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_n").alias("_nb")
    )
    return (
        matches.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    right_df: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold.

    With ``bucket_col`` (e.g. an IVF centroid or LSH bucket) the self-join
    is restricted to same-bucket pairs — the scale path. Without it this
    is the exact quadratic baseline (small inputs / validation only).
    With ``right_df`` the pair generation is ``df`` x ``right_df``
    (still id_a < id_b) instead of a self-join — the incremental
    delta-probe shape, where ``right_df`` is the delta and ``df`` the
    standing-union frame.

    Norms are computed ONCE per vector before the join (O(n) instead of
    O(n^2) norm folds); sqrt(norm2) per side is the same IEEE operation
    sequence as computing it inside the pair expression, so results stay
    bit-identical to the oracle. This is the ONE spelling of the pair
    cosine — every near-dup consumer routes through it."""
    keep = [id_col, vec_col] + ([bucket_col] if bucket_col else [])

    def _normed(frame):
        return frame.select(
            *keep, F.sqrt(_norm2(F.col(vec_col))).alias("_n")
        )

    normed = _normed(df)
    left = normed.alias("l")
    right = (_normed(right_df) if right_df is not None else normed).alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    if bucket_col is not None:
        cond = cond & (F.col(f"l.{bucket_col}") == F.col(f"r.{bucket_col}"))
    return (
        left.join(right, cond)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            (
                _dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
                / (F.col("l._n") * F.col("r._n"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): cluster the embeddings, compare
    pairs ONLY within a cluster, and drop every vector that has a
    lower-id near-duplicate (cosine >= threshold) in its cluster —
    deterministic lowest-id-wins, applied regardless of whether that
    lower-id neighbor itself survives (a defined, order-free policy; the
    paper keeps one representative per dup set, which this refines to an
    engine-portable rule).

    Scale shape: the clustering bounds the pair blowup exactly like an
    LSH band join — ``ivf_assign`` is a map-side broadcast of k centroid
    rows, the pair generation is an EQUI-join on ``centroid_id`` (never
    all-pairs), and the final survivor filter is a left-anti join on the
    id. At 100 TB, k grows with the corpus so per-cluster populations
    stay bounded; the quadratic work is per-cluster, not global.

    Returns the surviving rows of ``df`` plus their ``centroid_id``.
    """
    assigned = ivf_assign(df, centroids, id_col, vec_col).select(
        id_col, "centroid_id"
    )
    clustered = df.join(assigned, id_col)
    pairs = embedding_neardup_pairs(
        clustered, threshold, id_col, vec_col, bucket_col="centroid_id"
    )
    dups = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return clustered.join(dups, [id_col], "left_anti")


def _query_d2(centroid_vec: str, query_vec: list[float]) -> Column:
    """Squared L2 from each centroid to one literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return _pair_d2(F.col(centroid_vec), q)


IVF_MANIFEST_DIR = "_ivf_manifest"


def ivf_write_partitioned(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> None:
    """Materialize the IVF "inverted lists" as a lake layout: assign each
    vector to its nearest centroid (one broadcast pass, operators above)
    and write the corpus parquet-partitioned by ``centroid_id`` — one
    Hive directory per inverted list. This is the at-scale counterpart
    of the in-query ``ivf_search`` join: with the lists on disk, a probe
    reads ONLY the ``nprobe`` matching directories (same manifest
    pattern as ``sources/skipping.py``) instead of scanning the corpus
    and filtering. The reference's analog is its Iceberg partition
    layout (SURVEY.md §4.1); FAISS calls this structure the IVF index.
    """
    assigned = ivf_assign(
        df, centroids, id_col, vec_col, centroid_id, centroid_vec
    ).select(id_col, centroid_id)
    listed = df.join(assigned, id_col)
    listed.write.partitionBy(centroid_id).mode("overwrite").parquet(path)
    # non-empty-list manifest (the sources/skipping.py _zmanifest
    # precedent): a probed centroid with an EMPTY inverted list has no
    # directory on disk, so the searcher consults this k-row-bounded
    # manifest instead of trusting the centroid table. Underscore prefix
    # keeps it invisible to full-layout data discovery. Aggregated from
    # the just-written layout (partition-column + metadata scan), NOT by
    # re-evaluating the assignment lineage over the corpus. An empty
    # corpus writes no partition directories at all (only _SUCCESS), so
    # the read-back cannot infer a schema — that case gets an explicitly
    # typed empty manifest (every probe then correctly finds no lists).
    spark = df.sparkSession
    try:
        written = spark.read.parquet(path)
        manifest = written.groupBy(centroid_id).agg(
            F.count(F.lit(1)).alias("n_vectors")
        )
    except Exception:
        cid_type = centroids.schema[centroid_id].dataType.simpleString()
        manifest = spark.createDataFrame(
            [], f"{centroid_id} {cid_type}, n_vectors bigint"
        )
    manifest.write.mode("overwrite").parquet(f"{path}/{IVF_MANIFEST_DIR}")


def ivf_search_partitioned(
    spark,
    path: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """ANN probe against an ``ivf_write_partitioned`` layout: rank the
    k-row centroid table against the query, collect the ``nprobe``
    winning centroid ids (metadata-sized, the ``sources/skipping.py``
    manifest-collect precedent), and hand the parquet reader ONLY those
    partition directories — non-probed lists are never listed, let alone
    read (``df.inputFiles()`` shrinks by ~nprobe/k_centroids; pinned in
    tests). Probed centroids whose inverted list is EMPTY (no directory
    on disk) are dropped via the layout's ``_ivf_manifest`` rather than
    crashing the reader. Result contract: identical rows to
    ``ivf_search`` over the same corpus/centroids (same fold
    arithmetic, same tie-break)."""
    ranked = (
        centroids.select(
            F.col(centroid_id), _query_d2(centroid_vec, query_vec).alias("qd2")
        )
        .orderBy(F.asc("qd2"), F.asc(centroid_id))
        .limit(nprobe)
    )
    probed = sorted(r[centroid_id] for r in ranked.collect())
    # k-row-bounded manifest collect: which inverted lists exist on disk
    manifest = spark.read.parquet(f"{path}/{IVF_MANIFEST_DIR}")
    present = {r[centroid_id] for r in manifest.select(centroid_id).collect()}
    probed = [p for p in probed if p in present]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    if not probed:  # every probed list empty: no candidates by definition
        empty = spark.createDataFrame([], f"{id_col} bigint, cosine double")
        return empty
    scan = spark.read.option("basePath", path).parquet(
        *[f"{path}/{centroid_id}={p}" for p in probed]
    )
    return (
        scan.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ann_recall(
    df: DataFrame,
    centroids: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """Recall@k of the IVF probe against the exact top-k, per query —
    the eval harness every ANN deployment needs BEFORE trusting the
    approximate path for dedup/retrieval (recall < 1.0 is by
    construction, not a bug; this measures how much).

    Set-based, no driver loops: the exact side pays ONE corpus x
    queries broadcast scoring pass (n_q is a small eval set by
    definition — the n * n_q scan is the exact baseline's irreducible
    cost) with a row_number window per query; the approx side scores
    ONLY the probed-bucket candidates (~nprobe/k_centroids of the
    corpus per query — the probe's own cost shape, so the eval costs
    what exact + probe cost, nothing double). A left join counts
    overlaps. Returns (query_id, n_hits, recall)."""
    from pyspark.sql import Window

    scored = (
        df.crossJoin(F.broadcast(queries_df))
        .select(
            F.col(query_id),
            F.col(id_col),
            cosine(F.col(vec_col), F.col(query_vec)).alias("_cos"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("_cos"), F.asc(id_col))
    exact = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id, id_col)
    )
    # per-query centroid shortlist (k_c x n_q rows, all metadata-sized)
    cq_d2 = _pair_d2(F.col(centroid_vec), F.col(query_vec))
    wp = Window.partitionBy(query_id).orderBy(F.asc("_qd2"), F.asc(centroid_id))
    probed = (
        centroids.crossJoin(F.broadcast(queries_df))
        .select(F.col(query_id), F.col(centroid_id), cq_d2.alias("_qd2"))
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id, centroid_id)
    )
    assigned = ivf_assign(
        df, centroids, id_col, vec_col, centroid_id, centroid_vec
    ).select(id_col, centroid_id)
    # candidates first, THEN score: cosines are computed for the probed
    # subset only, not by re-running the full scoring pass
    approx = (
        df.join(assigned, id_col)
        .join(probed, centroid_id)
        .join(F.broadcast(queries_df), query_id)
        .select(
            F.col(query_id),
            F.col(id_col),
            cosine(F.col(vec_col), F.col(query_vec)).alias("_cos"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id, id_col, F.lit(1).alias("_hit"))
    )
    return (
        exact.join(approx, [query_id, id_col], "left")
        .groupBy(query_id)
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).cast("bigint").alias("n_hits"))
        .withColumn("recall", F.col("n_hits") / F.lit(float(k)))
    )


def incremental_semantic_dedup(
    standing_assigned: DataFrame,
    delta: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """SemDeDup index maintenance (the :func:`semantic_dedup` analog of
    ``operators/lsh.py incremental_lsh_pairs``): a DELTA of new vectors
    is deduped against a standing clustered index WITHOUT re-pairing
    the standing corpus. ``standing_assigned`` is the published index —
    every standing vector with its ``centroid_id`` (ALL vectors, not
    just survivors: the lowest-id-wins policy drops on any lower-id
    neighbor, surviving or not, so verdicts stay identical to a full
    recompute). A delta vector is dropped iff a lower-id near-dup
    (cosine >= threshold) shares its cluster in standing ∪ delta;
    standing rows are never re-examined (published data is immutable —
    the production contract).

    Scale shape: one broadcast assign over the delta, then ONE
    cluster-equi-join with the comparison restricted to (any vector,
    delta vector) — per-cluster work is |cluster| x |delta_cluster|,
    the delta-probe cost, never standing x standing."""
    assigned = ivf_assign(
        delta, centroids, id_col, vec_col, centroid_id, centroid_vec
    ).select(id_col, centroid_id)
    # pin the assigned delta: it feeds three plan branches (the union,
    # the probe's right side, and the final anti-join) and Spark does
    # not CSE across them — without pinning, the broadcast assignment
    # scan would run three times (the token_budget_select precedent)
    delta_c = (
        delta.join(assigned, id_col)
        .select(id_col, vec_col, centroid_id)
        .localCheckpoint(eager=True)
    )
    both = standing_assigned.select(id_col, vec_col, centroid_id).unionByName(
        delta_c
    )
    dups = (
        embedding_neardup_pairs(
            both,
            threshold,
            id_col,
            vec_col,
            bucket_col=centroid_id,
            right_df=delta_c,
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return delta_c.select(id_col, centroid_id).join(
        dups, [id_col], "left_anti"
    )


def ivf_assign_arrow(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """Arrow-vectorized twin of :func:`ivf_assign` for large ``k``: the
    same argmin-by-squared-L2 assignment computed as ONE numpy matrix
    product per Arrow batch (``|v|² - 2·V·Cᵀ + |c|²``) instead of k
    Catalyst expression-folds per row. Ties break to the LOWEST
    centroid_id (centroid matrix ordered by id + argmin-first-
    occurrence), matching the struct-min rule.

    Measured at both ends of the width axis (local[32], EXPLAIN.md
    "IVF assignment: Arrow vs codegen by dimensionality"): at 64-dim
    (200k x k=800) codegen won 5.7 s vs 7.7 s — Arrow transfer
    dominates where the expression fold is already memory-bound-fast.
    At 768-dim (100k x k=256) codegen collapsed to 139 s vs 1.4 s here
    (~97x): zip_with materializes a dim-length intermediate array per
    (vector, centroid) pair and the aggregate lambda is evaluated per
    element, so allocation/GC swamps the arithmetic, while this path is
    one BLAS matmul per Arrow batch. :func:`ivf_assign` with
    ``mode="auto"`` dispatches on the measured crossover
    (``IVF_ARROW_MIN_DIM``).

    NOT the oracle path: numpy's pairwise summation can differ from the
    sequential fold in the last ulp, so a vector within ~1 ulp of
    equidistant may flip clusters. Use :func:`ivf_assign` where
    bit-exact cross-engine verdicts are the contract (every contract
    query does); use this in production index builds where throughput
    matters and cluster assignment near exact ties is arbitrary anyway.
    Equality on the test corpora is asserted in
    tests/test_operators.py, not assumed. The k-row centroid collect is
    the k-means-centroid metadata class."""
    import numpy as np

    rows = sorted(
        centroids.select(centroid_id, centroid_vec).collect(),
        key=lambda r: r[centroid_id],
    )
    C = np.array([list(r[centroid_vec]) for r in rows], dtype=np.float64)
    ids = np.array([r[centroid_id] for r in rows], dtype=np.int64)
    c2 = (C * C).sum(axis=1)
    schema = f"{id_col} bigint, {centroid_id} bigint, dist2 double"

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + c2
            best = d2.argmin(axis=1)  # first occurrence = lowest cid
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    centroid_id: ids[best],
                    "dist2": d2[np.arange(len(best)), best],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, schema)
