"""Int8 embedding quantization — the memory lever for ANN at scale.

A 100 TB corpus with float32[768] embeddings is ~3 KB/vector; symmetric
int8 quantization cuts candidate-scan memory and shuffle bytes 4x with
<1% recall loss at IVF scale, which is why every production vector store
quantizes its inverted lists. This operator is the Spark-native version:
pure column expressions (array_max / transform / explode), no UDF, whole
plan stays in codegen.

Determinism discipline (functions/stable.py): all arithmetic in double
(float->double casts are exact), rounding is the explicit
``floor(x + 0.5)`` — identical IEEE ops in Spark and the DuckDB oracle,
so quantized values are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QMAX = 127


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization, exploded to (id, dim, q).

    scale = max(|v|)/127; q = clamp(floor(v/scale + 0.5), -127, 127).
    The all-zero vector quantizes to all zeros (scale stays 0 as the
    sentinel). Exploded output keeps every engine's hash of the result
    scalar-typed; re-assembly to arrays is a collect_list away when a
    consumer wants packed vectors."""
    vecd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    amax = F.array_max(F.transform(vecd, F.abs))
    scale = amax / F.lit(float(QMAX))
    base = df.select(
        F.col(id_col), scale.alias("scale"), F.posexplode(vecd).alias("dim", "x")
    )
    q = (
        F.when(F.col("scale") == 0.0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-QMAX),
                F.least(
                    F.lit(QMAX),
                    F.floor(F.col("x") / F.col("scale") + F.lit(0.5)),
                ),
            )
        )
        .cast("int")
    )
    return base.select(id_col, "dim", q.alias("qval"), "scale")


def sql_quantize_int8(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: same scale, same explicit rounding, same clamp."""
    return f"""
WITH s AS (
  SELECT {id_col},
         list_max(list_transform({vec_col},
                                 x -> abs(CAST(x AS DOUBLE)))) / {QMAX}.0
           AS scale,
         {vec_col} AS v
  FROM {table}
)
SELECT {id_col}, i::INT AS dim,
       CASE WHEN scale = 0 THEN 0
            ELSE greatest(-{QMAX}, least({QMAX},
                   floor(CAST(v[i + 1] AS DOUBLE) / scale + 0.5)))::INT
       END AS qval,
       scale
FROM s, unnest(generate_series(0, len(v) - 1)) AS u(i)
"""


# ------------------------------------------------ product quantization
def _subvectors(df: DataFrame, m: int, d_sub: int, id_col: str, vec_col: str):
    """Explode each vector into its ``m`` contiguous subvectors:
    (id, sub_id, subvec). One narrow projection — no shuffle.

    Length-guarded: dim is inferred from ONE probe row, so a malformed
    shorter/longer vector elsewhere in the corpus would slice to NULLs
    that sort first under the d2 argmin and silently hijack code
    assignment. A plan-embedded assert (per-row size check, no extra
    pass) names the offending id instead — the corpus-side mirror of
    the query-vector length checks in pq_adc_topk/ivf_pq_search."""
    df = df.filter(
        F.assert_true(
            F.size(vec_col) == F.lit(m * d_sub),
            F.concat(
                F.lit(f"pq: {vec_col} must have {m * d_sub} dims; "),
                F.col(id_col).cast("string"),
                F.lit(" has "),
                F.size(vec_col).cast("string"),
            ),
        ).isNull()
    )
    slices = F.array(
        *[
            F.slice(
                F.transform(F.col(vec_col), lambda v: v.cast("double")),
                s * d_sub + 1,
                d_sub,
            )
            for s in range(m)
        ]
    )
    return df.select(
        F.col(id_col), F.posexplode(slices).alias("sub_id", "subvec")
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train product-quantization codebooks (Jegou, Douze & Schmid,
    TPAMI 2011 — the IVF-PQ layout behind FAISS): split the space into
    ``m`` contiguous subspaces and run Lloyd's k-means (k=``ksub``,
    fixed ``iters``, deterministic lowest-id init) independently in
    each. Returns (sub_id, code_id, code_vec).

    All m fits run as ONE grouped Lloyd iteration, not m sequential
    jobs: the corpus is exploded to subvectors ONCE (localCheckpoint-
    pinned — every round reads it), assignment is a single broadcast
    of the m x ksub codebook joined on sub_id, and recentering is one
    (sub_id, code, dim)-keyed hash-agg with the kmeans.py decimal-mean
    discipline — so the number of corpus passes is ``iters``, not
    ``m * iters``. Per round the codebook collects (m x ksub rows,
    broadcast-sized by definition) exactly like kmeans_fit's k-row
    collect. Arithmetic is per-subspace identical to running
    kmeans_fit on each slice, which is what the unrolled DuckDB oracle
    (queries/llm_ops.py:_sql_pq) pins. Production trains on a sample;
    init is each subspace's slice of the ksub lowest-id vectors.
    """
    spark = df.sparkSession
    probe = df.select(F.size(vec_col).alias("d")).first()
    if probe is None:
        raise ValueError("pq_train: empty input")
    dim = probe["d"]
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    d_sub = dim // m

    subs = _subvectors(df, m, d_sub, id_col, vec_col).localCheckpoint(eager=True)
    books = (
        df.orderBy(F.asc(id_col))
        .limit(ksub)
        .select(F.col(id_col))
        .join(subs.withColumnRenamed(id_col, "__sid"), F.col(id_col) == F.col("__sid"))
        .select(
            F.col("sub_id"),
            F.col(id_col).alias("code_id"),
            F.col("subvec").alias("code_vec"),
        )
    )

    from pyspark.sql import Window

    from .similarity import _pair_d2

    w = Window.partitionBy(id_col, "sub_id").orderBy(F.asc("_d2"), F.asc("code_id"))
    for _ in range(iters):
        assigned = (
            subs.join(F.broadcast(books), "sub_id")
            .select(
                F.col(id_col),
                "sub_id",
                "code_id",
                "subvec",
                _pair_d2(F.col("subvec"), F.col("code_vec")).alias("_d2"),
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        per_dim = (
            assigned.select(
                "sub_id", "code_id", F.posexplode("subvec").alias("dim", "x")
            )
            .groupBy("sub_id", "code_id", "dim")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(27,8)"))
                    .cast("string")
                    .cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        books = per_dim.groupBy("sub_id", "code_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("code_vec")
        )
        rows = books.collect()  # m x ksub rows — broadcast-sized
        books = spark.createDataFrame(
            [
                (r["sub_id"], r["code_id"], [float(x) for x in r["code_vec"]])
                for r in rows
            ],
            "sub_id int, code_id bigint, code_vec array<double>",
        )
    return books


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode vectors against trained codebooks: (id, sub_id,
    code_id) — m small integers replace the float vector (the 4-32x
    compression that lets a 100 TB corpus's candidate scan fit in
    memory). Nearest code by squared L2, ties to the lowest code_id —
    the same deterministic argmin discipline as ivf_assign.

    Scale shape: codebooks are m x ksub rows (broadcast); one narrow
    pass over the exploded subvectors; the argmin is a per-(id, sub)
    row_number window over ksub candidates."""
    from pyspark.sql import Window

    from .similarity import _pair_d2

    probe = codebooks.select(
        (F.max("sub_id") + 1).alias("m"), F.size(F.first("code_vec")).alias("d_sub")
    ).first()
    if probe is None or probe["m"] is None:
        raise ValueError("pq_encode: empty codebooks")
    m, d_sub = probe["m"], probe["d_sub"]
    subs = _subvectors(df, m, d_sub, id_col, vec_col)
    scored = subs.join(F.broadcast(codebooks), "sub_id").select(
        F.col(id_col),
        "sub_id",
        "code_id",
        _pair_d2(F.col("subvec"), F.col("code_vec")).alias("_d2"),
    )
    w = Window.partitionBy(id_col, "sub_id").orderBy(
        F.asc("_d2"), F.asc("code_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "sub_id", "code_id")
    )


def _adc_topk(scored_codes: DataFrame, k: int, id_col: str) -> DataFrame:
    """Shared ADC finisher: fold each doc's per-subspace distances IN
    sub_id ORDER (the fixed-order double addition both oracles pin),
    then TakeOrderedAndProject + rank. One spelling for pq_adc_topk
    and ivf_pq_search so the bit-exactness contract lives in one
    place."""
    from pyspark.sql import Window

    per_doc = scored_codes.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub_id", "_d2"))),
                lambda s: s["_d2"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("adc_d2")
    )
    topk = per_doc.orderBy(F.asc("adc_d2"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.asc("adc_d2"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "adc_d2", "rank"
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays
    full-precision, each subspace contributes the exact squared L2
    between the query's subvector and the doc's assigned code vector,
    looked up from an m x ksub distance table.

    Engine-exactness: the per-subspace distances are the shared
    sequential zip_with/aggregate fold; the per-doc total folds the m
    subspace distances IN sub_id ORDER (sort_array over collected
    structs, then a sequential aggregate) — the same fixed-order
    double addition the DuckDB oracle's list_reduce(list(... ORDER BY
    sub_id)) performs, so ADC values are bit-identical.

    Scale shape: the distance table is m x ksub rows computed from the
    broadcast codebook; the scan touches ONLY the integer codes frame
    (the point of PQ); top-k is a TakeOrderedAndProject, never a
    global sort."""
    from .similarity import _pair_d2

    probe = codebooks.select(
        (F.max("sub_id") + 1).alias("m"),
        F.size(F.first("code_vec")).alias("d_sub"),
    ).first()
    if probe is None or probe["d_sub"] is None:
        raise ValueError("pq_adc_topk: empty codebooks")
    d_sub = probe["d_sub"]
    if len(query_vec) != probe["m"] * d_sub:
        raise ValueError(
            f"pq_adc_topk: query dim {len(query_vec)} != m*d_sub "
            f"{probe['m'] * d_sub} (a short query would yield NULL "
            "distances that sort first)"
        )
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    dtable = codebooks.select(
        "sub_id",
        "code_id",
        _pair_d2(
            F.slice(qlit, F.col("sub_id") * d_sub + 1, F.lit(d_sub)),
            F.col("code_vec"),
        ).alias("_d2"),
    )
    scored = codes.join(F.broadcast(dtable), ["sub_id", "code_id"])
    return _adc_topk(scored, k, id_col)


# ------------------------------------------------------------- IVF-PQ
def ivf_pq_build(
    df: DataFrame,
    coarse_k: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    ksub: int = 16,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Build the full IVF-PQ index (FAISS's production layout): a
    coarse k-means quantizer partitions the corpus into inverted
    lists, and a product quantizer trained on the RESIDUALS
    (v - coarse_centroid) compresses each vector to m small codes.
    Returns (coarse, books, codes):

    - ``coarse``: (centroid_id, centroid_vec) — coarse_k rows,
    - ``books``: (sub_id, code_id, code_vec) — m x ksub rows, shared
      across lists (the standard single-codebook IVF-PQ),
    - ``codes``: (id, centroid_id, sub_id, code_id) — the index
      payload; at scale this is what's written to the lake,
      partitioned by centroid_id exactly like the uncompressed layout
      in similarity.py:ivf_write_partitioned, so probes prune
      directories AND scan 8-byte codes instead of full vectors.

    Every stage reuses an existing verified operator: kmeans_fit for
    the coarse quantizer, ivf_assign for list assignment, the grouped
    pq_train/pq_encode for the residual codebooks. Residuals are an
    element-wise zip_with subtraction — one narrow projection.
    """
    from .kmeans import kmeans_fit

    coarse = kmeans_fit(
        df, k=coarse_k, iters=coarse_iters, id_col=id_col, vec_col=vec_col
    ).select("centroid_id", "centroid_vec")
    coarse = coarse.localCheckpoint(eager=True)  # assign + residual + search
    resid = _ivf_pq_residuals(df, coarse, id_col, vec_col).localCheckpoint(
        eager=True
    )  # pq_train + pq_encode both read it
    books = pq_train(resid, m=m, ksub=ksub, iters=pq_iters, id_col=id_col, vec_col=vec_col)
    books = books.localCheckpoint(eager=True)
    codes = pq_encode(resid, books, id_col=id_col, vec_col=vec_col).join(
        resid.select(id_col, "centroid_id"), id_col
    )
    return coarse, books, codes


def _ivf_pq_residuals(df, coarse, id_col: str, vec_col: str):
    """(id, centroid_id, residual vector): assign to the nearest coarse
    centroid and subtract it — shared by the index build and the
    incremental delta encode."""
    from .similarity import ivf_assign

    assigned = ivf_assign(df, coarse, id_col=id_col, vec_col=vec_col)
    return (
        df.join(assigned, id_col)
        .join(F.broadcast(coarse), "centroid_id")
        .select(
            F.col(id_col),
            F.col("centroid_id"),
            F.zip_with(
                F.transform(F.col(vec_col), lambda v: v.cast("double")),
                F.col("centroid_vec"),
                lambda x, y: x - y,
            ).alias(vec_col),
        )
    )


def ivf_pq_encode_delta(
    delta: DataFrame,
    coarse: DataFrame,
    books: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental IVF-PQ maintenance: encode NEW vectors against the
    FROZEN coarse quantizer and residual codebooks — the production
    daily-index-update path (FAISS add()), mirroring the repo's
    incremental-LSH / incremental-SemDeDup discipline: standing data
    is never re-read, the delta's cost is delta-sized (one assign +
    one encode against broadcast codebooks), and the output unions
    onto the standing codes frame / appends to its centroid-partitioned
    layout. Codebooks trained on the standing corpus quantize the
    delta with the same argmin determinism, so a later full rebuild
    differs only if the caller retrains."""
    resid = _ivf_pq_residuals(delta, coarse, id_col, vec_col).localCheckpoint(
        eager=True
    )  # encode + centroid join both read it
    return pq_encode(resid, books, id_col=id_col, vec_col=vec_col).join(
        resid.select(id_col, "centroid_id"), id_col
    )


def ivf_pq_search(
    coarse,
    books,
    codes,
    query_vec: list[float],
    nprobe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ probe: take the ``nprobe`` coarse lists nearest the
    query, build a PER-LIST ADC table from the query's residual
    against that list's centroid (nprobe x m x ksub rows — the
    residual differs per probed list), and rank the probed lists'
    codes by the fixed-order ADC fold.

    Scale shape: the probe list is an nprobe-row TakeOrdered over
    coarse_k centroids; the dtable join on (centroid_id, sub_id,
    code_id) prunes the code scan to the probed lists (hash-join
    locally; directory pruning when codes are written partitioned by
    centroid_id); nothing corpus-sized is broadcast or collected.
    Deterministic: same argmin/fold discipline as pq_adc_topk.
    """
    from .similarity import _pair_d2

    probe = books.select(
        (F.max("sub_id") + 1).alias("m"), F.size(F.first("code_vec")).alias("d_sub")
    ).first()
    if probe is None or probe["m"] is None:
        raise ValueError("ivf_pq_search: empty codebooks")
    d_sub = probe["d_sub"]
    if len(query_vec) != probe["m"] * d_sub:
        raise ValueError(
            f"ivf_pq_search: query dim {len(query_vec)} != m*d_sub "
            f"{probe['m'] * d_sub} (a short query would yield NULL "
            "distances that sort first)"
        )
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])

    probed = (
        coarse.select(
            "centroid_id",
            "centroid_vec",
            _pair_d2(qlit, F.col("centroid_vec")).alias("_cd2"),
        )
        .orderBy(F.asc("_cd2"), F.asc("centroid_id"))
        .limit(nprobe)
    )
    qresid = F.zip_with(qlit, F.col("centroid_vec"), lambda x, y: x - y)
    dtable = probed.crossJoin(F.broadcast(books)).select(
        "centroid_id",
        "sub_id",
        "code_id",
        _pair_d2(
            F.slice(qresid, F.col("sub_id") * d_sub + 1, F.lit(d_sub)),
            F.col("code_vec"),
        ).alias("_d2"),
    )
    scored = codes.join(F.broadcast(dtable), ["centroid_id", "sub_id", "code_id"])
    return _adc_topk(scored, k, id_col)
