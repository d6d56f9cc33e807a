"""MinHash + LSH and SimHash near-duplicate detection.

Scale shape (the reason these exist): exact pairwise Jaccard is O(n^2) —
dead at 100 TB. MinHash compresses each document to K integers (one
narrow pass: explode shingles -> hash -> K mins per doc, a single
groupBy(doc) shuffle), and LSH banding turns "find similar pairs" into an
equi-join on (band, band_hash) — a hash-partitioned join whose fan-out is
bounded by collision rate, not n^2. SimHash is the complementary
Hamming-space sketch: 64 sums per doc, again one aggregation pass.

All hashing is engine-portable integer arithmetic: base hash = 60 bits of
md5 reduced mod p = 2^31-1, permutations h_i = (a_i*h + b_i) mod p with
a_i,b_i < 2^31 so every product fits in int64 — the same expressions run
in Spark and in the DuckDB oracle (generated from MINHASH_PARAMS, one
source of truth).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WS_SPLIT

MERSENNE_P = 2_147_483_647  # 2^31 - 1
_GOLD = 2_654_435_761
_SALT = 40_503

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS

# (a_i, b_i) for the K permutation hashes — deterministic, shared with the
# DuckDB oracle generator.
MINHASH_PARAMS: list[tuple[int, int]] = [
    ((_GOLD * (i + 1)) % MERSENNE_P | 1, (_SALT * (i + 7)) % MERSENNE_P)
    for i in range(NUM_HASHES)
]

SIMHASH_BITS = 32


def tokens(text: Column | str) -> Column:
    """Whitespace token array."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), WS_SPLIT)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>) from a MATERIALIZED
    token-array column; empty array when the document has fewer than n
    tokens.

    ``toks`` must be a bound column (``.select(tokens(...).alias("toks"))``
    first), NOT the tokenizer expression itself: Catalyst inlines a passed
    expression into every ``element_at`` call site, re-running the regex
    split ~n times per shingle (measured 13x slower at sf0.1)."""
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, parallelism: int | None
) -> DataFrame:
    """(id, shingle) rows: tokenize once into a column, optionally fan out
    to ``parallelism`` partitions first (a file that arrives as few splits
    would otherwise serialize the explode+hash work onto few cores; at
    cluster scale pass None — the scan is already wide). With
    ``parallelism=None`` the fan-out is now AUTOMATIC and scale-adaptive
    (sources.tables widen_small_scan, optimization r13): small inputs
    widen to defaultParallelism, production-sized scans pass through."""
    base = df.select(F.col(id_col), tokens(text_col).alias("toks"))
    if parallelism:
        base = base.repartition(parallelism)
    else:
        from ..sources.tables import widen_small_scan

        base = widen_small_scan(base, id_col)
    return base.select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("toks"), n)).alias("shingle"),
    )


def base_hash31(col: Column) -> Column:
    """Portable 31-bit content hash: top 60 bits of md5, mod 2^31-1."""
    h60 = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
    return h60 % MERSENNE_P


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """One row per document: s0..s{K-1} minhash signature columns.

    Plan: explode distinct shingles (narrow), K permutation hashes as
    column expressions, ONE hash aggregate keyed by doc — the only
    shuffle, on a uniform key."""
    ex = _exploded_shingles(df, id_col, text_col, n, parallelism).withColumn(
        "h", base_hash31(F.col("shingle"))
    )
    aggs = [
        F.min((F.col("h") * a + b) % MERSENNE_P).alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Banding: hash each band of the signature; equal band-hash => candidate.

    Returns distinct (id_a, id_b), id_a < id_b.

    Shape: ONE pass over the signatures — band rows come from exploding an
    array of (band, band_hash) structs (not a B-way union, which would
    recompute the signature aggregation B times), then a groupBy on
    (band, band_hash) collects each collision bucket and the pairs are
    expanded bucket-locally with array combinatorics. No self-join: the
    upstream lineage is evaluated once, and the only shuffles are the
    bucket groupBy (uniform hash key) and the final distinct. Bucket
    fan-out is governed by the LSH collision probability, not n^2; a
    pathological mega-bucket (e.g. boilerplate docs) is the signal to
    raise ROWS_PER_BAND, not a plan problem."""
    return (
        _bucket_pairs_from_rows(lsh_band_rows(sigs, id_col))
        .distinct()
    )


def lsh_band_rows(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_hash) rows — the materializable LSH *index*.
    Persist this frame (or write it to the lake) to support incremental
    maintenance: new documents only need their own band rows plus an
    equi-join against this index (see ``incremental_lsh_pairs``)."""
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "_",
                    *[f"s{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)],
                )
            ).alias("band_hash"),
        )
        for b in range(BANDS)
    ])
    return sigs.select(F.col(id_col), F.explode(band_structs).alias("bh")).select(
        F.col(id_col).alias("id"), "bh.band", "bh.band_hash"
    )


def _bucket_pairs_from_rows(rows: DataFrame) -> DataFrame:
    """Bucket-local pair expansion over (id, band, band_hash) rows;
    NOT distinct — callers dedup after unioning sources."""
    buckets = (
        rows.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
    )


def incremental_lsh_pairs(
    index_rows: DataFrame, delta_sigs: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Add a document delta to an existing LSH index WITHOUT recomputing
    the corpus: returns (new_pairs, updated_index_rows).

    new_pairs = (delta × index) bucket collisions ∪ (delta × delta)
    collisions — the corpus' own pairs are already known. The delta×index
    part is an equi-join on (band, band_hash): with a daily-sized delta
    the delta side broadcasts, so the standing index is probed in place
    with NO shuffle of the corpus — the property that makes daily corpus
    refresh O(|delta| + collisions) instead of O(|corpus|). The
    delta×delta part reuses the bucket-local combinatorics.

    Union with the standing pair set to maintain a full dedup state
    incrementally (pairs(index ∪ delta) = pairs(index) ∪ new_pairs —
    exactly; tested against the full recompute in the oracle gate).
    """
    delta_rows = lsh_band_rows(delta_sigs, id_col)
    cross = (
        delta_rows.join(
            index_rows.withColumnRenamed("id", "id_x"), ["band", "band_hash"]
        )
        .select(
            F.least("id", "id_x").alias("id_a"),
            F.greatest("id", "id_x").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    dd = _bucket_pairs_from_rows(delta_rows)
    new_pairs = cross.unionByName(dd).distinct()
    return new_pairs, index_rows.unionByName(delta_rows)


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = SIMHASH_BITS, parallelism: int | None = None,
) -> DataFrame:
    """Per-document SimHash over whitespace tokens (with multiplicity).

    bit_j(doc) = 1 iff sum over tokens of (+1 if bit_j(hash(token)) else -1)
    is positive. One explode + one aggregation keyed by doc."""
    base = df.select(F.col(id_col), F.col(text_col))
    if parallelism:
        base = base.repartition(parallelism)
    ex = base.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("tok"),
    ).withColumn("h", base_hash31(F.col("tok")))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    per_doc = ex.groupBy(id_col).agg(*sums)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2 ** j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return per_doc.select(F.col(id_col), sim.alias("simhash"))


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    parallelism: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Broder's SECOND resemblance measure (Broder 1997 §2):
    CONTAINMENT C(A,B) = |S(A) ∩ S(B)| / |S(A)| — asymmetric, so it
    catches the pairs Jaccard structurally cannot rank high: a short
    document quoted inside a long one, an aggregation page wrapping an
    article, a doc that IS a subset of another (Jaccard dilutes by the
    union; containment of the smaller side is 1.0 regardless of how
    big the container is). The dedup policy consumer usually drops the
    CONTAINED side.

    Output per unordered candidate pair: (id_a, id_b, shared, n_a,
    n_b, containment_a, containment_b), kept when EITHER direction
    reaches ``threshold``. The containments are single IEEE divides
    over exact integers (the tfidf cross-engine discipline).

    Scale shape: identical to ngram_jaccard_pairs — distinct shingles
    explode once, the shingle equi-join is the prefilter (zero-overlap
    pairs never materialize), ``max_df`` caps stop-shingle fan-out on
    the JOIN ONLY (per-doc sizes stay exact, so containments are
    underestimates only for boilerplate-dominated pairs)."""
    sh = _exploded_shingles(df, id_col, text_col, n, parallelism)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("df_count")
        )
        sh = sh.join(
            df_counts.filter(F.col("df_count") <= max_df), "shingle"
        ).select(F.col(id_col), "shingle")
    pair_counts = (
        sh.alias("l")
        .join(
            sh.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    a_sizes = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    b_sizes = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    # no broadcast hints: sizes are one row per corpus document (see
    # ngram_jaccard_pairs' note) — AQE decides
    ca = F.col("shared").cast("double") / F.col("n_a")
    cb = F.col("shared").cast("double") / F.col("n_b")
    return (
        pair_counts.join(a_sizes, "id_a")
        .join(b_sizes, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared",
            "n_a",
            "n_b",
            ca.alias("containment_a"),
            cb.alias("containment_b"),
        )
        .filter(F.greatest(ca, cb) >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    parallelism: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle.

    The shingle equi-join IS the LSH-style prefilter: pairs with zero
    overlap never materialize. At scale, cap join fan-out with ``max_df``
    (stop-shingle cutoff): a shingle appearing in more than ``max_df``
    docs contributes O(df^2) join rows but almost no Jaccard signal
    (boilerplate), so it is dropped from the JOIN ONLY — per-doc shingle
    counts still include it, keeping denominators exact; the resulting
    Jaccard is a <= 2*max_df/|union| underestimate only for pairs whose
    overlap is dominated by boilerplate, which are precisely the pairs a
    dedup pipeline wants ranked down. ``None`` (default) keeps exact
    semantics — the correctness oracle runs with ``None``."""
    sh = _exploded_shingles(df, id_col, text_col, n, parallelism)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("df_count")
        )
        sh = (
            sh.join(df_counts.filter(F.col("df_count") <= max_df), "shingle")
            .select(F.col(id_col), "shingle")
        )
    pair_counts = (
        sh.alias("l")
        .join(
            sh.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    a_sizes = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
    )
    b_sizes = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
    )
    # NOTE: no broadcast hint — a_sizes/b_sizes are one row PER CORPUS
    # DOCUMENT (unbounded at scale; 10^9 docs = multi-GB driver
    # materialization).  The joins are id-keyed equi-joins over the
    # already-aggregated pair frame, so AQE picks broadcast when the
    # corpus is actually small and sort-merge when it is not.
    out = (
        pair_counts.join(a_sizes, "id_a")
        .join(b_sizes, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out
