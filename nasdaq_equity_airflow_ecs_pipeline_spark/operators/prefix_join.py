"""Prefix-filtered exact Jaccard similarity join (PPJoin-style).

The third leg of the dedup-pairs family, next to the LSH band join
(``operators/lsh.py lsh_candidate_pairs`` — probabilistic, tunable
recall) and the raw shingle equi-join (``ngram_jaccard_pairs`` — exact
but O(df^2) fan-out on common shingles unless ``max_df``-capped, and the
cap trades exactness). Prefix filtering (Chaudhuri et al. 2006; Xiao et
al., PPJoin, WWW 2008 — public literature, no reference-repo analog)
gives the third point on the trade-off curve: **exact results, no
recall loss, with candidate generation bounded by rare-shingle overlap
instead of all-shingle overlap**.

Principle: fix a global total order on shingles (here: ascending
document frequency, ties by shingle value — rarest first, the order
that minimizes candidates). For a doc with ``s`` distinct shingles and
threshold ``t``, any partner with Jaccard >= t must share at least
``ceil(t*s)`` shingles (proof: J = o/u >= t and u >= s since the
partner's size >= overlap, so o >= t*u >= t*s; o integral). By the
prefix-filter principle, two sets sharing >= o elements must collide
within their first ``size - o + 1`` elements under ANY shared total
order — so joining only on each doc's first ``s - ceil(t*s) + 1``
ordered shingles ("the prefix") finds every qualifying pair. A
size filter (``t*|a| <= |b| <= |a|/t``, also implied by J >= t)
prunes further during candidate generation. Candidates are then
verified with exact overlap counts; false positives drop, false
negatives cannot exist.

Why this is the 100 TB exact path: boilerplate shingles (high df) land
at the END of the global order and fall outside almost every prefix, so
they never enter the join — the same rows ``max_df`` drops, but here
dropping them is lossless because the theorem licenses it. All stages
are linear equi-joins / hash aggregates / per-doc windows; nothing is
collected, broadcast, or all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .lsh import _exploded_shingles

# The shingle and prefix frames feed 2-4 consumers each (both sides of
# the candidate self-join, both verify probes); Spark does not reuse
# shuffle stages across those consumers here (measured: 0 ReusedExchange,
# AQE included), so without a persist the whole explode+window chain
# recomputes per consumer — 23.1s vs 13.0s at sf0.1, identical shuffle
# bytes. Same bounded-registry pattern as plans/corpus.py: entering the
# operator releases the PREVIOUS invocation's frames, so a bench loop
# doesn't pin caches for the session lifetime. At cluster scale these
# are the frames a production PPJoin materializes to the lake once.
_CACHED: list = []


def _persist(frame: DataFrame) -> DataFrame:
    _CACHED.append(frame.persist())
    return frame


def _release() -> None:
    for f in _CACHED:
        try:
            f.unpersist()
        except Exception:
            pass  # session already stopped
    _CACHED.clear()


def prefix_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    parallelism: int | None = None,
    _sh: DataFrame | None = None,
) -> DataFrame:
    """(id, shingle, n_sh) rows restricted to each document's prefix.

    Plan: explode distinct shingles (narrow) -> one hash-agg for global
    document frequency -> shingle-keyed join back (both sides already
    hashed on shingle) -> one per-doc window pass that ranks shingles by
    (df, shingle) and keeps rank <= s - ceil(t*s) + 1. Both window
    functions share the doc_id partitioning, so the pass costs one
    exchange. Output size is sum over docs of (1-t)*s + 1 — strictly
    smaller than the full shingle frame for any t > 0.
    """
    sh = _exploded_shingles(df, id_col, text_col, n, parallelism) if _sh is None else _sh
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w_ord = Window.partitionBy(id_col).orderBy(
        F.col("__df").asc(), F.col("shingle").asc()
    )
    w_all = Window.partitionBy(id_col)
    # merge-hint: dfreq is corpus-sized (one row per distinct shingle)
    # but DERIVED stats bottom out at the compressed documents file size,
    # so past ~the broadcast threshold of raw input the static planner
    # broadcasts it and the build OOMs (caught by the x100 stress run:
    # 59 MB parquet < 64 MB threshold -> GB-scale broadcast build). The
    # hint pins every corpus x corpus join here to sort-merge — the only
    # join shape that survives any scale.
    return (
        sh.join(dfreq.hint("merge"), "shingle")
        .withColumn("__pos", F.row_number().over(w_ord))
        .withColumn("n_sh", F.count(F.lit(1)).over(w_all))
        .filter(
            F.col("__pos")
            <= F.col("n_sh")
            - F.ceil(F.lit(float(threshold)) * F.col("n_sh")).cast("int")
            + 1
        )
        .select(F.col(id_col), "shingle", "n_sh", "__pos")
    )


def prefix_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    parallelism: int | None = None,
    positional: bool = True,
    _pre: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, n_a, n_b) candidate pairs: prefixes collide on >= 1
    shingle AND sizes satisfy t*|a| <= |b| <= |a|/t AND (with
    ``positional=True``, PPJoin's positional filter) the overlap upper
    bound implied by collision positions still admits Jaccard >= t.
    Superset of the qualifying pairs by the theorems below; typically a
    tiny fraction of the all-shared-shingles pair set (candidate-count
    tests check both reductions).

    Positional filter, set-join form (Xiao et al., PPJoin, WWW 2008,
    Lemma "positional filtering" adapted from the streaming probe to one
    relational aggregate): within each doc the shingles are listed in
    the GLOBAL (df, shingle) order, so the shared shingles of a pair
    appear in the same relative order in both lists. Aggregate the
    pair's prefix collisions: k = count, (P_a, P_b) = positions of the
    LAST colliding shingle (= max positions, monotonicity). Every shared
    shingle globally before that one lies at positions < P_a and < P_b,
    hence inside BOTH prefixes, hence IS one of the k collisions — so
    total overlap o <= k + min(n_a - P_a, n_b - P_b). Jaccard >= t
    requires o >= t*(n_a+n_b)/(1+t); pairs whose upper bound falls short
    are pruned before the verify join ever fans them out. Lossless: the
    bound over-estimates o, never under-estimates.
    """
    if _pre is None:
        _release()
        _pre = _persist(
            prefix_shingles(df, id_col, text_col, n, threshold, parallelism)
        )
    pre = _pre
    t = F.lit(float(threshold))
    grouped = (
        pre.alias("l")
        .join(
            pre.hint("merge").alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            # size filter, applied inside candidate generation so
            # incompatible pairs never reach the pair aggregate
            & (F.col("l.n_sh") * t <= F.col("r.n_sh"))
            & (F.col("r.n_sh") * t <= F.col("l.n_sh")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.n_sh").alias("n_a"),
            F.col("r.n_sh").alias("n_b"),
            F.col("l.__pos").alias("__pa"),
            F.col("r.__pos").alias("__pb"),
        )
        # same shuffle shape as the previous .distinct(): one hash-agg
        # keyed on the pair, but now it also carries the position stats
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(
            F.count(F.lit(1)).alias("__k"),
            F.max("__pa").alias("__lpa"),
            F.max("__pb").alias("__lpb"),
        )
    )
    if positional:
        ubound = F.col("__k") + F.least(
            F.col("n_a") - F.col("__lpa"), F.col("n_b") - F.col("__lpb")
        )
        # o is integral and must be >= t*(n_a+n_b)/(1+t); the 1e-9 slack
        # keeps float rounding from ever pruning a boundary-qualifying
        # pair (over-admitting is safe, the verify stage is exact)
        required = (
            t / (F.lit(1.0) + t) * (F.col("n_a") + F.col("n_b"))
        ) - F.lit(1e-9)
        grouped = grouped.filter(ubound >= required)
    return grouped.select("id_a", "id_b", "n_a", "n_b")


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    parallelism: int | None = None,
) -> DataFrame:
    """All pairs with exact n-gram Jaccard >= threshold, via prefix
    filtering. Output (id_a, id_b, jaccard) is row-identical to
    ``ngram_jaccard_pairs`` with no ``max_df`` cap (same oracle SQL) —
    the filter is candidate-generation-only, verified exactly.

    Verify stage: candidates fan out to the left doc's full shingle set
    (id-keyed equi-join), intersect with the right doc's shingles
    ((id, shingle)-keyed equi-join), then one hash-agg counts the
    overlap. Cost is linear in |candidates| * avg shingles — the
    irreducible exact-verification work, paid only for size-compatible
    prefix-colliding pairs.
    """
    _release()
    sh = _persist(_exploded_shingles(df, id_col, text_col, n, parallelism))
    pre = _persist(
        prefix_shingles(df, id_col, text_col, n, threshold, parallelism, _sh=sh)
    )
    cand = prefix_candidates(
        df, id_col, text_col, n, threshold, parallelism, _pre=pre
    )
    # the shingle frames are corpus-sized: merge-hint for the same
    # static-estimate reason as prefix_shingles (see comment there)
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle").hint("merge")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle").hint("merge")
    shared = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    jac = F.col("__shared") / (
        F.col("n_a") + F.col("n_b") - F.col("__shared")
    )
    return (
        shared.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= float(threshold))
    )
