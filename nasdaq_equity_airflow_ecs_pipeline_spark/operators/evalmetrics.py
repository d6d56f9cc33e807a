"""Evaluation-harness metrics over (prediction, reference) pairs —
the scoring half of an LLM data pipeline (SQuAD's official
normalized token F1 / exact match, Rajpurkar et al. 2016, and
ROUGE-L, Lin 2004), integer-exact in-engine.

Normalization is SQuAD's: lowercase, strip non-alphanumerics,
collapse whitespace, drop English articles (a/an/the). Token F1 uses
MULTISET overlap (sum over tokens of min(count_pred, count_ref)) —
the official squad_v1 metric, not set overlap. ROUGE-L computes the
true longest-common-subsequence length with an in-engine DP fold (one
``aggregate`` row-rolling pass per pair — the Viterbi-fold machinery,
operators/unigram.py:143; the DuckDB oracle replays it with nested
list_reduce using the seed-element trick, since DuckDB's list_reduce
has no initial-value form) and reports the beta=1 F measure
``2 * lcs / (n_pred + n_ref)``.

Fixed-point discipline: every count is exact; the single ratio per
metric is a truncating integer division at x1e6. The degenerate
both-empty pair scores 1e6 (SQuAD's convention: empty matches empty).

Scale shape: token F1 is one explode -> two (pair, token)-keyed
hash-aggs -> one pair-keyed agg — linear, shuffle keyed on the pair
id. ROUGE-L is a single narrow projection per pair (the DP fold is
whole-stage-codegen column work, O(n_pred * n_ref) per pair — bounded
by document length, never corpus-quadratic).

Reference parity: the reference is a row-level OHLCV ETL with no
eval surface; engine-extension surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ARTICLES = ("a", "an", "the")
EVAL_SCALE = 1_000_000


def norm_tokens(col: Column | str) -> Column:
    """SQuAD answer normalization as one column expression:
    lower -> strip non-alphanumerics -> split -> drop empties and
    articles. Returns array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    arts = F.array(*[F.lit(a) for a in ARTICLES])
    t = F.split(
        F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")), " "
    )
    return F.filter(
        t, lambda x: (x != "") & ~F.array_contains(arts, x)
    )


def token_f1(
    pairs: DataFrame,
    id_col: str = "pair_id",
    pred_col: str = "prediction",
    ref_col: str = "reference",
) -> DataFrame:
    """(id, n_pred, n_ref, n_overlap, em, f1_x1e6) per pair — the
    official squad_v1 token F1 (multiset overlap) and exact match.
    Input widened on small scans (sources.tables widen_small_scan,
    optimization r13): the per-pair multiset overlap is a sort+fold
    over both token arrays and otherwise serializes on one split."""
    from ..sources.tables import widen_small_scan

    pairs = widen_small_scan(pairs, id_col)
    base = pairs.select(
        F.col(id_col),
        norm_tokens(pred_col).alias("_p"),
        norm_tokens(ref_col).alias("_r"),
    )
    pc = (
        base.select(id_col, F.explode("_p").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cp"))
    )
    rc = (
        base.select(id_col, F.explode("_r").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cr"))
    )
    ov = (
        pc.join(rc, [id_col, "tok"], "full_outer")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.least(
                    F.coalesce("cp", F.lit(0)), F.coalesce("cr", F.lit(0))
                )
            ).cast("bigint").alias("n_overlap")
        )
    )
    return (
        base.select(
            id_col,
            F.size("_p").cast("bigint").alias("n_pred"),
            F.size("_r").cast("bigint").alias("n_ref"),
            (F.col("_p") == F.col("_r")).cast("int").alias("em"),
        )
        .join(ov, id_col, "left")
        .select(
            id_col,
            "n_pred",
            "n_ref",
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias(
                "n_overlap"
            ),
            "em",
            F.expr(
                f"CASE WHEN n_pred + n_ref = 0 THEN {EVAL_SCALE} "
                f"ELSE (2 * coalesce(n_overlap, 0) * {EVAL_SCALE}) "
                f"div (n_pred + n_ref) END"
            ).cast("bigint").alias("f1_x1e6"),
        )
    )


def _lcs_bitparallel(p, r):
    """Exact LCS length via the Allison–Dix bit-parallel recurrence
    (V' = (V + (V & M)) | (V & ~M), LCS = zero bits of V): O(n * m/64)
    word operations per pair instead of the O(n * m^2) array copying
    the previous nested-``aggregate`` Catalyst DP paid (each inner DP
    row was built by repeated ``concat``). Bit-identical to the
    classic DP (pinned by test_lcs_bitparallel_matches_dp and the
    unchanged DuckDB oracle, which still replays the classic DP)."""
    import pandas as pd

    out = []
    for pp, rr in zip(p, r):
        if pp is None or rr is None:
            out.append(None)
            continue
        m = len(rr)
        if m == 0 or len(pp) == 0:
            out.append(0)
            continue
        masks: dict = {}
        for j, t in enumerate(rr):
            masks[t] = masks.get(t, 0) | (1 << j)
        full = (1 << m) - 1
        v = full
        for t in pp:
            mk = masks.get(t)
            if mk is None:
                continue  # U = 0: the update leaves V unchanged
            u = v & mk
            v = ((v + u) | (v & ~mk)) & full
        out.append(m - bin(v).count("1"))
    return pd.Series(out, dtype="object")


def _lcs_len(p: str, r: str) -> Column:
    """LCS length between two token-array COLUMNS (by name): exact
    bit-parallel fold in an Arrow-vectorized escape (ArrowEvalPython —
    the justified-escape class, guide §4.2: hand whole batches to a
    native/bit-level algorithm instead of interpreting an O(n*m^2)
    expression DP per row). The empty-side guard stays in SQL so the
    degenerate rows never cross the Python boundary."""
    fold = F.pandas_udf(_lcs_bitparallel, "bigint")(F.col(p), F.col(r))
    return F.when(
        (F.size(F.col(p)) == 0) | (F.size(F.col(r)) == 0),
        F.lit(0).cast("bigint"),
    ).otherwise(fold.cast("bigint"))


def rouge_l(
    pairs: DataFrame,
    id_col: str = "pair_id",
    pred_col: str = "prediction",
    ref_col: str = "reference",
) -> DataFrame:
    """(id, n_pred, n_ref, lcs, rouge_l_f_x1e6) per pair — true LCS,
    beta=1 F measure 2*lcs/(n_pred + n_ref). Input widened on small
    scans (widen_small_scan) so the Arrow LCS batches spread over all
    cores."""
    from ..sources.tables import widen_small_scan

    pairs = widen_small_scan(pairs, id_col)
    base = pairs.select(
        F.col(id_col),
        norm_tokens(pred_col).alias("_p"),
        norm_tokens(ref_col).alias("_r"),
    )
    return base.select(
        id_col,
        F.size("_p").cast("bigint").alias("n_pred"),
        F.size("_r").cast("bigint").alias("n_ref"),
        _lcs_len("_p", "_r").alias("lcs"),
    ).select(
        id_col,
        "n_pred",
        "n_ref",
        "lcs",
        F.expr(
            f"CASE WHEN n_pred + n_ref = 0 THEN {EVAL_SCALE} "
            f"ELSE (2 * lcs * {EVAL_SCALE}) div (n_pred + n_ref) END"
        ).cast("bigint").alias("rouge_l_f_x1e6"),
    )
