"""Hybrid retrieval: reciprocal-rank fusion of ranked lists.

The modern retrieval stack pairs a lexical leg (BM25,
operators/text.py:bm25_topk) with a semantic leg (embedding cosine
top-k, operators/similarity.py:cosine_topk_batch) and fuses them by
rank, not score — Reciprocal Rank Fusion (Cormack, Clarke &
Buettcher, SIGIR 2009): each list contributes 1/(k_rrf + rank) per
document, scores are summed, and the fused ordering is remarkably
robust to the incomparable score scales of the underlying legs.

The reference pipeline has no retrieval analog (it is an OHLCV ETL);
this family is part of the training-data/RAG surface the engine adds
on top of the reference's operator set.

Engine-exactness: 1/(k_rrf + rank) is quantized to an integer
contribution floor(1e9 / (k_rrf + rank)) BEFORE summation, same
policy as bm25_topk/lm_score — the per-document aggregate becomes an
order-independent bigint sum (double addition is not associative
across partitionings), and the double divide it floors is a single
IEEE op identical on any engine (operands are small exact integers,
quotients are >= 1/2^7 away from the nearest integer when inexact —
far outside half-ulp, so the floor is unambiguous).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_SCALE = 1_000_000_000.0


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    query_id: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists into a top-``k`` per query.

    Each input frame carries (query_id, id, rank) with rank starting
    at 1; extra columns are ignored. Output: (query_id, id,
    rrf_x1e9 = sum of floor(1e9/(k_rrf+rank)), n_legs = how many
    lists surfaced the document, rank).

    Scale shape: the legs are already top-k'd (bounded per query), so
    the union + per-(query, doc) hash-agg + per-query row_number
    window all operate on |queries| * k * n_legs rows — workload-
    bounded, corpus-independent. The expensive work happened inside
    the legs; fusion itself is metadata-sized.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = (
        F.floor(
            F.lit(RRF_SCALE) / (F.lit(float(k_rrf)) + F.col(rank_col).cast("double"))
        )
        .cast("bigint")
        .alias("_c")
    )
    legs = None
    for r in rankings:
        sel = r.select(F.col(query_id), F.col(id_col), contrib)
        legs = sel if legs is None else legs.unionByName(sel)
    agg = legs.groupBy(query_id, id_col).agg(
        F.sum("_c").alias("rrf_x1e9"), F.count(F.lit(1)).alias("n_legs")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("rrf_x1e9"), F.asc(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "rrf_x1e9", "n_legs", "rank")
    )


def best_snippet_window(
    docs: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_col: str = "query_text",
) -> DataFrame:
    """Passage extraction: for each (query, candidate doc), the
    ``window``-token span containing the most query-term hits — the
    snippet/highlight step after retrieval (the RAG chunk the caller
    actually feeds downstream).

    An optimal window starts at a hit, so candidate windows are
    enumerated at hit positions only: hits self-join within the same
    (query, doc) on ``pos_b BETWEEN pos_a AND pos_a + window - 1`` and
    the argmax per (query, doc) breaks ties toward the smallest start
    (fully deterministic, integer arithmetic only). Docs with zero
    hits yield no row — the retrieval leg already guarantees
    candidates matched something lexical, and semantic-only
    candidates are reported absent rather than given an arbitrary
    span.

    Scale shape: ``candidates`` (query_id, doc_id — e.g. a fused
    top-k) is workload-bounded, and the big side is pruned FIRST: a
    broadcast semi-join keeps only candidate docs before tokenize/
    posexplode, so per-position work is |candidates| x doc-length, not
    corpus-sized. The hit self-join is per-(query, doc) with both
    sides hit-bounded; everything downstream is a hash-agg + window
    over candidate-sized frames.
    """
    from .text import tokens

    cand = candidates.select(F.col(query_id), F.col(id_col))
    cdocs = docs.join(
        F.broadcast(cand.select(id_col).distinct()), id_col, "left_semi"
    ).select(F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "term"))
    qterms = queries.select(
        F.col(query_id), F.explode(tokens(query_col)).alias("term")
    ).distinct()
    hits = (
        cdocs.join(F.broadcast(qterms), "term")
        .join(F.broadcast(cand), [query_id, id_col], "left_semi")
        .select(query_id, id_col, "pos")
    )
    a = hits.alias("a")
    b = hits.alias("b")
    qa, ia = F.col(f"a.{query_id}"), F.col(f"a.{id_col}")
    wins = (
        a.join(
            b,
            (qa == F.col(f"b.{query_id}"))
            & (ia == F.col(f"b.{id_col}"))
            & (F.col("b.pos") >= F.col("a.pos"))
            & (F.col("b.pos") <= F.col("a.pos") + F.lit(window - 1)),
        )
        .groupBy(qa.alias(query_id), ia.alias(id_col), F.col("a.pos").alias("win_start"))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy(query_id, id_col).orderBy(
        F.desc("n_hits"), F.asc("win_start")
    )
    return (
        wins.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(query_id, id_col, "win_start", "n_hits")
    )
