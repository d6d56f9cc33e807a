"""Learned reranker (VERDICT r10 #6): valued-feature fixed-point
trainer parity against a pure-Python twin, and the done-criterion —
on a fixture where relevance tracks the cosine leg, the learned order
differs from RRF and improves retrieval_metrics on the fixture qrels."""

from __future__ import annotations

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators import classifier as clf
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.retrieval import (
    rerank_apply,
    reranker_features,
    retrieval_metrics,
    rrf_fuse,
)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_valued_trainer_matches_python_reference(spark):
    """train_logreg_fixed_point(x_col='x') against a pure-Python twin
    of the valued forward/gradient arithmetic, including a negative
    feature value (floor'd cosine) so the truncating products are
    exercised on both signs."""
    rows = [  # (pair_id, bucket, x)
        (1, 0, 500_000), (1, 1, -250_000), (1, -1, 1_000_000),
        (2, 0, 100_000), (2, 1, 900_000), (2, -1, 1_000_000),
        (3, 0, 800_000), (3, 1, 50_000), (3, -1, 1_000_000),
    ]
    labels = [(1, 0), (2, 1), (3, 0)]
    feats = spark.createDataFrame(rows, "pair_id bigint, bucket bigint, x bigint")
    lab = spark.createDataFrame(labels, "pair_id bigint, y bigint")
    got = {
        r["bucket"]: r["w"]
        for r in clf.train_logreg_fixed_point(
            feats, lab, id_col="pair_id", steps=6,
            lr_num=4, lr_den=1, cb_neg=2, x_col="x",
        ).collect()
    }

    S, ZC, XS = clf.SCALE, clf.ZCLAMP, clf.XSCALE
    by_id: dict[int, list] = {}
    for pid, b, x in rows:
        by_id.setdefault(pid, []).append((b, x))
    ys = dict(labels)
    w = {b: 0 for _pid, b, _x in rows}
    n = len(by_id)
    for _ in range(6):
        grad: dict[int, int] = {}
        for pid, fx in by_id.items():
            z = sum(_tdiv(w[b] * x, XS) for b, x in fx)
            zc = max(-ZC, min(ZC, z))
            p = S // 2 + _tdiv(zc * S, 2 * (S + abs(zc)))
            err = (p - ys[pid] * S) * (2 if ys[pid] == 0 else 1)
            for b, x in fx:
                grad[b] = grad.get(b, 0) + _tdiv(err * x, XS)
        for b, g in grad.items():
            w[b] = w[b] - _tdiv(g * 4, 1 * n)
    assert got == w


# fixture: 2 queries x 6 candidate docs. The lexical leg ranks docs
# 1..6 in doc order; the cosine leg ranks them in REVERSE, and the
# conjunctive-truth relevants are exactly the high-cosine docs {5, 6}.
# Plain RRF is symmetric between the legs, so its tie-break puts doc 1
# first; a reranker that learns the cosine feature puts 6 and 5 first.
def _fixture(spark):
    lex_rows, sem_rows, qrels_rows = [], [], []
    for qid in (1, 2):
        for d in range(1, 7):
            lex_rows.append((qid, d, (10 - d) * 1_000_000, d))
            sem_rows.append((qid, d, 0.35 + 0.09 * d, 7 - d))
        qrels_rows += [(qid, 5), (qid, 6)]
    lex = spark.createDataFrame(
        lex_rows, "query_id int, doc_id bigint, score_x1e6 bigint, rank int"
    )
    sem = spark.createDataFrame(
        sem_rows, "query_id int, doc_id bigint, cosine double, rank int"
    )
    qrels = spark.createDataFrame(qrels_rows, "query_id int, doc_id bigint")
    return lex, sem, qrels


def test_rerank_eval_improves_on_corpus(spark):
    """q_rerank_eval's contract value on the real corpus: the learned
    ordering's summed DCG and AP numerators beat plain RRF's (the same
    candidates, so hits@k / n_rel are invariant and the movement is
    pure ordering gain), in-sample against the training qrels."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.llm_ops import (
        q_rerank_eval,
    )

    rows = q_rerank_eval(spark, "/root/testdata/sf0.01").collect()
    agg = {}
    for r in rows:
        a = agg.setdefault(r["ordering"], [0, 0, 0])
        a[0] += r["dcg_x1e9"]
        a[1] += r["ap_num_x1e9"]
        a[2] += r["n_hits_at_k"]
    assert agg["reranked"][2] == agg["rrf"][2]  # same candidate set
    assert agg["reranked"][0] > agg["rrf"][0], agg
    assert agg["reranked"][1] > agg["rrf"][1], agg


def test_reranked_order_differs_and_improves_metrics(spark):
    lex, sem, qrels = _fixture(spark)
    cands = rrf_fuse([lex, sem], k=6)
    feats = reranker_features(cands, lex, sem)
    labels = (
        cands.join(qrels.withColumn("_r", F.lit(1)), ["query_id", "doc_id"], "left")
        .select(
            (F.col("query_id").cast("bigint") * 1_000_000_000 + F.col("doc_id"))
            .alias("pair_id"),
            F.coalesce(F.col("_r"), F.lit(0)).cast("bigint").alias("y"),
        )
    )
    w = clf.train_logreg_fixed_point(
        feats, labels, id_col="pair_id", steps=8,
        lr_num=4, lr_den=1, cb_neg=1, x_col="x",
    )
    rer = rerank_apply(cands, feats, w).collect()

    # non-vacuity: the learned order differs from RRF's
    assert any(r["rank"] != r["rerank"] for r in rer)

    def _msum(results, rank_col):
        m = retrieval_metrics(
            results.select(
                "query_id", "doc_id", F.col(rank_col).cast("int").alias("rank")
            ),
            qrels, k=6,
        ).collect()
        return (
            sum(r["mrr_x1e9"] for r in m),
            sum(r["dcg_x1e9"] for r in m),
        )

    base_mrr, base_dcg = _msum(cands, "rank")
    rer_df = spark.createDataFrame(rer)
    new_mrr, new_dcg = _msum(rer_df, "rerank")
    assert new_mrr > base_mrr, (new_mrr, base_mrr)
    assert new_dcg > base_dcg, (new_dcg, base_dcg)
    # and the learned head actually tops the relevant docs
    top = {
        (r["query_id"], r["rerank"]): r["doc_id"] for r in rer if r["rerank"] <= 2
    }
    assert set(top.values()) == {5, 6}
