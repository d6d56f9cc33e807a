"""curate_corpus_v7: the trained-classifier gate inside the composed
chain (plans/corpus.py). The oracle (q_corpus_pipeline_v7) pins the
exact stage censuses; this pins the semantic claims the census alone
can't: the gate is the REAL trained decision (doc-for-doc equal to
trained_score over the same stage input), and it differs from the
placeholder gate it replaces."""

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators import classifier as clf
from nasdaq_equity_airflow_ecs_pipeline_spark.plans.corpus import (
    curate_corpus_v6,
    curate_corpus_v7,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _inputs(spark):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    emb = load_table(spark, SF_SMALL, "embeddings")
    return docs, emb


def test_v7_gate_is_the_trained_decision(spark):
    docs, emb = _inputs(spark)
    stages = curate_corpus_v7(docs, emb, budget=5_000)
    line_kept = stages["line_dedup"]
    kept = stages["classifier"]

    # survivors are a subset of the line-dedup stage (chain discipline)
    assert kept.join(line_kept, "doc_id", "left_anti").count() == 0

    # and exactly the docs trained_score keeps on the same stage input
    td = docs.select("doc_id", "text")
    weights = clf.train_logreg_fixed_point(
        clf.hashed_token_features(td), clf.rule_labels(td)
    )
    expect = (
        clf.trained_score(line_kept, weights)
        .filter(F.col("kept"))
        .select("doc_id")
    )
    got = kept.select("doc_id")
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_v7_gate_differs_from_placeholder(spark):
    """If the trained gate kept exactly the placeholder's survivor set
    the capstone would be vacuous — the learned weights must actually
    move the stage decision on this corpus."""
    docs, emb = _inputs(spark)
    v6_kept = curate_corpus_v6(docs, emb, budget=5_000)["classifier"]
    v6_ids = {r["doc_id"] for r in v6_kept.select("doc_id").collect()}
    v7_kept = curate_corpus_v7(docs, emb, budget=5_000)["classifier"]
    v7_ids = {r["doc_id"] for r in v7_kept.select("doc_id").collect()}
    assert v7_ids != v6_ids
    assert v7_ids  # the trained gate keeps a non-empty corpus
