"""Bigram DSIR features (operators/curation.py importance_weights
ngram=2): the order-affinity claim — on a corpus where target and
non-target docs share the SAME unigram distribution and differ only in
word ORDER, unigram importance cannot separate them but bigram
importance must."""

import pytest
from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
    importance_weights,
)


def _corpus(spark):
    rows = []
    # target: "alpha beta" ordering, repeated
    for i in range(6):
        rows.append((i, "alpha beta alpha beta alpha beta", "en"))
    # non-target: identical unigram counts, reversed ordering
    for i in range(6, 12):
        rows.append((i, "beta alpha beta alpha beta alpha", "xx"))
    # probes written in each ordering, both labeled non-target
    rows.append((100, "alpha beta alpha beta", "xx"))
    rows.append((101, "beta alpha beta alpha", "xx"))
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_bigram_features_see_order_unigrams_cannot(spark):
    docs = _corpus(spark)
    tgt = F.col("lang") == "en"

    uni = {
        r["doc_id"]: r["importance"]
        for r in importance_weights(docs, tgt, n_buckets=64).collect()
    }
    bi = {
        r["doc_id"]: r["importance"]
        for r in importance_weights(docs, tgt, n_buckets=64, ngram=2).collect()
    }
    # unigram view: the probes are indistinguishable (same bag)
    assert uni[100] == pytest.approx(uni[101])
    # bigram view: the target-ordered probe scores strictly higher
    assert bi[100] > bi[101]


def test_ngram_guard(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError):
        importance_weights(docs, F.col("lang") == "en", ngram=3)
