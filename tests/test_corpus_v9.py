"""curate_corpus_v9: the Gopher + C4 rule front composed before the
decontamination + trained-gate chain (plans/corpus.py). The oracle
(q_corpus_pipeline_v9) pins the stage censuses; this pins what the
census can't: each front stage is exactly its standalone operator
applied to the previous stage's survivors (doc-for-doc,
text-for-text), the Gopher stage never rewrites text, and the stages
sit in the FineWeb order."""

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.c4 import c4_apply
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.gopher import (
    gopher_quality_flags,
    gopher_repetition_stats,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.plans.corpus import (
    _STAGE_ORDER_V9,
    curate_corpus_v9,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.queries.c4_ops import (
    C4_FLAG_WORDS,
    V9_GOPHER_STOP_MIN,
    V9_GOPHER_WORD_MIN,
    _webified,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _run(spark):
    web = _webified(spark, SF_SMALL, extra=("lang", "source"))
    docs = web.filter(F.col("doc_id") >= 10)
    bench = web.filter(F.col("doc_id") < 10).select("doc_id", "text")
    emb = load_table(spark, SF_SMALL, "embeddings")
    wl = spark.createDataFrame([(w,) for w in C4_FLAG_WORDS], "word string")
    return curate_corpus_v9(
        docs,
        emb,
        bench=bench,
        gopher_word_min=V9_GOPHER_WORD_MIN,
        gopher_stop_min=V9_GOPHER_STOP_MIN,
        c4_flag_words=wl,
        budget=5_000,
    ), wl


def test_v9_stage_order_is_fineweb(spark):
    i = _STAGE_ORDER_V9.index
    assert i("line_dedup") < i("gopher") < i("c4") < i("decon") < i(
        "classifier"
    )


def test_v9_gopher_stage_is_the_standalone_front(spark):
    stages, _wl = _run(spark)
    lk = stages["line_dedup"]
    got = {r["doc_id"]: r["text"] for r in stages["gopher"].collect()}
    keep = {
        r["doc_id"]
        for r in gopher_quality_flags(
            lk, word_min=V9_GOPHER_WORD_MIN, stop_min=V9_GOPHER_STOP_MIN
        )
        .filter(F.col("keep"))
        .collect()
    }
    viol = {
        r["doc_id"]
        for r in gopher_repetition_stats(lk)
        .filter(~F.col("ok"))
        .collect()
    }
    want = {
        r["doc_id"]: r["text"]
        for r in lk.collect()
        if r["doc_id"] in keep and r["doc_id"] not in viol
    }
    assert got == want  # same docs AND text untouched (pure filter)
    assert 0 < len(got) < lk.count()  # the stage actually bites


def test_v9_c4_stage_is_c4_apply(spark):
    stages, wl = _run(spark)
    got = {r["doc_id"]: r["text"] for r in stages["c4"].collect()}
    want = {
        r["doc_id"]: r["text"]
        for r in c4_apply(stages["gopher"], flag_words=wl).collect()
    }
    assert got == want
    # C4 rewrites (kept lines only): at least one doc loses text here
    gtxt = {r["doc_id"]: r["text"] for r in stages["gopher"].collect()}
    assert any(got[d] != gtxt[d] for d in got)


def test_v9_downstream_runs_on_rule_front_survivors(spark):
    stages, _wl = _run(spark)
    c4_ids = {r["doc_id"] for r in stages["c4"].select("doc_id").collect()}
    for stage in ("decon", "classifier", "lm_gate", "semdedup"):
        ids = {
            r["doc_id"] for r in stages[stage].select("doc_id").collect()
        }
        assert ids <= c4_ids, stage
