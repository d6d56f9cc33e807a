"""curate_corpus_v10: the v9 chain with the UniMax per-language
budget cut (plans/corpus.py). The oracle (q_corpus_pipeline_v10) pins
the stage censuses; this pins what the census can't: the budget stage
is exactly unimax_allocation + one token_budget_select per language
over the chain's own semdedup survivors, allocations respect the
epoch cap, and the cut genuinely differs from v9's global prefix."""

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
    token_budget_select,
    unimax_allocation,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import token_count
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.ordering import (
    shuffle_key,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.plans.corpus import (
    curate_corpus_v9,
    curate_corpus_v10,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.queries.c4_ops import (
    C4_FLAG_WORDS,
    V9_GOPHER_STOP_MIN,
    V9_GOPHER_WORD_MIN,
    _webified,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _inputs(spark):
    web = _webified(spark, SF_SMALL, extra=("lang", "source"))
    docs = web.filter(F.col("doc_id") >= 10)
    bench = web.filter(F.col("doc_id") < 10).select("doc_id", "text")
    emb = load_table(spark, SF_SMALL, "embeddings")
    wl = spark.createDataFrame([(w,) for w in C4_FLAG_WORDS], "word string")
    kw = dict(
        bench=bench,
        gopher_word_min=V9_GOPHER_WORD_MIN,
        gopher_stop_min=V9_GOPHER_STOP_MIN,
        c4_flag_words=wl,
    )
    return docs, emb, kw


def test_v10_budget_is_unimax_plus_per_lang_prefix(spark):
    docs, emb, kw = _inputs(spark)
    stages = curate_corpus_v10(docs, emb, **kw)
    sem = stages["semdedup"]
    sized = sem.select(
        "doc_id", "lang",
        token_count("text").cast("long").alias("n_tokens"),
        shuffle_key("doc_id").alias("pri"),
    )
    alloc = {
        r["grp"]: (r["alloc"], r["cap"])
        for r in unimax_allocation(
            sized, "lang", token_col="n_tokens"
        ).collect()
    }
    # allocations respect the epoch cap
    assert all(a <= c for a, c in alloc.values())
    # replay: per language, the budget stage is exactly the standalone
    # token_budget_select prefix under that language's allocation
    want = set()
    for g, (a, _c) in alloc.items():
        want |= {
            r["doc_id"]
            for r in token_budget_select(
                sized.filter(F.col("lang") == g), a, ["pri", "doc_id"]
            ).collect()
        }
    got = {r["doc_id"] for r in stages["budget"].collect()}
    assert got == want and got  # non-empty, doc-for-doc identical
    # per-language mass inside the budget never exceeds the allocation
    mass = {
        r["lang"]: r["m"]
        for r in stages["budget"]
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("m"))
        .collect()
    }
    assert all(mass[g] <= alloc[g][0] for g in mass)


def test_v10_cut_differs_from_v9_global_prefix(spark):
    docs, emb, kw = _inputs(spark)
    v9 = curate_corpus_v9(docs, emb, budget=5_000, **kw)
    v10 = curate_corpus_v10(docs, emb, **kw)
    # both chains share every stage through semdedup (the swap is the
    # budget stage only)
    assert {r["doc_id"] for r in v9["semdedup"].collect()} == {
        r["doc_id"] for r in v10["semdedup"].collect()
    }
    b9 = {r["doc_id"] for r in v9["budget"].collect()}
    b10 = {r["doc_id"] for r in v10["budget"].collect()}
    assert b9 != b10  # the UniMax cut is a genuinely different mix
