"""curate_corpus_v8: span-level benchmark decontamination composed
into the trained-gate chain (plans/corpus.py). The oracle
(q_corpus_pipeline_v8) pins the stage censuses; this pins what the
census can't: the decon stage is exactly decontaminate_apply over the
line-dedup survivors (doc-for-doc, text-for-text), benchmark content
is really gone from every downstream stage, and clean docs pass
through with only the newline->space rewrite."""

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
    decontaminate_apply,
    tokens,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.plans.corpus import (
    _STAGE_ORDER_V8,
    curate_corpus_v8,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMALL

DECON_L = 5


def _inputs(spark):
    raw = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    docs = raw.filter(F.col("doc_id") >= 10)
    bench = raw.filter(F.col("doc_id") < 10).select("doc_id", "text")
    return docs, bench, load_table(spark, SF_SMALL, "embeddings")


def test_v8_decon_stage_is_decontaminate_apply(spark):
    docs, bench, emb = _inputs(spark)
    stages = curate_corpus_v8(docs, emb, bench=bench, budget=5_000)
    line_kept = stages["line_dedup"]
    got = {
        r["doc_id"]: r["text"] for r in stages["decon"].collect()
    }
    want = {
        r["doc_id"]: r["kept_text"]
        for r in decontaminate_apply(line_kept, bench, min_len=DECON_L)
        .filter(F.col("kept_text") != "")
        .collect()
    }
    assert got == want
    # stage order contract: decon sits between line_dedup and classifier
    assert _STAGE_ORDER_V8.index("decon") == _STAGE_ORDER_V8.index(
        "line_dedup"
    ) + 1


def test_v8_output_shares_no_benchmark_run(spark):
    """The decontamination guarantee, end to end: no doc in ANY
    downstream stage shares a >= 5-token run with the benchmark."""
    docs, bench, emb = _inputs(spark)
    stages = curate_corpus_v8(docs, emb, bench=bench, budget=5_000)
    bgrams = {
        " ".join(ts[i:i + DECON_L])
        for (ts,) in bench.select(tokens("text")).collect()
        for i in range(len(ts) - DECON_L + 1)
    }
    for stage in ("decon", "classifier", "semdedup"):
        for (ts,) in stages[stage].select(tokens("text")).collect():
            for i in range(len(ts) - DECON_L + 1):
                assert " ".join(ts[i:i + DECON_L]) not in bgrams, (
                    stage, ts[i:i + DECON_L]
                )


def test_v8_clean_docs_pass_through(spark):
    """Docs sharing nothing with the benchmark keep their token
    sequence verbatim (only the newline->space rebuild)."""
    docs, bench, emb = _inputs(spark)
    stages = curate_corpus_v8(docs, emb, bench=bench, budget=5_000)
    lk = {
        r["doc_id"]: r["text"] for r in stages["line_dedup"].collect()
    }
    dc = {r["doc_id"]: r["text"] for r in stages["decon"].collect()}
    unchanged = 0
    for doc_id, text in dc.items():
        if text.split() == lk[doc_id].split():
            unchanged += 1
    # nearly every doc is clean; at least one is rewritten or dropped
    assert unchanged >= len(dc) - 5
    assert unchanged < len(lk), "fixture has no contamination at all"
