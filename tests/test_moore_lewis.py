"""Moore-Lewis cross-entropy-difference selection
(operators/lm_score.py moore_lewis_scores). The oracle pins the exact
integers; this pins the selection SEMANTICS on a constructed corpus:
in-domain-looking text scores delta <= 0 (kept), out-of-domain text
scores delta > 0 (dropped), and evidence-free docs stay NULL."""

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.lm_score import (
    moore_lewis_scores,
)


def _corpus(spark):
    rows = []
    # in-domain slice: repetitive domain bigrams
    for i in range(8):
        rows.append((i, "alpha beta gamma alpha beta gamma alpha beta", "en"))
    # out-of-domain: disjoint vocabulary, its own structure
    for i in range(8, 16):
        rows.append((i, "zeta eta theta zeta eta theta zeta eta", "xx"))
    # a fresh doc written in the domain's language
    rows.append((100, "alpha beta gamma alpha beta", "xx"))
    # a fresh doc written in the other vocabulary
    rows.append((101, "zeta eta theta zeta eta", "xx"))
    # no evidence: single token
    rows.append((102, "alpha", "xx"))
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_moore_lewis_selection_semantics(spark):
    got = {
        r["doc_id"]: r
        for r in moore_lewis_scores(
            _corpus(spark), F.col("lang") == "en", 0
        ).collect()
    }
    # domain-language doc: the in-domain LM models it strictly better
    # than the general LM (which also spent mass on the zeta slice)
    assert got[100]["delta_x100"] <= 0 and got[100]["kept"] is True
    # other-vocabulary doc: unseen by the in-domain LM, well modeled by
    # the general LM -> positive delta, dropped
    assert got[101]["delta_x100"] > 0 and got[101]["kept"] is False
    # < 2 tokens: no bigrams, NULL scores, NULL decision (policy stays
    # with the caller, never a silent drop)
    r = got[102]
    assert r["n_bigrams"] == 0
    assert r["bits_in_x100"] is None and r["kept"] is None
    # every row carries both sides of the contrast
    assert all(
        g["bits_gen_x100"] is not None
        for g in got.values()
        if g["n_bigrams"] > 0
    )
