"""Edge-case tests for operators/curation.py (the contract queries in
queries/curation_ops.py carry the oracle-exactness check; these cover
the operator behaviors a corpus fixture can't)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
    canonicalize_url,
    importance_weights,
    line_dedup,
    mixture_weights,
    url_dedup,
)


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url("url").alias("c")).collect()[0]["c"]


def test_canonicalize_url_rules(spark):
    # case, www, default port, trailing slash, fragment, tracking params,
    # param sort — all collapse
    assert (
        _canon(spark, "HTTPS://WWW.Site.COM:443/A/B/?b=2&utm_source=x&a=1#frag")
        == "https://site.com/A/B?a=1&b=2"
    )
    # path case is PRESERVED; non-default port is preserved
    assert _canon(spark, "http://site.com:8080/CaseSensitive") == (
        "http://site.com:8080/CaseSensitive"
    )
    # :80 stripped for http only
    assert _canon(spark, "http://site.com:80/x") == "http://site.com/x"
    assert _canon(spark, "https://site.com:80/x") == "https://site.com:80/x"
    # valueless tracking param and empty params dropped; '?' omitted when
    # nothing survives
    assert _canon(spark, "https://site.com/x?ref&utm_campaign=1&") == (
        "https://site.com/x"
    )
    # root URL: trailing slash stripped to bare authority
    assert _canon(spark, "https://site.com/") == "https://site.com"


def test_url_dedup_groups_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x?b=1&a=2"),
            (2, "HTTPS://WWW.A.com:443/x/?a=2&b=1&utm_source=s"),
            (3, "https://a.com/y"),
        ],
        "doc_id bigint, url string",
    )
    out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert out["https://a.com/x?a=2&b=1"]["survivor_id"] == 1
    assert out["https://a.com/x?a=2&b=1"]["dup_count"] == 2
    assert out["https://a.com/y"]["dup_count"] == 1


def test_mixture_weights_math_and_validation(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 6 else "b") for i in range(8)],
        "doc_id bigint, source string",
    )
    out = {
        r["source"]: r
        for r in mixture_weights(df, "source", {"a": 0.25, "b": 0.75}).collect()
    }
    # a: 6 of 8 actual (0.75) vs target 0.25 -> downweight to 1/3
    assert math.isclose(out["a"]["sample_weight"], 0.25 * 8 / 6)
    assert math.isclose(out["b"]["sample_weight"], 0.75 * 8 / 2)
    assert out["a"]["planned_docs"] == 2 and out["b"]["planned_docs"] == 6
    with pytest.raises(ValueError):
        mixture_weights(df, "source", {"a": 0.5, "b": 0.6})


def test_mixture_weights_unlisted_source_gets_zero(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "mystery")], "doc_id bigint, source string"
    )
    out = {
        r["source"]: r for r in mixture_weights(df, "source", {"a": 1.0}).collect()
    }
    assert out["mystery"]["target_share"] == 0.0
    assert out["mystery"]["sample_weight"] == 0.0
    assert out["mystery"]["planned_docs"] == 0


def test_line_dedup_removes_boilerplate_keeps_order(spark):
    banner = "accept cookies"
    df = spark.createDataFrame(
        [
            (1, f"{banner}\nunique one\nmiddle\nend one"),
            (2, f"{banner}\nunique two"),
            (3, f"{banner}\nunique three"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, max_docs=2).collect()}
    # the banner (3 docs > max 2) is gone everywhere; order preserved
    assert out[1]["kept_text"] == "unique one\nmiddle\nend one"
    assert out[1]["n_lines"] == 4 and out[1]["n_removed"] == 1
    assert out[2]["kept_text"] == "unique two"


def test_line_dedup_fully_removed_doc_yields_empty(spark):
    df = spark.createDataFrame(
        [(1, "dup"), (2, "dup"), (3, "dup")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in line_dedup(df, max_docs=2).collect()}
    assert out[1]["kept_text"] == ""
    assert out[1]["n_lines"] == 1 and out[1]["n_removed"] == 1


def test_weighted_resample_hits_target_mixture(spark):
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
        weighted_resample,
    )

    # 900 'web' docs vs 100 'books' docs; target 50/50 with alpha=0.5:
    # expected keep ~ 0.5*0.5/0.9 = 27.8% of web, 0.5*0.5/0.1 = 100%+ (capped)
    # of books -> resampled mixture ~ 250 web : 100 books
    rows = [(i, "web" if i % 10 else "books") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
        mixture_weights,
    )

    w = mixture_weights(df, "source", {"web": 0.5, "books": 0.5})
    out = weighted_resample(df, w, alpha=0.5)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # books: weight 0.5*1000/100 = 5, capped at 1 -> all 100 kept
    assert counts["books"] == 100
    # web: p = 0.5 * 0.5*1000/900 ~ 0.2778 -> about 250 of 900 (hash noise)
    assert 200 < counts["web"] < 310
    # deterministic: same inputs -> identical survivor set
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in
                  weighted_resample(df, w, alpha=0.5).select("doc_id").collect())
    assert ids1 == ids2


def test_weighted_resample_strict_on_missing_source(spark):
    """ADVICE r4: a source absent from the weights frame must fail the
    job (strict default), not silently drop its documents; strict=False
    restores the documented drop; a pre-existing sample_weight column on
    df must survive untouched (collision-safe internal join name)."""
    import pytest
    from pyspark.errors import SparkRuntimeException
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
        weighted_resample,
    )

    df = spark.createDataFrame(
        [(1, "web", 9.9), (2, "books", 8.8)],
        "doc_id bigint, source string, sample_weight double",
    )
    w = spark.createDataFrame([("web", 1.0)], "source string, sample_weight double")
    with pytest.raises(SparkRuntimeException, match="books"):
        weighted_resample(df, w, alpha=1.0).collect()

    out = weighted_resample(df, w, alpha=1.0, strict=False)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]  # books dropped, weight 0
    # df's own sample_weight column passed through unmodified
    assert rows[0]["sample_weight"] == 9.9

    # a source PRESENT with an explicit NULL weight is the deliberate
    # exclude spelling: dropped (weight 0.0) even under strict, never
    # confused with an absent source
    w2 = spark.createDataFrame(
        [("web", 1.0), ("books", None)], "source string, sample_weight double"
    )
    rows2 = weighted_resample(df, w2, alpha=1.0).collect()  # strict default
    assert [r["doc_id"] for r in rows2] == [1]


def test_importance_weights_orders_target_like_docs_first(spark):
    # target docs speak 'alpha beta'; the off-target doc speaks 'omega'
    df = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", True),
            (2, "alpha beta beta alpha", True),
            (3, "alpha beta alpha beta", False),  # target-like non-target
            (4, "omega omega omega omega", False),
        ],
        "doc_id bigint, text string, is_t boolean",
    )
    out = {
        r["doc_id"]: r
        for r in importance_weights(df, F.col("is_t"), n_buckets=64).collect()
    }
    # doc 3 uses the target vocabulary -> importance above the omega doc
    assert out[3]["importance"] > out[4]["importance"]
    assert out[3]["n_tokens"] == 4
    # docs with identical token multisets score identically
    assert out[1]["importance"] == out[2]["importance"] == out[3]["importance"]


def test_hist_sketch_merges_and_bounds_error(spark):
    """Core sketch property: build on two halves, merge by summing
    bucket counts -> identical to a single build; estimates within one
    bucket width of the exact quantile."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.functions.sketches import (
        hist_build,
        hist_quantiles,
    )

    rows = [(i, "g", float(i % 97) + (i % 7) * 0.13) for i in range(2000)]
    df = spark.createDataFrame(rows, "i bigint, g string, x double")
    h_full = hist_build(df, ["g"], "x", 5.0)
    h1 = hist_build(df.filter(F.col("i") % 2 == 0), ["g"], "x", 5.0)
    h2 = hist_build(df.filter(F.col("i") % 2 == 1), ["g"], "x", 5.0)
    merged = (
        h1.unionByName(h2)
        .groupBy("g", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    full = {r["bucket"]: r["n"] for r in h_full.collect()}
    mrg = {r["bucket"]: r["n"] for r in merged.collect()}
    assert full == mrg

    est = {
        r["q"]: r["est_quantile"]
        for r in hist_quantiles(h_full, ["g"], 5.0, [0.5, 0.9]).collect()
    }
    exact = df.agg(
        F.percentile("x", 0.5).alias("p50"), F.percentile("x", 0.9).alias("p90")
    ).collect()[0]
    assert abs(est[0.5] - exact["p50"]) <= 5.0
    assert abs(est[0.9] - exact["p90"]) <= 5.0
