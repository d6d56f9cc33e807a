"""PII redaction apply + URL/domain filtering front
(operators/privacy.py, operators/curation.py domain ops)."""

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
    blocklist_filter,
    domain_stats,
    host_suffixes,
    url_host,
    url_word_score,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.privacy import pii_redact


def test_pii_redact_order_contract(spark):
    """URLs are consumed FIRST: an email or digit run inside a URL
    disappears with the URL and never shows up in the later counts;
    free-standing PII after the URL is still typed and counted."""
    df = spark.createDataFrame(
        [
            (
                1,
                "see https://x.com/a@b.com?z=900000000123 "
                "mail c@d.example.org tel 123456789 done",
            ),
            (2, "no pii here at all"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    r1 = got[1]
    assert (r1["n_url"], r1["n_email"], r1["n_longnum"]) == (1, 1, 1)
    assert r1["redacted"] == "see <URL> mail <EMAIL> tel <NUM> done"
    r2 = got[2]
    assert (r2["n_url"], r2["n_email"], r2["n_longnum"]) == (0, 0, 0)
    assert r2["redacted"] == "no pii here at all"


def test_pii_redact_placeholders_are_stable(spark):
    """A second pass over redacted text is a no-op: placeholders must
    not themselves match any pattern (the idempotence a multi-pass
    pipeline silently relies on)."""
    df = spark.createDataFrame(
        [(1, "x 9876543210 y a@b.co z https://e.com/q?r=1")],
        "doc_id bigint, text string",
    )
    once = pii_redact(df).select(
        "doc_id", F.col("redacted").alias("text")
    )
    twice = pii_redact(once).collect()[0]
    assert (twice["n_url"], twice["n_email"], twice["n_longnum"]) == (0, 0, 0)
    assert twice["redacted"] == "x <NUM> y <EMAIL> z <URL>"


def test_url_host_and_suffixes(spark):
    df = spark.createDataFrame(
        [
            (1, "https://user:pw@Ads.Example.NET:443/banner?id=1"),
            (2, "http://a.b.c.d.e.f.g.h.i.j.example.com/x"),
            (3, "not a url"),
        ],
        "doc_id bigint, url string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            url_host("url").alias("h"),
            host_suffixes(url_host("url")).alias("s"),
        ).collect()
    }
    assert rows[1]["h"] == "ads.example.net"
    assert rows[1]["s"] == [
        "ads.example.net",
        "example.net",
        "net",
    ]
    # 12-label host, cap 8: only the shallowest 8 suffixes survive
    assert len(rows[2]["s"]) == 8
    assert rows[2]["s"][0] == "e.f.g.h.i.j.example.com"
    assert rows[2]["s"][-1] == "com"
    assert rows[3]["h"] == ""


def test_blocklist_filter_suffix_semantics(spark):
    """Exact host and any-depth subdomains block; an INFIX occurrence
    of a blocked domain does not; non-URL rows survive (empty host)."""
    df = spark.createDataFrame(
        [
            (1, "https://Ads.Example.NET/x"),  # exact (case-noise)
            (2, "https://a.b.ads.example.net/y"),  # deep subdomain
            (3, "https://ads.example.net.evil.org/z"),  # infix: KEEP
            (4, "https://news.example.com/ok"),  # clean
            (5, None),  # no URL at all
        ],
        "doc_id bigint, url string",
    )
    bl = spark.createDataFrame([("ads.example.net",)], "domain string")
    kept = sorted(
        r["doc_id"] for r in blocklist_filter(df, bl).collect()
    )
    assert kept == [3, 4, 5]


def test_domain_stats_shares(spark):
    df = spark.createDataFrame(
        [(i, f"https://h{i % 3}.example.com/{i}") for i in range(10)],
        "doc_id bigint, url string",
    )
    rows = domain_stats(df).collect()
    assert sum(r["n_docs"] for r in rows) == 10
    # integer-truncated shares never exceed 10000 in total
    assert sum(r["share_bp"] for r in rows) <= 10000
    by_host = {r["host"]: r["n_docs"] for r in rows}
    assert by_host == {
        "h0.example.com": 4,
        "h1.example.com": 3,
        "h2.example.com": 3,
    }


def test_url_word_score_counts_fragments(spark):
    df = spark.createDataFrame(
        [
            (1, "https://ADS.site/banner.gif"),
            (2, "https://news.example.com/article"),
            (3, "http://spam.tracker.example.net/p"),
        ],
        "doc_id bigint, url string",
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            url_word_score("url", ["ads", "banner", "spam", "tracker"]).alias(
                "s"
            ),
        ).collect()
    }
    assert got == {1: 2, 2: 0, 3: 2}


def test_flagged_word_stats_semantics(spark):
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
        flagged_word_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "Bad WORD bad word clean text here"),
            (2, "all clean tokens only"),
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    wl = spark.createDataFrame([("bad",), ("WORD",)], "word string")
    got = {r["doc_id"]: r for r in flagged_word_stats(df, wl).collect()}
    # case-insensitive both sides: 4 of 7 tokens hit
    assert got[1]["n_flagged"] == 4 and got[1]["n_tokens"] == 7
    assert got[1]["density_bp"] == (10000 * 4) // 7
    assert got[2]["n_flagged"] == 0 and got[2]["density_bp"] == 0
    # empty text: zero tokens, zero density (not NULL)
    assert got[3]["n_tokens"] == 0 and got[3]["density_bp"] == 0


def test_domain_stats_delta_equals_rebuild(spark):
    """Fold == full rebuild over the union, on a DIFFERENT split than
    the oracle query uses (host seen only in delta, host seen only in
    standing, host in both)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
        domain_stats,
        domain_stats_delta,
    )

    urls = [
        (i, f"https://h{i % 4}.example.com/{i}") for i in range(20)
    ] + [(100, "https://only-delta.example.org/x")]
    df = spark.createDataFrame(urls, "doc_id bigint, url string")
    standing_docs = df.filter(F.col("doc_id") % 4 != 3).filter(
        F.col("doc_id") != 100
    )
    delta_docs = df.join(standing_docs, "doc_id", "left_anti")
    folded = domain_stats_delta(domain_stats(standing_docs), delta_docs)
    rebuilt = domain_stats(df)
    assert folded.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(folded).count() == 0


def test_domain_stats_delta_is_the_streaming_maintenance_body(
    spark, tmp_path
):
    """The incremental fold IS the streaming maintenance body (the
    house foreachBatch discipline): a file stream of arriving URL
    batches folds per-host stats through domain_stats_delta inside
    foreachBatch (AvailableNow + checkpoint), state round-trips via
    parquet between batches, and the final standing table equals one
    batch-mode domain_stats over everything that arrived."""
    import json
    import os

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
        domain_stats,
        domain_stats_delta,
    )

    schema = "doc_id bigint, url string"
    batches = [
        [(i, f"https://h{i % 3}.example.com/{i}") for i in range(6)],
        [(10 + i, f"https://h{i % 4}.example.org/{i}") for i in range(6)],
    ]
    state = str(tmp_path / "host_stats")
    # empty standing table seed
    spark.createDataFrame([], "host string, n_docs bigint").write.parquet(
        state
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def fold(batch_df, _bid):
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        standing = s.read.parquet(state)
        folded = domain_stats_delta(standing, batch_df)
        folded.select("host", "n_docs").write.mode("overwrite").parquet(
            state + ".next"
        )
        import shutil

        shutil.rmtree(state)
        os.rename(state + ".next", state)

    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for did, url in rows:
                f.write(json.dumps({"doc_id": did, "url": url}) + "\n")
        q = (
            spark.readStream.schema(schema)
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    final = domain_stats_delta(
        spark.read.parquet(state),
        spark.createDataFrame([], schema),
    )
    want = domain_stats(
        spark.createDataFrame(
            [r for b in batches for r in b], schema
        )
    )
    assert final.exceptAll(want).count() == 0
    assert want.exceptAll(final).count() == 0
