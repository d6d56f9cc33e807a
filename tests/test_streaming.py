"""Structured Streaming surface: real readStream/writeStream runs.

Each test drives an actual streaming query (file source or per-batch
feed, AvailableNow trigger, memory/parquet sink) and asserts the result
equals the batch run of the SAME transformation function — the
batch/stream-parity contract streaming/__init__.py promises.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.sources.mock import generate_mock_quotes
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.jsonl import write_quotes_jsonl
from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import load_table
from nasdaq_equity_airflow_ecs_pipeline_spark.streaming import (
    read_quotes_stream,
    run_ingest_available_now,
    session_window_agg,
    tumbling_counts,
)

from .conftest import SF_SMALL


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_ingest_available_now(spark, tmp_path):
    raw = str(tmp_path / "raw")
    bronze = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    for d in ("2024-01-01", "2024-01-02"):
        write_quotes_jsonl(generate_mock_quotes(spark, d), raw)

    run_ingest_available_now(read_quotes_stream(spark, raw), bronze, ckpt)
    got = spark.read.parquet(bronze)
    exp = spark.read.json(f"{raw}/date=*")  # sans partition col
    assert got.count() == exp.count()
    assert set(
        r["d"] for r in got.select(F.col("date").cast("string").alias("d")).distinct().collect()
    ) == {"2024-01-01", "2024-01-02"}

    # incremental contract: a new day arrives -> only it is processed
    write_quotes_jsonl(generate_mock_quotes(spark, "2024-01-03"), raw)
    run_ingest_available_now(read_quotes_stream(spark, raw), bronze, ckpt)
    assert spark.read.parquet(bronze).count() == exp.count() // 2 * 3


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """sf0.001 events re-landed as JSON files (a file-streamable feed)."""
    d = str(tmp_path_factory.mktemp("events_json"))
    ev = load_table(spark, SF_SMALL, "events")
    ev.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id", "event_type", "value",
    ).coalesce(4).write.mode("overwrite").json(d)
    return d


def _read_event_stream(spark, d):
    return (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .json(d)
    )


def _run_to_memory(df, name: str, output_mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_tumbling_stream_matches_batch(spark, event_stream_dir):
    stream = _read_event_stream(spark, event_stream_dir)
    agg = tumbling_counts(stream, duration="1 hour", watermark="2 hours")
    _run_to_memory(agg, "t_tumbling", "complete")
    got = spark.table("t_tumbling")

    batch = spark.read.schema(stream.schema).json(event_stream_dir)
    exp = tumbling_counts(batch, duration="1 hour")
    cols = ["window_start", "window_end", "event_type", "n_events"]
    assert _rows(got, cols) == _rows(exp, cols)


def test_session_window_stream_matches_batch(spark, event_stream_dir):
    stream = _read_event_stream(spark, event_stream_dir)
    agg = session_window_agg(stream, gap="30 minutes", watermark="2 hours")
    _run_to_memory(agg, "t_sessions", "complete")
    got = spark.table("t_sessions")

    batch = spark.read.schema(stream.schema).json(event_stream_dir)
    exp = session_window_agg(batch, gap="30 minutes")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got, cols) == _rows(exp, cols)


def test_quotefeed_datasource_batch(spark):
    """Custom Python DataSource (sources/quotefeed.py): executor-side
    partitioned generation, deterministic across reads, parallelism
    honored, schema = RAW_QUOTE_SCHEMA."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.schemas import RAW_QUOTE_SCHEMA
    from nasdaq_equity_airflow_ecs_pipeline_spark.sources.quotefeed import (
        QuoteFeedDataSource,
    )

    spark.dataSource.register(QuoteFeedDataSource)
    df = (
        spark.read.format("quotefeed")
        .option("date", "2024-03-05")
        .option("symbols", "AAPL,MSFT,GOOGL,AMZN,META")
        .option("parallelism", "3")
        .load()
    )
    assert df.schema == RAW_QUOTE_SCHEMA
    assert df.rdd.getNumPartitions() == 3
    rows = sorted(tuple(r) for r in df.collect())
    assert len(rows) == 5 and {r[0] for r in rows} == {
        "AAPL", "MSFT", "GOOGL", "AMZN", "META"
    }
    again = sorted(tuple(r) for r in df.sparkSession.read.format("quotefeed")
                   .option("date", "2024-03-05")
                   .option("symbols", "AAPL,MSFT,GOOGL,AMZN,META")
                   .option("parallelism", "3").load().collect())
    assert again == rows  # deterministic re-read
    for r in rows:
        assert r[6] <= r[3] <= r[7]  # day_low <= price <= day_high


def test_quotefeed_datasource_stream_drains_days(spark, tmp_path):
    """DataSourceStreamReader: AvailableNow drains the whole day-backlog
    (one batch of per-day splits) with checkpointed offsets; a restart
    re-processes nothing."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.sources.quotefeed import (
        QuoteFeedDataSource,
    )

    spark.dataSource.register(QuoteFeedDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("quotefeed")
            .option("start_date", "2024-03-04")
            .option("end_date", "2024-03-06")
            .option("symbols", "AAPL,MSFT")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = spark.read.parquet(out)
    assert got.count() == 3 * 2  # 3 days x 2 symbols
    assert {r["extraction_time"] for r in got.collect()} == {
        f"2024-03-0{d}T02:00:00" for d in (4, 5, 6)
    }
    drain()  # offsets checkpointed: nothing new
    assert spark.read.parquet(out).count() == 6


def test_quotefeed_stream_rejects_inverted_dates():
    """end_date < start_date must fail fast with a directed message, not
    surface as Spark's opaque 'latest offset precedes initial offset'."""
    import pytest

    from nasdaq_equity_airflow_ecs_pipeline_spark.sources.quotefeed import (
        QuoteFeedStreamReader,
    )

    with pytest.raises(ValueError, match="before start_date"):
        QuoteFeedStreamReader(
            {"start_date": "2024-03-06", "end_date": "2024-03-04"}
        )


def test_interval_join_stream_matches_batch(spark, event_stream_dir):
    """Stream-stream interval join (clicks x purchases within 1h, same
    user): two watermarked streams over the same feed, inner append-mode
    join — result equals the batch run of the same function body."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.streaming.joins import interval_join

    def split(df):
        c = df.filter(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts"
        )
        p = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts", "value"
        )
        return c, p

    sc, sp = split(_read_event_stream(spark, event_stream_dir))
    joined = interval_join(sc, sp, tolerance="1 hour", watermark="2 hours")
    _run_to_memory(joined, "t_sjoin", "append")
    got = spark.table("t_sjoin")

    batch = spark.read.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    ).json(event_stream_dir)
    bc, bp = split(batch)
    exp = interval_join(bc, bp, tolerance="1 hour")
    cols = ["user_id", "l_event_id", "r_event_id", "r_value"]
    assert _rows(got, cols) == _rows(exp, cols)
    assert got.count() > 0


def test_interval_left_outer_stream_join(spark, event_stream_dir):
    """Left-outer stream-stream join: matched rows equal the batch run;
    null-padded unmatched clicks are a subset of the batch unmatched set
    (rows inside the final watermark window are held back — Spark's
    outer-join contract, documented in streaming/joins.py)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.streaming.joins import interval_join

    def split(df):
        c = df.filter(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts"
        )
        p = df.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts", "value"
        )
        return c, p

    sc, sp = split(_read_event_stream(spark, event_stream_dir))
    joined = interval_join(
        sc, sp, tolerance="1 hour", watermark="2 hours", how="left_outer"
    )
    _run_to_memory(joined, "t_sjoin_lo", "append")
    got = spark.table("t_sjoin_lo")

    batch = spark.read.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    ).json(event_stream_dir)
    bc, bp = split(batch)
    exp = interval_join(bc, bp, tolerance="1 hour", how="left_outer")

    cols = ["user_id", "l_event_id", "r_event_id"]
    matched = lambda df: df.filter(F.col("r_event_id").isNotNull())  # noqa: E731
    unmatched = lambda df: df.filter(F.col("r_event_id").isNull())  # noqa: E731
    assert _rows(matched(got), cols) == _rows(matched(exp), cols)
    got_un = set(_rows(unmatched(got), ["l_event_id"]))
    exp_un = set(_rows(unmatched(exp), ["l_event_id"]))
    assert got_un <= exp_un
    assert len(got_un) > 0  # watermark did release past-horizon unmatched rows


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    """At-least-once feed (every record delivered twice, in different
    micro-batch files) -> dedup_stream emits each key exactly once, equal
    to the batch dropDuplicates twin."""
    import json as _json

    from nasdaq_equity_airflow_ecs_pipeline_spark.streaming import dedup_stream

    d = str(tmp_path / "feed")
    os.makedirs(d)
    recs = [
        {"event_id": i, "ts": f"2024-01-01 00:{i:02d}:00", "value": float(i)}
        for i in range(20)
    ]
    # original deliveries in file A, full re-drive (duplicates) in file B
    for fname, batch in (("a.json", recs), ("b.json", recs)):
        with open(os.path.join(d, fname), "w") as f:
            f.write("\n".join(_json.dumps(r) for r in batch))

    schema = "event_id bigint, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # re-drive lands in a later micro-batch
        .json(d)
    )
    deduped = dedup_stream(stream, ["event_id"], within="1 hour", ts_col="ts")
    _run_to_memory(deduped, "t_dedup", "append")
    got = spark.table("t_dedup")

    batch_twin = dedup_stream(spark.read.schema(schema).json(d), ["event_id"])
    assert _rows(got, ["event_id", "value"]) == _rows(
        batch_twin, ["event_id", "value"]
    )
    assert got.count() == 20


def test_stream_static_dimension_join(spark, event_stream_dir, tmp_path):
    """Star-schema enrichment on a stream: the static dim side broadcasts
    into every micro-batch (the streaming form of J1/J2)."""
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "growth"), ("error", "ops")],
        ["event_type", "category"],
    )
    stream = _read_event_stream(spark, event_stream_dir)
    enriched = stream.join(F.broadcast(dim), "event_type").groupBy("category").count()
    _run_to_memory(enriched, "t_enriched", "complete")
    got = {r["category"]: r["count"] for r in spark.table("t_enriched").collect()}

    batch = spark.read.schema(stream.schema).json(event_stream_dir)
    exp = {
        r["category"]: r["count"]
        for r in batch.join(dim, "event_type").groupBy("category").count().collect()
    }
    assert got == exp


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches AND
    across separate runs sharing a checkpoint (exactly-once restart)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.streaming.stateful import running_totals

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    captured: list[tuple] = []

    def run_once() -> None:
        stream = _read_event_stream(spark, src)
        out = running_totals(stream)
        q = (
            out.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, _id: captured.extend(
                    (r["user_id"], r["n_events"], r["sum_value"]) for r in df.collect()
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with open(os.path.join(src, "b1.json"), "w") as f:
        f.write(
            '{"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "a", "value": 1.5}\n'
            '{"event_id": 2, "ts": "2024-01-01 10:01:00", "user_id": 7, "event_type": "a", "value": 2.0}\n'
            '{"event_id": 3, "ts": "2024-01-01 10:02:00", "user_id": 8, "event_type": "a", "value": 4.0}\n'
        )
    run_once()
    assert (7, 2, 3.5) in captured and (8, 1, 4.0) in captured

    # second run, same checkpoint: totals continue, not restart
    with open(os.path.join(src, "b2.json"), "w") as f:
        f.write(
            '{"event_id": 4, "ts": "2024-01-01 11:00:00", "user_id": 7, "event_type": "a", "value": 10.0}\n'
        )
    captured.clear()
    run_once()
    assert captured == [(7, 3, 13.5)]  # state survived the restart


def test_stateful_v2_transform_with_state(spark, tmp_path):
    """Spark-4 transformWithStateInPandas processor: same cross-batch +
    cross-restart totals contract as the classic API. Skips where the
    protobuf package the TWS driver worker needs is absent (the
    environment gate documented in streaming/stateful_v2.py)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.streaming.stateful_v2 import (
        TWS_AVAILABLE,
        running_totals_v2,
    )

    if not TWS_AVAILABLE:
        with pytest.raises(ImportError):
            running_totals_v2(_read_event_stream(spark, str(tmp_path)))
        pytest.skip("google.protobuf absent: transformWithState cannot run here")

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    captured: list[tuple] = []

    def run_once() -> None:
        stream = _read_event_stream(spark, src)
        out = running_totals_v2(stream)
        q = (
            out.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, _id: captured.extend(
                    (r["user_id"], r["n_events"], r["sum_value"]) for r in df.collect()
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with open(os.path.join(src, "b1.json"), "w") as f:
        f.write(
            '{"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "a", "value": 1.5}\n'
            '{"event_id": 2, "ts": "2024-01-01 10:01:00", "user_id": 7, "event_type": "a", "value": 2.0}\n'
            '{"event_id": 3, "ts": "2024-01-01 10:02:00", "user_id": 8, "event_type": "a", "value": 4.0}\n'
        )
    run_once()
    assert (7, 2, 3.5) in captured and (8, 1, 4.0) in captured

    with open(os.path.join(src, "b2.json"), "w") as f:
        f.write(
            '{"event_id": 4, "ts": "2024-01-01 11:00:00", "user_id": 7, "event_type": "a", "value": 10.0}\n'
        )
    captured.clear()
    run_once()
    assert captured == [(7, 3, 13.5)]


def test_streaming_merge_sink(spark, tmp_path):
    """foreachBatch MERGE: latest-wins within a batch, upsert across
    batches, idempotent when a new run re-reads nothing."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.streaming.merge_sink import (
        run_merge_stream,
    )

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run_once() -> None:
        stream = _read_event_stream(spark, src).withColumn(
            "event_date", F.to_date("ts")
        )
        q = run_merge_stream(
            stream, tbl,
            keys=["user_id", "event_date"], partition_by=["event_date"],
            order_by=[F.desc("ts"), F.desc("event_id")],
            checkpoint=ckpt,
        )
        q.awaitTermination()

    with open(os.path.join(src, "b1.json"), "w") as f:
        f.write(
            '{"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 7, "event_type": "a", "value": 1.0}\n'
            '{"event_id": 2, "ts": "2024-01-01 11:00:00", "user_id": 7, "event_type": "a", "value": 2.0}\n'
            '{"event_id": 3, "ts": "2024-01-01 10:30:00", "user_id": 8, "event_type": "a", "value": 3.0}\n'
        )
    run_once()
    got = {(r.user_id, str(r.event_date)): r.event_id for r in spark.read.parquet(tbl).collect()}
    # latest-wins within the batch: user 7 keeps event 2
    assert got == {(7, "2024-01-01"): 2, (8, "2024-01-01"): 3}

    # batch 2: newer row for user 7 same day + a new day
    with open(os.path.join(src, "b2.json"), "w") as f:
        f.write(
            '{"event_id": 4, "ts": "2024-01-01 12:00:00", "user_id": 7, "event_type": "a", "value": 9.0}\n'
            '{"event_id": 5, "ts": "2024-01-02 09:00:00", "user_id": 7, "event_type": "a", "value": 5.0}\n'
        )
    run_once()
    got = {(r.user_id, str(r.event_date)): r.event_id for r in spark.read.parquet(tbl).collect()}
    assert got == {
        (7, "2024-01-01"): 4, (8, "2024-01-01"): 3, (7, "2024-01-02"): 5,
    }

    # re-run with no new files: checkpoint says nothing to do; table stable
    run_once()
    assert spark.read.parquet(tbl).count() == 3


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode + watermark: an event older than (max ts - delay) after
    the watermark advanced is excluded from its (already-final) window."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def land(name: str, rows: list[str]) -> None:
        with open(os.path.join(src, name), "w") as f:
            f.write("\n".join(rows) + "\n")

    # batch 1: two events at 10:00 and a watermark-advancer at 14:00
    land("b1.json", [
        '{"event_id": 1, "ts": "2024-01-01 10:00:01", "user_id": 1, "event_type": "a", "value": 1.0}',
        '{"event_id": 2, "ts": "2024-01-01 10:00:02", "user_id": 1, "event_type": "a", "value": 1.0}',
        '{"event_id": 3, "ts": "2024-01-01 14:00:00", "user_id": 1, "event_type": "a", "value": 1.0}',
    ])
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_pass() -> None:
        stream = _read_event_stream(spark, src)
        agg = tumbling_counts(stream, duration="1 hour", watermark="1 hour")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_pass()

    # batch 2: a late event into the finalized 10:00 window — dropped
    land("b2.json", [
        '{"event_id": 4, "ts": "2024-01-01 10:00:03", "user_id": 1, "event_type": "a", "value": 1.0}',
        '{"event_id": 5, "ts": "2024-01-01 16:00:00", "user_id": 1, "event_type": "a", "value": 1.0}',
    ])
    run_pass()

    emitted = {
        (str(r["window_start"]), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window finalized with 2 events; the late 10:00:03 never counted
    assert ("2024-01-01 10:00:00", 2) in emitted
    assert not any(n == 3 for _, n in emitted)


def test_streaming_curation_filter_parity(spark, tmp_path):
    """The curation-stage column expressions (classifier quality score,
    token count, lang-id) are stateless, so the SAME transformation body
    runs unchanged as a streaming stage — a streamed documents feed
    filtered by classifier score must equal the batch run row-for-row
    (the streaming/__init__.py parity contract extended to the
    training-data pipeline surface)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
        classifier_quality_score,
        token_count,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    feed = str(tmp_path / "docs_json")
    docs.coalesce(2).write.mode("overwrite").json(feed)

    def curate(df):
        score = classifier_quality_score("text")
        return df.select(
            "doc_id",
            score.alias("score"),
            token_count("text").alias("n_tokens"),
        ).filter(F.col("score") >= 0.0)

    stream = spark.readStream.schema("doc_id bigint, text string").json(feed)
    q = (
        curate(stream)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)  # availableNow batch must finish
    got = _rows(spark.table("curated_stream"), ["doc_id", "score", "n_tokens"])
    exp = _rows(curate(docs), ["doc_id", "score", "n_tokens"])
    assert got == exp and len(got) > 0


def test_streaming_bm25_index_maintenance(spark, tmp_path):
    """The index-is-a-table discipline under streaming ingest: each
    micro-batch of new documents folds into standing BM25 index frames
    via bm25_index_delta inside foreachBatch (delta-sized tokenize,
    append-only tf parquet, stats re-folded), and after draining the
    backlog the maintained index scores IDENTICALLY to a full batch
    rebuild over everything ingested."""
    import json

    from pyspark.sql import functions as F

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
        bm25_index,
        bm25_score_terms,
        tokens,
    )

    src = str(tmp_path / "docs_src")
    tf_tbl = str(tmp_path / "tf")
    os.makedirs(src)
    batches = [
        [(0, "spark join window"), (1, "join merge hash join")],
        [(2, "spark spark scan"), (3, "window sort window")],
    ]
    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
        bm25_index_delta,
    )

    state: dict = {}

    def fold(batch_df, batch_id):
        if "tf" not in state:
            tf, st = bm25_index(batch_df)
        else:
            tf, st = bm25_index_delta(state["tf"], state["stats"], batch_df)
        state["tf"] = tf.localCheckpoint(eager=True)
        state["stats"] = st.localCheckpoint(eager=True)
        state["tf"].write.mode("overwrite").parquet(tf_tbl)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # maintained index frames: the bm25_index_delta-folded state (the
    # persisted tf table mirrors it)
    tf2 = state["tf"]
    stats2 = state["stats"]
    assert spark.read.parquet(tf_tbl).count() == tf2.count()
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id bigint, text string"
    )
    qs = spark.createDataFrame(
        [(1, "spark join"), (2, "window")], "query_id int, query_text string"
    )
    qt = qs.select(
        "query_id", F.explode(tokens("query_text")).alias("term")
    ).distinct()
    tf_full, stats_full = bm25_index(all_docs)
    got = sorted(
        tuple(r) for r in bm25_score_terms(tf2, stats2, qt).collect()
    )
    expect = sorted(
        tuple(r) for r in bm25_score_terms(tf_full, stats_full, qt).collect()
    )
    assert got == expect and len(got) > 0


def test_streaming_hamming_index_fold(spark, tmp_path):
    """The incremental-index family IS the streaming maintenance body:
    a file stream of arriving perceptual hashes folds into a standing
    parquet hash table via hamming_index_delta inside foreachBatch
    (AvailableNow + checkpoint = exactly-once batches), and the
    accumulated pair log equals the batch-mode full rebuild's pairs —
    each pair reported exactly once, when its younger member arrives."""
    import json
    import os

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.multimodal import (
        hamming_index_delta,
        image_neardup_pairs,
    )

    src = os.path.join(str(tmp_path), "src")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    standing_path = os.path.join(str(tmp_path), "standing")
    os.makedirs(src)
    base = 0x5A5A5A5A5A5A5A5A
    batches = [
        [(1, base), (2, base ^ 0b11)],            # near pair inside batch 1
        [(3, base ^ 0b100), (4, -77)],            # 3 near 1 and 2; 4 far
        [(5, (base ^ 0b100) ^ 0b1000)],           # 5 near 3 (and 1 at h=2)
    ]
    pair_log: list[tuple] = []

    def fold(batch_df, _bid):
        if not os.path.exists(standing_path):
            standing = batch_df.sparkSession.createDataFrame(
                [], "content_id bigint, ahash bigint"
            )
        else:
            standing = batch_df.sparkSession.read.parquet(standing_path)
        folded, pairs = hamming_index_delta(
            standing, batch_df, max_hamming=3, n_bands=4
        )
        pair_log.extend(
            (r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()
        )
        folded.write.mode("overwrite").parquet(standing_path + ".next")
        # atomic-enough swap for the test (real sinks use the versioned
        # catalog's CAS commit)
        import shutil

        if os.path.exists(standing_path):
            shutil.rmtree(standing_path)
        os.rename(standing_path + ".next", standing_path)

    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for cid, h in rows:
                f.write(json.dumps({"content_id": cid, "ahash": h}) + "\n")
        q = (
            spark.readStream.schema("content_id bigint, ahash bigint")
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    all_hashes = spark.createDataFrame(
        [r for b in batches for r in b], "content_id bigint, ahash bigint"
    )
    want = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_neardup_pairs(
            all_hashes, max_hamming=3, n_bands=4
        ).collect()
    )
    assert sorted(pair_log) == want and want
    # standing table accumulated every arrival
    assert spark.read.parquet(standing_path).count() == 5
