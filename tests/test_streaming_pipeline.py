"""End-to-end streaming DAG (streaming/pipeline.py): quotefeed stream ->
dedup -> per-day star landing -> GX gate under one AvailableNow trigger.
Must (a) equal the batch run_pipeline output day-for-day and (b) be a
no-op on restart (checkpointed offsets)."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.plans.pipeline import run_pipeline
from nasdaq_equity_airflow_ecs_pipeline_spark.streaming.pipeline import (
    run_streaming_pipeline,
)

DAYS = ["2024-03-04", "2024-03-05", "2024-03-06"]


def _table_state(spark, path, drop=("created_at", "updated_at")):
    df = spark.read.parquet(path)
    cols = sorted(c for c in df.columns if c not in drop)
    return sorted(map(tuple, df.select(*cols).collect()))


def test_streaming_pipeline_equals_batch_and_restarts_idempotently(
    spark, tmp_path
):
    stream_wh = str(tmp_path / "stream_wh")
    batch_wh = str(tmp_path / "batch_wh")

    # default symbol set on BOTH paths — same deterministic feed
    s_paths = run_streaming_pipeline(spark, stream_wh, DAYS[0], DAYS[-1])

    # batch twin: one run_pipeline per trading day over the same feed
    for day in DAYS:
        b_paths = run_pipeline(spark, batch_wh, day, raw_root="quotefeed")

    # streaming == batch, table for table (timestamps excluded: each run
    # stamps its own created_at)
    for t, sp in s_paths.items():
        got = _table_state(spark, sp)
        want = _table_state(spark, b_paths[t])
        assert got == want, f"{t}: streaming output != batch output"

    # restart: offsets are checkpointed, second drain lands nothing new
    before = {t: _table_state(spark, p) for t, p in s_paths.items()}
    run_streaming_pipeline(spark, stream_wh, DAYS[0], DAYS[-1])
    after = {t: _table_state(spark, p) for t, p in s_paths.items()}
    assert after == before, "restarted stream re-landed data"


def test_mv_refresh_snapshots_and_batch_equality(spark, tmp_path):
    """N incremental refreshes == one-shot batch rebuild, and each
    refresh is its own snapshot (time travel shows the MV as of any
    refresh)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.incremental import (
        finalize_rollup,
        merge_partials,
    )
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.streaming_ops import (
        MV_DAYS,
        MV_SEED,
        mv_day_partial,
        mv_refresh_build,
    )

    mv = mv_refresh_build(spark, str(tmp_path / "mv"))
    # one snapshot for the seed + one per delta refresh
    assert len(mv.versions()) == 1 + len(MV_DAYS) - MV_SEED

    batch = finalize_rollup(
        merge_partials(*[mv_day_partial(spark, d) for d in MV_DAYS])
    )
    cols = sorted(batch.columns)
    assert sorted(
        map(tuple, finalize_rollup(mv.read()).select(*cols).collect())
    ) == sorted(map(tuple, batch.select(*cols).collect()))

    # time travel: the seed snapshot covers exactly the seed days
    seed_batch = finalize_rollup(
        merge_partials(*[mv_day_partial(spark, d) for d in MV_DAYS[:MV_SEED]])
    )
    assert sorted(
        map(tuple, finalize_rollup(mv.read(version=0)).select(*cols).collect())
    ) == sorted(map(tuple, seed_batch.select(*cols).collect()))


def test_streaming_pipeline_gx_gate_enforced(spark, tmp_path):
    """validate=True runs the reference GX suites per landed day — prove
    the gate is live by checking it passes on good data (the suites'
    failure path is covered by tests/test_quality.py)."""
    import pytest

    paths = run_streaming_pipeline(
        spark, str(tmp_path / "wh"), DAYS[0], DAYS[0],
        symbols="AAPL,MSFT,GOOGL", validate=True,
    )
    assert spark.read.parquet(paths["fact_stock_daily_price"]).count() == 3

    # the gate is LIVE: an off-universe symbol fails the values_in_set
    # whitelist check and the job surfaces it (foreachBatch errors arrive
    # wrapped in StreamingQueryException — match on the message)
    with pytest.raises(Exception, match="values_in_set"):
        run_streaming_pipeline(
            spark, str(tmp_path / "wh_bad"), DAYS[0], DAYS[0],
            symbols="AAPL,ENRON", validate=True,
        )


def test_streaming_pipeline_day_cap_bounds_driver_list(spark, tmp_path):
    """The per-batch distinct-day collect is bounded: a cap smaller than
    the batch's day count fails the run with an explicit message (the
    collect itself is limit(cap+1)-bounded, so the driver never holds
    more than cap+1 rows), and a cap equal to the feed range succeeds."""
    import pytest

    with pytest.raises(Exception, match="distinct days"):
        run_streaming_pipeline(
            spark, str(tmp_path / "wh_capped"), DAYS[0], DAYS[-1],
            symbols="AAPL", validate=False, max_days_per_batch=1,
        )
    paths = run_streaming_pipeline(
        spark, str(tmp_path / "wh_ok"), DAYS[0], DAYS[-1],
        symbols="AAPL", validate=False,
    )
    assert (
        spark.read.parquet(paths["fact_stock_daily_price"]).count()
        == len(DAYS)
    )
