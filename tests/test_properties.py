"""Property-based tests (hypothesis): algebraic laws the engine's
operators must satisfy on arbitrary inputs, not just fixtures."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.dedup import latest_wins
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.upsert import merge_upsert

from pyspark.sql import functions as F

_spark = None


def _get_spark():
    # hypothesis drives many examples through one function call; reuse the
    # session fixture's singleton rather than re-entering pytest fixtures
    global _spark
    if _spark is None:
        from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

        _spark = get_spark("props", cpus=8)
    return _spark


batches = st.lists(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),  # (key, value)
        min_size=1, max_size=6,
    ),
    min_size=1, max_size=4,
)


@settings(max_examples=15, deadline=None)
@given(batches)
def test_merge_upsert_is_last_writer_wins(seq):
    """Folding merge_upsert over batches == a dict folded the same way
    (each batch internally deduped latest-wins by value then key order —
    the engine's W1 discipline)."""
    spark = _get_spark()
    expected: dict[int, int] = {}
    table = None
    for batch in seq:
        df = spark.createDataFrame(batch, ["k", "v"])
        df = latest_wins(df, ["k"], [F.desc("v"), F.desc("k")])
        best: dict[int, int] = {}
        for k, v in batch:
            if k not in best or v > best[k]:
                best[k] = v
        expected.update(best)
        table = merge_upsert(table, df, ["k"])
    got = {r.k: r.v for r in table.collect()}
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=30),
    st.integers(1, 100),
)
def test_sessionize_counts_gaps(offsets, gap_s):
    """Number of sessions == 1 + number of inter-event gaps > gap."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.sessionize import sessionize

    spark = _get_spark()
    ts = sorted(set(offsets))
    rows = [(i, 1, float(t)) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "off"]).select(
        "event_id", "user_id",
        F.timestamp_seconds(F.col("off")).alias("ts"),
    )
    out = sessionize(df, gap_seconds=gap_s)
    n_sessions = out.agg(F.max("session_seq")).first()[0]
    expected = 1 + sum(1 for a, b in zip(ts, ts[1:]) if b - a > gap_s)
    assert n_sessions == expected
