"""Incremental twins: match_matrix_delta / bradley_terry_fit and
unimax_allocation_delta — fold == full rebuild exactly (both
artifacts are monoids), new keys may arrive only in the delta, and a
foreachBatch stream maintains the growing matrix across triggers."""

from __future__ import annotations

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
    unimax_allocation,
    unimax_allocation_delta,
)
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.preference import (
    bradley_terry,
    bradley_terry_fit,
    match_matrix,
    match_matrix_delta,
)

MATCHES = (
    [("a", "b")] * 3 + [("b", "a")] + [("b", "c")] * 2 + [("c", "a")]
    + [("a", "c")] * 2 + [("d", "a")]  # d appears ONLY in the delta slice
)
STANDING, DELTA = MATCHES[:6], MATCHES[6:]


def _df(spark, rows):
    return spark.createDataFrame(rows, "winner string, loser string")


def test_fold_equals_rebuild_with_new_player_in_delta(spark):
    standing = match_matrix(_df(spark, STANDING))
    folded = match_matrix_delta(standing, _df(spark, DELTA))
    got = sorted(tuple(r) for r in bradley_terry_fit(folded).collect())
    want = sorted(tuple(r) for r in bradley_terry(_df(spark, MATCHES)).collect())
    assert got == want
    assert any(r[0] == "d" for r in got)  # the delta-only player ranks


def test_matrix_fold_is_the_monoid_sum(spark):
    standing = match_matrix(_df(spark, STANDING))
    folded = {
        (r["i"], r["j"]): (r["n"], r["wi"])
        for r in match_matrix_delta(standing, _df(spark, DELTA)).collect()
    }
    full = {
        (r["i"], r["j"]): (r["n"], r["wi"])
        for r in match_matrix(_df(spark, MATCHES)).collect()
    }
    assert folded == full


def test_unimax_fold_equals_rebuild_with_new_group(spark):
    rows = [
        (1, "en", "w " * 40), (2, "en", "w " * 30), (3, "fr", "w " * 20),
        (4, "fr", "w " * 9), (5, "de", "w " * 7),  # de only in the delta
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    standing = unimax_allocation(d.filter("doc_id <= 3"), "lang").select(
        "grp", "n_tokens"
    )
    got = sorted(
        tuple(r)
        for r in unimax_allocation_delta(
            standing, d.filter("doc_id > 3"), "lang"
        ).collect()
    )
    want = sorted(tuple(r) for r in unimax_allocation(d, "lang").collect())
    assert got == want
    assert any(r[0] == "de" for r in got)


def test_streaming_matrix_fold_across_triggers(spark, tmp_path):
    """foreachBatch maintains the GROWING pair matrix: two triggers of
    match rows fold into the published artifact, and the refit after
    the last trigger equals the batch fit over everything seen."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    state = {"mat": None}

    def fold(batch_df, _bid):
        m = (
            match_matrix(batch_df)
            if state["mat"] is None
            else match_matrix_delta(state["mat"], batch_df)
        )
        state["mat"] = m.localCheckpoint(eager=True)

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for w, l in rows:
                f.write(json.dumps({"winner": w, "loser": l}) + "\n")

    write_batch("b0.json", STANDING)
    stream = (
        spark.readStream.schema("winner string, loser string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    ckpt = str(tmp_path / "ckpt")  # so the second run folds ONLY b1
    q = stream.writeStream.option("checkpointLocation", ckpt).foreachBatch(
        fold
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    write_batch("b1.json", DELTA)
    q = stream.writeStream.option("checkpointLocation", ckpt).foreachBatch(
        fold
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in bradley_terry_fit(state["mat"]).collect()
    )
    want = sorted(
        tuple(r) for r in bradley_terry(_df(spark, MATCHES)).collect()
    )
    assert got == want
