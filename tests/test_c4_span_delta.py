"""Incremental C4 span dedup (operators/c4.py c4_span_index /
c4_span_dedup_delta): the fold equals the full rebuild restricted to
delta ids under a monotone id split, and — unlike decontamination —
the span-key index GROWS: a span shared between two corpus batches IS
cut in the later batch (dedup is corpus-relative). The streaming test
folds batches through foreachBatch with the index round-tripping
through parquet between triggers."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.c4 import (
    c4_span_dedup,
    c4_span_dedup_delta,
    c4_span_index,
)

BOILER = "alpha one two. beta three four. gamma five six."
SCHEMA = "doc_id bigint, text string"
# standing: doc 1 holds the boilerplate (first occurrence, survives);
# delta: doc 10 repeats it (cut via the STANDING index), docs 11+12
# share a NEW 3-sentence block only within the delta (intra-batch
# keep-first), doc 13 is untouched
STANDING = [
    (1, "unique opener sentence here. " + BOILER),
    (2, "another standing page text. with more sentences. and one closer."),
]
DELTA_BLOCK = "delta only block one. delta only block two. delta only block three."
DELTA = [
    (10, "fresh delta opener here. " + BOILER),
    (11, DELTA_BLOCK),
    (12, "twelve has an opener. " + DELTA_BLOCK),
    (13, "untouched delta page text. with two sentences. and a third one."),
]


def test_fold_equals_full_rebuild_restricted(spark):
    standing = spark.createDataFrame(STANDING, SCHEMA)
    delta = spark.createDataFrame(DELTA, SCHEMA)
    idx = c4_span_index(standing)
    _folded, res = c4_span_dedup_delta(idx, delta)
    got = sorted(
        (r["doc_id"], r["text"], r["n_removed"]) for r in res.collect()
    )
    union = standing.unionByName(delta)
    want = sorted(
        (r["doc_id"], r["text"], r["n_removed"])
        for r in c4_span_dedup(union).filter(F.col("doc_id") >= 10).collect()
    )
    assert got == want
    d = {i: (t, n) for i, t, n in got}
    # standing-dup block cut, the delta doc's own opener kept
    assert d[10] == ("fresh delta opener here.", 3)
    # intra-delta keep-first: 11 (min id) keeps, 12 loses the block
    assert d[11] == (DELTA_BLOCK, 0)
    assert d[12] == ("twelve has an opener.", 3)
    assert d[13][1] == 0


def test_folded_index_covers_union(spark):
    standing = spark.createDataFrame(STANDING, SCHEMA)
    delta = spark.createDataFrame(DELTA, SCHEMA)
    folded, _res = c4_span_dedup_delta(c4_span_index(standing), delta)
    want = c4_span_index(standing.unionByName(delta))
    assert sorted(r["gkey"] for r in folded.collect()) == sorted(
        r["gkey"] for r in want.collect()
    )


def test_streaming_span_dedup_fold(spark, tmp_path):
    """foreachBatch maintenance of the GROWING span index: each batch
    dedups against the index-so-far, then publishes the folded index
    for the next trigger. Accumulated output == sequential batch folds
    == full rebuild restricted per batch (monotone batch ids)."""
    idx_dir = str(tmp_path / "span_index")
    # seed: an empty index (batch 0 sees no standing spans)
    spark.createDataFrame([], "gkey string").write.parquet(idx_dir)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    out: list[tuple] = []

    def fold(batch_df, _bid):
        if batch_df.isEmpty():
            return
        ss = batch_df.sparkSession
        idx = ss.read.parquet(idx_dir)
        folded, res = c4_span_dedup_delta(idx, batch_df)
        out.extend(
            (r["doc_id"], r["text"], r["n_removed"]) for r in res.collect()
        )
        # publish the folded index for the next trigger (collect is
        # test-sized; production writes a new snapshot directory)
        rows = [(r["gkey"],) for r in folded.collect()]
        ss.createDataFrame(rows, "gkey string").write.mode(
            "overwrite"
        ).parquet(idx_dir)

    for i, rows in enumerate([STANDING, DELTA]):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for did, text in rows:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        q = (
            spark.readStream.schema(SCHEMA)
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = {i: (t, n) for i, t, n in out}
    # batch 1 against the empty index == plain span dedup of batch 1
    standing = spark.createDataFrame(STANDING, SCHEMA)
    for r in c4_span_dedup(standing).collect():
        assert got[r["doc_id"]] == (r["text"], r["n_removed"])
    # batch 2 saw batch 1's spans: the cross-batch block IS cut
    # (dedup is corpus-relative — the index grows, unlike decon)
    assert got[10] == ("fresh delta opener here.", 3)
    assert got[12] == ("twelve has an opener.", 3)
    assert got[11] == (DELTA_BLOCK, 0)
