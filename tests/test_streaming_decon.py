"""Streaming decontamination maintenance: the frozen benchmark gram
index (operators/text.py benchmark_gram_index) round-trips through
parquet once, and arriving corpus batches fold through
decontaminate_apply_indexed inside foreachBatch (AvailableNow +
checkpoint = exactly-once). Because corpus docs are independent given
the index, the accumulated stream output equals the one-shot batch
apply over the union — and, unlike dedup, a run shared between two
CORPUS batches is NOT cut (decontamination is benchmark-relative
only; the index never grows)."""

from __future__ import annotations

import json
import os

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
    benchmark_gram_index,
    decontaminate_apply,
    decontaminate_apply_indexed,
)

BENCH = [(1, "secret eval answer key alpha beta")]
# b1: doc 100 embeds a 5-token benchmark run mid-doc; doc 101 is clean
# but shares a 5-token run with doc 200 of batch 2 (corpus-corpus
# overlap — must SURVIVE decontamination)
BATCH1 = [
    (100, "x1 secret eval answer key alpha y1 y2"),
    (101, "shared corpus run of tokens here p1"),
]
BATCH2 = [
    (200, "shared corpus run of tokens here p2"),
    (201, "totally clean document q1 q2 q3"),
]
SCHEMA = "doc_id bigint, text string"


def test_streaming_decon_fold(spark, tmp_path):
    bench = spark.createDataFrame(BENCH, SCHEMA)
    idx_path = str(tmp_path / "gram_index")
    benchmark_gram_index(bench, min_len=5).write.parquet(idx_path)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    out: list[tuple] = []

    def fold(batch_df, _bid):
        if batch_df.isEmpty():
            return
        idx = batch_df.sparkSession.read.parquet(idx_path)
        out.extend(
            (r["doc_id"], r["kept_text"], r["n_removed"])
            for r in decontaminate_apply_indexed(
                batch_df, idx, min_len=5
            ).collect()
        )

    for i, rows in enumerate([BATCH1, BATCH2]):
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

    # stream fold == one-shot batch apply over the union
    union = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = sorted(
        (r["doc_id"], r["kept_text"], r["n_removed"])
        for r in decontaminate_apply(union, bench, min_len=5).collect()
    )
    assert sorted(out) == want

    got = {d: (t, n) for d, t, n in out}
    # the planted benchmark run is cut with tails intact
    assert got[100] == ("x1 y1 y2", 5)
    # corpus-corpus overlap survives: the index is benchmark-only
    assert got[101][1] == 0 and got[200][1] == 0
    assert got[201] == ("totally clean document q1 q2 q3", 0)
