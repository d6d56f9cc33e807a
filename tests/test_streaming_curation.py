"""The composed curation fold IS the streaming maintenance body
(plans/corpus.py curate_corpus_fold — the r9 foreachBatch discipline
applied to the whole chain): a file stream of arriving document batches
folds into the standing curated-corpus index inside foreachBatch
(AvailableNow + checkpoint = exactly-once), artifacts round-trip
through parquet between batches, and the accumulated admission log
equals folding the same batches sequentially in batch mode. Also pins
the statefulness the fold exists for: a boilerplate line crosses the
df cap only once enough copies have ARRIVED, and later batches see the
budget already consumed by earlier admissions."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.plans.corpus import (
    curate_corpus_fold,
    curate_corpus_index,
)

BOILER = "copyright footer line"
LM_MAX = 2000  # permissive gate: the LM stage is exercised, not starved
BUDGET = 400

# standing corpus: multi-line docs, one line of future boilerplate
# planted once (df=1 standing, cap=2 -> a second arrival is still kept,
# the third is removed)
# "spark fast table row one" etc. are verified POSITIVE under the
# placeholder classifier's hashed weights (the rule the delta chain
# gates on) — arbitrary words get random-sign weights and would starve
# the funnel before the stages under test
STANDING = [
    (i, f"spark fast table row one doc{i} scan window\n{BOILER}" if i == 0
     else f"spark fast table row one doc{i} scan window\nunique tail {i}",
     "en", "s")
    for i in range(10)
]
# delta batches: ids 100.. — b1 re-plants the boiler line (df -> 2,
# kept), b2 plants it again (df -> 3, removed); b2 also carries a
# near-duplicate embedding of a standing vector (semdedup drop) and
# enough tokens to strain the budget
BATCH1 = [
    (101, f"spark fast table fresh one oh one\n{BOILER}", "en", "d"),
    (102, "spark fast table fresh one oh two\ngood apple 102", "en", "d"),
]
BATCH2 = [
    (201, f"spark fast table fresh two oh one\n{BOILER}", "en", "d"),
    (202, "spark fast table fresh two oh two\ngood apple 202", "en", "d"),
]
DOC_SCHEMA = "doc_id bigint, text string, lang string, source string"
EMB_SCHEMA = "vec_id bigint, embedding array<float>"


def _unit(d, dim=16):
    return [1.0 if j == d else 0.0 for j in range(dim)]


def _embs():
    # orthogonal one-hots: cosine 0 between distinct docs, so semdedup
    # drops NOTHING except the planted exact copy (201 == standing 3)
    rows = [(i, _unit(i)) for i, *_ in STANDING]
    rows += [(101, _unit(10)), (102, _unit(11))]
    rows += [(201, _unit(3)), (202, _unit(13))]
    return rows


def _write_index(index, path):
    index["line_freq"].write.mode("overwrite").parquet(path + "/lf")
    index["assigned"].write.mode("overwrite").parquet(path + "/as")
    index["sized"].write.mode("overwrite").parquet(path + "/sz")


def _read_index(spark, path, static):
    return {
        "line_freq": spark.read.parquet(path + "/lf"),
        "assigned": spark.read.parquet(path + "/as"),
        "sized": spark.read.parquet(path + "/sz"),
        "model": static["model"],
        "centroids": static["centroids"],
    }


def test_streaming_curation_fold(spark, tmp_path):
    docs_s = spark.createDataFrame(STANDING, DOC_SCHEMA)
    emb = spark.createDataFrame(_embs(), EMB_SCHEMA)
    index0 = curate_corpus_index(
        docs_s, emb, lm_max_avg_bits_x100=LM_MAX, neardup_threshold=0.9,
        cluster_target=250, max_line_docs=2,
    )
    # static published artifacts; folding state round-trips via parquet
    static = {
        "model": index0["model"],
        "centroids": index0["centroids"].localCheckpoint(eager=True),
    }
    state = str(tmp_path / "state")
    _write_index(index0, state)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    admitted_log: list[tuple] = []

    def fold(batch_df, _bid):
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        idx = _read_index(s, state, static)
        new_index, admitted = curate_corpus_fold(
            idx, batch_df, emb, lm_max_avg_bits_x100=LM_MAX,
            budget=BUDGET, neardup_threshold=0.9, max_line_docs=2,
        )
        admitted_log.extend(
            (r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in admitted.collect()
        )
        _write_index(new_index, state + ".next")
        import shutil

        shutil.rmtree(state)
        os.rename(state + ".next", state)

    for i, rows in enumerate([BATCH1, BATCH2]):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for did, text, lang, source in rows:
                f.write(json.dumps(
                    {"doc_id": did, "text": text, "lang": lang,
                     "source": source}) + "\n")
        q = (
            spark.readStream.schema(DOC_SCHEMA)
            .json(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch-mode reference: the same two folds, no streaming machinery
    want: list[tuple] = []
    idx = index0
    for rows in [BATCH1, BATCH2]:
        b = spark.createDataFrame(rows, DOC_SCHEMA)
        idx, admitted = curate_corpus_fold(
            idx, b, emb, lm_max_avg_bits_x100=LM_MAX,
            budget=BUDGET, neardup_threshold=0.9, max_line_docs=2,
        )
        # pin the folded state so fold N+1's plan doesn't recompute it
        idx = {k: (v.localCheckpoint(eager=True)
                   if k in ("line_freq", "assigned", "sized") else v)
               for k, v in idx.items()}
        want.extend(
            (r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in admitted.collect()
        )
    assert sorted(admitted_log) == sorted(want) and want

    # statefulness, not just equality:
    got_ids = {d for d, *_ in admitted_log}
    # b1's boiler re-plant (df 1->2, at the cap) keeps doc 101's line...
    assert 101 in got_ids
    # ...b2's third copy crosses the cap: 201 loses the line but keeps
    # its other line (still a doc), while its near-dup embedding of
    # standing vec 3 drops it at semdedup -> never admitted
    assert 201 not in got_ids
    lf = spark.read.parquet(state + "/lf")
    boiler_df = lf.filter(
        F.col("line_key") == F.md5(F.lit(BOILER))
    ).collect()[0]["n_docs_with_line"]
    assert boiler_df == 3  # the folded index saw every arrival
    # the sized table accumulated the surviving delta docs
    sized_ids = {r["doc_id"] for r in
                 spark.read.parquet(state + "/sz").collect()}
    assert 102 in sized_ids and 202 in sized_ids
