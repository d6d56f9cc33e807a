#!/usr/bin/env python3
"""BPE training at realistic merge counts (operators/text.py:bpe_train
vs bpe_train_batched).

bpe_train is sound per round (pair-count hash-agg + 1-row collect), but
a production tokenizer runs 32k merges = 32k sequential Spark rounds:
past the first few, the cost is DRIVER ROUND LATENCY (job scheduling +
localCheckpoint), not data. bpe_train_batched folds the maximal
provably-safe rank-prefix per round (exact — same merge table, pinned
by test + oracle), collapsing rounds by the observed batch factor.

Two corpora are measured:
- the sf0.1 documents fixture (the contract corpus — its synthetic
  vocabulary EXHAUSTS at ~89 merges, so it cannot exercise realistic
  depth; reported for honesty);
- a deep synthetic vocabulary (md5-hex words: 16 symbols, 32 chars —
  merge chains run to any requested depth) for the realistic-depth
  numbers.

A warm-up round runs first and the sequential trainer runs BEFORE the
batched one, so JVM warm-up cannot flatter the batched numbers.

Usage:
    python3 tools/bpe_scale_probe.py [n_merges] [deep_vocab_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.1"


def measure(text_ops, docs, n: int) -> dict:
    t0 = time.time()
    seq = text_ops.bpe_train(docs, n_merges=n).collect()
    seq_wall = round(time.time() - t0, 1)
    rounds: list[int] = []
    t0 = time.time()
    bat = text_ops.bpe_train_batched(docs, n_merges=n, rounds_out=rounds).collect()
    bat_wall = round(time.time() - t0, 1)
    t0 = time.time()
    loc = text_ops.bpe_train_local(docs, n_merges=n).collect()
    loc_wall = round(time.time() - t0, 1)
    merges = len(seq)
    return {
        "n_requested": n,
        "n_merges": merges,
        "equal": [tuple(r) for r in seq] == [tuple(r) for r in bat],
        "local_equal": [tuple(r) for r in seq] == [tuple(r) for r in loc],
        "seq_wall_s": seq_wall,
        "seq_rounds": merges,
        "bat_wall_s": bat_wall,
        "bat_rounds": len(rounds),
        "loc_wall_s": loc_wall,
        "batch_factor": round(merges / max(len(rounds), 1), 2),
        "speedup": round(seq_wall / max(bat_wall, 1e-9), 2),
        "loc_speedup": round(seq_wall / max(loc_wall, 1e-9), 2),
        "seq_s_per_merge": round(seq_wall / max(merges, 1), 3),
        "seq_32k_extrapolation_min": round(
            seq_wall / max(merges, 1) * 32000 / 60, 1
        ),
        "bat_32k_extrapolation_min": round(
            bat_wall / max(merges, 1) * 32000 / 60, 1
        ),
    }


def measure_local_32k(text_ops, docs) -> dict:
    """The depth bound bpe_train_local exists to close: a REAL 32k-merge
    run (no extrapolation) — one corpus pass + capped vocab collect +
    32k pure-Python incremental rounds."""
    t0 = time.time()
    out = text_ops.bpe_train_local(docs, n_merges=32_000).collect()
    wall = round(time.time() - t0, 1)
    return {"n_requested": 32_000, "n_merges": len(out), "loc_wall_s": wall}


def main() -> None:
    from pyspark.sql import functions as F

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators import text as text_ops
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    deep_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("bpe_scale_probe", cpus=32)

    fixture = spark.read.parquet(f"{SF}/documents.parquet")
    deep = spark.range(deep_rows).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("text")
    )
    # warm-up: JIT + shuffle machinery, untimed
    text_ops.bpe_train_batched(fixture, n_merges=3).collect()

    report = {
        "fixture_sf0.1": measure(text_ops, fixture, n),
        f"deep_md5_{deep_rows}w": measure(text_ops, deep, n),
        f"local_32k_md5_{deep_rows}w": measure_local_32k(text_ops, deep),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
