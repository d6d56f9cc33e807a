#!/usr/bin/env python3
"""Skew probe for the bigram-LM scoring joins (operators/lm_score.py).

``score_docs`` reaches the model through two shuffled equi-joins; the
context join keys on ``w1`` alone, and natural language concentrates
bigram contexts on stopwords (Zipf) — the classic hot-reducer shape.
The x100 scale harness can NOT show this: its per-copy token suffixes
split every stopword into 100 cold keys. This probe builds the opposite
corpus — 100 copies of sf0.1 documents with the SAME text (only doc_id
shifted) — so "the" carries 100x its natural mass against a model/vocab
of unchanged size. 500k docs, one shared Zipf vocabulary.

Measured: wall + the max/median single-task time of the heaviest join
stage (UI REST taskSummary), with AQE skew-join splitting ON (the
shipped default) and OFF (the naive plan). The lm_score docstring's
claim is that the fan-in is bounded (1 context row per bigram row — the
join never amplifies); the residual risk is partition imbalance on the
w1 hash, which OptimizeSkewedJoin splits for SMJ plans. This probe
records whether that holds with numbers.

The trigram tier (``score_docs3``) adds a (w2)-keyed backoff-context
join — the widest fan-in of the four model joins, same stopword shape.
``order=3`` probes it with the identical corpus construction.
``order=4`` probes the Kneser-Ney tier (``score_docs_kn``), whose
(w2)-keyed continuation-context join has the same stopword profile.

Usage:
    python3 tools/lm_skew_probe.py [k_copies] [order]   # default 100 2
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1/documents.parquet"
OFFSET = 10_000_000


def _get(ui: str, path: str):
    import urllib.request

    with urllib.request.urlopen(f"{ui}{path}", timeout=30) as r:
        return json.load(r)


def _stage_task_stats(spark) -> list[dict]:
    """[{stage, max_s, med_s, tasks}] for completed stages, descending
    by max task time."""
    ui = spark.sparkContext.uiWebUrl
    app = _get(ui, "/api/v1/applications")[0]["id"]
    out = []
    for s in _get(ui, f"/api/v1/applications/{app}/stages?status=complete"):
        sid, att = s["stageId"], s["attemptId"]
        try:
            q = _get(
                ui,
                f"/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.5,1.0",
            )
        except Exception:
            continue
        med, mx = (v / 1000.0 for v in q["executorRunTime"])
        out.append(
            {
                "stage": sid,
                "max_s": round(mx, 2),
                "med_s": round(med, 2),
                "ratio": round(mx / max(med, 1e-3), 1),
                "tasks": s["numCompleteTasks"],
            }
        )
    return sorted(out, key=lambda r: -r["max_s"])


def main() -> None:
    from pyspark.sql import functions as F

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators import lm_score
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    order = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    report = {}
    for label, conf in (
        ("aqe_skew_on", {}),
        ("aqe_skew_off", {"spark.sql.adaptive.skewJoin.enabled": "false"}),
    ):
        conf = dict(conf)
        conf.update(
            {
                "spark.ui.enabled": "true",
                "spark.ui.port": "4055",
                "spark.ui.retainedStages": "50000",
                # the dim side must not broadcast or there is no shuffle
                # join to measure (same pinning as skew_stress.py)
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            }
        )
        spark = get_spark(f"lm_skew_{label}", cpus=32, extra_conf=conf)
        base = spark.read.parquet(SRC)
        copies = [
            base.select(
                (F.col("doc_id") + F.lit(OFFSET * i)).alias("doc_id"),
                "text",
                "lang",
            )
            for i in range(k)
        ]
        docs = copies[0]
        for c in copies[1:]:
            docs = docs.unionByName(c)
        docs = docs.repartition(64)

        # model trains on ONE copy (the trusted slice does not grow with
        # the crawl); scoring fans the full skewed corpus into it
        trusted = base.filter(F.col("lang") == "en")
        if order == 4:
            model = lm_score.train_kn_trigram_lm(trusted)
            t0 = time.time()
            out = lm_score.score_docs_kn(docs, model).drop(
                "avg_logprob_bits"
            )
        elif order == 3:
            model = lm_score.train_trigram_lm(trusted)
            t0 = time.time()
            out = lm_score.score_docs3(docs, model).drop("avg_logprob_bits")
        else:
            model = lm_score.train_bigram_lm(trusted)
            t0 = time.time()
            out = lm_score.score_docs(docs, model).drop("avg_logprob_bits")
        out.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 1)
        stats = _stage_task_stats(spark)[:4]
        report[label] = {"wall_s": wall, "heaviest_stages": stats}
        print(f"[{label}] wall={wall}s top stages={stats}")
        spark.stop()
    print(json.dumps({"k": k, "order": order, "results": report}))


if __name__ == "__main__":
    main()
