#!/usr/bin/env python3
"""Dump .explain('formatted') for named contract queries to files —
the optimization round's before/after plan evidence.

    python3 tools/plan_dump.py --out plans/r12 --suffix after q_foo q_bar
    python3 tools/plan_dump.py --repo /tmp/before_r12 --out plans/r12 \
        --suffix before q_foo

The plan is captured at sf0.01 on a local[8] session (plan shape is
scale- and core-count-independent for these queries; AQE renders
isFinalPlan=false plans, the same thing `explain` shows the driver).
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    import __spark_entry__ as contract
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    spark = get_spark("plan_dump", cpus=8)
    queries = contract.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        df = queries[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"[plan_dump] wrote {path} ({len(txt.splitlines())} lines)", flush=True)


if __name__ == "__main__":
    main()
