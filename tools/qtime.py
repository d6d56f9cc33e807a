#!/usr/bin/env python3
"""Time individual contract queries through the noop sink — the
bench.py methodology (same session confs, same SF dir, best-of-N with
the cold rep reported) isolated to a named subset, for the
optimization loop's before/after measurements without paying a full
bench sweep per change.

    python3 tools/qtime.py q_foo q_bar [--reps 3] [--sf /root/testdata/sf0.1]

Prints one line per query: warm best, cold first rep, reps.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    import __spark_entry__ as contract
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    spark = get_spark("qtime")
    queries = contract.queries()
    # JVM/footer warmup outside any timed region (bench.py convention)
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).limit(1).count()

    for name in args.queries:
        fn = queries[name]
        best, cold = float("inf"), None
        for rep in range(args.reps):
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if cold is None:
                cold = dt
            best = min(best, dt)
        print(f"[qtime] {name}: warm={best:.3f}s cold={cold:.3f}s reps={args.reps}",
              flush=True)


if __name__ == "__main__":
    main()
