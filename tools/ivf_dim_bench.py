#!/usr/bin/env python3
"""Arrow-vs-codegen IVF assignment at production embedding width.

The r5 measurement (200k vectors x k=800 x 64-dim) showed whole-stage
codegen BEATING the mapInPandas numpy path (5.7 s vs 7.7 s) — at narrow
dims the k expression folds are memory-bound-fast and Arrow transfer
dominates. `ivf_assign_arrow` ships as "the escape hatch for
768-4096-dim production embeddings", so this tool measures that claim
where it actually lives: synthetic 768-dim vectors at two k values.

Method: write a deterministic parquet fixture (seeded per-element hash
-> uniform doubles), then time each path end-to-end with the noop sink
(full compute, no collect), best of 2 reps. The centroid frame is the
k-row metadata class both paths already collect/broadcast.

Usage:
    python3 tools/ivf_dim_bench.py [n_vectors] [dim] [k1,k2,...]
    # defaults: 100000 768 256,1024
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_fixture(spark, path: str, n: int, dim: int, seed: int) -> None:
    """n rows of (vec_id bigint, embedding array<double>) written once.

    Elements are xxhash64-derived uniforms in [0,1) — deterministic
    across runs/partitionings, generated JVM-side (no Python in the
    build) so the fixture cost is not part of either measured path."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    vec = F.array(
        *[
            (
                F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(j)))
                / F.lit(float(1 << 63))
            ).alias(f"e{j}")
            for j in range(dim)
        ]
    )
    (
        spark.range(n)
        .repartition(32)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .write.mode("overwrite")
        .parquet(path)
    )


def centroid_frame(spark, fixture: str, k: int):
    """First k vectors as centroids (content is irrelevant to cost:
    both paths do n*k*dim distance work regardless of geometry)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(fixture)
        .filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )


def time_path(spark, fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_arrow,
    )
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    args = sys.argv[1:]
    n = int(args[0]) if args else 100_000
    dim = int(args[1]) if len(args) > 1 else 768
    ks = [int(x) for x in (args[2].split(",") if len(args) > 2 else ["256", "1024"])]

    spark = get_spark("ivf_dim_bench", cpus=32)
    fixture = f"/tmp/ivf_dim_{n}_{dim}.parquet"
    build_fixture(spark, fixture, n, dim, seed=42)
    vecs = spark.read.parquet(fixture)

    report = {"n": n, "dim": dim, "results": {}}
    for k in ks:
        cents = centroid_frame(spark, fixture, k)
        # cache the k-row centroid frame so its scan isn't re-paid inside
        # the timed region of both paths identically
        cents = cents.cache()
        cents.count()
        t_codegen = time_path(spark, lambda: ivf_assign(vecs, cents))
        t_arrow = time_path(spark, lambda: ivf_assign_arrow(vecs, cents))
        report["results"][f"k={k}"] = {
            "codegen_s": t_codegen,
            "arrow_s": t_arrow,
            "speedup_arrow": round(t_codegen / max(t_arrow, 1e-9), 2),
        }
        print(
            f"[ivf-dim] n={n} dim={dim} k={k}: codegen {t_codegen}s "
            f"arrow {t_arrow}s ({report['results'][f'k={k}']['speedup_arrow']}x)"
        )
        cents.unpersist()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
