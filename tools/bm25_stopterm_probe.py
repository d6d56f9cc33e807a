#!/usr/bin/env python3
"""BM25 stop-term fan-out probe at scale.

The one way bm25_topk's "bounded by matched postings" claim fails at
100 TB is a stop-term in the query: its posting list IS the corpus, so
the scoring join fans out to n_docs rows for near-zero idf weight.
``max_df_frac`` exists to cut exactly that. This probe measures the
cut where it matters: the x100 corpus (~5M docs), one query whose
terms include the highest-df token in the vocabulary, default vs
capped.

The scale_stress x100 fixture is deliberately WRONG for this probe:
its per-copy token suffixing caps every term's df at ~1% of the
corpus (that harness measures index-build scaling, not posting
fan-out). Like tools/lm_skew_probe.py, this probe builds the opposite
corpus in-session: k same-TEXT copies of sf0.1 documents (only doc_id
shifts), so the natural stopwords keep corpus-wide df at full scale.

Usage:
    python3 tools/bm25_stopterm_probe.py [k_copies] [cap]
    # defaults: 100 0.2
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import bm25_topk, tokens
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cap = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    spark = get_spark("bm25_stopterm_probe", cpus=32)
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    offset = 10_000_000
    copies = [
        base.select((F.col("doc_id") + F.lit(offset * i)).alias("doc_id"), "text")
        for i in range(k)
    ]
    docs = copies[0]
    for c in copies[1:]:
        docs = docs.unionByName(c)
    docs = docs.repartition(64).persist()
    n_docs = docs.count()
    # top-df and a mid-df term, measured not assumed
    df_tbl = (
        docs.select("doc_id", F.explode_outer(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .orderBy(F.desc("df"))
        .limit(50)
        .collect()
    )
    hot = df_tbl[0]
    mid = next(r for r in df_tbl if r["df"] * 5 < n_docs)
    print(
        f"[probe] n_docs={n_docs} hot_term={hot['term']!r} df={hot['df']} "
        f"({hot['df']*100//n_docs}%) mid_term={mid['term']!r} df={mid['df']}"
    )
    q = spark.createDataFrame(
        [(1, f"{hot['term']} {mid['term']}")], "query_id int, query_text string"
    )

    def run(label: str, **kw) -> None:
        t0 = time.monotonic()
        out = bm25_topk(docs, q, k=10, **kw)
        out.write.format("noop").mode("overwrite").save()
        print(f"[probe] {label}: {time.monotonic() - t0:.1f}s")

    run("default (stop-term scores full corpus)")
    run(f"max_df_frac={cap} (stop-term dropped)", max_df_frac=cap)


if __name__ == "__main__":
    main()
