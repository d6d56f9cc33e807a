#!/usr/bin/env python3
"""Headline benchmark for the driver contract.

Runs the representative queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q_star_join": 1.23, ...}, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` datasource writer
(full computation, no driver collect, no disk) so the timing measures
the Spark plan, not Python-side result handling.

The stdout line is kept COMPACT (headline timings only) so the driver's
tail-capture window always holds it; per-query shuffle bytes, the
extended-query timings, and methodology notes go to ``BENCH_DETAIL.json``
next to this script.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Representative spread: scan/cast, broadcast star join, the three OHLCV
# rollups, top-k window, dedup family (exact + MinHash LSH), similarity
# search, text analysis, sessionization. Ordered cheap->expensive.
HEADLINE = [
    "q_scan_project_cast",
    "q_case_bucketing",
    "q_star_join",
    "q_tpch_q3_shipping_priority",
    "q_tpch_q5_local_supplier",
    "q_tpch_q6_forecast_revenue",
    "q_tpch_q10_returned_items",
    "q_tpch_q18_large_orders",
    "q_tpch_q21_waiting_suppliers",
    "q_group_count",
    "q_weekly_rollup",
    "q_monthly_rollup",
    "q_sector_rollup",
    "q_top_k_per_group",
    "q_fact_build",
    "q_dedup_exact",
    "q_text_quality",
    "q_token_count",
    "q_minhash_pairs",
    "q_embedding_topk",
    "q_embedding_neardup_lsh",
    "q_sessionize",
    "q_asof_join",
    "q_chunk_documents",
    "q_tumbling_window",
    "q_session_window_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as contract
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scale_stress import _shuffle_totals

    t_start = time.monotonic()
    # UI on: the REST API is the per-query shuffle-bytes source — plan-
    # shape regressions (a lost broadcast, a new exchange) show up in
    # shufW even when wall-clock noise hides them
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4052",
            # the shuffle deltas difference cumulative stage sums; the
            # status store must retain every stage of the run or late
            # queries under-count (default retainedStages=1000 < a full
            # bench's stage count)
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    queries = contract.queries()

    # JVM + parquet-footer warmup outside the timed region.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).count()
    startup = round(time.monotonic() - t_start, 3)

    # machine-speed canary: fixed-size single-thread Python hash + JVM
    # range-sum, identical work every round. Shared-VM throughput swings
    # 1.2-1.9x between rounds (measured r4); the canary makes that
    # visible so a cross-round headline delta can be read against the
    # machine, not assumed to be the code.
    import hashlib
    t0 = time.monotonic()
    h = hashlib.md5()
    blk = b"x" * (1 << 20)
    for _ in range(64):
        h.update(blk)
    py_canary = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    spark.range(50_000_000).selectExpr("sum(id)").collect()
    jvm_canary = round(time.monotonic() - t0, 3)
    # I/O canary (VERDICT r9 #4): the CPU canaries cannot adjudicate
    # scan-bound drift — r9 saw q_scan_project_cast move +49% raw on a
    # byte-identical plan with 0.0 shuffle while the CPU canary got
    # FASTER. A fixed full-column parquet scan of lineitem (the largest
    # table) through the noop sink times the scan+decode path itself;
    # best-of-2 so the first rep's page-cache fill doesn't pollute it
    # (the cold rep is reported too — it's the number that matches a
    # cold bench run).
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    io_cold = io_canary = None
    for _ in range(2):
        t0 = time.monotonic()
        li.write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        if io_cold is None:
            io_cold = dt
        io_canary = dt if io_canary is None else min(io_canary, dt)

    # two reps: rep 1 is the cold number (JIT compiling, page cache
    # filling), the min is the reproducible warm number. Both totals are
    # reported so a single cold run is never mistaken for a regression
    # against a warm one (shared-machine noise is +-40% run-to-run).
    # Sub-second queries get FIVE reps (VERDICT r11 #6): at <1s,
    # scheduler jitter alone is tens of ms (>10% variance) and r11 saw
    # 13 sub-second headline rows move 1.3-1.7x normalized on
    # byte-identical shufW under best-of-3 — the extra reps cost ~15s
    # total and shrink cross-round movers to real plan changes.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    shufw: dict[str, float] = {}
    reps_per_query: dict[str, int] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        rep = 0
        # shuffle delta brackets the whole rep loop (the REST settle wait
        # stays OUTSIDE the timed region); bytes are plan-deterministic,
        # so per-execution volume = delta / reps
        w0, _ = _shuffle_totals(spark)
        while rep < 2 or (best < 1.0 and rep < 5):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if rep == 0:
                cold[name] = round(dt, 3)
            best = min(best, dt)
            rep += 1
        w1, _ = _shuffle_totals(spark)
        shufw[name] = round((w1 - w0) / 1e6 / rep, 1)
        timings[name] = round(best, 3)
        reps_per_query[name] = rep
        print(f"[bench] {name}: {timings[name]}s (cold {cold[name]}s, {rep} reps, "
              f"shufW {shufw[name]}MB)",
              file=sys.stderr)

    # flagship composition, timed separately so the headline total stays
    # comparable across rounds (added round 2)
    extended: dict[str, float] = {}
    for name in (
        "q_corpus_pipeline",
        "q_scd2_history",
        "q_bloom_prune_join",
        "q_moving_window_range",
        "q_incremental_lsh",
        "q_zorder_pruned_scan",
        "q_count_min_freq",
        "q_stream_interval_join",
        "q_line_dedup",
        "q_importance_weights",
        "q_mv_refresh",
        "q_corpus_pipeline_v2",
        "q_semantic_dedup",
        "q_corpus_pipeline_v3",
        "q_corpus_pipeline_v4",
        "q_token_budget",
        "q_bm25_topk",
        "q_bm25_prf",
        "q_hybrid_retrieval",
        "q_rag_retrieve",
        "q_training_pairs_pipeline",
        "q_corpus_pipeline_v5",
        "q_lm_score3",
        "q_qld_topk",
        "q_phrase_boost",
        # r9: winnow match + delta-isolated incremental row (VERDICT r8
        # #8 — delta-path regressions visible without EXPLAIN.md prose),
        # KN tier, CCNet terciles, substring apply, video near-dup
        "q_winnow_overlap",
        "q_winnow_incremental",
        "q_lm_score_kn",
        "q_ccnet_buckets",
        "q_substring_dedup_apply",
        "q_substring_index_delta",
        "q_cdc_dedup_apply",
        "q_video_neardup",
        "q_ahash_index_delta",
        "q_corpus_pipeline_v6",
        "q_lm_score_kn_full",
        "q_containment_pairs",
        "q_ccnet_sample",
        "q_bpe_encode",
        # r10 surface (VERDICT r10 #1 — every r10 query gets a wall+shufW
        # row so plan-shape drift in them is adjudicable round-over-round)
        "q_classifier_train",
        "q_filter_eval_trained",
        "q_corpus_pipeline_v7",
        "q_corpus_pipeline_delta",
        "q_doremi_weights",
        "q_pii_redact",
        "q_domain_stats",
        "q_blocklist_filter",
        "q_url_word_score",
        "q_domain_stats_delta",
        "q_flagged_words",
        "q_corpus_report",
        "q_bpe_bytes_merges",
        "q_bpe_bytes_encode",
        "q_bpe_bytes_roundtrip",
        "q_substring_anyoffset_spans",
        "q_substring_anyoffset_apply",
        "q_video_shingle_neardup",
        "q_tokenizer_eval",
        "q_moore_lewis",
        "q_importance_bigram",
        # r11 surface: subword classifier, span decontamination, learned
        # reranker, unigram-LM tokenizer family
        "q_classifier_train_ngram",
        "q_decontaminate_apply",
        "q_reranker_train",
        "q_rag_retrieve_reranked",
        "q_unigram_lm_train",
        "q_unigram_encode",
        "q_tokenizer_compare",
        "q_unigram_doc_score",
        "q_decontaminate_delta",
        "q_rerank_eval",
        "q_corpus_pipeline_v8",
        "q_pack_attention_spans",
        "q_gopher_quality",
        "q_gopher_repetition",
        # r12 surface: C4 front + span dedup, the FineWeb-shaped v9
        # chain, the multiclass lang-id trainer
        "q_c4_quality",
        "q_c4_apply",
        "q_c4_span_dedup",
        "q_corpus_pipeline_v9",
        "q_langid_train",
        "q_langid_predict",
        "q_unigram_lm_prune",
        "q_c4_span_delta",
        "q_filter_ablation",
        # r12 sixth wave: the WordPiece tokenizer completes the triad;
        # UniMax joins the mixture family
        "q_wordpiece_merges",
        "q_wordpiece_encode",
        "q_unimax_weights",
        "q_bradley_terry",
        "q_bitext_mine",
        "q_bitext_mine_ivf",
        "q_readability",
        "q_corpus_pipeline_v10",
        "q_bradley_terry_delta",
        "q_unimax_delta",
        "q_eval_f1",
        "q_eval_rouge_l",
        "q_sft_quality",
        "q_sft_dedup",
        "q_sft_loss_mask",
        "q_sft_pack_masks",
    ):
        fn = queries[name]
        best = float("inf")
        rep = 0
        w0, _ = _shuffle_totals(spark)
        while rep < 2 or (best < 1.0 and rep < 3):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
            rep += 1
        w1, _ = _shuffle_totals(spark)
        shufw[name] = round((w1 - w0) / 1e6 / rep, 1)
        extended[name] = round(best, 3)
        reps_per_query[name] = rep
        print(f"[bench] extended {name}: {extended[name]}s ({rep} reps, "
              f"shufW {shufw[name]}MB)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # canary-normalized walls (r5 judge #3): the shared VM drifts 1.2-1.9x
    # between rounds while plans stay byte-identical, so cross-round
    # comparisons should read wall / jvm_canary (canary-seconds of work),
    # not raw seconds. jvm_canary is the denominator because the queries
    # are JVM-bound; py_canary is reported for cross-checking the drift.
    norm = lambda v: round(v / max(jvm_canary, 1e-9), 3)  # noqa: E731
    # scan-dominated rows (measured ~zero shuffle this run) get an
    # io-canary normalization too — cross-round drift on these rows is
    # adjudicated against io_canary_sec, not the CPU canaries
    io_norm = {
        k: round(v / max(io_canary, 1e-9), 3)
        for k, v in timings.items()
        if shufw.get(k, 1.0) < 1.0
    }
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "value_normalized": norm(total),
        "unit": "sec",
        "queries": timings,
        "queries_normalized": {k: norm(v) for k, v in timings.items()},
        "extended_normalized": {k: norm(v) for k, v in extended.items()},
        "sf": sf,
        "cold_total": round(sum(cold.values()), 3),
        "extended": extended,
        "shufW_mb": shufw,
        "startup_sec": startup,
        "cpu_canary_sec": {"py_md5_64mb": py_canary, "jvm_range_sum_50m": jvm_canary},
        "io_canary_sec": io_canary,
        "io_canary_cold_sec": io_cold,
        "queries_io_normalized": io_norm,
        "reps": "2 (headline: up to 5 when warm best <1s; extended: +1)",
        "reps_per_query": reps_per_query,
        "timing": "best-of-2 per query; sub-second rows get extra reps "
                  "(headline best-of-5, extended best-of-3 — r11 jitter); "
                  "cold_total = first-rep sum; "
                  "startup_sec = session build + first parquet touch; "
                  "*_normalized = wall / jvm_range_sum_50m canary (unitless "
                  "machine-drift-corrected work, comparable across rounds); "
                  "queries_io_normalized = wall / io_canary_sec for rows with "
                  "measured shufW < 1MB (scan-bound drift adjudication)",
    }
    # Full detail goes to a file; stdout's LAST line is a COMPACT summary
    # the driver's tail-capture window can always hold (VERDICT r4 #2:
    # the full per-query map outgrew the window and BENCH_r04.json came
    # back with "parsed": null — the headline evidence was lost).
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "value_normalized": detail["value_normalized"],
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cold_total": detail["cold_total"],
        "startup_sec": startup,
        "cpu_canary_sec": {"py_md5_64mb": py_canary, "jvm_range_sum_50m": jvm_canary},
        "io_canary_sec": io_canary,
        "detail": "BENCH_DETAIL.json",
    }))


if __name__ == "__main__":
    main()
