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
    "q_ann_ivf_pruned": "broadcast of k centroid rows (layout-build ivf_assign on first call)",
    "q_ann_recall": "corpus x n_q eval queries (the exact baseline's irreducible scoring pass) + k centroid rows",
    "q_lsh_recall": "three 1-row count aggregates",
    "q_semantic_dedup": "broadcast of k centroid rows (ivf_assign); pairs are cluster-equi-joined",
    "q_incremental_semdedup": "broadcast of k centroid rows (ivf_assign, standing + delta); pairs are cluster-equi-joined delta probes",
    "q_corpus_pipeline_v3": "broadcast of k centroid rows (semantic-dedup stage); pairs are cluster-equi-joined",
    "q_corpus_pipeline_v4": "broadcast of k centroid rows (semantic-dedup stage); pairs are cluster-equi-joined",
    "q_corpus_pipeline_v5": "broadcast of k centroid rows (semantic-dedup stage, same chain as v4 with the trigram gate); pairs are cluster-equi-joined",
    "q_corpus_pipeline_v6": "broadcast of k centroid rows (semantic-dedup stage, same chain as v4 with the KN-tercile gate); pairs are cluster-equi-joined",
    "q_corpus_pipeline_v7": (
        "broadcast of k centroid rows (semantic-dedup stage, v6's chain) "
        "+ the trainer's 1-row doc count per gradient step; pairs are "
        "cluster-equi-joined"
    ),
    "q_corpus_pipeline_v8": (
        "v7's bounded broadcasts (k centroid rows + the trainer's 1-row "
        "doc count) plus the benchmark gram index semi-join side "
        "(eval-suite-sized); pairs are cluster-equi-joined"
    ),
    "q_corpus_pipeline_v9": (
        "v8's bounded broadcasts (k centroid rows, trainer's 1-row doc "
        "count, eval-suite-sized gram index) plus the C4 bad-words "
        "policy list (policy-bounded); the rule front adds no pairing "
        "path — Gopher/C4 are doc-local filters"
    ),
    "q_corpus_pipeline_v10": (
        "v9's bounded broadcasts; the UniMax budget stage adds only "
        "per-language L-row offset broadcasts (token_budget_select's "
        "two-pass shape per language, L = language inventory)"
    ),
    "q_bpe_encode": "broadcast of the 1-row char-alphabet count (merge-output id offset)",
    "q_ann_ivf_search": "broadcast of k centroid rows",
    "q_ann_ivf_search_quantized": "broadcast of k centroid rows",
    "q_kmeans_centroids": "broadcast of k centroid rows per iteration",
    "q_pq_adc_topk": (
        "broadcast of m x ksub codebook rows (subspace k-means fits, "
        "encode, and the ADC distance table are all codebook-sized)"
    ),
    "q_ivf_pq_search": (
        "broadcast of coarse_k centroid rows + m x ksub codebook rows + "
        "the nprobe x m x ksub per-list ADC table"
    ),
    "q_ivf_pq_delta": (
        "broadcast of coarse_k centroid rows + m x ksub codebook rows "
        "(standing-trained, frozen for the delta encode)"
    ),
    "q_ivf_pq_recall": (
        "broadcast of coarse_k centroids + m x ksub codebook/ADC rows + "
        "1-row query vector (the exact baseline's irreducible scoring pass)"
    ),
    "q_hash_embed_sim": (
        "broadcast of the query doc's sparse vector (<= dim rows) and its "
        "1-row norm"
    ),
    "q_corpus_pipeline_delta": (
        "broadcast of k centroid rows (standing-index ivf_assign on the "
        "delta batch, the incremental-semdedup stage); pairs are "
        "cluster-equi-joined delta probes"
    ),
    # quadratic BY DESIGN: exact all-pairs validation twin of the
    # cluster-bucketed bitext path (the q_embedding_neardup_pairs class)
    "q_bitext_mine": "exact baseline, validation twin of the IVF-bucketed path",
    "q_bitext_mine_ivf": "broadcast of k centroid rows (ivf_assign on both sides); pairs are cluster-equi-joined",
    # 1-row broadcast (query vector / corpus doc-count / scalar subquery)
    "q_domain_stats": "broadcast of the 1-row corpus doc total (share_bp)",
    "q_domain_stats_delta": "broadcast of the 1-row merged doc total (share_bp recompute)",
    "q_corpus_report": "broadcast of the 1-row exact-dup count onto the 1-row profile agg",
    "q_embedding_topk": "broadcast of 1-row query vector",
    "q_tfidf_topk": "broadcast of 1-row corpus doc count",
    "q_bm25_topk": "broadcast of 1-row corpus stats (n_docs, sum_dl)",
    "q_qld_topk": "broadcast of 1-row corpus token total (cf_total)",
    "q_phrase_boost": (
        "broadcast of 1-row corpus stats (BM25 leg) + the exploded "
        "phrase workload (phrase leg)"
    ),
    "q_bm25_prf": "broadcast of 1-row corpus stats (n_docs, sum_dl), both scoring passes",
    "q_retrieval_metrics": "broadcast of 1-row corpus stats (BM25 results leg)",
    "q_bm25_index_delta": "broadcast of the folded 1-row corpus stats",
    "q_hard_negatives": "broadcast of 1-row corpus stats (BM25 results leg)",
    "q_training_pairs_pipeline": (
        "broadcast of 1-row corpus stats (BM25 retrieval leg, inherited "
        "from q_hard_negatives' shape); mining/budget/packing stages are "
        "workload-bounded equi-joins + one window prefix-sum"
    ),
    "q_mmr_rerank": (
        "broadcast of 3 query vectors (cosine_topk_batch candidate leg); "
        "the MMR loop itself joins only workload-bounded candidate frames"
    ),
    "q_hybrid_retrieval": (
        "broadcast of 1-row corpus stats (BM25 leg) + 3 query vectors "
        "(semantic leg)"
    ),
    "q_rag_retrieve": (
        "broadcast of 1-row corpus stats (PRF leg, both passes) + 3 query "
        "vectors (semantic leg); fusion/snippet frames are fused-top-k-sized"
    ),
    "q_snippet_extract": (
        "broadcast of 1-row corpus stats (BM25 candidate leg)"
    ),
    "q_tokenizer_compare": (
        "broadcast of the 1-row corpus byte/word totals onto each "
        "tokenizer's 1-row token count (and bpe_encode_bytes' 1-row "
        "alphabet count)"
    ),
    "q_rerank_eval": (
        "broadcast of 1-row corpus stats (BM25 leg) + 3 query vectors "
        "(semantic leg) — the same candidate plan as "
        "q_rag_retrieve_reranked, evaluated under both orderings"
    ),
    "q_rag_retrieve_reranked": (
        "broadcast of 1-row corpus stats (BM25 leg) + 3 query vectors "
        "(semantic leg) — q_hybrid_retrieval's candidate plan; the "
        "trainer's weights are a materialized bounded artifact and the "
        "rerank join is feature-keyed"
    ),
    "q_tpch_q22_idle_customers": "scalar subquery (1-row avg) broadcast",
    "q_tpch_q15_top_supplier": "scalar subquery (1-row max) broadcast",
    "q_tpch_q11_important_stock": "scalar subquery (1-row total) broadcast",
    "q_boilerplate_score": "broadcast of 1-row corpus doc count",
    "q_bloom_prune_join": "broadcast of 1-row bloom bitmap map",
    "q_importance_weights": "broadcast of 1-row token-totals frame",
    "q_importance_bigram": "broadcast of 1-row unit-totals frame (same shape, unigram+bigram units)",
    "q_corpus_pipeline_v2": "broadcast of 1-row token-totals frame (importance stage)",
}


# Source-level lint: every explicit ``F.broadcast(...)`` hint in the
# package must appear here, keyed "relpath::enclosing_function", with the
# reason the hinted frame is PROVABLY BOUNDED (1-row aggregate, k-row
# centroids, spec-bounded dimension, df-capped set, benchmark set, ...).
# A hint on an unbounded frame (one row per corpus document, a dup-window
# set, an SF-scaled table) is a driver OOM at 100 TB that small-SF benches
# can never see — so it is a lint error, not a style nit.  AQE already
# broadcasts any frame whose RUNTIME size fits; a hint only ever needs to
# exist for frames whose boundedness we know statically.
BROADCAST_OK = {
    "plans/aggregations.py::_with_dates": "dim_date: calendar-bounded (2557 rows)",
    "plans/aggregations.py::_with_stock": "dim_stock: symbol-universe-bounded",
    "plans/corpus.py::curate_corpus": "benchmark shingle set: eval suite is small by definition",
    "operators/bloom.py::bloom_semi_join": "1-row relational bitmap",
    "operators/classifier.py::train_langid_ovr": (
        "K language classes + the K x (n_buckets + 1) weight grid + the "
        "1-row doc count — all bounded artifacts of the trainer"
    ),
    "operators/classifier.py::langid_predict": (
        "trained weight grid: K x (n_buckets + 1) rows by construction"
    ),
    "operators/c4.py::c4_quality_flags": (
        "bad-words policy list: policy-bounded (hundreds of rows, the "
        "flagged_word_stats class)"
    ),
    "operators/ordering.py::global_sort_index": "per-partition counts: numPartitions rows",
    "operators/curation.py::token_budget_select": "per-partition token-sum offsets: numPartitions rows",
    "operators/curation.py::balanced_shards": "per-partition token-sum offsets: numPartitions rows",
    "operators/pagerank.py::pagerank_fixed_point": "1-row node count",
    "operators/similarity.py::ivf_assign": "k centroid rows",
    "operators/quantize.py::pq_train": "m x ksub codebook rows per Lloyd round",
    "operators/quantize.py::pq_encode": "m x ksub codebook rows",
    "operators/quantize.py::pq_adc_topk": "m x ksub distance-table rows",
    "operators/quantize.py::_ivf_pq_residuals": "coarse_k centroid rows (residual join)",
    "operators/quantize.py::ivf_pq_search": "nprobe x m x ksub per-list ADC table",
    "operators/retrieval.py::best_snippet_window": (
        "workload-bounded candidate set (a fused/retrieved top-k) and "
        "query-vocabulary terms"
    ),
    "operators/retrieval.py::phrase_match": (
        "exploded query phrases: q x phrase_len rows (a retrieval "
        "workload, not a corpus)"
    ),
    "operators/retrieval.py::bm25_prf_topk": (
        "feedback-doc set: q x fb_k rows (a retrieved top-k, workload-"
        "bounded not corpus-bounded)"
    ),
    "operators/similarity.py::cosine_topk_batch": (
        "q query-workload vectors (a retrieval workload, not a corpus)"
    ),
    "operators/similarity.py::ann_recall": "n_q eval-query rows (a fixed small eval set by definition), twice",
    "operators/similarity.py::ivf_search": "nprobe centroid rows",
    "operators/similarity.py::ivf_search_quantized": "nprobe centroid rows",
    "operators/text.py::tfidf_topk": "1-row corpus doc count",
    "operators/text.py::qld_topk": (
        "query-vocabulary frames (exploded query terms / query-filtered "
        "collection frequencies), bounded by the workload not the "
        "corpus, + 1-row corpus token total"
    ),
    "operators/text.py::bm25_score_terms": (
        "query-vocabulary frames (qterms / query-filtered df), bounded by "
        "the query workload not the corpus, + 1-row corpus stats"
    ),
    "operators/text.py::boilerplate_flags": "1-row count + df-capped frequent-shingle set (df > bp/1e4*n_docs bounds set size by construction)",
    "operators/text.py::bpe_encode": (
        "1-row char-alphabet count + the vocab-sized seg/vocab artifacts "
        "(distinct-word frame, Heaps-bounded and localCheckpoint-pinned "
        "so the planner sees its true size — r12 wave 3)"
    ),
    "operators/text.py::bpe_segment": (
        "vocab-sized per-word token-count frame (distinct words, "
        "Heaps-bounded — the same artifact class as bpe_encode's seg)"
    ),
    "functions/sketches.py::cms_estimate": "fixed d*w counter matrix (input-size-independent)",
    "queries/llm_ops.py::q_embedding_topk": "1-row query vector",
    "queries/llm_ops.py::q_hash_embed_sim": (
        "query doc's sparse hashed vector (<= dim rows) + its 1-row norm"
    ),
    "queries/llm_ops.py::q_decontaminate": "benchmark shingle set: eval suite is small by definition",
    "queries/reference.py::q_star_join": "reference star-schema dim side (dim_stock symbol universe / dim_date calendar are bounded; testdata miniatures them)",
    "queries/reference.py::q_sector_rollup": "reference star-schema dim side (customer plays symbol-bounded dim_stock)",
    "queries/tpch_suite.py::q_tpch_q22_idle_customers": "1-row avg acctbal",
    "queries/tpch_suite.py::q_tpch_q15_top_supplier": "1-row max revenue",
    "queries/tpch_suite.py::q_tpch_q2_min_cost_supplier": "nation=25 / region=5 rows by TPC-H spec",
    "queries/tpch_suite.py::q_tpch_q9_product_profit": "nation=25 rows by TPC-H spec",
    "queries/tpch_suite.py::q_tpch_q11_important_stock": "nation=25 rows + 1-row total",
    "queries/tpch_suite.py::q_tpch_q20_excess_stock": "nation=25 rows by TPC-H spec",
    "operators/classifier.py::train_logreg_fixed_point": (
        "weight table <= n_buckets+1 rows by construction + 1-row doc "
        "count (the per-step forward-pass/update joins)"
    ),
    "operators/classifier.py::trained_score": "weight table <= n_buckets+1 rows by construction",
    "operators/doremi.py::doremi_weights": (
        "per-domain frames (weights / token totals / reference losses: "
        "one row per domain, k-bounded) + 1-row mixture total + 1-row "
        "domain count"
    ),
    "operators/curation.py::domain_stats": "1-row corpus doc total",
    "operators/curation.py::domain_stats_delta": "1-row merged doc total",
    "queries/privacy_ops.py::q_corpus_report": "1-row exact-dup count joined onto the 1-row profile agg",
    "operators/text.py::bpe_encode_bytes": (
        "merge-output vocab rows (<= n_merges, the trained artifact) — "
        "the id-assignment join — plus the vocab-sized seg artifact "
        "(distinct byte-piece frame, Heaps-bounded, r12 wave 3)"
    ),
    "operators/text.py::bpe_decode_bytes": "merge-output vocab rows (<= n_merges, the trained artifact)",
    "operators/retrieval.py::rerank_apply": (
        "trained reranker weight table: n_features+1 rows (4 at the "
        "contract constants) by construction"
    ),
    "operators/unigram.py::viterbi_segment": (
        "(piece, cost) table <= alphabet + SEED_MULTI rows by "
        "construction (it IS the tokenizer artifact)"
    ),
    "operators/unigram.py::unigram_encode": (
        "piece-id table <= alphabet + SEED_MULTI rows (the artifact)"
    ),
    "operators/unigram.py::viterbi_piece_losses": (
        "(piece, cost) table <= alphabet + SEED_MULTI rows by "
        "construction (the viterbi_segment artifact, loss variant)"
    ),
    "queries/tokenizer_ops.py::_row": (
        "1-row corpus byte/word totals joined onto each tokenizer's "
        "1-row token count (q_tokenizer_compare's per-tokenizer row)"
    ),
    "operators/wordpiece.py::wordpiece_encode": (
        "vocabulary artifact: alphabet + n_merges rows by construction "
        "(the match join and the id-assignment join)"
    ),
    "operators/preference.py::bradley_terry_fit": (
        "strength table: one row per PLAYER (models/policies/annotators "
        "— an artifact universe, not a corpus), twice per MM round"
    ),
}


def audit_broadcast_hints(pkg_root: str | None = None) -> list[str]:
    """AST-scan the package for ``*.broadcast(...)`` calls and flag every
    one whose ``relpath::enclosing_function`` key is not justified in
    ``BROADCAST_OK``.  Returns violation strings (empty = clean)."""
    import ast

    if pkg_root is None:
        pkg_root = os.path.join(REPO, "nasdaq_equity_airflow_ecs_pipeline_spark")
    violations: list[str] = []
    for root, _dirs, files in os.walk(pkg_root):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, pkg_root)
            try:
                tree = ast.parse(open(path).read())
            except SyntaxError as exc:
                violations.append(f"{rel}: unparseable ({exc})")
                continue

            def visit(node, fname):
                for child in ast.iter_child_nodes(node):
                    nf = (
                        child.name
                        if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef))
                        else fname
                    )
                    if (
                        isinstance(child, ast.Call)
                        and isinstance(child.func, ast.Attribute)
                        and child.func.attr == "broadcast"
                    ):
                        key = f"{rel}::{fname}"
                        if key not in BROADCAST_OK:
                            violations.append(
                                f"{rel}:{child.lineno} broadcast hint in "
                                f"{fname}() has no boundedness justification "
                                f"in BROADCAST_OK"
                            )
                    visit(child, nf)

            visit(tree, "<module>")
    return violations


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
    hint_violations = audit_broadcast_hints()
    for v in hint_violations:
        print(f"HINT   {v}")
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
    bad += len(hint_violations)
    print(
        f"RESULT: {len(report)} queries, {bad} flagged "
        f"({len(hint_violations)} broadcast-hint lint)"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
