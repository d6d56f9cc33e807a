#!/usr/bin/env python3
"""Scale-stress harness: replicate the sf0.1 testdata K times with
key-space offsets (join cardinalities scale linearly, no artificial key
collisions), then time the heaviest queries and compare per-row
throughput against plain sf0.1 — a nonlinear blowup here is a scale bug
the 17 MB test files can't show.

Key remapping per copy i (offset = 10_000_000 * i):
- customer/orders/lineitem/part/supplier keys all shift consistently, so
  every FK still lands on exactly one PK and selectivities are unchanged.
- nation/region stay fixed (real dims don't grow with fact data).
- documents: doc_id shifts; copy i rewrites every token through a
  per-copy deterministic PERMUTATION of the base vocabulary (rank by
  md5(word#ci)), so the word POPULATION is fixed across copies (a
  Heaps'-law-compatible corpus: vocabulary does not grow 10x per
  decade of data — the earlier per-token-suffix scheme did exactly
  that and inflated pieces/word for the tokenizer rows, VERDICT r11
  #5) while 5-gram shingle spaces stay effectively disjoint across
  copies (a shingle collides only where the two permutations agree on
  all 5 words) — near-dup structure WITHIN a copy is preserved, no
  cross-copy mega-buckets (which would measure a different, quadratic
  workload). Copy 0 is the identity (the base data verbatim).
- embeddings: vec_id shifts; vectors rotate by i positions (norms and
  intra-copy geometry preserved, copies are not mutual near-dups).
- events: event_id/user_id shift; timestamps shift by i days so window
  populations stay the same shape.

Per-query shuffle volume is captured from the Spark UI REST API
(stage-level shuffle read/write byte deltas): a query whose wall time
scales linearly but whose shuffle bytes scale super-linearly is a latent
scale bug (it's borrowing from memory/spill headroom that won't exist at
100 TB), so both are reported and gated.

Usage:
    python3 tools/scale_stress.py [K] [outdir]      # default K=10
    python3 tools/scale_stress.py 10 /tmp/stress --run-only   # skip build
    python3 tools/scale_stress.py 100 /tmp/stress100 --deep   # sf1-level,
        adds the composed corpus pipeline + full LSH family to the set
    python3 tools/scale_stress.py 100 /tmp/s100 --run-only \
        --queries q_tpch_q21_waiting_suppliers --base /tmp/s10 --base-k 10
        # compare x10 -> x100 for specific queries: distinguishes a
        # broadcast->shuffle plan transition (baseline shuffle artificially
        # ~0 at sf0.1) from genuinely super-linear shuffle growth
    python3 tools/scale_stress.py 100 /tmp/stress100 --run-only --isolated
        # delta-isolated incremental rows: standing index trained and
        # persisted UNTIMED, only the delta fold / frozen-index op timed
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000

HEAVY = [
    "q_minhash_pairs",
    "q_embedding_neardup_lsh",
    "q_weekly_rollup",
    "q_tpch_q21_waiting_suppliers",
    "q_dedup_clusters",
    "q_star_join",
    "q_sessionize",
    "q_text_quality",
    "q_boilerplate_score",
    "q_global_shuffle",
    "q_rolling_zscore",
    "q_scd2_history",
    "q_moving_window_range",
    "q_bloom_prune_join",
]

# --deep adds the composed curation chain + the rest of the LSH family —
# the queries whose scale behavior matters most at 100 TB
DEEP = [
    "q_corpus_pipeline",
    "q_minhash_signatures",
    "q_simhash",
    "q_ngram_jaccard_capped",  # max_df scale path (uncapped twin is the oracle baseline)
    "q_substring_dedup",
    "q_decontaminate",
    "q_pack_sequences",
    "q_incremental_lsh",
    "q_count_min_freq",
    "q_line_dedup",
    "q_importance_weights",
    "q_url_dedup",
    "q_corpus_pipeline_v2",
    "q_corpus_pipeline_v3",
    "q_hist_quantiles",
    "q_time_gapfill",
    "q_retention_cohorts",
    # ANN/similarity family (r5): embeddings table scales with K, the 8
    # centroids / 1-row query vector stay fixed — expected linear scans
    "q_ann_ivf",
    "q_ann_ivf_search",
    "q_ann_ivf_search_quantized",
    "q_embedding_topk",
    # SemDeDup + token-budget cut (r5): cluster-equi-joined pairs /
    # two-pass distributed prefix sum
    "q_semantic_dedup",
    "q_incremental_semdedup",
    "q_token_budget",
    "q_balanced_shards",
    # partitioned-IVF probe + recall eval (r5): directory-pruned scan /
    # one shared corpus x n_q scoring pass
    "q_ann_ivf_pruned",
    "q_ann_recall",
    # hashed-linear quality filter (r5): one narrow scan, zero shuffle
    "q_quality_classifier",
    # PPJoin exact-pairs + bigram-LM scoring (r6): candidate self-join
    # bounded by rare-shingle prefixes + positional filter / stopword-
    # context fan-in bounded by |vocab| on the c1 join
    "q_jaccard_prefix_pairs",
    "q_lm_score",
    # BM25 PRF (r6): index built once (localCheckpoint, 3 consumers);
    # feedback/expansion frames are workload-bounded (q x fb_k / q x
    # n_exp rows) — the corpus-proportional part is the index hash-aggs
    "q_bm25_prf",
    # r6 second wave: MMR (zero-shuffle candidate loop), IR metrics
    # (qrels build is the corpus stage), PQ (codebook broadcast, ADC
    # over integer codes), HLL (register hash-agg; exact-distinct twin
    # rides the agg ceiling — two-scale probe adjudicated)
    "q_mmr_rerank",
    "q_retrieval_metrics",
    "q_pq_adc_topk",
    "q_ivf_pq_search",
    "q_ivf_pq_delta",
    "q_ivf_pq_recall",
    "q_rag_retrieve",
    "q_hash_embed_sim",
    "q_bpe_merges",
    "q_phrase_match",
    "q_bm25_index_delta",
    "q_hll_distinct",
    # composed v4 (r6): line dedup -> classifier -> LM gate -> SemDeDup
    # -> budget -> shards
    "q_corpus_pipeline_v4",
    # r7: composed contrastive-training product (retrieval -> mining ->
    # budget -> packing), trigram LM (4 merge-hinted model joins),
    # oracle-checked image-hash banding, exact-batched BPE
    "q_training_pairs_pipeline",
    "q_corpus_pipeline_v5",
    "q_lm_score3",
    "q_qld_topk",
    "q_phrase_boost",
    "q_winnow_fingerprint",
    "q_winnow_overlap",
    "q_winnow_incremental",
    "q_ahash_neardup",
    "q_bpe_merges_batched",
    # r9: KN tier (4 merge-hinted joins + 2 continuation frames), CCNet
    # terciles (KN + histogram sketch + cut join), substring APPLY
    # (chunk explode + canonical min hash-agg + rebuild), video near-dup
    # (majority-fold hash-agg + banded pairs), driver-side BPE finisher
    # (one corpus pass + capped vocab collect)
    "q_lm_score_kn",
    "q_lm_score_kn_full",
    "q_ccnet_buckets",
    "q_ccnet_sample",
    "q_substring_dedup_apply",
    "q_substring_index_delta",
    "q_cdc_dedup_apply",
    "q_video_neardup",
    "q_ahash_index_delta",
    "q_bpe_merges_local",
    "q_bpe_encode",
    # zorder layout (r5): lineitem key shifts mask into the 16-bit code
    # space, so the code distribution densifies with K — the boundary
    # collect stays <= n_buckets rows at any density by construction
    "q_zorder_layout",
    # r10: in-engine trainers (per-step = one broadcast join + two
    # hash-aggs; weights collected bounded-artifact), byte-BPE encode
    # (vocab-keyed folds + corpus-sized id stream), any-offset substring
    # spans (stride-1 gram hash-agg), video/audio sequence shingling,
    # incremental composed curation (frozen-artifact delta fold), the
    # trained-gate chain, PII redaction (narrow regexp map, no shuffle),
    # domain filtering (suffix-chain explode -> semi/anti equi-joins),
    # tokenizer eval (encode plan + one count agg + narrow join)
    "q_classifier_train",
    "q_doremi_weights",
    "q_bpe_bytes_encode",
    "q_substring_anyoffset_spans",
    "q_substring_anyoffset_apply",
    "q_video_shingle_neardup",
    "q_corpus_pipeline_delta",
    "q_corpus_pipeline_v6",
    "q_corpus_pipeline_v7",
    "q_pii_redact",
    "q_domain_stats",
    "q_blocklist_filter",
    "q_url_word_score",
    "q_tokenizer_eval",
]


def _doc_mapper(spark, docs):
    """Per-copy document rewriter with a FIXED word population (module
    docstring): copy 0 is the identity; copy i > 0 maps each token
    through a deterministic permutation of the base vocabulary (words
    ranked by md5(word#ci) — computable without RNG state, identical
    on re-runs). Falls back to the per-token-suffix scheme only if the
    base vocabulary is too large for a literal map expression (not the
    case for the synthetic fixture; a real corpus would pre-build a
    mapping table and join)."""
    import hashlib

    from pyspark.sql import functions as F

    vocab = sorted(
        r["w"]
        for r in docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .distinct()
        .collect()
    )

    def mapper(df, i):
        ident = df.select(
            (F.col("doc_id") + F.lit(OFFSET * i)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        if i == 0:
            return ident
        if len(vocab) > 4096:
            return df.select(
                (F.col("doc_id") + F.lit(OFFSET * i)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", r"$1c" + str(i)).alias(
                    "text"
                ),
                "lang",
                "source",
                "n_chars",
            )
        target = sorted(
            vocab,
            key=lambda w: hashlib.md5(f"{w}#c{i}".encode()).hexdigest(),
        )
        m = F.create_map(
            *[
                F.lit(x)
                for src, dst in zip(vocab, target)
                for x in (src, dst)
            ]
        )
        return df.select(
            (F.col("doc_id") + F.lit(OFFSET * i)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda w: F.coalesce(m[w], w),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    return mapper


def build(spark, k: int, outdir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(outdir, exist_ok=True)
    t = {
        name: spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        for name in (
            "customer orders lineitem part supplier nation region "
            "documents embeddings events".split()
        )
    }

    def rep(df, mapper):
        copies = [mapper(df, i) for i in range(k)]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    def shift(cols):
        def m(df, i):
            off = F.lit(OFFSET * i)
            return df.select(
                *[
                    (F.col(c) + off).alias(c) if c in cols else F.col(c)
                    for c in df.columns
                ]
            )

        return m

    plans = {
        "customer": rep(t["customer"], shift({"c_custkey"})),
        "orders": rep(t["orders"], shift({"o_orderkey", "o_custkey"})),
        "lineitem": rep(
            t["lineitem"], shift({"l_orderkey", "l_partkey", "l_suppkey"})
        ),
        "part": rep(t["part"], shift({"p_partkey"})),
        "supplier": rep(t["supplier"], shift({"s_suppkey"})),
        "nation": t["nation"],
        "region": t["region"],
        "documents": rep(t["documents"], _doc_mapper(spark, t["documents"])),
        "embeddings": rep(
            t["embeddings"],
            lambda df, i: df.select(
                (F.col("vec_id") + F.lit(OFFSET * i)).alias("vec_id"),
                F.concat(
                    F.slice(F.col("embedding"), i % 64 + 1, 64),
                    F.slice(F.col("embedding"), 1, i % 64),
                ).alias("embedding"),
                "label",
            ),
        ),
        "events": rep(
            t["events"],
            lambda df, i: df.select(
                (F.col("event_id") + F.lit(OFFSET * i)).alias("event_id"),
                # ts is TIMESTAMP_NTZ after load_table normalization —
                # shift i days in calendar-free interval arithmetic
                (F.col("ts") + F.make_interval(days=F.lit(i))).alias("ts"),
                (F.col("user_id") + F.lit(OFFSET * i)).alias("user_id"),
                "event_type",
                "value",
                "props",
            ),
        ),
    }
    nfiles = max(8, k // 3)
    for name, df in plans.items():
        df.repartition(nfiles).write.mode("overwrite").parquet(
            os.path.join(outdir, f"{name}.parquet")
        )
        print(f"[build] {name} written")


def _shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over all stages so
    far, from the UI REST API. (0, 0) when the UI is off.

    The status store updates asynchronously after an action returns, so
    settle first: wait for active stages to drain (bounded) before
    snapshotting, else a query's stages land in the NEXT delta."""
    import urllib.request

    def get(path):
        with urllib.request.urlopen(f"{ui}{path}", timeout=30) as r:
            return json.load(r)

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return (0, 0)
    try:
        app_id = get("/api/v1/applications")[0]["id"]
        for _ in range(20):  # <=2s settle
            if not get(f"/api/v1/applications/{app_id}/stages?status=active"):
                break
            time.sleep(0.1)
        stages = get(f"/api/v1/applications/{app_id}/stages?status=complete")
    except Exception as exc:  # REST hiccup: degrade to wall-time-only
        print(f"[shuffle-metrics] unavailable: {exc}", file=sys.stderr)
        return (0, 0)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def run(spark, sf_dir: str, queries: list[str]) -> dict[str, dict]:
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries import QUERIES

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    out = {}
    for name in queries:
        w0, r0 = _shuffle_totals(spark)
        start = time.time()
        # noop write + observe, NOT .count(): count() lets Catalyst
        # eliminate whole subtrees (e.g. an aggregated unique-key left
        # join never changes cardinality, so q_substring_dedup's entire
        # operator optimized away and "scaled" perfectly).  The noop
        # sink materializes every output column; the observation rides
        # along for the row count at zero extra passes.
        obs = Observation(f"rows_{name}")
        df = QUERIES[name](spark, sf_dir).observe(obs, F.count(F.lit(1)).alias("n"))
        df.write.format("noop").mode("overwrite").save()
        n = obs.get["n"]
        dt = round(time.time() - start, 2)
        w1, r1 = _shuffle_totals(spark)
        out[name] = {
            "s": dt,
            "rows": n,
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        }
        print(
            f"[run] {name}: {dt}s rows={n} "
            f"shufW={out[name]['shuffle_write_mb']}MB"
        )
    return out


def run_isolated(spark, sf_dir: str, fixdir: str) -> dict[str, dict]:
    """Delta-isolated incremental rows (r6 VERDICT #3): the standing
    index (IVF-PQ coarse centroids + residual codebooks; BM25 tf/stats)
    is trained and PERSISTED as parquet fixtures UNTIMED, then the
    timed section runs ONLY the incremental op against the frozen
    artifacts — so the row measures the delta fold, not the fixture's
    re-training (q_ivf_pq_delta's x100 wall was ~all Lloyd iterations).

    Rows:
    - q_ivf_pq_delta@iso: frozen-index delta encode (assign + encode
      against broadcast codebooks) — delta-sized by construction.
    - q_ivf_pq_recall@iso: the probe + exact-topk eval against the
      persisted index (codes read from parquet, no training).
    - q_bm25_index_delta@iso: the delta-side index build (tokenize +
      hash-agg of the NEW docs) + the 1-row stats fold — exactly what
      an index-table append writes; the standing tf is touched only as
      the 1-row standing stats read.
    - q_substring_index_delta@iso (r9): delta chunking + the ownership
      anti-join against the persisted standing kept-chunk index + the
      delta-only rebuild.
    - q_ahash_index_delta@iso (r9): delta-side banding probing the
      persisted standing hash table + exact hamming verify.
    """
    from pyspark.sql import functions as F

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators import text as text_ops
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.quantize import (
        ivf_pq_build,
        ivf_pq_encode_delta,
        ivf_pq_search,
    )
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.similarity import (
        _pair_d2,
    )
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries import llm_ops
    from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import load_table

    os.makedirs(fixdir, exist_ok=True)
    out: dict[str, dict] = {}

    def timed(name, df):
        w0, r0 = _shuffle_totals(spark)
        start = time.time()
        from pyspark.sql import Observation

        obs = Observation(f"rows_{name}_{fixdir.replace('/', '_')}")
        df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        df.write.format("noop").mode("overwrite").save()
        n = obs.get["n"]
        dt = round(time.time() - start, 2)
        w1, r1 = _shuffle_totals(spark)
        out[name] = {
            "s": dt,
            "rows": n,
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        }
        print(f"[iso] {name}: {dt}s rows={n} shufW={out[name]['shuffle_write_mb']}MB")

    # ---------- fixtures (UNTIMED standing-index training) ----------
    emb = llm_ops._emb(spark, sf_dir)
    standing_e = emb.filter(F.col("vec_id") % 10 < 8)
    delta_e = emb.filter(F.col("vec_id") % 10 >= 8)
    coarse, books, codes = ivf_pq_build(
        standing_e,
        coarse_k=llm_ops.IVFPQ_COARSE_K,
        coarse_iters=llm_ops.IVFPQ_COARSE_ITERS,
        m=llm_ops.PQ_M,
        ksub=llm_ops.PQ_KSUB,
        pq_iters=llm_ops.PQ_ITERS,
    )
    coarse.write.mode("overwrite").parquet(f"{fixdir}/ivfpq_coarse.parquet")
    books.write.mode("overwrite").parquet(f"{fixdir}/ivfpq_books.parquet")
    codes.write.mode("overwrite").parquet(f"{fixdir}/ivfpq_codes.parquet")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    standing_d = d.filter(F.col("doc_id") % 10 < 8)
    delta_d = d.filter(F.col("doc_id") % 10 >= 8)
    tf0, st0 = text_ops.bm25_index(standing_d)
    tf0.write.mode("overwrite").parquet(f"{fixdir}/bm25_tf.parquet")
    st0.write.mode("overwrite").parquet(f"{fixdir}/bm25_stats.parquet")
    print("[iso] standing-index fixtures persisted (untimed)")

    coarse_p = spark.read.parquet(f"{fixdir}/ivfpq_coarse.parquet")
    books_p = spark.read.parquet(f"{fixdir}/ivfpq_books.parquet")
    codes_p = spark.read.parquet(f"{fixdir}/ivfpq_codes.parquet")
    st_p = spark.read.parquet(f"{fixdir}/bm25_stats.parquet")

    # ---------- timed delta ops ----------
    timed("q_ivf_pq_delta@iso", ivf_pq_encode_delta(delta_e, coarse_p, books_p))

    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    approx = ivf_pq_search(
        coarse_p, books_p, codes_p, qvec,
        nprobe=llm_ops.IVFPQ_NPROBE, k=llm_ops.PQ_K,
    )
    qlit = F.array(*[F.lit(x) for x in qvec])
    exact = (
        standing_e.select(
            "vec_id",
            _pair_d2(
                F.transform("embedding", lambda v: v.cast("double")), qlit
            ).alias("_d2"),
        )
        .orderBy(F.asc("_d2"), F.asc("vec_id"))
        .limit(llm_ops.PQ_K)
    )
    recall = approx.join(
        exact.select("vec_id"), "vec_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    timed("q_ivf_pq_recall@iso", recall)

    # the delta-side build + 1-row stats fold — what an append writes
    tf_d, st_d = text_ops.bm25_index(delta_d)
    folded_stats = st_p.unionByName(st_d).agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    )
    timed("q_bm25_index_delta@iso", tf_d.crossJoin(folded_stats))

    # r9: substring-dedup index delta (standing kept-chunk index
    # persisted untimed; timed = delta chunking + ownership anti-join
    # + delta-only rebuild). Monotone-id split per the contract.
    mx = int(d.agg(F.max("doc_id")).collect()[0][0])
    thr = mx * 4 // 5
    text_ops.substring_kept_chunks(
        d.filter(F.col("doc_id") <= thr)
    ).write.mode("overwrite").parquet(f"{fixdir}/substr_chunks.parquet")
    chunks_p = spark.read.parquet(f"{fixdir}/substr_chunks.parquet")
    _fold_s, sub_res = text_ops.substring_index_delta(
        chunks_p, d.filter(F.col("doc_id") > thr)
    )
    timed("q_substring_index_delta@iso", sub_res)

    # r9: banded-hamming index delta (standing hash table persisted
    # untimed; timed = delta-side banding probe + exact verify) —
    # the q_ahash_neardup planted-triplet stand-in hash frame.
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.multimodal import (
        hamming_index_delta,
    )

    h60 = F.conv(
        F.substring(F.md5(F.floor(F.col("doc_id") / 3).cast("string")), 1, 15),
        16,
        10,
    ).cast("bigint")
    hashes = d.select(
        "doc_id", h60.bitwiseXOR((F.col("doc_id") % 3) * 3).alias("ahash")
    )
    hashes.filter(F.col("doc_id") % 10 < 8).write.mode("overwrite").parquet(
        f"{fixdir}/ahash_standing.parquet"
    )
    standing_h = spark.read.parquet(f"{fixdir}/ahash_standing.parquet")
    _fold_h, ham_pairs = hamming_index_delta(
        standing_h,
        hashes.filter(F.col("doc_id") % 10 >= 8),
        max_hamming=3,
        n_bands=4,
        id_col="doc_id",
    )
    timed("q_ahash_index_delta@iso", ham_pairs)
    return out


def main() -> None:
    from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

    value_flags = {"--queries", "--base", "--base-k"}
    opts, args, it = {}, [], iter(sys.argv[1:])
    for a in it:
        if a in value_flags:
            opts[a] = next(it)
        elif a.startswith("--"):
            opts[a] = True
        else:
            args.append(a)
    k = int(args[0]) if args else 10
    outdir = args[1] if len(args) > 1 else f"/tmp/stress_x{k}"
    queries = HEAVY + DEEP if "--deep" in opts else HEAVY
    if "--queries" in opts:
        queries = opts["--queries"].split(",")
    base_dir = opts.get("--base", SRC)
    base_k = int(opts.get("--base-k", 1))  # data multiple of baseline dir
    # UI on: the REST API is the shuffle-bytes source; driver mem sized
    # for the K=100 single-JVM run (local mode driver == all executors)
    conf = {
        "spark.ui.enabled": "true",
        "spark.ui.port": "4050",
        # shuffle deltas need every stage retained (see bench.py)
        "spark.ui.retainedStages": "50000",
        "spark.ui.retainedJobs": "50000",
    }
    if "--no-broadcast" in opts:
        # Force the 100 TB-shape plan at every scale: with broadcast off,
        # no join flips broadcast->SMJ between the two runs, so the
        # shuffle ratio isolates algorithmic scaling from plan transitions.
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
        conf["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
    spark = get_spark("scale_stress", cpus=32, extra_conf=conf)
    if "--run-only" not in opts:
        build(spark, k, outdir)
    growth = k / base_k  # data-volume multiple between the two runs
    blabel = f"x{base_k}" if base_k > 1 else "sf0.1"
    if "--isolated" in opts:
        # delta-isolated incremental rows only (standing index persisted
        # untimed; see run_isolated) — replaces the full query set
        base = run_isolated(spark, base_dir, f"/tmp/iso_fix_{blabel}")
        big = run_isolated(spark, outdir, f"/tmp/iso_fix_x{k}")
        queries = sorted(base)
    else:
        base = run(spark, base_dir, queries)
        big = run(spark, outdir, queries)
    report = {
        name: {
            f"{blabel}_s": base[name]["s"],
            f"x{k}_s": big[name]["s"],
            "scale_factor": round(big[name]["s"] / max(base[name]["s"], 1e-9), 1),
            f"{blabel}_shufW_mb": base[name]["shuffle_write_mb"],
            f"x{k}_shufW_mb": big[name]["shuffle_write_mb"],
            "shuffle_scale": round(
                big[name]["shuffle_write_mb"]
                / max(base[name]["shuffle_write_mb"], 1e-3),
                1,
            ),
        }
        for name in queries
    }
    print(json.dumps({"k": k, "base_k": base_k, "queries": report}, indent=2))
    # gates: wall time worse than ~2x data growth, or shuffle volume
    # growing super-linearly (> 1.5x data growth, min 50MB to skip noise).
    #
    # PLAN_TRANSITION_OK: the vs-sf0.1 ratio is a toy-BASELINE artifact —
    # either every join side broadcasts at sf0.1 (shuffle ~0 until the
    # legitimate broadcast->SMJ flip) or partial aggregation collapses the
    # tiny input far below the per-(map x group) floor. Every entry was
    # verified LINEAR with the `--no-broadcast --base /tmp/stress_x10
    # --base-k 10` two-scale probe (ratio for 10x data given per entry).
    # Applies ONLY to the sf0.1 baseline (base_k == 1) — a two-scale run
    # still gates these.
    plan_transition_ok = {
        # broadcast->SMJ transitions (r3 probe: 10.0x / 10.5x)
        "q_tpch_q21_waiting_suppliers",
        "q_corpus_pipeline",
        # r4 probe 11.4x: tiny dup-window set broadcasts at toy scale only
        "q_substring_dedup",
        # r7 probe 11.1x (45.6->504.7 MB for 10x): the sf0.1 base's
        # 2.8 MB fingerprint shuffle is a partial-agg toy-scale floor
        "q_winnow_incremental",
        # r7 probes (x10->x100, --no-broadcast): sub-MB sf0.1 bases are
        # partial-agg floors; absolute bytes converge to linear-in-input
        "q_hash_embed_sim",   # 13.2x for 10x (11.6->153.3 MB)
        "q_hll_distinct",     # 11.1x for 10x (13.4->148.8 MB)
        "q_lm_score",         # 12.7x for 10x (67.9->860.5 MB)
        # partial-agg baseline artifacts (r4 probe: 9.5x / 11.3x —
        # 420->3998 MB and 13.9->156.7 MB for 10x data)
        "q_weekly_rollup",
        "q_time_gapfill",
    }
    # AGG_CEILING_OK: distinct-projection shapes whose shuffle is bounded
    # by min(input rows, maps x groups). The harness scales BOTH maps and
    # groups with K, so the RATIO reads super-linear at every pair of
    # scales (r4 two-scale probe: 24.4x for 10x data, 7.0->170.9 MB)
    # while ABSOLUTE bytes converge to the linear-in-input ceiling —
    # x100 moves ~165-171 MB across runs ~= the 160 MB of raw
    # (user_id, ts) column bytes, AT the ceiling, never past it. With
    # maps ∝ input (fixed partition size, the production config) the
    # shape is linear, so these are exempt at ANY base_k; the per-entry
    # ceiling number is the evidence a regression triager re-checks.
    agg_ceiling_ok = {
        "q_retention_cohorts",
    }
    # PROBE_LINEAR_OK: broadcast->SMJ transitions that fire BETWEEN the
    # two-scale points (not at the sf0.1 toy base), each verified linear
    # with the `--no-broadcast` probe at the same pair of scales (the
    # forced-SMJ plan is the 100 TB shape at every scale). Applies at
    # any base_k; the per-entry ratio is the re-check evidence.
    # r12: q_tokenizer_eval's entry removed — the vocabulary-permuting
    # doc scaler (fixed word population) made the row plainly linear
    # (x10->x100 re-probe: 9.5x wall / 12.7x shufW for 10x data), so
    # the gate applies to it again.
    probe_linear_ok: set[str] = set()
    bad = {n: r for n, r in report.items() if r["scale_factor"] > 2 * growth}
    shuf_bad = {
        n: r for n, r in report.items()
        if r[f"x{k}_shufW_mb"] > 50 and r["shuffle_scale"] > 1.5 * growth
        and not (base_k == 1 and n in plan_transition_ok)
        and n not in agg_ceiling_ok
        and n not in probe_linear_ok
    }
    exempt = [n for n in plan_transition_ok
              if base_k == 1 and n in report and report[n]["shuffle_scale"] > 1.5 * growth]
    if exempt:
        print(f"plan-transition exempt (probe-verified linear): {sorted(exempt)}")
    ceiling = [n for n in agg_ceiling_ok
               if n in report and report[n]["shuffle_scale"] > 1.5 * growth]
    if ceiling:
        print(f"agg-ceiling exempt (bytes at the linear-in-input ceiling): {sorted(ceiling)}")
    probed = [n for n in probe_linear_ok
              if n in report and report[n]["shuffle_scale"] > 1.5 * growth]
    if probed:
        print(f"probe-linear exempt (--no-broadcast two-scale verified): {sorted(probed)}")
    if bad or shuf_bad:
        print(f"NONLINEAR wall: {sorted(bad)}  shuffle: {sorted(shuf_bad)}")
        sys.exit(1)
    print("linear-or-better across the board (wall + shuffle bytes)")


if __name__ == "__main__":
    main()
