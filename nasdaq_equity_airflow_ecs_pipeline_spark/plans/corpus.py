"""End-to-end training-corpus curation — the composed pipeline a user
actually runs, not just its individual operators.

Stage chain (each one an existing, individually oracle-checked operator):

    raw corpus (eval set held out)
      -> quality filter        (operators/text.py quality_features)
      -> exact dedup           (content-hash, min-id survivor)
      -> near-dup dedup        (MinHash -> LSH pairs -> connected
                                components -> canonical doc per cluster)
      -> decontamination       (drop docs sharing any 5-gram with the
                                eval set — equi-join, no pairwise scan)
      -> training-mix sampling (operators/sampling.py, hash-threshold)
      -> sequence packing      (operators/packing.py, concat-and-chunk)

Everything stays one lazy DataFrame composition: Catalyst sees the whole
chain, so column pruning flows through every stage (the text column is
only materialized where a stage hashes it) and nothing is collected on
the driver. The funnel census (``curate_corpus_funnel``) is the
shape-auditing output a data engineer watches: docs/tokens surviving
each stage, plus the final sequence count.

Scale notes: the per-stage shapes are each operator's (one hash-agg for
exact dedup, banded equi-join for LSH, broadcast for the eval-set join,
narrow filter for sampling, one shuffle + window for packing). The chain
introduces NO extra shuffles beyond its stages' own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import lsh
from ..operators import text as text_ops
from ..operators.graph import dedup_clusters
from ..operators.packing import pack_sequences
from ..operators.sampling import stratified_sample

# Stage frames pin at reuse boundaries; a bench/stress loop calls
# these builders repeatedly in one session, so without cleanup each call
# pins its caches for the session lifetime (the zorder leak class,
# ADVICE r3). The registry bounds that: entering a builder unpersists
# the frames its PREVIOUS invocation cached — at most one call's frames
# stay resident, and the frames a caller is still consuming lazily are
# only released once it asks for a fresh pipeline.
#
# Pinning is an EAGER localCheckpoint, not persist() (optimization
# round 12, guide §3.3/§5): a persisted frame keeps its full logical
# lineage, and the funnel's union-of-stage-aggregates plus the
# stage-to-stage joins re-embed every cached ancestor's plan
# RECURSIVELY — the v4 funnel's physical plan ran to ~96k lines, and
# at sf0.01 (where compute is trivial) the chain queries still took
# 10-50 s, i.e. almost pure driver planning/analysis. The eager
# checkpoint makes every downstream plan see a LogicalRDD leaf (the
# same fix that cured v8's explainString OOM in r11, applied at every
# stage boundary). Results are unchanged — the checkpoint pins exactly
# the frame persist() pinned. Checkpoint RDD storage is released when
# the registry clears its references (ContextCleaner reclaims the
# RDDs once the Python refs drop).
_CACHED: dict[str, list] = {"v1": [], "v2": [], "v3": [], "v4": [], "v6": [], "idx": []}


def _persist(frame, slot: str):
    pinned = frame.localCheckpoint(eager=True)
    # DataFrame.unpersist() is a CacheManager call and a NO-OP for
    # localCheckpointed frames — their storage is an RDD-level persist
    # that survives the DataFrame ref (ADVICE r12, verified: the
    # checkpoint RDD stays in getPersistentRDDs after unpersist() and
    # GC). Stash the checkpoint RDD itself so _release can free the
    # MEMORY_AND_DISK blocks immediately, restoring the registry's
    # "at most one call's frames stay resident" guarantee.
    try:
        ckpt_rdd = pinned._jdf.queryExecution().analyzed().rdd()
    except Exception:
        ckpt_rdd = None
    _CACHED[slot].append((pinned, ckpt_rdd))
    return pinned


def _release(slot: str) -> None:
    for f, ckpt_rdd in _CACHED[slot]:
        try:
            if ckpt_rdd is not None:
                ckpt_rdd.unpersist(False)
            f.unpersist()
        except Exception:
            pass  # session already stopped
    _CACHED[slot].clear()


def curate_corpus(
    docs: DataFrame,
    mix_rates: dict[str, float],
    mix_default: float = 0.1,
    quality_min: float = 0.6,
    eval_max_id: int = 10,
    seq_len: int = 512,
    num_shards: int = 8,
) -> dict[str, DataFrame]:
    """Run the curation chain; returns every stage's surviving doc set
    (doc_id, n_tokens, lang) plus the final packed spans, keyed by stage
    name — callers pick the frame they need, the funnel query aggregates
    all of them."""
    _release("v1")
    base = docs.select(
        "doc_id", "text", "lang", text_ops.token_count("text").alias("n_tokens")
    )
    corpus = base.filter(F.col("doc_id") >= eval_max_id)

    # The funnel census evaluates every stage's frame AND each stage
    # feeds the next, so the shared prefixes are consumed 2-5x — Spark
    # does not CSE across union branches, so persist() the reused
    # survivor sets (spill-safe MEMORY_AND_DISK; at cluster scale these
    # are the frames you'd materialize to the lake between jobs anyway).
    quality = (
        text_ops.quality_features(corpus, "text")
        .filter(F.col("q_score") >= quality_min)
        .select("doc_id", "text", "lang", "n_tokens")
    )
    quality = _persist(quality, "v1")

    exact_survivors = (
        quality.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(quality, "doc_id")
        .select("doc_id", "text", "lang", "n_tokens")
    )
    exact_survivors = _persist(exact_survivors, "v1")

    sigs = lsh.minhash_signatures(exact_survivors)
    pairs = lsh.lsh_candidate_pairs(sigs)
    neardup = (
        dedup_clusters(exact_survivors, pairs)
        .filter(F.col("is_canonical"))
        .select("doc_id")
        .join(exact_survivors, "doc_id")
        .select("doc_id", "text", "lang", "n_tokens")
    )
    neardup = _persist(neardup, "v1")

    # eval 5-grams come from the held-out slice of the RAW input
    ev_tok = base.filter(F.col("doc_id") < eval_max_id).select(
        "doc_id", lsh.tokens("text").alias("toks")
    )
    ev_sh = (
        ev_tok.select(
            F.explode(lsh.shingles_from_tokens(F.col("toks"), 5)).alias("s")
        )
        .distinct()
    )
    c_tok = neardup.select("doc_id", lsh.tokens("text").alias("toks"))
    contaminated = (
        c_tok.select(
            "doc_id", F.explode(lsh.shingles_from_tokens(F.col("toks"), 5)).alias("s")
        )
        .join(F.broadcast(ev_sh), "s")
        .select("doc_id")
        .distinct()
    )
    clean = _persist(
        neardup.join(contaminated, "doc_id", "left_anti").select(
            "doc_id", "lang", "n_tokens"
        ),
        "v1",
    )

    mixed = stratified_sample(
        clean, mix_rates, strata_col="lang", key_col="doc_id",
        default_rate=mix_default,
    ).select("doc_id", "lang", "n_tokens")

    packed = pack_sequences(mixed, seq_len=seq_len, num_shards=num_shards)

    return {
        "raw": corpus.select("doc_id", "lang", "n_tokens"),
        "quality": quality.select("doc_id", "lang", "n_tokens"),
        "exact_dedup": exact_survivors.select("doc_id", "lang", "n_tokens"),
        "neardup_dedup": neardup.select("doc_id", "lang", "n_tokens"),
        "decontaminated": clean,
        "mixed": mixed,
        "packed": packed,
    }


def curate_corpus_v2(
    docs: DataFrame,
    targets: dict[str, float],
    importance_min: float = 1.0,
    alpha: float = 0.5,
    max_line_docs: int = 2,
    n_buckets: int = 1024,
) -> dict[str, DataFrame]:
    """The round-4 curation family composed end-to-end — the web-crawl
    front half that runs BEFORE ``curate_corpus``'s near-dup/packing
    back half:

        raw (doc_id, url, text, lang, source)
          -> URL dedup            (canonical-URL min-id survivor)
          -> line dedup           (cross-corpus boilerplate lines removed;
                                   docs emptied entirely leave the corpus)
          -> importance filter    (DSIR-lite score vs the 'en' target
                                   distribution, keep >= importance_min)
          -> mixture resample     (deterministic hash sample toward the
                                   target source mixture)

    Returns each stage's surviving (doc_id, text, lang, source) frame.
    Stage plans are the operators' own (one hash-agg + survivor join,
    line-hash join, bucket-table join, k-row weights join) — the chain
    adds no extra shuffles; reused stage frames persist() at the
    boundaries a production pipeline would materialize to the lake."""
    from ..operators.curation import (
        canonicalize_url,
        importance_weights,
        line_dedup,
        mixture_weights,
        weighted_resample,
    )

    _release("v2")
    base = docs.select("doc_id", "url", "text", "lang", "source")
    with_canon = base.withColumn("canonical_url", canonicalize_url("url"))
    url_surv = (
        with_canon.groupBy("canonical_url")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(base, "doc_id")
        .select("doc_id", "text", "lang", "source")
    )
    url_surv = _persist(url_surv, "v2")

    ld = line_dedup(url_surv, max_docs=max_line_docs)
    line_kept = (
        ld.filter(F.col("n_removed") < F.col("n_lines"))
        .join(url_surv.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", F.col("kept_text").alias("text"), "lang", "source")
    )
    line_kept = _persist(line_kept, "v2")

    imp = importance_weights(
        line_kept, F.col("lang") == "en", n_buckets=n_buckets
    )
    important = _persist(
        line_kept.join(
            imp.filter(F.col("importance") >= importance_min).select("doc_id"),
            "doc_id",
        ),
        "v2",
    )

    weights = mixture_weights(important, "source", targets)
    resampled = weighted_resample(
        important, weights, source_col="source", key_col="doc_id", alpha=alpha
    )

    return {
        "raw": base.select("doc_id", "text", "lang", "source"),
        "url_dedup": url_surv,
        "line_dedup": line_kept,
        "importance": important,
        "resampled": resampled,
    }


_STAGE_ORDER_V2 = ["raw", "url_dedup", "line_dedup", "importance", "resampled"]


def curate_corpus_v2_funnel(stages: dict[str, DataFrame]) -> DataFrame:
    """(stage_id, stage, n_docs, n_tokens) census over the v2 chain;
    n_tokens counts each stage's SURVIVING text (so the line-dedup row
    shows tokens removed line-wise, not just docs dropped)."""
    from ..operators import text as text_ops

    out = None
    for i, name in enumerate(_STAGE_ORDER_V2):
        census = stages[name].agg(
            F.lit(i).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(
                F.sum(text_ops.token_count("text")), F.lit(0)
            ).alias("n_tokens"),
        )
        out = census if out is None else out.unionByName(census)
    return out


_STAGE_ORDER = [
    "raw", "quality", "exact_dedup", "neardup_dedup",
    "decontaminated", "mixed",
]


def curate_corpus_funnel(stages: dict[str, DataFrame]) -> DataFrame:
    """(stage_id, stage, n_docs, n_tokens) census over the chain; the
    final row counts packed training sequences (n_docs = sequences,
    n_tokens = total packed tokens)."""
    out = None
    for i, name in enumerate(_STAGE_ORDER):
        census = stages[name].agg(
            F.lit(i).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
        )
        out = census if out is None else out.unionByName(census)
    packed = stages["packed"]
    seqs = (
        packed.groupBy("shard")
        .agg((F.max("last_seq") + 1).alias("n_seqs"), F.sum("n_tokens").alias("t"))
        .agg(
            F.lit(len(_STAGE_ORDER)).alias("stage_id"),
            F.lit("packed_sequences").alias("stage"),
            F.coalesce(F.sum("n_seqs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("t"), F.lit(0)).alias("n_tokens"),
        )
    )
    return out.unionByName(seqs)


def curate_corpus_v3(
    docs: DataFrame,
    emb: DataFrame,
    neardup_threshold: float = 0.4,
    cluster_target: int = 250,
    budget: int = 10_000,
    n_shards: int = 8,
) -> dict[str, DataFrame]:
    """The round-5 curation family composed end-to-end — the
    model-assisted back half that runs AFTER ``curate_corpus_v2``'s
    rule-based front half:

        raw (doc_id, text, lang, source) + embeddings (vec_id ~ doc_id)
          -> classifier filter   (hashed-linear quality score >= 0)
          -> semantic dedup      (SemDeDup: cluster-scoped embedding
                                  near-dup removal, k scales with the
                                  surviving corpus)
          -> token-budget cut    (priority-ordered prefix-sum cut)
          -> balanced shards     (equal-token output shard assignment)

    Stage plans are the operators' own (narrow scan, broadcast-assign +
    cluster-equi-join, two two-pass prefix sums); centroids are the
    ``k`` lowest surviving vec_ids via a distributed partial top-k
    (``orderBy().limit(k)`` — TakeOrderedAndProject, never a global
    single-task window). Returns each stage's surviving frame."""
    from ..operators.curation import balanced_shards, token_budget_select
    from ..operators.ordering import shuffle_key
    from ..operators.similarity import semantic_dedup

    _release("v3")
    base = docs.select("doc_id", "text", "lang", "source")
    kept = _persist(
        base.filter(text_ops.classifier_quality_score("text") >= 0.0), "v3"
    )

    kept_emb = _persist(
        emb.join(kept.select(F.col("doc_id").alias("vec_id")), "vec_id"), "v3"
    )
    n = kept_emb.count()
    k = max(8, -(-n // cluster_target))
    centroids = (
        kept_emb.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    surv = semantic_dedup(kept_emb, centroids, threshold=neardup_threshold)
    sem = _persist(
        kept.join(surv.select(F.col("vec_id").alias("doc_id")), "doc_id"), "v3"
    )

    sized = sem.select(
        "doc_id",
        "text",
        "lang",
        "source",
        text_ops.token_count("text").cast("long").alias("n_tokens"),
        shuffle_key("doc_id").alias("pri"),
    )
    budgeted = _persist(
        token_budget_select(sized, budget, ["pri", "doc_id"]), "v3"
    )
    sharded = balanced_shards(
        budgeted.drop("cum_tokens"), n_shards, ["pri", "doc_id"]
    )
    return {
        "raw": base,
        "classifier": kept,
        "semdedup": sem,
        "budget": budgeted,
        "sharded": sharded,
    }


_STAGE_ORDER_V3 = ["raw", "classifier", "semdedup", "budget"]


def curate_corpus_v3_funnel(stages: dict[str, DataFrame]) -> DataFrame:
    """(stage_id, stage, n_docs, n_tokens) census over the v3 chain.
    The final row audits the SHARD assignment: n_docs = number of
    non-empty shards, n_tokens = the heaviest shard's token mass (the
    balance figure a data engineer actually watches)."""
    out = None
    for i, name in enumerate(_STAGE_ORDER_V3):
        fr = stages[name]
        tok = (
            F.sum("n_tokens")
            if "n_tokens" in fr.columns
            else F.sum(text_ops.token_count("text"))
        )
        census = fr.agg(
            F.lit(i).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(tok, F.lit(0)).cast("long").alias("n_tokens"),
        )
        out = census if out is None else out.unionByName(census)
    mass = stages["sharded"].groupBy("shard").agg(
        F.sum("n_tokens").alias("m")
    )
    final = mass.agg(
        F.lit(len(_STAGE_ORDER_V3)).alias("stage_id"),
        F.lit("sharded").alias("stage"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.max("m"), F.lit(0)).cast("long").alias("n_tokens"),
    )
    return out.unionByName(final)


def curate_corpus_v4(
    docs: DataFrame,
    emb: DataFrame,
    lm_max_avg_bits_x100: int,
    neardup_threshold: float = 0.4,
    cluster_target: int = 250,
    budget: int = 10_000,
    n_shards: int = 8,
    max_line_docs: int = 2,
    lm_order: int = 2,
) -> dict[str, DataFrame]:
    """The full CCNet-ordered curation product (Wenzek et al. 2020:
    dedup -> LM perplexity filter -> mixture/selection), composing the
    rule-based front, both model-assisted quality gates, and the
    selection back half:

        raw (doc_id, text, lang, source) + embeddings (vec_id ~ doc_id)
          -> line dedup          (cross-corpus boilerplate lines removed —
                                  the rule-based front half, CCNet's own
                                  paragraph-dedup stage; emptied docs
                                  leave the corpus)
          -> classifier filter   (hashed-linear quality score >= 0)
          -> LM gate             (bigram LM trained on the surviving 'en'
                                  slice; keep quantized mean surprisal
                                  avg_bits_x100 <= lm_max_avg_bits_x100 —
                                  CCNet's perplexity band, engine-exact)
          -> semantic dedup      (SemDeDup, k scales with survivors)
          -> token-budget cut    (priority-ordered prefix-sum cut)
          -> balanced shards     (equal-token output shard assignment)

    Quality-gate placement mirrors the reference's validate-between-
    stages DAG (docker/dags/nasdaq_stock_pipeline_with_gx.py:280-309):
    every gate runs on the previous stage's SURVIVORS, so the LM trains
    only on line-deduped, classifier-kept text — the trusted-slice
    bootstrap CCNet actually uses. Stage plans are the operators' own
    (line-hash join + rebuild; narrow scan; bigram explode + two
    merge-hinted equi-joins + per-doc agg; broadcast-assign +
    cluster-equi-join; two two-pass prefix sums); the one action is the
    LM's 1-row vocabulary count. Returns each stage's surviving frame.
    """
    from ..operators.curation import (
        balanced_shards,
        line_dedup,
        token_budget_select,
    )
    from ..operators.lm_score import (
        lm_filter,
        lm_filter3,
        train_bigram_lm,
        train_trigram_lm,
    )
    from ..operators.ordering import shuffle_key
    from ..operators.similarity import semantic_dedup

    if lm_order not in (2, 3):
        # a typo here would silently change CURATION SEMANTICS (which
        # LM gates the corpus), so unsupported orders are an error,
        # not a fallback
        raise ValueError(f"lm_order must be 2 or 3, got {lm_order!r}")
    _release("v4")
    base = docs.select("doc_id", "text", "lang", "source")
    ld = line_dedup(base, max_docs=max_line_docs)
    line_kept = _persist(
        ld.filter(F.col("n_removed") < F.col("n_lines"))
        .join(base.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", F.col("kept_text").alias("text"), "lang", "source"),
        "v4",
    )
    kept = _persist(
        line_kept.filter(text_ops.classifier_quality_score("text") >= 0.0),
        "v4",
    )
    if lm_order == 3:
        # v5: the trigram+backoff tier (one order closer to CCNet's
        # 5-gram KN), same trusted-slice bootstrap and gate semantics
        model3 = train_trigram_lm(kept.filter(F.col("lang") == "en"))
        lm_kept = _persist(
            lm_filter3(kept, model3, lm_max_avg_bits_x100), "v4"
        )
    else:
        model = train_bigram_lm(kept.filter(F.col("lang") == "en"))
        lm_kept = _persist(lm_filter(kept, model, lm_max_avg_bits_x100), "v4")

    kept_emb = _persist(
        emb.join(lm_kept.select(F.col("doc_id").alias("vec_id")), "vec_id"),
        "v4",
    )
    n = kept_emb.count()
    k = max(8, -(-n // cluster_target))
    centroids = (
        kept_emb.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    surv = semantic_dedup(kept_emb, centroids, threshold=neardup_threshold)
    sem = _persist(
        lm_kept.join(surv.select(F.col("vec_id").alias("doc_id")), "doc_id"),
        "v4",
    )

    sized = sem.select(
        "doc_id",
        "text",
        "lang",
        "source",
        text_ops.token_count("text").cast("long").alias("n_tokens"),
        shuffle_key("doc_id").alias("pri"),
    )
    budgeted = _persist(
        token_budget_select(sized, budget, ["pri", "doc_id"]), "v4"
    )
    sharded = balanced_shards(
        budgeted.drop("cum_tokens"), n_shards, ["pri", "doc_id"]
    )
    return {
        "raw": base,
        "line_dedup": line_kept,
        "classifier": kept,
        "lm_gate": lm_kept,
        "semdedup": sem,
        "budget": budgeted,
        "sharded": sharded,
    }


def curate_corpus_v6(
    docs: DataFrame,
    emb: DataFrame,
    neardup_threshold: float = 0.4,
    cluster_target: int = 250,
    budget: int = 10_000,
    n_shards: int = 8,
    max_line_docs: int = 2,
    bucket_width: float = 25.0,
    quality_gate=None,
    post_line_stages=None,
    budget_select=None,
) -> dict[str, DataFrame]:
    """The v4 CCNet chain with the selection CCNet ACTUALLY uses
    (Wenzek et al. 2020 §4.4) in place of the fixed perplexity
    threshold: interpolated Kneser-Ney scoring + per-language
    perplexity TERCILES, keeping the head and middle buckets —
    distribution-relative, so the gate adapts to each language's score
    range instead of hard-coding a bits threshold:

        raw -> line dedup -> classifier filter
            -> KN tercile select  (train KN trigram LM on the
                                   surviving 'en' slice; per-lang
                                   head/middle/tail via the histogram
                                   quantile sketch; DROP the tail)
            -> semantic dedup -> token-budget cut -> balanced shards

    Same stage discipline as v4 (every gate runs on the previous
    stage's survivors; the LM trains on line-deduped, classifier-kept
    text); stage plans are the operators' own. Returns each stage's
    surviving frame under the v4 funnel's stage keys ('lm_gate' is the
    tercile selection here)."""
    from ..operators.curation import (
        balanced_shards,
        line_dedup,
        token_budget_select,
    )
    from ..operators.lm_score import ppl_buckets, train_kn_trigram_lm
    from ..operators.ordering import shuffle_key
    from ..operators.similarity import semantic_dedup

    _release("v6")
    base = docs.select("doc_id", "text", "lang", "source")
    ld = line_dedup(base, max_docs=max_line_docs)
    line_kept = _persist(
        ld.filter(F.col("n_removed") < F.col("n_lines"))
        .join(base.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", F.col("kept_text").alias("text"), "lang", "source"),
        "v6",
    )
    # optional post-line-dedup stages, in order (v8 injects span
    # decontamination here; v9 prepends the Gopher + C4 rule front):
    # same frame contract per stage — (doc_id, text, lang, source),
    # text possibly rewritten, a subset of the input's docs.
    # localCheckpoint, NOT persist: a persisted frame keeps its logical
    # lineage, and the funnel's union-of-stage-aggregates embeds every
    # cached ancestor's plan RECURSIVELY per census row — one extra
    # decon level pushed the AQE explain-string past a 1 GB heap
    # (OOM in QueryExecution.explainString, measured; v7 sat just
    # under it). The eager checkpoint makes downstream plans see a
    # LogicalRDD leaf, resetting the textual plan depth below v7's —
    # and keeps it flat however many stages the front adds (v9 is 3).
    injected: dict[str, DataFrame] = {}
    gate_in = line_kept
    for stage_name, stage_fn in (post_line_stages or []):
        gate_in = _persist(stage_fn(gate_in), "v6")
        injected[stage_name] = gate_in
    # quality gate: default = the placeholder-weight expression score;
    # v7 injects the TRAINED-classifier gate here (same stage, same
    # survivor frame contract: a subset of the input, schema unchanged)
    kept = _persist(
        gate_in.filter(text_ops.classifier_quality_score("text") >= 0.0)
        if quality_gate is None
        else quality_gate(gate_in),
        "v6",
    )
    model = train_kn_trigram_lm(kept.filter(F.col("lang") == "en"))
    buckets = ppl_buckets(kept, model, width=bucket_width)
    lm_kept = _persist(
        kept.join(
            buckets.filter(F.col("ppl_bucket") != "tail").select("doc_id"),
            "doc_id",
        ),
        "v6",
    )

    kept_emb = _persist(
        emb.join(lm_kept.select(F.col("doc_id").alias("vec_id")), "vec_id"),
        "v6",
    )
    n = kept_emb.count()
    k = max(8, -(-n // cluster_target))
    centroids = (
        kept_emb.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    surv = semantic_dedup(kept_emb, centroids, threshold=neardup_threshold)
    sem = _persist(
        lm_kept.join(surv.select(F.col("vec_id").alias("doc_id")), "doc_id"),
        "v6",
    )

    sized = sem.select(
        "doc_id",
        "text",
        "lang",
        "source",
        text_ops.token_count("text").cast("long").alias("n_tokens"),
        shuffle_key("doc_id").alias("pri"),
    )
    budgeted = _persist(
        token_budget_select(sized, budget, ["pri", "doc_id"])
        if budget_select is None  # v10 swaps in the UniMax per-language cut
        else budget_select(sized),
        "v6",
    )
    sharded = balanced_shards(
        budgeted.drop("cum_tokens"), n_shards, ["pri", "doc_id"]
    )
    stages = {
        "raw": base,
        "line_dedup": line_kept,
        "classifier": kept,
        "lm_gate": lm_kept,
        "semdedup": sem,
        "budget": budgeted,
        "sharded": sharded,
    }
    stages.update(injected)
    return stages


def curate_corpus_v7(
    docs: DataFrame,
    emb: DataFrame,
    train_docs: DataFrame | None = None,
    clf_buckets: int = 512,
    clf_seed: str = "clf-v1",
    clf_steps: int = 16,
    clf_lr_num: int = 4,
    clf_lr_den: int = 1,
    clf_cb_neg: int = 10,
    **v6_kwargs,
) -> dict[str, DataFrame]:
    """The v6 CCNet chain gating on the TRAINED quality classifier
    (VERDICT r9 #1's capstone): train the hashed-feature fixed-point
    logistic regression in-engine (operators/classifier.py) on
    ``train_docs`` (the labeler corpus — defaults to the chain input,
    the fasttext-wikiref setup where the reference corpus that defines
    'quality' is scored by rules and distilled into token weights),
    then replace the placeholder-weight expression gate with
    ``trained_score``'s keep decision. Every other stage is v6's.

    The trained weight table is a local literal frame (bounded-artifact
    collect, <= clf_buckets+1 rows), so the gate adds one broadcast
    join + one doc-keyed hash-agg to the chain — the same shape as the
    placeholder expression at 100 TB, after a training cost of
    ``clf_steps`` corpus passes paid once per retrain, not per run."""
    from ..operators import classifier as clf

    td = (train_docs if train_docs is not None else docs).select(
        "doc_id", "text"
    )
    weights = clf.train_logreg_fixed_point(
        clf.hashed_token_feature_arrays(
            td, n_buckets=clf_buckets, seed=clf_seed
        ),
        clf.rule_labels(td),
        steps=clf_steps,
        lr_num=clf_lr_num,
        lr_den=clf_lr_den,
        cb_neg=clf_cb_neg,
    )

    def gate(line_kept: DataFrame) -> DataFrame:
        scored = clf.trained_score(
            line_kept, weights, n_buckets=clf_buckets, seed=clf_seed
        )
        return line_kept.join(
            scored.filter(F.col("kept")).select("doc_id"), "doc_id"
        )

    return curate_corpus_v6(docs, emb, quality_gate=gate, **v6_kwargs)


_STAGE_ORDER_V8 = [
    "raw", "line_dedup", "decon", "classifier", "lm_gate", "semdedup",
    "budget",
]


def curate_corpus_v8(
    docs: DataFrame,
    emb: DataFrame,
    bench: DataFrame,
    decon_min_len: int = 5,
    **v7_kwargs,
) -> dict[str, DataFrame]:
    """The v7 trained-gate chain with SPAN-LEVEL BENCHMARK
    DECONTAMINATION inserted between line dedup and the classifier
    gate (VERDICT r10 #5 composed into the chain):

        raw (benchmark excluded) -> line dedup
            -> span decontamination  (cut every run shared with the
                                      ``bench`` frame at >= decon_min_len
                                      tokens; docs emptied entirely are
                                      dropped)
            -> trained classifier gate -> KN tercile select
            -> semantic dedup -> token-budget cut -> balanced shards

    ``bench`` is the reference benchmark frame — it is never part of
    the chain input (the caller excludes it) and is never rewritten;
    the chain consumes only its sliding-gram keys
    (operators/text.py:benchmark_gram_index — the frozen artifact,
    broadcast-sized). The decontaminated rebuild joins tokens with
    single spaces, which is why the stage runs AFTER line dedup (the
    newline structure has already been consumed; every later stage
    tokenizes on \\s+ and cannot tell). Stage keys are v7's plus
    'decon' (_STAGE_ORDER_V8 orders the funnel)."""
    from ..operators.text import (
        benchmark_gram_index,
        decontaminate_apply_indexed,
    )

    idx = benchmark_gram_index(bench, min_len=decon_min_len)

    def decon_stage(line_kept: DataFrame) -> DataFrame:
        dec = decontaminate_apply_indexed(
            line_kept, idx, min_len=decon_min_len
        )
        return (
            dec.filter(F.col("kept_text") != "")
            .join(line_kept.select("doc_id", "lang", "source"), "doc_id")
            .select(
                "doc_id", F.col("kept_text").alias("text"), "lang", "source"
            )
        )

    return curate_corpus_v7(
        docs, emb, post_line_stages=[("decon", decon_stage)], **v7_kwargs
    )


_STAGE_ORDER_V9 = [
    "raw", "line_dedup", "gopher", "c4", "decon", "classifier", "lm_gate",
    "semdedup", "budget",
]


def curate_corpus_v9(
    docs: DataFrame,
    emb: DataFrame,
    bench: DataFrame,
    decon_min_len: int = 5,
    gopher_word_min: int = 50,
    gopher_word_max: int = 100_000,
    gopher_stop_min: int = 2,
    c4_flag_words: DataFrame | None = None,
    **v7_kwargs,
) -> dict[str, DataFrame]:
    """The FineWeb-shaped chain (VERDICT r11 #2): the v8 trained-gate +
    decontamination chain with the RULE FRONT composed in front of
    them, in the FineWeb ablation order (rules before model gates —
    cheap narrow filters run first so every expensive stage sees fewer
    docs):

        raw (benchmark excluded) -> line dedup
            -> Gopher front   (all 7 quality rules AND all 13
                               repetition metrics must pass —
                               operators/gopher.py; thresholds are the
                               paper's, with stop_min parameterized the
                               way FineWeb re-ablates per corpus)
            -> C4 front       (line rules rewrite the text, page rules
                               drop docs — operators/c4.py c4_apply)
            -> span decontamination -> trained classifier gate
            -> KN tercile select -> semantic dedup -> token-budget cut
            -> balanced shards

    The Gopher stage is a pure filter (text unchanged: one narrow flag
    projection + one explode/agg for the repetition metrics, both
    doc-local); the C4 stage rewrites text (kept lines only), so it
    runs BEFORE decontamination — the decon gram index then matches
    against exactly the text later stages train on. Funnel census
    gains 'gopher' and 'c4' rows (_STAGE_ORDER_V9)."""
    from ..operators.c4 import c4_apply
    from ..operators.gopher import (
        gopher_quality_flags,
        gopher_repetition_stats,
    )
    from ..operators.text import (
        benchmark_gram_index,
        decontaminate_apply_indexed,
    )

    def gopher_stage(frame: DataFrame) -> DataFrame:
        gk = gopher_quality_flags(
            frame,
            word_min=gopher_word_min,
            word_max=gopher_word_max,
            stop_min=gopher_stop_min,
        ).filter(F.col("keep")).select("doc_id")
        viol = (
            gopher_repetition_stats(frame)
            .filter(~F.col("ok"))
            .select("doc_id")
            .distinct()
        )
        return frame.join(gk, "doc_id", "left_semi").join(
            viol, "doc_id", "left_anti"
        )

    def c4_stage(frame: DataFrame) -> DataFrame:
        out = c4_apply(frame, flag_words=c4_flag_words)
        return out.join(
            frame.select("doc_id", "lang", "source"), "doc_id"
        ).select("doc_id", "text", "lang", "source")

    idx = benchmark_gram_index(bench, min_len=decon_min_len)

    def decon_stage(frame: DataFrame) -> DataFrame:
        dec = decontaminate_apply_indexed(frame, idx, min_len=decon_min_len)
        return (
            dec.filter(F.col("kept_text") != "")
            .join(frame.select("doc_id", "lang", "source"), "doc_id")
            .select(
                "doc_id", F.col("kept_text").alias("text"), "lang", "source"
            )
        )

    return curate_corpus_v7(
        docs,
        emb,
        post_line_stages=[
            ("gopher", gopher_stage),
            ("c4", c4_stage),
            ("decon", decon_stage),
        ],
        **v7_kwargs,
    )


def curate_corpus_v10(
    docs: DataFrame,
    emb: DataFrame,
    bench: DataFrame,
    unimax_budget_num: int = 9,
    unimax_budget_den: int = 10,
    unimax_cap_x100: int = 100,
    group_col: str = "lang",
    **v9_kwargs,
) -> dict[str, DataFrame]:
    """The v9 FineWeb-shaped chain with the GLOBAL token-budget cut
    replaced by UniMax per-language allocation (Chung et al. 2023,
    operators/curation.py:unimax_allocation) — the final mix is
    budgeted per LANGUAGE (each language capped at its epoch limit,
    the remainder waterfilled), not by one corpus-wide prefix that a
    dominant language would monopolize.

    The 'budget' stage becomes: one group-keyed hash-agg over the
    SemDeDup survivors' token counts -> the bounded-artifact driver
    waterfill -> one :func:`token_budget_select` per language (the
    language inventory is bounded, so the union has L branches, each
    with token_budget_select's scalable two-pass prefix shape), each
    filling exactly its UniMax allocation in the deterministic
    shuffle-priority order. Shards then rebalance over the union as
    in v9. Census keys are v9's (_STAGE_ORDER_V9); the budget row now
    reports the UniMax cut."""
    from functools import reduce

    from ..operators.curation import token_budget_select, unimax_allocation

    def unimax_budget(sized: DataFrame) -> DataFrame:
        alloc = unimax_allocation(
            sized,
            group_col,
            token_col="n_tokens",
            budget_num=unimax_budget_num,
            budget_den=unimax_budget_den,
            epoch_cap_x100=unimax_cap_x100,
        )
        groups = sorted(
            (r["grp"], int(r["alloc"])) for r in alloc.collect()
        )
        parts = [
            token_budget_select(
                sized.filter(F.col(group_col) == g), a, ["pri", "doc_id"]
            )
            for g, a in groups
        ]
        return reduce(lambda x, y: x.unionByName(y), parts)

    return curate_corpus_v9(
        docs, emb, bench, budget_select=unimax_budget, **v9_kwargs
    )


def curate_corpus_index(
    docs: DataFrame,
    emb: DataFrame,
    lm_max_avg_bits_x100: int,
    neardup_threshold: float = 0.4,
    cluster_target: int = 250,
    max_line_docs: int = 2,
) -> dict[str, object]:
    """Publish the standing curated corpus's INDEX ARTIFACTS — the
    state :func:`curate_corpus_delta` folds daily batches into. One
    v4-chain (bigram, fixed threshold) pass over the standing corpus
    producing, per stage, exactly the artifact a production pipeline
    writes to the lake:

    - ``line_freq``      line-frequency index (operators/curation.py)
    - ``model``          the trained bigram LM count frames — CCNet's
                         perplexity model is a PUBLISHED STATIC
                         artifact (Wenzek et al. 2020 train it once on
                         Wikipedia), not retrained per batch
    - ``centroids``      the SemDeDup cluster centroids (frozen — the
                         incremental_semantic_dedup contract)
    - ``assigned``       every standing LM-survivor vector with its
                         cluster id (the published dedup index: ALL
                         survivors, not just dedup winners — lowest-id-
                         wins needs losers too)
    - ``sized``          the standing post-SemDeDup survivors with
                         (pri, n_tokens) — the budget stage's standing
                         prefix state

    Callers persist these between folds (the q_substring_index_delta
    stress convention isolates the fold cost from this build)."""
    from ..operators.curation import line_dedup, line_freq
    from ..operators.lm_score import BigramLM, lm_filter, train_bigram_lm
    from ..operators.ordering import shuffle_key
    from ..operators.similarity import ivf_assign, semantic_dedup

    _release("idx")
    base = docs.select("doc_id", "text", "lang", "source")
    lfreq = line_freq(base)
    ld = line_dedup(base, max_docs=max_line_docs)
    line_kept = (
        ld.filter(F.col("n_removed") < F.col("n_lines"))
        .join(base.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", F.col("kept_text").alias("text"), "lang", "source")
    )
    kept = _persist(
        line_kept.filter(text_ops.classifier_quality_score("text") >= 0.0),
        "idx",
    )
    # Pin the published artifacts that the fold consumes MORE THAN ONCE
    # (optimization r13, VERDICT r12 #5): Spark does not CSE shared
    # subtrees, so without pinning the standing chain re-executed per
    # consumer — the bigram count frames feed both the standing lm_kept
    # and the delta gate, lm_kept feeds kept_emb AND the sized table,
    # and the centroid top-k is evaluated by ivf_assign, semantic_dedup
    # and the published artifact itself. These are exactly the frames a
    # production pipeline writes to the lake once.
    model = train_bigram_lm(kept.filter(F.col("lang") == "en"))
    model = BigramLM(
        bigrams=_persist(model.bigrams, "idx"),
        contexts=_persist(model.contexts, "idx"),
        vocab_size=model.vocab_size,
    )
    lm_kept = _persist(lm_filter(kept, model, lm_max_avg_bits_x100), "idx")

    kept_emb = _persist(
        emb.join(lm_kept.select(F.col("doc_id").alias("vec_id")), "vec_id"),
        "idx",
    )
    n = kept_emb.count()
    k = max(8, -(-n // cluster_target))
    centroids = _persist(
        kept_emb.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        ),
        "idx",
    )
    assigned = kept_emb.join(
        ivf_assign(kept_emb, centroids).select("vec_id", "centroid_id"),
        "vec_id",
    ).select("vec_id", "embedding", "centroid_id")
    surv = semantic_dedup(kept_emb, centroids, threshold=neardup_threshold)
    sem = lm_kept.join(
        surv.select(F.col("vec_id").alias("doc_id")), "doc_id"
    )
    sized = sem.select(
        "doc_id",
        text_ops.token_count("text").cast("long").alias("n_tokens"),
        shuffle_key("doc_id").alias("pri"),
    )
    return {
        "line_freq": lfreq,
        "model": model,
        "centroids": centroids,
        "assigned": assigned,
        "sized": sized,
    }


def curate_corpus_delta(
    index: dict[str, object],
    delta_docs: DataFrame,
    delta_emb: DataFrame,
    lm_max_avg_bits_x100: int,
    budget: int = 10_000,
    neardup_threshold: float = 0.4,
    max_line_docs: int = 2,
) -> DataFrame:
    """Fold a DELTA batch into a standing curated corpus — the
    incremental twin of the composed v4 CCNet chain, closing the
    incremental-index family over the COMPOSITION (VERDICT r9 #2):
    every stage is its own delta operator, chained:

        delta raw -> line_dedup_delta   (merged standing+delta line dfs)
                  -> classifier filter  (per-doc, delta-local)
                  -> frozen-LM gate     (score against the published
                                         standing model)
                  -> incremental SemDeDup (delta probes the standing
                                         cluster index; standing rows
                                         never re-paired)
                  -> budget fill        (union prefix-sum; delta docs
                                         admitted where the merged
                                         cumulative fits)

    Equivalence contract (q_corpus_pipeline_delta pins it): the output
    == the full v4 rebuild over standing ∪ delta RESTRICTED TO DELTA
    DOCS, with the standing index artifacts held fixed — the frozen-
    artifact semantics production actually runs: CCNet's LM is a static
    published model, SemDeDup's published clustering is immutable, and
    already-shipped shards are not recalled. What a RETRAINED rebuild
    would additionally change (LM counts shifting standing scores,
    centroid sets, tercile thresholds — the v6 gate is distribution-
    relative and so CANNOT be folded delta-sized: re-thresholding
    requires rescoring every standing doc under the merged model) is a
    rebuild decision, not a fold; that boundary is documented here
    rather than approximated silently.

    Scale shape: stages 1-4 are delta-sized probes of standing indexes
    (delta-keyed joins — the winnow/bm25/semdedup delta class); the
    budget stage is one two-pass distributed prefix sum over the
    standing sized table ∪ delta (index-PASS bounded, no pairing, no
    retraining — token_budget_select's own shape). Returns the admitted
    delta docs as (doc_id, n_tokens, cum_tokens)."""
    _new_index, admitted = curate_corpus_fold(
        index,
        delta_docs,
        delta_emb,
        lm_max_avg_bits_x100,
        budget=budget,
        neardup_threshold=neardup_threshold,
        max_line_docs=max_line_docs,
    )
    return admitted


def curate_corpus_fold(
    index: dict[str, object],
    delta_docs: DataFrame,
    delta_emb: DataFrame,
    lm_max_avg_bits_x100: int,
    budget: int = 10_000,
    neardup_threshold: float = 0.4,
    max_line_docs: int = 2,
) -> tuple[dict[str, object], DataFrame]:
    """:func:`curate_corpus_delta` plus the NEXT standing index — the
    (folded_state, new_output) pair every incremental twin in the repo
    returns (bm25_index_delta / hamming_index_delta), which makes this
    the streaming maintenance body directly (foreachBatch: fold, write
    the new artifacts, emit the admissions — pinned by
    tests/test_streaming_curation.py). Folds forward:

    - ``line_freq``  += delta line document-frequencies (additive,
                        full-outer merge on line_key)
    - ``assigned``   += ALL delta LM-survivor vectors with their frozen-
                        centroid assignment (losers included — future
                        lowest-id-wins verdicts need them)
    - ``sized``      += delta post-SemDeDup survivors
    - ``model`` / ``centroids`` unchanged: static published artifacts
                        (retraining is a rebuild decision, see above)."""
    from ..operators.curation import (
        line_dedup_delta,
        line_freq,
        token_budget_select,
    )
    from ..operators.lm_score import lm_filter
    from ..operators.ordering import shuffle_key
    from ..operators.similarity import (
        incremental_semantic_dedup,
        ivf_assign,
    )

    base_d = delta_docs.select("doc_id", "text", "lang", "source")
    ld = line_dedup_delta(
        index["line_freq"], base_d, max_docs=max_line_docs
    )
    line_kept = (
        ld.filter(F.col("n_removed") < F.col("n_lines"))
        .join(base_d.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", F.col("kept_text").alias("text"), "lang", "source")
    )
    kept = line_kept.filter(text_ops.classifier_quality_score("text") >= 0.0)
    lm_kept = lm_filter(kept, index["model"], lm_max_avg_bits_x100)

    kept_emb = delta_emb.join(
        lm_kept.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    surv = incremental_semantic_dedup(
        index["assigned"],
        kept_emb,
        index["centroids"],
        threshold=neardup_threshold,
    )
    sem = lm_kept.join(
        surv.select(F.col("vec_id").alias("doc_id")), "doc_id"
    )
    sized_d = sem.select(
        "doc_id",
        text_ops.token_count("text").cast("long").alias("n_tokens"),
        shuffle_key("doc_id").alias("pri"),
    )
    union = index["sized"].unionByName(sized_d)
    admitted = token_budget_select(union, budget, ["pri", "doc_id"]).join(
        sized_d.select("doc_id"), "doc_id"
    ).select("doc_id", "n_tokens", "cum_tokens")

    # folded artifacts for the next batch
    freq_d = line_freq(base_d)
    lf = (
        index["line_freq"]
        .withColumnRenamed("n_docs_with_line", "_s")
        .join(
            freq_d.withColumnRenamed("n_docs_with_line", "_d"),
            "line_key",
            "full_outer",
        )
        .select(
            "line_key",
            (
                F.coalesce(F.col("_s"), F.lit(0))
                + F.coalesce(F.col("_d"), F.lit(0))
            ).alias("n_docs_with_line"),
        )
    )
    assigned_d = kept_emb.join(
        ivf_assign(kept_emb, index["centroids"]).select(
            "vec_id", "centroid_id"
        ),
        "vec_id",
    ).select("vec_id", "embedding", "centroid_id")
    new_index = {
        "line_freq": lf,
        "model": index["model"],
        "centroids": index["centroids"],
        "assigned": index["assigned"].unionByName(assigned_d),
        "sized": union,
    }
    return new_index, admitted


_STAGE_ORDER_V4 = [
    "raw", "line_dedup", "classifier", "lm_gate", "semdedup", "budget",
]


def curate_corpus_v4_funnel(
    stages: dict[str, DataFrame], order: list[str] | None = None
) -> DataFrame:
    """(stage_id, stage, n_docs, n_tokens) census over the v4 chain;
    the final row audits the shard assignment (non-empty shard count +
    heaviest shard's token mass), like the v3 funnel. ``order``
    overrides the stage list (v8 inserts 'decon' after line_dedup)."""
    order = order if order is not None else _STAGE_ORDER_V4
    out = None
    for i, name in enumerate(order):
        fr = stages[name]
        tok = (
            F.sum("n_tokens")
            if "n_tokens" in fr.columns
            else F.sum(text_ops.token_count("text"))
        )
        census = fr.agg(
            F.lit(i).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(tok, F.lit(0)).cast("long").alias("n_tokens"),
        )
        out = census if out is None else out.unionByName(census)
    mass = stages["sharded"].groupBy("shard").agg(F.sum("n_tokens").alias("m"))
    final = mass.agg(
        F.lit(len(order)).alias("stage_id"),
        F.lit("sharded").alias("stage"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.max("m"), F.lit(0)).cast("long").alias("n_tokens"),
    )
    return out.unionByName(final)
