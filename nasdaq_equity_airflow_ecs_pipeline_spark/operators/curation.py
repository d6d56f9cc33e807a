"""Corpus-curation operators for web-scale training-data pipelines:
URL canonicalization + dedup, target-mixture reweighting, exact
line-level dedup (RefinedWeb-style), and hashed-bucket importance
weighting (DSIR-lite).

All four are pure DataFrame compositions — no UDFs, no driver loops —
and every shuffle is keyed on a high-cardinality column (canonical URL,
line hash, doc id) or a constant-bounded one (hash bucket, source), so
each operator's plan is linear in corpus size. No ``F.broadcast`` hints:
the bounded frames (bucket stats <= n_buckets rows, source counts <=
n_sources rows) auto-broadcast under AQE when they fit, and nothing
unbounded is ever hinted (tools/plan_audit.py enforces this class).

Cross-engine exactness: hashing is the repo's portable 60-bit md5
construction; scores stay in exact integer/decimal arithmetic until one
final deterministic double division (functions/stable.py discipline), so
every operator is DuckDB-oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an http(s) URL, as one column expression:

    - scheme and host lowercased; leading ``www.`` and default ports
      (``:80`` http, ``:443`` https) stripped from the host
    - fragment dropped
    - path kept case-sensitive, trailing slashes stripped
    - query params: tracking params (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``, ``ref``) and empties dropped, the rest sorted

    The same rules CommonCrawl-style dedup applies before URL-keyed
    dedup; mirrored 1:1 by the DuckDB oracle in queries/curation_ops.py.
    """
    u = F.regexp_replace(F.trim(F.col(col) if isinstance(col, str) else col), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)
    )
    path = F.regexp_replace(F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-keyed exact dedup: one group per canonical URL, min-id
    survivor, duplicate count. One hash aggregation keyed on the
    canonical URL — high cardinality, partial-aggregated map-side, no
    skew concern beyond what AQE handles."""
    return (
        df.withColumn("canonical_url", canonicalize_url(url_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def mixture_weights(
    df: DataFrame, source_col: str, targets: dict[str, float]
) -> DataFrame:
    """Per-source sampling weights that reshape the corpus toward a
    target mixture (The-Pile/DoReMi-style domain reweighting).

    ``sample_weight = target_share / actual_share``: sampling each
    source's documents with probability proportional to its weight
    yields the target mixture in expectation. Exact-arithmetic note:
    ``actual_share`` and ``sample_weight`` are single double divisions
    of exact integers, so results are bit-identical cross-engine.

    One k-row aggregation (k = #sources) + one empty-frame window over
    those k rows — nothing here scales with corpus size.
    """
    if abs(sum(targets.values()) - 1.0) > 1e-9:
        raise ValueError("target shares must sum to 1")
    tmap = F.create_map(*[F.lit(x) for kv in targets.items() for x in kv])
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return counts.select(
        "source",
        "n_docs",
        (F.col("n_docs").cast("double") / total.cast("double")).alias("actual_share"),
        F.coalesce(tmap[F.col("source")], F.lit(0.0)).alias("target_share"),
        (
            F.coalesce(tmap[F.col("source")], F.lit(0.0))
            * total.cast("double")
            / F.col("n_docs").cast("double")
        ).alias("sample_weight"),
        F.round(F.coalesce(tmap[F.col("source")], F.lit(0.0)) * total.cast("double"))
        .cast("bigint")
        .alias("planned_docs"),
    )


def temperature_mixture_weights(
    df: DataFrame, source_col: str
) -> DataFrame:
    """Temperature-scaled sampling weights at tau = 0.5 (the standard
    multilingual rebalancing: sample source s proportionally to
    share_s^(1/tau's inverse) — sqrt flattens the distribution so
    low-resource sources are upsampled relative to their share; used by
    mBERT/XLM-style corpus mixing).

    Exactness: tau is fixed at 0.5 because ``sqrt`` is correctly rounded
    in every IEEE engine while general ``pow`` is not — and weights are
    normalized by the MAX (order-independent) rather than the sum (a
    float sum's value depends on accumulation order), so every output is
    bit-identical cross-engine. ``rel_weight`` = 1 for the largest
    source, > share ratio for smaller ones."""
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    share = F.col("n_docs").cast("double") / total.cast("double")
    with_share = counts.select("source", "n_docs", share.alias("share"))
    sqrt_share = F.sqrt(F.col("share"))
    max_sqrt = F.max(sqrt_share).over(Window.partitionBy())
    return with_share.select(
        "source",
        "n_docs",
        "share",
        sqrt_share.alias("sqrt_share"),
        (sqrt_share / max_sqrt).alias("rel_weight"),
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    budget_num: int = 9,
    budget_den: int = 10,
    epoch_cap_x100: int = 100,
    token_col: str | None = None,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining", Algorithm 1): distribute a token budget as uniformly
    as possible across groups (languages), capping each group at
    ``epoch_cap_x100/100`` epochs of its own data — the mixing policy
    that replaced temperature sampling in mT5-class pretraining because
    it never over-repeats low-resource languages.

    Waterfilling, integer-exact: groups are visited in ascending cap
    order (ties to the lexicographically smaller group); each takes
    ``min(cap, remaining_budget div remaining_groups)`` — floor
    division, so the allocation is exact BIGINT arithmetic both engines
    evaluate identically (the DuckDB oracle replays the identical
    recurrence as a recursive CTE). The budget is
    ``total_tokens * budget_num div budget_den``; when every group is
    capped the budget is deliberately under-filled, exactly as in the
    paper.

    Scale shape: ONE corpus pass (group-keyed hash-agg of word counts,
    map-side combine) collecting one row per group — the language
    inventory is a bounded artifact, so the sequential waterfill runs
    driver-side on L rows and returns a literal frame (the
    unigram_train bounded-artifact discipline). Nothing else scales
    with corpus size.

    Returns (group, n_tokens, cap, alloc, share_x1e9, epochs_x100):
    ``share_x1e9`` is each group's share of the TOTAL ALLOCATED mass
    (x1e9 fixed point), ``epochs_x100`` how many epochs of the group's
    own data the allocation consumes.
    """
    tok = (
        F.col(token_col)
        if token_col is not None  # caller pre-counted (the chain's sized frame)
        else F.size(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
        )
    )
    counts = df.select(
        F.col(group_col).alias("grp"), tok.cast("bigint").alias("_nt")
    ).groupBy("grp").agg(F.sum("_nt").cast("bigint").alias("n_tokens"))
    return _unimax_waterfill(
        counts, budget_num, budget_den, epoch_cap_x100
    )


def _unimax_waterfill(
    counts: DataFrame,
    budget_num: int,
    budget_den: int,
    epoch_cap_x100: int,
) -> DataFrame:
    """Driver-side exact waterfill over a collected (grp, n_tokens)
    frame (bounded: the group inventory) — shared by the from-corpus
    and incremental entry points."""
    rows = counts.collect()
    stats = sorted(
        (int(r["n_tokens"]) * epoch_cap_x100 // 100, r["grp"], int(r["n_tokens"]))
        for r in rows
    )
    total = sum(nt for _c, _g, nt in stats)
    b = total * budget_num // budget_den
    out = []
    remaining = len(stats)
    for cap, grp, nt in stats:
        share = b // remaining if remaining else 0
        alloc = min(cap, share)
        b -= alloc
        remaining -= 1
        out.append((grp, nt, cap, alloc))
    total_alloc = sum(a for _g, _n, _c, a in out)
    final = [
        (
            g,
            n,
            c,
            a,
            (a * 1_000_000_000 // total_alloc) if total_alloc else 0,
            (a * 100 // n) if n else 0,
        )
        for g, n, c, a in sorted(out)
    ]
    return counts.sparkSession.createDataFrame(
        final,
        "grp string, n_tokens bigint, cap bigint, alloc bigint, "
        "share_x1e9 bigint, epochs_x100 bigint",
    )


def unimax_allocation_delta(
    standing_counts: DataFrame,
    delta: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    budget_num: int = 9,
    budget_den: int = 10,
    epoch_cap_x100: int = 100,
) -> DataFrame:
    """Fold a delta batch into standing per-group token counts and
    re-waterfill — the incremental-index twin of
    :func:`unimax_allocation` (the domain_stats_delta discipline).
    ``standing_counts`` is the published (grp, n_tokens) artifact;
    the fold is one delta-sized hash-agg full-outer-merged onto it
    (counts are a monoid), and the waterfill reruns on the merged
    group inventory — so the result EQUALS the full rebuild over the
    union exactly (the q_unimax_delta oracle IS the full-rebuild
    SQL). Per-fold cost: delta-sized + one pass over the group table."""
    d = (
        delta.select(
            F.col(group_col).alias("grp"),
            F.size(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
            ).cast("bigint").alias("_nt"),
        )
        .groupBy("grp")
        .agg(F.sum("_nt").cast("bigint").alias("_dn"))
    )
    merged = (
        standing_counts.select("grp", "n_tokens")
        .join(d, "grp", "full_outer")
        .select(
            "grp",
            (
                F.coalesce(F.col("n_tokens"), F.lit(0))
                + F.coalesce(F.col("_dn"), F.lit(0))
            ).cast("bigint").alias("n_tokens"),
        )
    )
    return _unimax_waterfill(merged, budget_num, budget_den, epoch_cap_x100)


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 2,
) -> DataFrame:
    """Exact line-level dedup across the corpus (RefinedWeb/CCNet
    pattern): any line occurring in more than ``max_docs`` distinct
    documents is boilerplate (nav bars, cookie banners, license
    headers) and is removed from EVERY document; the per-document
    remainder is reassembled in original line order.

    Plan shape at scale (optimization round 12, guide §2.3: shuffle
    keys, not payloads): the line TEXT never leaves its document row.
    Each doc's line array is computed once; only (doc, pos, md5-key)
    rows are exploded for the frequency hash-agg (high cardinality —
    the hot empty-line case is why lines are md5'd rather than joined
    raw); boilerplate hits collapse to a per-doc removed-POSITION set
    (no broadcast hint: the duplicated-line set is corpus-scale on a
    duplicated corpus, the same class as substring-dedup's dup set)
    attached by one doc-keyed join, and the text is rebuilt doc-locally
    by filtering the doc's own array. The previous shape shuffled the
    full line strings three times (freq join, collect_list rebuild,
    final doc join); this one shuffles 16-byte keys and the removed-set
    rows, and the doc text at most once (the removed frame usually
    auto-broadcasts). Result rows identical: a position is removed iff
    its line's distinct-doc frequency exceeds ``max_docs``, and the
    rebuild joins the surviving lines in original order either way.
    """
    docs = df.select(
        F.col(id_col), F.split(F.col(text_col), "\n").alias("_arr")
    )
    keys = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.transform("_arr", F.md5)).alias("pos", "line_key"),
    )
    freq = keys.groupBy("line_key").agg(
        F.count_distinct("_id").alias("n_docs_with_line")
    )
    removed = (
        keys.join(
            freq.filter(F.col("n_docs_with_line") > max_docs).select(
                "line_key"
            ),
            "line_key",
        )
        .groupBy("_id")
        .agg(F.collect_set("pos").alias("_rm"))
    )
    joined = docs.join(removed, docs[id_col] == removed["_id"], "left")
    rm = F.coalesce(F.col("_rm"), F.array().cast("array<int>"))
    return joined.select(
        F.col(id_col),
        F.array_join(_gather_kept(rm), "\n").alias("kept_text"),
        F.size("_arr").alias("n_lines"),
        F.size(rm).cast("int").alias("n_removed"),
    )


def _gather_kept(rm):
    """Linear per-doc rebuild (ADVICE r12): kept POSITIONS once via
    order-preserving ``array_except`` (hash-set lookup), then gather —
    the previous ``filter(~array_contains(rm, i))`` spelling was
    O(n_lines x n_removed) inside a single row, quadratic exactly on
    the boilerplate-heavy docs this operator targets. Same kept lines
    in the same order (positions are distinct, array_except preserves
    first-array order); NULL text still yields NULL kept_text."""
    kept_pos = F.array_except(
        F.sequence(F.lit(0), F.size("_arr") - F.lit(1)), rm
    )
    return F.transform(
        kept_pos, lambda i: F.element_at(F.col("_arr"), i + F.lit(1))
    )


def line_freq(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The publishable line-frequency index behind :func:`line_dedup`:
    (line_key, n_docs_with_line) with line_key = md5(line). Frequencies
    fold ADDITIVELY across disjoint corpora (doc sets are disjoint, so
    count_distinct sums), which is what makes the incremental line
    dedup (:func:`line_dedup_delta`) exact."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), "\n")).alias("line"),
        )
        .withColumn("line_key", F.md5("line"))
        .groupBy("line_key")
        .agg(F.count_distinct("_id").alias("n_docs_with_line"))
    )


def line_dedup_delta(
    standing_freq: DataFrame,
    delta_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 2,
) -> DataFrame:
    """Incremental :func:`line_dedup` for a DELTA batch against a
    standing line-frequency index (:func:`line_freq` output): a delta
    doc's line is boilerplate iff its MERGED document frequency
    (standing + delta) exceeds ``max_docs`` — exactly the df a full
    union rebuild would compute for that line, so delta docs' kept_text
    equals the union rebuild's restricted to delta docs (standing docs'
    own rewrites are the standing corpus's rebuild decision, out of
    scope by the incremental-index discipline).

    Scale shape: delta-sized explode + hash-agg for delta KEY
    frequencies (line text stays on its doc row — line_dedup's
    shuffle-keys-not-payloads shape), ONE line_key-keyed join probing
    the standing index (index-shaped, delta-keyed — the
    winnow_index_delta class), then the doc-local rebuild from the
    per-doc removed-position set. Same output schema as line_dedup."""
    docs = delta_df.select(
        F.col(id_col), F.split(F.col(text_col), "\n").alias("_arr")
    )
    keys = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.transform("_arr", F.md5)).alias("pos", "line_key"),
    )
    freq_d = keys.groupBy("line_key").agg(
        F.count_distinct("_id").alias("_nd_delta")
    )
    merged = freq_d.join(
        standing_freq.withColumnRenamed("n_docs_with_line", "_nd_standing"),
        "line_key",
        "left",
    ).select(
        "line_key",
        (
            F.coalesce(F.col("_nd_standing"), F.lit(0)) + F.col("_nd_delta")
        ).alias("n_docs_with_line"),
    )
    removed = (
        keys.join(
            merged.filter(F.col("n_docs_with_line") > max_docs).select(
                "line_key"
            ),
            "line_key",
        )
        .groupBy("_id")
        .agg(F.collect_set("pos").alias("_rm"))
    )
    joined = docs.join(removed, docs[id_col] == removed["_id"], "left")
    rm = F.coalesce(F.col("_rm"), F.array().cast("array<int>"))
    return joined.select(
        F.col(id_col),
        F.array_join(_gather_kept(rm), "\n").alias("kept_text"),
        F.size("_arr").alias("n_lines"),
        F.size(rm).cast("int").alias("n_removed"),
    )


def weighted_resample(
    df: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    strict: bool = True,
) -> DataFrame:
    """Deterministic mixture resample: keep each row iff its md5 hash
    bucket falls under ``min(1, alpha * sample_weight(source))`` — the
    doc-level application of :func:`mixture_weights` (alpha globally
    downsamples so per-source probabilities stay < 1 and the target
    mixture is reachable for over-represented sources).

    Membership is a pure function of (key, source weight): reproducible
    across partitionings and engines — the same basis-point hash-bucket
    construction as ``operators/sampling.py``, with the threshold
    computed from exact counts in a fixed-order double expression. The
    k-row weights frame auto-broadcasts.

    ``strict=True`` (default) fails the job — via ``raise_error``, no
    extra pass over the data — on the first row whose source is ABSENT
    from the weights frame; a missing source is almost always a stale
    weights table, and silently dropping its documents is the worst
    failure mode a mixture pipeline can have. A source that IS present
    with an explicit NULL ``sample_weight`` is the deliberate
    exclude-this-source spelling and is dropped (weight 0.0) in both
    modes — presence is tracked with a join indicator, so strict mode
    distinguishes the two cases instead of conflating them.
    ``strict=False`` also drops absent sources for intentional
    allow-listing. The weight is joined under a collision-safe internal
    name so an existing ``sample_weight`` column on ``df`` passes
    through untouched."""
    from .sampling import _BPS, hash_bucket

    w = weights.select(
        F.col("source").alias(source_col),
        F.col("sample_weight").alias("__wr_weight"),
        F.lit(1).alias("__wr_present"),
    )
    if strict:
        weight = F.when(
            F.col("__wr_present").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "weighted_resample: source absent from weights frame: "
                    ),
                    F.col(source_col).cast("string"),
                )
            ).cast("double"),
        ).otherwise(F.coalesce(F.col("__wr_weight"), F.lit(0.0)))
    else:
        weight = F.coalesce(F.col("__wr_weight"), F.lit(0.0))
    return (
        df.join(w, source_col, "left")
        .filter(
            hash_bucket(F.col(key_col)).cast("double")
            < F.least(
                F.lit(float(_BPS)),
                F.lit(alpha) * weight * F.lit(float(_BPS)),
            )
        )
        .drop("__wr_weight", "__wr_present")
    )


def importance_weights(
    df: DataFrame,
    target_cond: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    ngram: int = 1,
) -> DataFrame:
    """DSIR-lite importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", arXiv:2302.03169):
    score each document by how much its hashed-unigram profile resembles
    a target subset (``target_cond`` rows) relative to the raw corpus.

    This variant is log-free so it stays cross-engine exact: with
    Laplace-smoothed bucket counts t_b+1 (target) and a_b+1 (all), a
    document's ``target_mass = sum over tokens of (t_b+1)`` and
    ``corpus_mass = sum of (a_b+1)`` are exact integers;
    ``importance = (target_mass * total_corpus) / (corpus_mass *
    total_target)`` is one deterministic double expression, > 1 when the
    document leans toward the target distribution. (True DSIR sums log
    ratios — same ordering signal, but float log sums are not
    bit-reproducible across engines, so the contract query uses the
    rational form.)

    Plan: one explode (linear), one bucket aggregation (<= n_buckets
    rows out), one equi-join of tokens to the bounded bucket table
    (auto-broadcast — bounded by construction), one per-doc sum.

    ``ngram=2`` is the paper-faithful feature space (DSIR §3 hashes
    unigrams AND bigrams into the bucket table): the feature stream
    becomes every token plus every adjacent ``"tok_i tok_i+1"`` pair —
    same plan shape, < 2x the exploded rows, and it distinguishes
    word-ORDER affinity that a bag of unigrams cannot (pinned by the
    q_importance_bigram fixture where target and non-target share the
    unigram distribution and differ only in ordering).
    """
    if ngram not in (1, 2):
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    arr = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        target_cond.alias("is_target"),
        arr.alias("_arr"),
    )
    if ngram == 2:
        units = F.concat(
            F.col("_arr"),
            F.expr(
                "zip_with(slice(_arr, 1, greatest(size(_arr) - 1, 0)),"
                " slice(_arr, 2, greatest(size(_arr) - 1, 0)),"
                " (x, y) -> concat(x, ' ', y))"
            ),
        )
    else:
        units = F.col("_arr")
    toks = base.select(
        "_id", "is_target", F.explode(units).alias("tok")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    toks = toks.withColumn("bucket", bucket)
    stats = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_cnt"),
        F.count(F.lit(1)).alias("a_cnt"),
    )
    totals = toks.agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("total_target"),
        F.count(F.lit(1)).alias("total_corpus"),
    )
    return (
        toks.join(stats, "bucket")
        .groupBy("_id")
        .agg(
            F.sum(F.col("t_cnt") + 1).alias("target_mass"),
            F.sum(F.col("a_cnt") + 1).alias("corpus_mass"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .crossJoin(totals)  # 1-row totals frame: broadcast by size
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "target_mass",
            "corpus_mass",
            (
                F.col("target_mass").cast("double")
                * F.col("total_corpus").cast("double")
                / (
                    F.col("corpus_mass").cast("double")
                    * F.col("total_target").cast("double")
                )
            ).alias("importance"),
        )
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    order_cols: list[str],
    token_col: str = "n_tokens",
    partitions: int | None = None,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Fill a token budget in priority order: keep rows, walking the
    total order given by ``order_cols`` (must be a unique key), while
    the INCLUSIVE running sum of ``token_col`` stays <= ``budget`` —
    the standard "take the best N tokens" final cut of a curated
    training mix.

    The naive spelling — ``sum(tokens) OVER (ORDER BY ...)`` with no
    partition — collapses the corpus into ONE task. This is the
    ``global_sort_index`` two-pass shape instead (operators/ordering.py):
    distributed range sort, per-partition token sums collected as k rows
    (k = partition count), driver prefix-sum into per-partition offsets,
    broadcast back, partition-local window cumsum + offset. Equal to the
    single-task window bit-for-bit (integer arithmetic), but the only
    serial work is the k-row prefix sum. Partitions whose OFFSET already
    exceeds the budget are pruned driver-side before the window stage —
    every one of their rows would fail the filter (token counts are
    non-negative, so cum >= offset > budget), so at 100 TB the
    window/join work is proportional to the budget, not the corpus.
    (``offset == budget`` partitions are kept: a zero-token first row
    there still satisfies the inclusive bound.)
    """
    parts, offsets, _total = _ranged_prefix_offsets(
        df, order_cols, token_col, partitions
    )
    # budget-exceeded partitions never join back (driver-side pruning)
    kept = [(pid, off) for pid, off in offsets if off <= budget]
    spark = df.sparkSession
    off_df = spark.createDataFrame(kept or [(0, 0)], "_pid int, _off bigint")
    cols = [F.col(c) for c in order_cols]
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(
            cum_col, F.sum(F.col(token_col)).over(w) + F.col("_off")
        )
        .filter(F.col(cum_col) <= budget)
        .drop("_pid", "_off")
    )


def _ranged_prefix_offsets(
    df: DataFrame,
    order_cols: list[str],
    token_col: str,
    partitions: int | None,
):
    """Shared pass 1+2 of the distributed prefix sum
    (``global_sort_index`` shape): range-sort ``df`` on ``order_cols``,
    pin the partition assignment (localCheckpoint — passes 2/3 must see
    the same sampled boundaries), collect the k per-partition token
    sums, prefix-sum them on the driver. Returns
    ``(parts, [(pid, exclusive_offset)...], total_tokens)`` — the only
    serial work anywhere is the k-row prefix."""
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    parts = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = sorted(
        (r["_pid"], r["_s"] or 0)
        for r in parts.groupBy("_pid").agg(F.sum(token_col).alias("_s")).collect()
    )
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += s
    return parts, offsets, acc


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    order_cols: list[str],
    token_col: str = "n_tokens",
    partitions: int | None = None,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign each row an equal-TOKEN output shard (the "write N
    balanced training shards" final step — shards balanced by token
    count, not row count, so downstream data loaders stream equal work
    from every file):

    ``shard = (exclusive_cum_tokens * n_shards) div total_tokens``
    clamped to ``n_shards - 1`` — contiguous in the ``order_cols``
    total order, every shard within one max-row-weight of the ideal
    token share. Pure integer arithmetic (the div is exact in any
    engine), computed with the same two-pass distributed prefix sum as
    :func:`token_budget_select`; the single-task ``sum() OVER (ORDER
    BY)`` spelling is the oracle twin, never the plan."""
    parts, offsets, total = _ranged_prefix_offsets(
        df, order_cols, token_col, partitions
    )
    if total == 0:
        return parts.drop("_pid").withColumn(
            shard_col, F.lit(0).cast("int")
        )
    off_df = df.sparkSession.createDataFrame(
        offsets, "_pid int, _off bigint"
    )
    cols = [F.col(c) for c in order_cols]
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    excl = F.sum(F.col(token_col)).over(w) + F.col("_off") - F.col(token_col)
    shard = F.least(
        F.expr(f"({n_shards}L * _excl) div {total}L"),
        F.lit(n_shards - 1).cast("bigint"),
    ).cast("int")
    return (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn("_excl", excl)
        .withColumn(shard_col, shard)
        .drop("_pid", "_off", "_excl")
    )


# --------------------------------------------------------- domain filtering
def url_host(col: Column | str) -> Column:
    """Lowercased host of an http(s) URL: userinfo and port stripped,
    path/query/fragment gone. One regex extract — the RefinedWeb-style
    domain-filter key. (No eTLD+1 collapse: a correct registered-domain
    cut needs the public-suffix list, which is policy data, not engine
    logic; ``blocklist_filter`` instead matches the full suffix chain,
    which subsumes any suffix cut the policy layer chooses.)"""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.lower(
        F.regexp_extract(
            u, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#]*@)?([^/:?#]+)", 1
        )
    )


def host_suffixes(host: Column, max_labels: int = 8) -> Column:
    """All dot-suffixes of a host, deepest first: ``a.b.example.com ->
    [a.b.example.com, b.example.com, example.com, com]``, capped at the
    last ``max_labels`` labels (hosts deeper than that keep only their
    shallowest ``max_labels`` suffixes — blocklist entries are never
    that deep, and the cap bounds the explode fan-out at scale).

    This is what turns subdomain blocking into an EQUI-join: explode
    the suffix chain and hash-join it against the blocklist, instead of
    a non-equi ``endswith`` theta-join (which Spark can only execute as
    BroadcastNestedLoopJoin — per-row scans of the whole blocklist)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    start = F.greatest(n - F.lit(max_labels) + 1, F.lit(1))
    return F.transform(
        F.sequence(start, n),
        lambda i: F.array_join(
            F.slice(labels, i, n - i + F.lit(1)), "."
        ),
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-host corpus profile: doc count and corpus share in basis
    points (integer-exact: share_bp = 10000*docs div total). The triage
    table a domain-filter policy is written against. One hash-agg keyed
    on host + one 1-row total joined back — linear, skew-free."""
    hosts = df.select(url_host(url_col).alias("host"), F.col(id_col))
    per = hosts.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("_t"))  # 1 row
    return per.join(F.broadcast(tot)).select(
        "host",
        "n_docs",
        F.expr("(10000 * n_docs) div _t").alias("share_bp"),
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
    max_labels: int = 8,
) -> DataFrame:
    """Drop every row whose URL host equals OR is a subdomain of any
    blocklist entry. Returns the surviving rows (original schema).

    Plan shape: project (id, suffix-chain) -> explode (<= ``max_labels``
    rows per doc, two narrow columns) -> LEFT SEMI equi-join against the
    blocklist to find doomed ids -> LEFT ANTI join back on the id (a
    non-null equi key — anti-joining on the full row would both widen
    the shuffle to every column and silently keep doomed rows that carry
    a NULL anywhere). The blocklist is a policy file — thousands to low
    millions of rows — so the semi-join side is broadcast-or-shuffle by
    AQE's choice; the corpus is never re-partitioned by anything
    lower-cardinality than doc id."""
    doomed = (
        df.select(
            F.col(id_col),
            F.explode(
                host_suffixes(url_host(url_col), max_labels)
            ).alias("_sfx"),
        )
        .join(
            blocklist.select(F.lower(F.col(domain_col)).alias("_sfx")),
            "_sfx",
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return df.join(doomed, id_col, "left_anti")


def url_word_score(
    col: Column | str, flag_words: list[str]
) -> Column:
    """RefinedWeb's soft URL signal: how many flagged fragments appear
    in the lowercased URL (0..len(flag_words)). A bounded sum of
    ``contains`` tests — one expression, no join, no UDF; the policy
    layer thresholds it (e.g. score >= 2 drops, == 1 down-weights)."""
    u = F.lower(F.col(col) if isinstance(col, str) else col)
    score = F.lit(0)
    for w in flag_words:
        score = score + F.when(u.contains(w.lower()), 1).otherwise(0)
    return score


def flagged_word_stats(
    df: DataFrame,
    flag_words: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_col: str = "word",
) -> DataFrame:
    """Content-level flagged-word screen — the C4/RefinedWeb wordlist
    filter applied to DOCUMENT TEXT (``url_word_score`` covers the URL
    side): per doc, the number of tokens on the policy wordlist and the
    density in basis points (10000 * hits div n_tokens, integer-exact).
    The policy layer thresholds (C4 drops any hit; RefinedWeb uses a
    density cut).

    The wordlist is a DataFrame, not a literal: policy lists run to
    thousands of entries and change without code edits, so matching is
    one equi-join of the exploded lowercased token stream against the
    (auto-broadcast, bounded-by-policy) list — never a per-word
    expression chain, which would rebuild the plan per revision and
    blow past codegen limits at real list sizes. Docs with zero tokens
    report density 0 (no evidence, not NULL-poisoned).

    Scale: ONE tokenization (ADVICE r10: the earlier two-branch plan
    regex-tokenized the text twice — once for the exploded hit side,
    once for the ``F.size`` base side). The array is projected once,
    ``n_tokens`` rides along through an ``explode_outer`` (so
    zero-token docs keep their row), hits are marked by one broadcast
    left join against the list, and a single doc-keyed hash-agg with
    map-side partials produces both counts. No second scan, no
    corpus-keyed shuffle beyond the per-doc agg."""
    toks = df.select(
        F.col(id_col), tokens_arr(text_col).alias("_arr")
    ).select(
        F.col(id_col),
        F.size("_arr").cast("bigint").alias("n_tokens"),
        F.explode_outer("_arr").alias("_tok"),
    )
    wl = flag_words.select(
        F.lower(F.col(word_col)).alias("_tok")
    ).distinct().withColumn("_hit", F.lit(1))
    return (
        toks.join(wl, "_tok", "left")
        .groupBy(id_col, "n_tokens")
        .agg(
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias(
                "n_flagged"
            )
        )
        .select(
            id_col,
            "n_tokens",
            "n_flagged",
            F.expr(
                "CASE WHEN n_tokens > 0"
                " THEN (10000 * n_flagged) div n_tokens"
                " ELSE 0 END"
            ).cast("bigint").alias("density_bp"),
        )
    )


def tokens_arr(text_col: str) -> Column:
    """Lowercased whitespace tokens as an array (empties dropped) —
    the flagged-word matching unit."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )


def domain_stats_delta(
    standing: DataFrame, delta: DataFrame,
    url_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """Fold a delta batch into a standing per-host stats table — the
    incremental-index twin of :func:`domain_stats` (the LSH / SemDeDup
    / BM25 delta discipline applied to the domain-filter front):
    aggregate ONLY the delta batch by host, full-outer-merge the counts
    onto the standing (host, n_docs) frame, and recompute the shares
    from the merged totals. == ``domain_stats(standing_docs UNION
    delta_docs)`` exactly (pinned by the q_domain_stats_delta
    restricted-equality oracle); per-fold cost is delta-sized plus one
    pass over the standing stats table (host-cardinality, not corpus-
    cardinality)."""
    d = (
        delta.select(url_host(url_col).alias("host"), F.col(id_col))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("_dn"))
    )
    merged = (
        standing.select("host", "n_docs")
        .join(d, "host", "full_outer")
        .select(
            "host",
            (
                F.coalesce(F.col("n_docs"), F.lit(0))
                + F.coalesce(F.col("_dn"), F.lit(0))
            ).cast("bigint").alias("n_docs"),
        )
    )
    tot = merged.agg(F.sum("n_docs").alias("_t"))  # 1 row
    return merged.join(F.broadcast(tot)).select(
        "host",
        "n_docs",
        F.expr("(10000 * n_docs) div _t").alias("share_bp"),
    )
