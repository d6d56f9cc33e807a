"""Text analysis operators for the training-data pipeline (BASELINE.json
north star): tokenization, quality scoring, language ID, fingerprinting.

All pure `pyspark.sql.functions` column expressions — JVM-side, inside
whole-stage codegen, no UDFs. Each operator is linear in input size with
no shuffle (per-row), so it streams at parquet-scan speed at 100 TB.

Cross-engine determinism: counts and integer hashes only; ratios are one
double division (IEEE-identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# whitespace tokenization + a BPE-ish regex token class
WS_SPLIT = r"\s+"
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# small per-language marker lexicons for the n-gram/stopword language
# heuristic (extend via config for production use)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que"],
}
STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (array<string>)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), WS_SPLIT)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column | str) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def stopword_hits(text: Column | str, words: list[str] | None = None) -> Column:
    """Number of distinct marker words present in the text (presence, not
    frequency — the cheap signal used by fastText-style heuristics)."""
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    hits = [
        F.when(padded.contains(f" {w} "), 1).otherwise(0)
        for w in (words or STOPWORDS)
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/word counts, mean word length,
    punctuation + digit + stopword ratios, and a composite score in [0,1].

    Score: fraction-of-checks-passed style (deterministic integer/bool
    arithmetic + one final divide) — the shape used by C4/Gopher-quality
    filters, simplified."""
    t = tokens(text_col)
    n_chars = F.length(text_col)
    n_words = F.size(t)
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    n_digit = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[0-9]"), 0))
    sw = stopword_hits(text_col)
    checks = (
        F.when(n_words >= 10, 1).otherwise(0)
        + F.when((n_chars / n_words).between(2, 12), 1).otherwise(0)
        + F.when(n_punct * 3 <= n_words, 1).otherwise(0)
        + F.when(n_digit * 2 <= n_chars, 1).otherwise(0)
        + F.when(sw >= 1, 1).otherwise(0)
    )
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_words.alias("q_n_words"),
        n_punct.alias("q_n_punct"),
        n_digit.alias("q_n_digit"),
        sw.alias("q_stopword_hits"),
        (checks.cast("double") / 5).alias("q_score"),
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    return {lang: stopword_hits(text, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: argmax of per-language hit counts with
    a deterministic tie-break (lexicographic language code); 'und' when
    nothing matches."""
    scores = lang_scores(text_col)
    # greatest via sort on (hits desc, lang asc) over a small literal array
    pairs = F.array(
        *[
            F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_min(pairs)
    return df.select(
        "*",
        F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
        (-best["neg"]).alias("pred_hits"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Sliding-window chunking for training-data prep: fixed-size token
    windows with overlap, as pure column expressions (explode over chunk
    starts + array slice — no UDF, no shuffle; streams at scan speed).

    n_chunks = ceil(max(n_tokens - overlap, 1) / stride) with
    stride = chunk_size - overlap: every token is covered, the final
    chunk may be shorter, and a doc shorter than one chunk still yields
    exactly one chunk."""
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    base = df.select("*", tokens(text_col).alias("_toks"))
    n = F.size("_toks")
    n_chunks = (F.greatest(n - overlap, F.lit(1)) + (stride - 1)).cast("bigint") / stride
    n_chunks = F.floor(n_chunks).cast("int")
    out = base.select(
        "*", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    )
    chunk_toks = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_size)
    return out.select(
        *df.columns,
        "chunk_id",
        F.size(chunk_toks).alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk_toks)).alias("chunk_md5"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text,
    plus a 60-bit integer form for compact joins/bloom filters."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    fp = F.md5(norm)
    return df.select(
        "*",
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint").alias("fp_int"),
    )


def winnow_fingerprint(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing LOCAL fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS scheme): hash every ``k``-gram, slide a
    ``w``-hash window, select each window's minimum. The winnowing
    guarantee: any token run shared between two documents of length
    >= w + k - 1 contributes at least one SHARED selected hash — the
    partial-overlap detector that whole-document fingerprints
    (:func:`fingerprint`) cannot provide. Ties select the LEFTMOST
    minimal hash (documented variant; the classic picks rightmost —
    either satisfies the guarantee, and leftmost is the same spelling
    in both engines via first-position lookup).

    Output: (id, pos, fp_hash) — pos is the 1-based k-gram start of
    each selected fingerprint, deduplicated per document. Hashes are
    the portable 31-bit md5 form (base_hash31), bit-identical across
    engines.

    Scale shape: entirely map-side — one tokenize, one k-gram hash
    array, one window-min transform, array_distinct BEFORE the
    explode (adjacent windows reselect the same minimum, so the
    explode emits ~2/(w+1) of the gram count, the winnowing density
    bound). No shuffle at all; downstream overlap detection is a
    fp_hash-keyed equi-join, the banding shape."""
    from .lsh import base_hash31

    arr = tokens(text_col)
    base = docs.select(F.col(id_col), arr.alias("_t")).filter(
        F.size("_t") >= k + w - 1
    )
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("_t"), i + j) for j in range(k)]
    )
    gh = F.transform(
        F.sequence(F.lit(1), F.size("_t") - F.lit(k - 1)),
        lambda i: base_hash31(gram(i)),
    )
    withg = base.select(F.col(id_col), gh.alias("gh"))
    win = lambda i: F.slice(F.col("gh"), i, w)  # noqa: E731
    sel = F.transform(
        F.sequence(F.lit(1), F.size("gh") - F.lit(w - 1)),
        lambda i: F.struct(
            (i + F.array_position(win(i), F.array_min(win(i))) - F.lit(1))
            .cast("bigint")
            .alias("pos"),
            F.array_min(win(i)).alias("fp"),
        ),
    )
    return withg.select(
        F.col(id_col), F.explode(F.array_distinct(sel)).alias("s")
    ).select(
        id_col,
        F.col("s.pos").alias("pos"),
        F.col("s.fp").alias("fp_hash"),
    )


def winnow_overlap(
    fps: DataFrame,
    min_shared: int = 2,
    max_df: int | None = 1000,
    id_col: str = "doc_id",
    hash_col: str = "fp_hash",
) -> DataFrame:
    """Partial-overlap pairs from :func:`winnow_fingerprint` output:
    documents sharing >= ``min_shared`` selected fingerprint hashes —
    the MOSS match step. ``max_df`` drops stop-fingerprints (hashes in
    more than max_df docs: boilerplate the caller should treat with
    line_dedup, and the quadratic bucket a 100 TB self-join must not
    pay — the same df-cap discipline as boilerplate_flags and
    ngram_jaccard's capped twin). The cap is ON BY DEFAULT (1000: a
    fingerprint in >1000 docs contributes >10^6 join rows of pure
    boilerplate signal) because the uncapped self-join is the one
    shape here that can go quadratic at 100 TB; pass ``max_df=None``
    explicitly for the exact validation twin on bounded corpora.

    Scale shape: distinct + optional df-cap are hash-aggs; the pair
    join is fp_hash-keyed (banding shape, collision/df-bounded, never
    all-pairs); the count-filter is one more hash-agg."""
    f = fps.select(F.col(id_col), F.col(hash_col)).distinct()
    if max_df is not None:
        keep = (
            f.groupBy(hash_col)
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select(hash_col)
        )
        f = f.join(keep, hash_col)
    a, b = f.alias("a"), f.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{hash_col}") == F.col(f"b.{hash_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_index_delta(
    standing_fps: DataFrame,
    delta_docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Incremental MOSS maintenance — the winnowing member of the
    repo's incremental-index family (LSH / SemDeDup / BM25 / IVF-PQ
    all follow this discipline): fingerprint ONLY the delta batch
    (map-side, delta-sized), append to the standing fingerprint table,
    and probe NEW-vs-ALL overlaps with a fp-keyed join — standing
    documents are never re-tokenized, and standing-vs-standing pairs
    are never recomputed (they were reported when their younger member
    arrived).

    Returns (folded_fps, new_pairs):
    - folded_fps: standing ∪ delta fingerprints, (id, fp_hash)-distinct
      — the next standing table (the caller owns id uniqueness, as in
      bm25_index_delta's documented contract). Dedup matters: df below
      is per-DOCUMENT frequency, and a raw winnow_fingerprint table has
      one row per (pos, fp).
    - new_pairs: (id_a, id_b, n_shared) where at least one side is a
      delta doc — delta-vs-standing AND delta-vs-delta. ``max_df``
      caps stop-fingerprints over the FOLDED table (df is a global
      property; an incrementally-maintained cap must see the merged
      counts or a hash that crossed the cap this batch would still
      pair). The cap is on by default — winnow_overlap's discipline;
      ``max_df=None`` is the explicit exact twin.

    Equivalence contract (q_winnow_incremental pins it): new_pairs ==
    full-rebuild winnow_overlap(all docs) restricted to pairs touching
    a delta id.

    Scale shape: the ONLY standing-side work is index-shaped — one
    df-count hash-agg over the standing fingerprint TABLE (the merged
    df cap is a global property, same reason bm25_score_terms
    recomputes df from the merged tf) and one fp-keyed equi-join
    probed BY THE DELTA side. No standing-vs-standing self-join, no
    re-tokenization."""
    delta_fp = (
        winnow_fingerprint(
            delta_docs, k=k, w=w, id_col=id_col, text_col=text_col
        )
        .select(F.col(id_col), "fp_hash")
        .distinct()
    )
    # (id, fp_hash)-distinct BEFORE the df count: winnow_fingerprint emits
    # one row per (pos, fp), so a hash selected at several positions in one
    # standing doc would otherwise count multiple times toward max_df and
    # the incremental path would drop hashes the full rebuild keeps —
    # breaking the pinned new_pairs == full-rebuild contract at the cap
    # boundary. df is per-DOCUMENT frequency, exactly as winnow_overlap
    # computes it over its own distinct() input.
    folded = (
        standing_fps.select(F.col(id_col), "fp_hash")
        .unionByName(delta_fp)
        .distinct()
    )
    if max_df is not None:
        keep = (
            folded.groupBy("fp_hash")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("fp_hash")
        )
        probe_a = delta_fp.join(keep, "fp_hash")
        probe_b = folded.join(keep, "fp_hash")
    else:
        probe_a = delta_fp
        probe_b = folded
    a, b = probe_a.alias("a"), probe_b.alias("b")
    hits = a.join(
        b,
        (F.col("a.fp_hash") == F.col("b.fp_hash"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    ).select(
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        F.col("a.fp_hash").alias("fp_hash"),
    )
    new_pairs = (
        hits.distinct()  # delta-delta pairs arrive from both sides
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return folded, new_pairs


def tfidf_topk(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per document by tf * (N+1)/(df+1).

    The idf factor is RATIONAL, not ln((N+1)/(df+1)): transcendental
    functions come from libm and round differently across engines/builds,
    while a monotone rational transform ranks identically and keeps the
    score cross-engine bit-exact (integer-valued doubles, one IEEE
    divide). Ties break on term asc, so top-k is fully deterministic.

    Scale shape: tokens explode once; tf and document-frequency are two
    hash aggregates; df_t joins back on term (vocabulary-sized — AQE
    skew-split absorbs stopword-heavy terms); the per-doc top-k is a
    row_number window partitioned by doc — partial per partition, no
    global sort."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.col("n_docs") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


def boilerplate_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df_bp: int = 60,
    parallelism: int | None = None,
) -> DataFrame:
    """Corpus-frequency boilerplate detection (CCNet/RefinedWeb-style,
    re-expressed over shingles since the corpus carries no line breaks):
    an n-gram shingle occurring in more than ``min_df_bp`` basis points
    (bp/10000) of documents is "boilerplate"; each document scores the
    fraction of its distinct shingles that are boilerplate and is flagged
    when boilerplate is the majority.

    Output: (id, n_shingles, n_boiler, boiler_frac, is_boilerplate) — one
    row per input document, including shingle-less short docs (frac 0.0).

    Determinism: the frequency cut is pure integer arithmetic
    (df*10000 > bp*n_docs — no float threshold), boiler_frac is a single
    IEEE double divide; both evaluate identically on any engine.

    Scale shape (100 TB): two passes over the shingle set — a
    document-frequency hash-aggregate, then a mark-join back. The shingle
    frame is persisted (memory-and-disk) so the explode runs once, not
    twice. The frequent-shingle set is bounded by construction —
    |instances| / (bp/10000 * n_docs) — so it broadcasts; the 1-row corpus
    count broadcasts onto the df aggregate. No shuffle touches full
    documents; the final per-doc join is id-keyed.
    """
    from pyspark import StorageLevel

    from .lsh import _exploded_shingles

    ids = df.select(id_col, text_col)
    sh = _exploded_shingles(ids, id_col, text_col, n, parallelism).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    freq = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df_count") * 10000 > F.lit(min_df_bp) * F.col("n_docs"))
        .select("shingle", F.lit(1).alias("is_freq"))
    )
    per = (
        sh.join(F.broadcast(freq), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("is_freq"), F.lit(0))).alias("n_boiler"),
        )
    )
    return df.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
        F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
        F.when(
            F.coalesce(F.col("n_shingles"), F.lit(0)) > 0,
            F.col("n_boiler").cast("double") / F.col("n_shingles"),
        )
        .otherwise(F.lit(0.0))
        .alias("boiler_frac"),
        (
            F.coalesce(F.col("n_boiler"), F.lit(0)) * 2
            > F.coalesce(F.col("n_shingles"), F.lit(0))
        ).alias("is_boilerplate"),
    )


def substring_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Exact substring-level duplication (the character-window analog of
    Lee et al. 2022's suffix-array dedup, re-expressed as a two-pass
    hash-aggregate): slide a ``window``-char window with ``stride`` over
    each document, hash every window, mark the hashes that occur in two
    or more DISTINCT documents, and report per document how much of it
    is cross-document duplicated text.

    Output: (id, n_windows, n_dup_windows, dup_frac) — one row per input
    document; docs shorter than ``window`` chars have 0 windows.

    Why windows, not suffix arrays: a distributed suffix array needs a
    global sort of every suffix (O(total chars) shuffle rows); stride-S
    windows find every duplicated run of length >= window+stride with
    1/S of the rows, a standard recall/cost trade (stride 32 on window
    64 catches any shared run >= 96 chars). Plan: one explode ->
    hash-agg on the window hash (map-side combine; count(distinct id)
    never materializes pairs) -> id-keyed join back. The dup-hash set is
    NOT hinted for broadcast: on a heavily duplicated corpus (the very
    thing this operator measures) every window of every cloned document
    lands in it, so it is corpus-scale in the worst case — AQE chooses
    broadcast only when runtime stats show it actually fits.
    """
    from pyspark import StorageLevel

    wins = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.length(text_col) >= window,
                F.expr(
                    f"transform(sequence(1, length({text_col}) - "
                    f"{window - 1}, {stride}), "
                    f"i -> md5(substring({text_col}, i, {window})))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("wh"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        wins.groupBy("wh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("wh", F.lit(1).alias("is_dup"))
    )
    per = (
        wins.join(dup, "wh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias(
                "n_dup_windows"
            ),
        )
    )
    return df.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
        F.when(
            F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
            F.col("n_dup_windows").cast("double") / F.col("n_windows"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def _substring_chunks(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """(_id, idx, chunk, ck) — the non-overlapping ``window``-char
    tiling of each document (1-based idx; sub-window tails excluded),
    ck = md5(chunk). Shared by the apply operator and the incremental
    index twin so both see the identical chunking."""
    chunk_arr = F.when(
        F.length(text_col) >= window,
        F.expr(
            f"transform(sequence(1, CAST(floor(length({text_col}) * 1.0 "
            f"/ {window}) AS INT)), j -> struct(CAST(j AS BIGINT) AS idx, "
            f"substring({text_col}, (j - 1) * {window} + 1, {window}) "
            f"AS chunk))"
        ),
    ).otherwise(
        F.array().cast("array<struct<idx:bigint,chunk:string>>")
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(chunk_arr).alias("c"))
        .select(
            "_id", F.col("c.idx").alias("idx"), F.col("c.chunk").alias("chunk")
        )
        .withColumn("ck", F.md5("chunk"))
    )


def substring_dedup_apply(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
) -> DataFrame:
    """APPLY substring-level dedup (the remove step Lee et al. 2022
    perform after finding duplicated spans; :func:`substring_dup_stats`
    only reports): remove all but ONE copy of every duplicated
    ``window``-char chunk across the corpus, keeping the canonical
    first occurrence (smallest (id, chunk_idx) — deterministic,
    partitioning-independent), and reassemble every document from its
    surviving chunks in original order — line_dedup's order-preserving
    rebuild convention at the substring granularity.

    Chunking is the NON-OVERLAPPING tiling (stride == window): apply
    semantics need each character owned by exactly one chunk, or
    removing one overlapping window would tear text a kept window still
    claims. The honest trade vs the stats operator's stride-32 windows:
    a shared run must tile-align to dedup (verbatim-duplicated
    documents and long aligned runs do; arbitrarily-offset shared runs
    need Lee '22's suffix array, whose global suffix sort is the cost
    this tiling avoids). The sub-window tail of each document is never
    removed.

    Output: (id, kept_text, n_chunks, n_removed) — n_chunks full
    windows, n_removed of them deleted as non-canonical copies; docs
    shorter than ``window`` pass through verbatim with n_chunks = 0.

    Scale shape: one chunk explode (1/window of corpus chars as rows);
    canonical pick is ONE hash-agg on the chunk hash (min struct —
    map-side combine); an equi-join back on the hash (no broadcast: the
    dup set is corpus-scale on a duplicated corpus, exactly
    substring_dup_stats' reasoning); per-doc rebuild is a collect_list
    bounded by document chunk count, line_dedup's class."""
    chunks = _substring_chunks(df, id_col, text_col, window)
    canon = chunks.groupBy("ck").agg(
        F.min(F.struct(F.col("_id"), F.col("idx"))).alias("first")
    )
    kept = chunks.join(canon, "ck").filter(
        (F.col("_id") == F.col("first._id"))
        & (F.col("idx") == F.col("first.idx"))
    )
    return _substring_rebuild(df, kept, id_col, text_col, window)


def _substring_rebuild(
    df: DataFrame,
    kept: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
) -> DataFrame:
    """Order-preserving reassembly of surviving chunks + the untouched
    sub-window tail: (id, kept_text, n_chunks, n_removed)."""
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            "",
        ).alias("_body"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    n_full = F.floor(F.length(text_col) * F.lit(1.0) / F.lit(window)).cast(
        "bigint"
    )
    tail = F.expr(
        f"substring({text_col}, CAST(floor(length({text_col}) * 1.0 "
        f"/ {window}) AS INT) * {window} + 1)"
    )
    return (
        df.select(F.col(id_col), n_full.alias("n_chunks"), tail.alias("_tail"))
        .join(rebuilt, F.col(id_col) == F.col("_id"), "left")
        .select(
            id_col,
            F.concat(
                F.coalesce(F.col("_body"), F.lit("")), F.col("_tail")
            ).alias("kept_text"),
            "n_chunks",
            (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def substring_kept_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
) -> DataFrame:
    """The standing-index form of :func:`substring_dedup_apply`'s
    decision: the SURVIVING chunk rows (id, idx, ck) after canonical-
    first dedup — hash-sized state, no chunk text. This is the table
    :func:`substring_index_delta` folds; re-chunking the reassembled
    kept_text would shift offsets, so the index must be these rows,
    not a re-tiling."""
    chunks = _substring_chunks(df, id_col, text_col, window)
    canon = chunks.groupBy("ck").agg(
        F.min(F.struct(F.col("_id"), F.col("idx"))).alias("first")
    )
    return (
        chunks.join(canon, "ck")
        .filter(
            (F.col("_id") == F.col("first._id"))
            & (F.col("idx") == F.col("first.idx"))
        )
        .select(F.col("_id").alias(id_col), "idx", "ck")
    )


def substring_index_delta(
    standing_chunks: DataFrame,
    delta_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Incremental substring dedup — the apply operator's member of
    the repo's incremental-index family (LSH / SemDeDup / BM25 /
    winnow / IVF-PQ discipline): chunk ONLY the delta batch, remove
    delta chunks whose hash the standing index already owns (standing
    documents are NEVER rewritten — their copies were canonical when
    they arrived), dedup canonically within the delta, and reassemble
    only delta documents.

    Returns (folded_chunks, delta_result):
    - folded_chunks: standing ∪ surviving delta chunk rows
      (id, idx, ck) — the next standing index.
    - delta_result: (id, kept_text, n_chunks, n_removed) for the
      delta docs.

    Equivalence contract (q_substring_index_delta pins it): under
    APPEND-ONLY MONOTONE ids (every delta id greater than every
    standing id — the natural ingest order, and the same caller-owned
    precondition class as bm25_index_delta's id uniqueness),
    delta_result == full-rebuild substring_dedup_apply(standing kept
    texts ∪ delta docs) restricted to delta ids: a standing-owned hash
    has the globally smallest (id, idx) occurrence in the standing
    corpus, so the full rebuild removes exactly the delta copies the
    anti-join removes here.

    Scale shape: delta-sized chunk explode; ownership is ONE
    hash-keyed left-anti join against the standing index (probed by
    the delta side); within-delta canonical pick is the same
    min-struct hash-agg; standing chunks are never re-read beyond the
    index itself."""
    dchunks = _substring_chunks(delta_docs, id_col, text_col, window)
    canon = dchunks.groupBy("ck").agg(
        F.min(F.struct(F.col("_id"), F.col("idx"))).alias("first")
    )
    delta_canon = dchunks.join(canon, "ck").filter(
        (F.col("_id") == F.col("first._id"))
        & (F.col("idx") == F.col("first.idx"))
    )
    owned = standing_chunks.select("ck").distinct()
    kept = delta_canon.join(owned, "ck", "left_anti")
    folded = standing_chunks.select(id_col, "idx", "ck").unionByName(
        kept.select(F.col("_id").alias(id_col), "idx", "ck")
    )
    result = _substring_rebuild(delta_docs, kept, id_col, text_col, window)
    return folded, result


def cdc_chunk_table(
    df: DataFrame,
    m: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking over TOKENS (the text analog of the
    storage-dedup CDC family — Muthitacharoen et al. LBFS SOSP'01,
    FastCDC ATC'16): a chunk boundary falls after every token whose
    portable 31-bit hash is ≡ 0 (mod ``m``), so boundaries are a LOCAL
    property of the content. The payoff vs fixed tiling
    (:func:`substring_dedup_apply`'s documented trade): an insertion
    or deletion shifts every aligned window after it, but CDC
    boundaries downstream of the edit are unchanged — shared runs
    dedup at ANY offset. Expected chunk length is ``m`` tokens
    (geometric); no min/max clamp, keeping the boundary rule stateless
    and engine-exact.

    Output: (id, chunk_id, chunk, ck) — chunk_id is the 0-based
    chunk ordinal, chunk the space-joined token span, ck = md5(chunk).

    Scale shape: tokenize explode (narrow); the chunk ordinal is a
    per-document running count of boundary flags — one window keyed by
    the document id (the line_dedup/collect_list class, linear); chunk
    assembly is a (id, chunk_id) hash-agg with an ordered array_sort
    fold."""
    from pyspark.sql import Window

    from .lsh import base_hash31

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    flag = (base_hash31(F.col("tok")) % F.lit(m) == 0).cast("int")
    w = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # boundary token ENDS its chunk: ordinal = flags strictly before it
    with_chunk = toks.withColumn(
        "chunk_id",
        F.coalesce(F.sum(flag).over(w), F.lit(0)).cast("bigint"),
    )
    return (
        with_chunk.groupBy("_id", "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk")
        )
        .select(
            F.col("_id").alias(id_col),
            "chunk_id",
            "chunk",
            F.md5("chunk").alias("ck"),
        )
    )


def cdc_dedup_apply(
    df: DataFrame,
    m: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY dedup over content-defined chunks: remove all but the
    canonical first copy (smallest (id, chunk_id)) of every duplicated
    CDC chunk and reassemble each document from its surviving chunks
    in order — :func:`substring_dedup_apply`'s semantics on
    :func:`cdc_chunk_table`'s boundaries, closing that operator's
    alignment-sensitivity trade: a shared run dedups wherever it sits
    in the document (pinned by the insertion-robustness test).

    Output: (id, kept_text, n_chunks, n_removed); kept_text is the
    surviving chunks joined by single spaces (token-level rebuild —
    original whitespace is not preserved, same as line_dedup's
    line-level convention).

    Scale shape: cdc_chunk_table's doc-keyed window + hash-agg; the
    canonical pick is one min-struct hash-agg on the chunk hash; join
    back on the hash (no broadcast — corpus-scale dup set on the
    corpus that needs this); per-doc rebuild bounded by chunk count."""
    chunks = cdc_chunk_table(df, m=m, id_col=id_col, text_col=text_col)
    canon = chunks.groupBy("ck").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_id"))).alias("first")
    )
    kept = chunks.join(canon, "ck").filter(
        (F.col(id_col) == F.col(f"first.{id_col}"))
        & (F.col("chunk_id") == F.col("first.chunk_id"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("_body"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    return (
        df.select(F.col(id_col))
        .join(totals, [id_col], "left")
        .join(rebuilt, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col("_body"), F.lit("")).alias("kept_text"),
            F.coalesce(F.col("n_chunks"), F.lit(0))
            .cast("bigint")
            .alias("n_chunks"),
            (
                F.coalesce(F.col("n_chunks"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10,
) -> DataFrame:
    """Inverted index over whitespace tokens: per term, the document
    frequency and a truncated posting list (first ``max_postings`` doc
    ids ascending).

    Scale shape: explode → distinct (term, doc) → ONE shuffle keyed by
    term for both the rank-truncation window and the df count (same
    partitioning, no second exchange). The posting list is rank-filtered
    BEFORE collect_list, so the per-group state is bounded by
    ``max_postings`` — a stop-term with df=10^9 still aggregates only
    ``max_postings`` ids (df itself is counted pre-truncation). Real
    search systems shard postings further; the truncated form is the
    relational core.
    """
    td = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy(F.asc(id_col))
    ranked = td.withColumn("__r", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.max("__r").alias("df"),
            F.sort_array(
                F.collect_list(F.when(F.col("__r") <= max_postings, F.col(id_col)))
            ).alias("postings"),
        )
    )


def classifier_quality_score(
    text_col: Column | str = "text",
    n_buckets: int = 4096,
    seed: str = "qc-v1",
) -> Column:
    """Hashed-linear text-classifier score (the fasttext-style structure
    behind CCNet/LLaMA-family "model-based quality filter" stages):
    tokenize, hash each token into ``n_buckets`` feature buckets with
    the portable md5 hash, mean-pool the per-bucket weights. Keep-rule:
    ``score >= 0`` (the mean weight is a monotone transform of the
    sigmoid logit, so thresholding it IS thresholding the classifier —
    log/exp-free by design, hence cross-engine exact like the DSIR
    variant in operators/curation.py).

    The hashing / pooling / thresholding plumbing is the real
    distributed shape — one narrow JVM-side pass, no shuffle, no UDF.
    The weight table is a DISCLOSED deterministic placeholder
    (``w[b] = (b % 2001 - 1000) / 1000``) because no trained model
    ships in this container; a real deployment substitutes its learned
    vector (a k-row broadcast map or a literal array) in this exact
    expression.
    """
    from .lsh import base_hash31

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(c), WS_SPLIT)

    def _weight(t: Column) -> Column:
        h = base_hash31(F.concat(t, F.lit(":" + seed)))
        return ((h % n_buckets) % 2001 - 1000) / F.lit(1000.0)

    total = F.aggregate(
        F.transform(toks, _weight), F.lit(0.0), lambda acc, v: acc + v
    )
    return total / F.size(toks).cast("double")


def bm25_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The corpus-side BM25 index frames, computed once:

    - ``tf`` (id, term, tf, dl): one explode + one hash-aggregate; the
      per-doc length rides through as ``min(dl)`` so no corpus-sized
      join is ever keyed on doc id.
    - ``stats`` (n_docs, sum_dl): the 1-row corpus aggregate.

    Multi-stage workloads (PRF expansion, repeated query batches)
    should persist/materialize these — they are what a production
    search system writes to the lake as its index."""
    base = docs.select(F.col(id_col), tokens(text_col).alias("_t")).select(
        F.col(id_col), F.size("_t").alias("dl"), F.explode("_t").alias("term")
    )
    tf = base.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("sum_dl"),
    )
    return tf, stats


def bm25_index_delta(
    standing_tf: DataFrame,
    standing_stats: DataFrame,
    delta_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    on_reingest: str = "allow",
) -> tuple[DataFrame, DataFrame]:
    """Incremental BM25 index maintenance: fold a batch of NEW
    documents into standing index frames — the daily-append path for
    the index-as-a-table discipline (bm25_index's docstring). The tf
    frame is append-only for new doc ids (one delta-sized tokenize +
    hash-agg, standing postings never re-read); the 1-row stats fold
    by addition. Downstream scoring (bm25_score_terms) recomputes df
    from the merged tf per query workload, so idf reflects the whole
    corpus — an incrementally-maintained index scores IDENTICALLY to
    a full rebuild (q_bm25_index_delta pins this with the full-rebuild
    oracle).

    The append-only contract is only CORRECT for genuinely new doc
    ids: re-ingesting an existing id would double-count its postings,
    df, n_docs, and sum_dl. ``on_reingest`` makes that failure loud
    instead of silent:

    - ``"allow"`` (default): trust the caller's append-only feed —
      zero extra cost, the delta fold stays delta-sized.
    - ``"error"``: any delta doc id already in the standing index
      trips an executor-side assert naming the id (lazy — embedded in
      the plan, fails on first materialization).
    - ``"skip"``: conflicting delta rows are anti-joined away, so the
      fold is idempotent under replayed batches.

    Both guard modes pay one distinct over standing doc ids per fold
    (corpus-sized — the price of checking); production appends with a
    trusted upstream key keep the default."""
    if on_reingest not in ("allow", "error", "skip"):
        raise ValueError(
            f"on_reingest must be allow|error|skip, got {on_reingest!r}"
        )
    if on_reingest != "allow":
        standing_ids = standing_tf.select(F.col(id_col)).distinct()
        if on_reingest == "skip":
            delta_docs = delta_docs.join(standing_ids, id_col, "left_anti")
        else:
            dup = standing_ids.withColumn("_standing", F.lit(True))
            delta_docs = (
                delta_docs.join(dup, id_col, "left")
                .filter(
                    F.assert_true(
                        F.col("_standing").isNull(),
                        F.concat(
                            F.lit(
                                "bm25_index_delta(on_reingest=error): "
                                f"delta re-ingests standing {id_col}="
                            ),
                            F.col(id_col).cast("string"),
                        ),
                    ).isNull()
                )
                .drop("_standing")
            )
    tf_d, stats_d = bm25_index(delta_docs, id_col=id_col, text_col=text_col)
    tf2 = standing_tf.unionByName(tf_d)
    stats2 = (
        standing_stats.unionByName(stats_d)
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("sum_dl").cast("bigint").alias("sum_dl"),
        )
    )
    return tf2, stats2


def bm25_score_terms(
    tf: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_id: str = "query_id",
    max_df_frac: float | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """BM25 scores (query_id, id, score_x1e6) for an explicit
    (query_id, term) workload frame against :func:`bm25_index` frames
    — the scoring core shared by :func:`bm25_topk` and the PRF
    expansion (operators/retrieval.py:bm25_prf_topk). Scoring formula,
    exactness policy, and scale shape: see :func:`bm25_topk`.

    ``weight_col``: optional INTEGER weight column on ``qterms``; each
    per-(query, doc, term) contribution becomes
    ``floor(idf * sat * 1e6) * weight`` — floor FIRST, then bigint
    multiply, so the weighted sum stays an order-independent integer
    aggregate (the quantized analog of RM3's query-interpolation
    weights)."""
    qterms = qterms.distinct()
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
    )
    if max_df_frac is not None:
        frac_ppm = int(max_df_frac * 1_000_000)
        dfreq = (
            dfreq.crossJoin(F.broadcast(stats.select("n_docs")))
            .filter(
                F.col("df_t") * F.lit(1_000_000) <= F.lit(frac_ppm) * F.col("n_docs")
            )
            .select("term", "df_t")
        )
    n_d = F.col("n_docs").cast("double")
    df_d = F.col("df_t").cast("double")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_d
    idf = (n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))
    sat = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d + F.lit(k1) * ((F.lit(1.0) - F.lit(b)) + F.lit(b) * (dl_d / avgdl))
    )
    scored = (
        # dfreq first: under max_df_frac the surviving-term set is the
        # pruned one, so stop-term postings never fan out into query rows
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(query_id),
            F.col(id_col),
            (
                F.floor(idf * sat * F.lit(1000000.0)).cast("bigint")
                if weight_col is None
                else F.floor(idf * sat * F.lit(1000000.0)).cast("bigint")
                * F.col(weight_col).cast("bigint")
            ).alias("_sq"),
        )
    )
    return scored.groupBy(query_id, id_col).agg(F.sum("_sq").alias("score_x1e6"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_col: str = "query_text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Batch BM25 retrieval: top-``k`` documents per query (Robertson &
    Zaragoza 2009, the Okapi weighting behind every classic search
    engine — the lexical-retrieval leg of a RAG / data-selection
    pipeline, next to the embedding ANN family in similarity.py).

    Scoring. Per matched (query, doc, term):

        idf = (N - df + 0.5) / (df + 0.5)            -- RATIONAL, no ln
        sat = tf * (k1 + 1) / (tf + k1 * ((1 - b) + b * dl / avgdl))
        contribution = floor(idf * sat * 1e6)        -- bigint

    and the document score is the integer SUM of contributions. Two
    deliberate engine-exactness choices, same policy as tfidf_topk and
    lm_score: the idf keeps the classic +0.5 smoothing but drops the
    outer ln (libm transcendentals round differently across engines;
    the rational form keeps every per-term value a fixed dag of IEEE
    ops, bit-identical anywhere) — note rankings CAN differ from
    log-BM25 when summing multiple terms, this is a documented variant,
    not an approximation bug — and each contribution is quantized to an
    integer BEFORE the sum so the aggregate is order-independent
    (double addition is not associative; bigint addition is).

    Scale shape (100 TB corpus, q queries): tokens explode once; tf and
    df are linear hash-aggregates; dl rides through the tf aggregate
    (min over a per-doc constant) so no corpus-sized join is ever
    keyed on doc id. The query term set (q * terms rows) broadcasts
    onto the term-keyed tf frame, so only postings matching some query
    term survive into the scoring join; df joins on term after the same
    broadcast semi-filter (bounded by |query vocabulary|); N/sum_dl is
    a 1-row broadcast. The final top-k is a row_number window
    partitioned by query — q partitions, each bounded by matched docs.

    ``max_df_frac``: the one way "bounded by matched postings" fails at
    100 TB is a stop-term in a query ("the") whose posting list IS the
    corpus — near-zero idf weight, full-corpus cost. When set, query
    terms with df > max_df_frac * N are dropped before the posting
    join (integer-arithmetic cut, df_t * 10^6 > frac_ppm * n_docs, no
    float threshold — the boilerplate_flags convention), bounding the
    scoring fan-out by the df cap. Default None preserves exact BM25
    (the oracle-checked contract path).
    """
    tf, stats = bm25_index(docs, id_col, text_col)
    qterms = queries.select(
        F.col(query_id), F.explode(tokens(query_col)).alias("term")
    ).distinct()
    agg = bm25_score_terms(
        tf, stats, qterms, k1, b, id_col, query_id, max_df_frac
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score_x1e6"), F.asc(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "score_x1e6", "rank")
    )


def qld_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    mu: int = 300,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_col: str = "query_text",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR 2001 — the other classic lexical ranker next to
    BM25; the standard LM-based baseline in IR evaluation):

        p(w|d) = (tf + mu * cf_w / cf_total) / (dl + mu)

    ranked by the document's total QUANTIZED surprisal over the query
    terms — lower sum_bits = higher likelihood. Engine-exactness uses
    the lm_score bit-length discipline at its scale-proof tier: per
    term, ``bits = floor(log2(1/p))`` computed as the binary length of
    the INTEGER division

        ((dl + mu) * cf_total) div (tf * cf_total + mu * cf_w)

    (p <= 1 always since tf <= dl and cf_w <= cf_total, so the ratio
    is >= 1; `div`/`//` is exact integer arithmetic in both engines —
    no double rounding at any corpus size, unlike a ppm quantization
    whose cross-products pass 2^53 at web scale). Query terms absent
    from the corpus carry no evidence and are dropped by the cf join
    (both engines alike); the aggregate is an order-free bigint sum.

    Scale shape — identical to bm25_topk: tokens explode once, tf/cf
    are linear hash-aggregates, the query vocabulary broadcasts onto
    term-keyed postings so only matching postings survive, candidates
    get one (doc, term)-keyed left join back to tf for the missing-
    term background mass, and the final top-k is a per-query window.
    Smoothing means EVERY doc has nonzero likelihood; like every
    practical engine this ranks only candidates that match >= 1 query
    term (a no-hit doc can never out-rank a hit under equal dl).
    Output: (query_id, id, n_hit_terms, sum_bits, rank)."""
    tf, stats = bm25_index(docs, id_col, text_col)
    qt = (
        queries.select(
            F.col(query_id), F.explode(tokens(query_col)).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # query-vocabulary-bounded + 1-row frames: safe broadcasts
    cf = F.broadcast(
        tf.groupBy("term")
        .agg(F.sum("tf").cast("bigint").alias("cf_w"))
        .join(qt.select("term").distinct(), "term")
    )
    matched = tf.join(F.broadcast(qt), "term")
    cand = matched.groupBy(query_id, id_col).agg(
        F.min("dl").alias("dl"),
        F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
    )
    full = (
        cand.join(F.broadcast(qt), query_id)
        .join(
            tf.select(F.col(id_col), "term", "tf"), [id_col, "term"], "left"
        )
        .join(cf, "term")
        .crossJoin(
            F.broadcast(stats.select(F.col("sum_dl").alias("cf_total")))
        )
    )
    num = (F.col("dl").cast("bigint") + F.lit(mu)) * F.col("cf_total").cast(
        "bigint"
    )
    den = (
        F.coalesce(F.col("tf"), F.lit(0)).cast("bigint")
        * F.col("cf_total").cast("bigint")
        + F.lit(mu) * F.col("cf_w")
    )
    per = full.select(
        query_id,
        id_col,
        "n_hit_terms",
        num.alias("_num"),
        den.alias("_den"),
    ).select(
        query_id,
        id_col,
        "n_hit_terms",
        # `div` = exact bigint division (no double rounding at any scale)
        (F.length(F.bin(F.expr("_num div _den"))) - F.lit(1))
        .cast("bigint")
        .alias("bits"),
    )
    agg = per.groupBy(query_id, id_col).agg(
        F.max("n_hit_terms").alias("n_hit_terms"),
        F.sum("bits").cast("bigint").alias("sum_bits"),
    )
    w = Window.partitionBy(query_id).orderBy(F.asc("sum_bits"), F.asc(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "n_hit_terms", "sum_bits", "rank")
    )


def hash_embed(
    docs: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashed text embedding (the hashing trick — Weinberger
    et al., ICML 2009): every token hashes to a bucket in [0, dim)
    with a +/-1 sign drawn from an independent hash bit, and the
    document's vector is the INTEGER sum of signs per bucket — the
    classic cheap text->vector path when no learned encoder ships
    (the vector twin of classifier_quality_score's hashed features).

    Engine-exactness: bucket and sign come from the portable 60-bit
    md5 hash (sign = 1 - 2*(h % 2), bucket = (h // 2) % dim — disjoint
    bits), values are bigint sums, so the embedding is bit-identical
    on any engine with md5. Output is the SPARSE exploded form
    (id, dim_idx, val != 0); consumers densify or sparse-join.

    Scale shape: one tokenize + one (id, bucket)-keyed hash-agg with
    map-side combine — the same linear shape as tf. dim is a
    constant; the output is at most dim rows per document.
    """
    from ..functions.sketches import kmv_hash

    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    h = kmv_hash("term")
    sgn = (F.lit(1) - F.lit(2) * F.pmod(h, F.lit(2))).cast("bigint")
    bucket = F.pmod(F.shiftright(h, 1), F.lit(dim))
    return (
        toks.select(F.col(id_col), bucket.alias("dim_idx"), sgn.alias("_s"))
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("_s").alias("val"))
        .filter(F.col("val") != 0)
    )


def substring_dup_spans(
    docs: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT any-offset duplicate-substring detection (the Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"
    suffix-array semantics, arXiv:2107.06499): every maximal token span
    that is part of a duplicated run of >= ``min_len`` tokens, at ANY
    offset, in any document — the capability the aligned 64-char tiling
    and CDC chunking (substring_dedup_* above) approximate at chunk
    granularity and provably miss at non-boundary offsets (pinned by
    the contrast test).

    The suffix-array reduction: a run of >= L tokens is shared iff some
    SLIDING L-gram (stride 1 — not the tiled stride-L grams) is shared,
    so exact detection is an equi-join on the hashed L-gram — the same
    linear-rows shape as the BM25 explode, replacing the suffix array's
    sequential construction with one corpus-keyed shuffle. Gram keys
    are full md5 hex (the exact-dedup equality class, not a 31-bit
    sketch). Canonicality: the lexicographically first occurrence
    (doc_id, pos) of each gram survives; spans are reported for
    NON-canonical occurrences only, merged to maximal form by
    gaps-and-islands (consecutive duplicated window starts).

    Output: (doc_id, span_start, span_end, n_windows) with 1-based
    inclusive token indices, end = last window start + L - 1.

    Scale shape: the gram explode is one map-side transform (token-
    count rows, ~50 B each); duplication + canonicality is ONE hash-agg
    keyed by gram; the island merge is a doc-keyed window over the
    duplicated positions only (dup-proportional, not corpus-
    proportional). No pairwise joins, no suffix sort."""
    occ = _sliding_grams(docs, min_len, id_col, text_col)
    stats = occ.groupBy("gkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
    )
    noncanon = (
        occ.join(stats, "gkey")
        .filter(
            (F.col("_n") > 1)
            & ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
        .select(id_col, "pos")
        .distinct()
    )
    return _islands_to_spans(noncanon, min_len, id_col)


def _sliding_grams(
    docs: DataFrame, min_len: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gkey): every SLIDING (stride-1) ``min_len``-token gram
    of every doc, keyed by full md5 hex (the exact-equality class).
    1-based token positions. Shared by the any-offset dedup family and
    decontamination."""
    arr = tokens(text_col)
    base = docs.select(F.col(id_col), arr.alias("_t")).filter(
        F.size("_t") >= min_len
    )
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("_t"), i + j) for j in range(min_len)]
    )
    gh = F.transform(
        F.sequence(F.lit(1), F.size("_t") - F.lit(min_len - 1)),
        lambda i: F.struct(i.cast("bigint").alias("pos"),
                           F.md5(gram(i)).alias("gkey")),
    )
    return base.select(F.col(id_col), F.explode(gh).alias("g")).select(
        id_col, F.col("g.pos").alias("pos"), F.col("g.gkey").alias("gkey")
    )


def _islands_to_spans(
    positions: DataFrame, min_len: int, id_col: str
) -> DataFrame:
    """Merge flagged window-start positions to maximal spans by
    gaps-and-islands: (id, span_start, span_end, n_windows), end =
    last window start + min_len - 1. Doc-keyed window over the flagged
    positions only (flag-proportional, not corpus-proportional)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        positions.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(min_len - 1)).alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        )
        .drop("_grp")
    )


def decontaminate_spans(
    docs: DataFrame,
    bench: DataFrame,
    min_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Span-level benchmark decontamination DETECTION (VERDICT r10 #5):
    every maximal corpus token span sharing a >= ``min_len``-token run
    with the BENCHMARK set, at any offset — :func:`substring_dup_spans`
    with the reference grams coming from a separate frame and NO
    canonicality (any overlap with the benchmark is contamination; the
    benchmark itself is never rewritten). This is the production
    decontamination semantics (GPT-3 appendix C / PaLM / Llama n-gram
    overlap): q_decontaminate's whole-doc flag drops the entire
    document, while the span form cuts the contaminated run and keeps
    the remainder.

    Output: (doc_id, span_start, span_end, n_windows), 1-based
    inclusive token indices into the CORPUS doc.

    Scale shape: benchmark gram set is one distinct over the (small,
    eval-suite-sized) reference frame — AQE broadcasts it; corpus-side
    work is the same linear sliding-gram explode + one semi equi-join +
    a flag-proportional island merge. No pairwise joins."""
    bg = benchmark_gram_index(bench, min_len, id_col, bench_text_col)
    return decontaminate_spans_indexed(docs, bg, min_len, id_col, text_col)


def benchmark_gram_index(
    bench: DataFrame,
    min_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The FROZEN decontamination artifact: the distinct sliding
    ``min_len``-gram keys of the benchmark set — built (and in a real
    pipeline persisted) once per benchmark release. Corpus batches are
    independent given this index (no corpus-corpus interaction in
    decontamination), so the incremental fold is
    :func:`decontaminate_apply_indexed` over just the delta batch —
    delta-sized by construction, == the full rebuild restricted to the
    delta ids (pinned by test_decontaminate.py)."""
    return (
        _sliding_grams(bench, min_len, id_col, text_col)
        .select("gkey")
        .distinct()
    )


def decontaminate_spans_indexed(
    docs: DataFrame,
    gram_index: DataFrame,
    min_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`decontaminate_spans` against a prebuilt
    :func:`benchmark_gram_index` (the incremental path)."""
    occ = _sliding_grams(docs, min_len, id_col, text_col)
    hit = (
        occ.join(gram_index, "gkey", "left_semi")
        .select(id_col, "pos")
        .distinct()
    )
    return _islands_to_spans(hit, min_len, id_col)


def decontaminate_apply_indexed(
    docs: DataFrame,
    gram_index: DataFrame,
    min_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`decontaminate_apply` against a prebuilt gram index —
    the per-batch fold of the incremental decontamination story."""
    spans = decontaminate_spans_indexed(
        docs, gram_index, min_len, id_col, text_col
    )
    return _remove_spans(docs, spans, id_col, text_col)


def decontaminate_apply(
    docs: DataFrame,
    bench: DataFrame,
    min_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Span-level decontamination APPLY: cut every token covered by a
    benchmark-overlap span (:func:`decontaminate_spans`) and rejoin the
    remainder in token order — the doc survives with the contaminated
    run removed and its tails intact (pinned by the planted-overlap
    test + q_decontaminate_apply oracle). Same removal machinery as
    :func:`substring_dedup_any_offset_apply`."""
    spans = decontaminate_spans(
        docs, bench, min_len, id_col, text_col, bench_text_col
    )
    return _remove_spans(docs, spans, id_col, text_col)


def substring_dedup_any_offset_apply(
    docs: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Canonical-first REMOVAL under the any-offset semantics: every
    token covered by a non-canonical duplicated span
    (:func:`substring_dup_spans`) is cut; the remainder rejoins in
    token order — the Lee '22 policy (keep exactly the first
    occurrence of each duplicated run) at token granularity.

    Scale shape: spans explode to their covered token indices
    (REMOVED-token-proportional — spans are maximal, so no overlap
    blowup), one anti-join against the posexploded corpus, one per-doc
    rebuild agg."""
    spans = substring_dup_spans(docs, min_len, id_col, text_col)
    return _remove_spans(docs, spans, id_col, text_col)


def _remove_spans(
    docs: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Cut every token covered by a (span_start, span_end) row and
    rebuild the remainder in token order: (id, kept_text, n_tokens,
    n_removed). Shared by the any-offset dedup apply and
    decontamination apply."""
    removed = spans.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end"))
        ).alias("tpos"),
    ).distinct()
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("_p0", "tok"),
    ).select(id_col, (F.col("_p0") + 1).alias("tpos"), "tok")
    kept = toks.join(removed, [id_col, "tpos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("kept_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    return (
        docs.select(F.col(id_col), token_count(text_col).alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


# GPT-2-convention byte-level pre-tokenization: split the text into
# pieces that KEEP their leading whitespace (" word"), plus a trailing
# pure-whitespace piece, so concat(pieces) == text exactly and the
# tokenizer round-trips losslessly. Both Java regex and RE2 treat the
# alternation identically (pinned by test_bpe_bytes_roundtrip).
BYTE_PIECES = r"\s*\S+|\s+$"


def byte_pieces(text: Column | str) -> Column:
    """Whitespace-preserving pre-tokenizer pieces (array<string>)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BYTE_PIECES), 0)


def byte_syms(word: Column | str) -> Column:
    """A piece as its UTF-8 byte sequence, one 2-hex-digit symbol per
    byte (array<string>). Hex-pair symbols instead of GPT-2's printable
    remapping: the engine-portable spelling (Spark hex == DuckDB hex,
    both uppercase; chr() beyond 255 is engine-specific), losslessly
    reversible via unhex. Merge outputs concatenate, so every BPE symbol
    at any depth is the hex of the exact bytes it covers — decode is
    one unhex of the concatenated symbols."""
    c = F.col(word) if isinstance(word, str) else word
    return F.split(
        F.trim(F.regexp_replace(F.hex(F.encode(c, "UTF-8")), "(..)", "$1 ")),
        " ",
    )


def _bpe_apply_merge(arr, a: str, b: str, merged: str):
    """Apply one BPE merge to a token array: textbook greedy
    left-to-right fold — every non-overlapping (a, b) becomes
    ``merged`` in a single pass ('a a a a' with (a,a) -> ['aa','aa']).
    The same fold the DuckDB oracle runs via list_reduce."""
    return F.aggregate(
        arr,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (t == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def bpe_train(docs: DataFrame, n_merges: int = 5, text_col: str = "text") -> DataFrame:
    """Train byte-pair-encoding merges (Sennrich, Haddow & Birch, ACL
    2016) in-engine: the corpus collapses to a word-frequency table
    ONCE (the standard BPE trick — training cost is vocabulary-sized,
    not corpus-sized), words become character sequences, and each round
    counts adjacent symbol pairs weighted by word frequency, picks the
    most frequent pair (ties to the lexicographically smallest), and
    applies the merge with the greedy left-to-right fold.

    Returns the trained artifact: (step, pair, merged, freq) — one row
    per merge, the merges.txt a tokenizer ships.

    Determinism: pair counts are integer sums; selection ties break on
    the pair string; the merge application is the same sequential fold
    in Spark (F.aggregate) and DuckDB (list_reduce). Scale shape: one
    corpus pass for word counts (hash-agg with map-side combine), then
    n_merges rounds over the vocabulary-sized sequence table
    (localCheckpoint-pinned per round — the pagerank lineage-cut
    convention), each collecting exactly ONE winning row.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        F.split(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")), " "
        ).alias("arr"),
        "freq",
    ).localCheckpoint(eager=True)

    pair_expr = F.expr(
        "CASE WHEN size(arr) > 1 THEN transform(sequence(1, size(arr) - 1), "
        "i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    out_rows = []
    for step in range(1, n_merges + 1):
        top = (
            cur.select("freq", F.explode(pair_expr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, f = top[0]["pair"], top[0]["f"]
        a, b = pair.split(" ", 1)
        merged = a + b
        out_rows.append((step, pair, merged, int(f)))
        cur = cur.select(
            _bpe_apply_merge(F.col("arr"), a, b, merged).alias("arr"), "freq"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out_rows, "step int, pair string, merged string, freq bigint"
    )


def _bpe_accept_prefix(
    cands: list[tuple[str, int]],
    top_k: int,
    merged_symbols: set[str],
    remaining: int,
) -> list[tuple[str, str, str, int]]:
    """Pure driver-side acceptance step for :func:`bpe_train_batched`:
    the maximal rank-order prefix of collected candidates that
    sequential BPE provably would pick in this order. Factored out so
    the batching invariants are unit-testable without a corpus.

    ``merged_symbols`` is the set of merge OUTPUTS produced so far
    (initial symbols are single characters — the per-char split — and
    merge outputs are >= 2 chars, so tracking outputs alone is exact).
    A candidate whose ``a + b`` already exists as a symbol is a
    merge-path collision: the pairs its merge creates — (x, ab) and
    (ab, y) — FOLD INTO the existing pairs' counts instead of starting
    from zero, so the created-pair bound below no longer bounds them
    and ``f_existing + created`` could overtake a later accepted
    candidate. A colliding candidate is therefore accepted only as the
    LAST member of its batch (as rank-1 it is exactly sequential
    BPE's pick; anything after it cannot be proven safe), and a
    collision with an earlier batch member's output stops the batch
    before it."""
    from collections import defaultdict

    tail_bound = cands[-1][1] if len(cands) == top_k else 0
    maxf_first: dict[str, int] = defaultdict(lambda: tail_bound)
    maxf_second: dict[str, int] = defaultdict(lambda: tail_bound)
    for p, f in cands:
        a, b = p.split(" ", 1)
        if f > maxf_first[a]:
            maxf_first[a] = f
        if f > maxf_second[b]:
            maxf_second[b] = f
    accepted: list[tuple[str, str, str, int]] = []
    used: set[str] = set()
    batch_merged: set[str] = set()
    new_pair_bound = -1
    for p, f in cands:
        if len(accepted) >= remaining:
            break
        a, b = p.split(" ", 1)
        merged = a + b
        collision = merged in merged_symbols or merged in batch_merged
        if accepted and (
            a in used or b in used or f <= new_pair_bound or collision
        ):
            break
        accepted.append((p, a, b, f))
        used.update((a, b, merged))
        batch_merged.add(merged)
        new_pair_bound = max(
            new_pair_bound, maxf_second[a], maxf_first[b]
        )
        if collision:
            break
    return accepted


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    top_k: int = 512,
    rounds_out: list | None = None,
) -> DataFrame:
    """:func:`bpe_train` with EXACT conflict-free batching — the same
    merge sequence, bit-identical artifact, in far fewer Spark rounds
    (realistic tokenizers run 32k merges; one job per merge is a
    driver-latency wall, not a data wall).

    Per round, ONE pair-count job collects the top-``top_k`` pairs;
    the driver then accepts the maximal RANK-ORDER PREFIX of
    candidates that sequential BPE provably would have picked in this
    order, and applies them all in one fold. A candidate c_i joins the
    batch only if

    - its symbols are disjoint from every earlier accepted pair's
      symbols AND merged outputs (disjointness ⇒ its count and the
      count semantics of its own merge are unchanged by the earlier
      merges in the batch), and
    - ``f_i`` is STRICTLY greater than the largest count any pair
      newly created by the earlier merges could have: a merge (a,b)
      creates only pairs (x,ab) with count <= count((x,a)) and (ab,y)
      with count <= count((b,y)), so the bound is
      max(maxf_second(a), maxf_first(b)) over accepted merges —
      computed driver-side from the collected top-k, with f_k
      bounding every uncollected tail pair.

    Acceptance stops at the FIRST rejection (a conflicted higher-rank
    pair might still win its sequential round, so nothing after it can
    be batched safely). Conflict-free prefixes are the common case in
    natural text, so rounds collapse by the observed batch factor
    while the output stays equal to bpe_train's — pinned by
    test_bpe_batched_equals_sequential and the same unrolled DuckDB
    oracle (q_bpe_merges_batched).

    A candidate whose merged output ``a + b`` ALREADY exists as a
    symbol (created earlier via a different merge path) ends its batch:
    the pairs its merge creates fold into existing counts, so the
    created-pair bound above does not cover them — see
    :func:`_bpe_accept_prefix`, where the acceptance invariants live
    and are unit-tested.

    ``rounds_out``: optional list; one entry (the batch size) is
    appended per Spark round — the measurement hook
    tools/bpe_scale_probe.py reads the batch factor from."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        F.split(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")), " "
        ).alias("arr"),
        "freq",
    ).localCheckpoint(eager=True)

    pair_expr = F.expr(
        "CASE WHEN size(arr) > 1 THEN transform(sequence(1, size(arr) - 1), "
        "i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    out_rows: list[tuple[int, str, str, int]] = []
    merged_symbols: set[str] = set()
    while len(out_rows) < n_merges:
        top = (
            cur.select("freq", F.explode(pair_expr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("pair"))
            .limit(top_k)
            .collect()
        )
        if not top:
            break
        cands = [(r["pair"], int(r["f"])) for r in top]
        accepted = _bpe_accept_prefix(
            cands, top_k, merged_symbols, n_merges - len(out_rows)
        )
        if rounds_out is not None:
            rounds_out.append(len(accepted))
        arr: Column = F.col("arr")
        for p, a, b, f in accepted:
            out_rows.append((len(out_rows) + 1, p, a + b, f))
            merged_symbols.add(a + b)
            arr = _bpe_apply_merge(arr, a, b, a + b)
        cur = cur.select(arr.alias("arr"), "freq").localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(
        out_rows, "step int, pair string, merged string, freq bigint"
    )


def bpe_train_local(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    max_vocab: int = 2_000_000,
    unit: str = "char",
) -> DataFrame:
    """:func:`bpe_train`'s driver-side merge FINISHER — bit-identical
    merge table, realistic depth (32k merges in seconds, not 25 h of
    sequential Spark rounds).

    The insight closing the depth bound: after ONE corpus pass, BPE
    training state is the word-frequency table — VOCABULARY-sized, not
    corpus-sized (the same trick bpe_train exploits in-engine). That is
    the bounded-artifact class the repo already collects (k-means
    centroids at operators/kmeans.py, PQ codebooks, zorder stats), so
    the table collects under an explicit ``max_vocab`` cap (raises past
    it — never silent truncation: a truncated vocabulary would train
    DIFFERENT merges) and the 32k merge rounds run in pure Python with
    the classic incremental structures (Sennrich's learn_bpe shape):
    pair counts + a pair->words inverted index + a lazy-deletion heap,
    so each merge touches only the words containing its pair.

    Determinism parity with bpe_train, piece by piece:
    - counts are integer sums of word freqs — exact in both;
    - selection orders by (freq desc, pair-string asc); the heap orders
      by the literal ``"a b"`` string, and Python's code-point order ==
      Spark UTF8_BINARY's UTF-8 byte order (UTF-8 preserves code-point
      order), so ties break identically;
    - the merge application is the same greedy left-to-right
      non-overlapping fold as :func:`_bpe_apply_merge`.

    ``unit="byte"`` trains BYTE-LEVEL BPE (the GPT-2 convention): the
    word table comes from the whitespace-preserving pre-tokenizer
    (:func:`byte_pieces`) and initial symbols are 2-hex-digit bytes
    (:func:`byte_syms`) — no OOV is possible (any text is bytes) and
    unicode splits are deterministic. Tie-break parity holds in byte
    mode too: hex-pair symbols are fixed-width ASCII, so lexicographic
    order on symbol strings == numeric order on bytes in both engines.

    Pinned by test_bpe_local_equals_engine (both probe corpora) and the
    q_bpe_merges oracle (q_bpe_merges_local); byte mode by
    q_bpe_bytes_merges vs the byte-flavored unrolled oracle."""
    import heapq
    from collections import Counter

    if unit not in ("char", "byte"):
        raise ValueError(f"unit must be char|byte, got {unit!r}")
    spark = docs.sparkSession
    word_src = (
        F.explode(tokens(text_col))
        if unit == "char"
        else F.explode(byte_pieces(text_col))
    )
    words = (
        docs.select(word_src.alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    rows = words.limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; a truncated "
            f"vocabulary would train different merges — raise the cap "
            f"or use bpe_train_batched"
        )

    def _split(w: str) -> list[str]:
        if unit == "char":
            return list(w)
        h = w.encode("utf-8").hex().upper()
        return [h[i : i + 2] for i in range(0, len(h), 2)]

    seqs: list[list[str]] = [_split(r["w"]) for r in rows]
    freqs: list[int] = [int(r["freq"]) for r in rows]

    # pair state: counts, inverted index, lazy-deletion heap. Heap
    # entries are (-freq, "a b", (a, b)) pushed on EVERY count change;
    # an entry is live iff its freq matches the current count, so the
    # heap top is always the true (freq desc, pair asc) winner.
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, seq in enumerate(seqs):
        f = freqs[idx]
        for p in zip(seq, seq[1:]):
            pair_counts[p] += f
            pair_words.setdefault(p, set()).add(idx)
    heap: list[tuple[int, str, tuple[str, str]]] = [
        (-f, f"{p[0]} {p[1]}", p) for p, f in pair_counts.items()
    ]
    heapq.heapify(heap)

    def bump(p: tuple[str, str], delta: int) -> None:
        nf = pair_counts[p] + delta
        if nf <= 0:
            pair_counts.pop(p, None)
            pair_words.pop(p, None)
        else:
            pair_counts[p] = nf
            heapq.heappush(heap, (-nf, f"{p[0]} {p[1]}", p))

    out_rows: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = None
        while heap:
            nf, _ps, p = heap[0]
            if pair_counts.get(p) == -nf:
                best = p
                break
            heapq.heappop(heap)  # stale
        if best is None:
            break
        a, b = best
        merged, f = a + b, pair_counts[best]
        out_rows.append((step, f"{a} {b}", merged, f))
        for idx in sorted(pair_words.get(best, ())):
            seq, wf = seqs[idx], freqs[idx]
            old = Counter(zip(seq, seq[1:]))
            new_seq: list[str] = []
            for t in seq:
                if new_seq and new_seq[-1] == a and t == b:
                    new_seq[-1] = merged
                else:
                    new_seq.append(t)
            seqs[idx] = new_seq
            new = Counter(zip(new_seq, new_seq[1:]))
            for p in set(old) | set(new):
                d = new[p] - old[p]
                if d:
                    bump(p, d * wf)
                if new[p] == 0:
                    ws = pair_words.get(p)
                    if ws is not None:
                        ws.discard(idx)
                elif old[p] == 0 and p in pair_counts:
                    pair_words.setdefault(p, set()).add(idx)
    return spark.createDataFrame(
        out_rows, "step int, pair string, merged string, freq bigint"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode the corpus to TOKEN IDS with a trained merge list — the
    artifact consumer a training pipeline actually feeds (bpe_segment
    stops at counts): (id, seq_pos, token_id), one row per BPE symbol
    in document order.

    Vocabulary ids are the standard tokenizer-file convention (GPT-2
    style: base alphabet first, then merges in training order):
    distinct corpus characters sorted lexicographically take ids
    0..C-1, merge outputs take C+step-1. Characters are length-1 and
    merge outputs length>=2, so the ranges never collide; duplicate
    merge OUTPUTS (two paths to one symbol — see _bpe_accept_prefix)
    keep the earliest id.

    Scale shape: the folds apply on the DISTINCT-WORD vocabulary
    (bpe_segment's production shape); the char-id frame is an
    alphabet-sized single-partition window (the zorder-boundary
    class); symbol->id is an equi-join against the bounded vocab frame
    (AQE broadcasts it); the per-doc sequence index is one doc-keyed
    row_number window."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    words = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("wpos", "w")
    ).filter(F.col("w") != "")
    # The distinct-word vocabulary feeds THREE consumers (the fold
    # frame, the alphabet ids, the alphabet count); pin it once so the
    # corpus scan+explode+distinct runs once instead of once per
    # consumer, and so the planner sees the frame's true (vocab-sized)
    # size — without it the static estimator bottoms out at the file
    # size of `documents` and happily broadcasts the CORPUS side of
    # the symbol join instead.
    vocab_words = words.select("w").distinct().localCheckpoint(eager=True)
    arr = F.split(F.trim(F.regexp_replace("w", "(.)", "$1 ")), " ")
    chars = vocab_words.select(F.explode(arr).alias("sym")).distinct()
    # Unpartitioned Window.orderBy = single-partition sort, but over the
    # DISTINCT-CHARACTER frame: alphabet-sized (hundreds of rows at any
    # corpus scale), the same bounded class as the zorder boundary
    # window. This is the source of the 'WindowExec: No Partition
    # Defined' warnings in the bench tail — expected and safe here; it
    # would be a scale bug only on a corpus-sized frame.
    w_char = Window.orderBy("sym")
    char_ids = chars.select(
        "sym", (F.row_number().over(w_char) - F.lit(1)).cast("bigint").alias(
            "token_id"
        )
    )
    n_chars = char_ids.agg(F.count(F.lit(1)).alias("_c"))
    merge_rows = spark.createDataFrame(
        [(m, i) for i, (_a, _b, m) in enumerate(merges)],
        "sym string, _step int",
    )
    merge_ids = (
        merge_rows.groupBy("sym")
        .agg(F.min("_step").alias("_step"))  # earliest id on output dup
        .crossJoin(F.broadcast(n_chars))
        .select(
            "sym", (F.col("_c") + F.col("_step")).cast("bigint").alias(
                "token_id"
            )
        )
    )
    vocab = char_ids.unionByName(merge_ids)
    folded = arr
    for a, b, merged in merges:
        folded = _bpe_apply_merge(folded, a, b, merged)
    seg = vocab_words.select("w", folded.alias("_syms"))
    # seg/vocab are vocab-sized: Heaps-bounded (sub-linear in corpus
    # size), NOT constant-bounded like merge_ids — broadcast is right
    # up to ~10^8 distinct words (the 8 GB relation cap); beyond that
    # drop the hint and let the planner shuffle-join the token stream
    # (documented watch item, the ilog2_cost discipline). Broadcasting
    # keeps the corpus side out of the exchange entirely.
    symrows = words.join(F.broadcast(seg), "w").select(
        F.col(id_col),
        "wpos",
        F.posexplode("_syms").alias("spos", "sym"),
    )
    w_seq = Window.partitionBy(id_col).orderBy("wpos", "spos")
    return (
        symrows.join(F.broadcast(vocab), "sym")
        .select(
            F.col(id_col),
            (F.row_number().over(w_seq) - F.lit(1)).cast("bigint").alias(
                "seq_pos"
            ),
            "token_id",
        )
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a TRAINED merge list (the consumer of
    :func:`bpe_train`'s artifact): per-document BPE token count after
    applying the merges in training order.

    ``merges`` is the collected (a, b, merged) list — n_merges rows,
    driver-sized by definition (it IS the tokenizer file). The folds
    apply on the DISTINCT-WORD vocabulary, not the corpus (the
    production shape: tokenize the vocab once, join counts back to
    the exploded words) — corpus-proportional work is one explode +
    one join + one per-doc hash-agg.
    """
    words = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.select("w").distinct()
    arr = F.split(F.trim(F.regexp_replace("w", "(.)", "$1 ")), " ")
    for a, b, merged in merges:
        arr = _bpe_apply_merge(arr, a, b, merged)
    seg = vocab.select("w", F.size(arr).alias("_n_tok"))
    return (
        words.join(F.broadcast(seg), "w")
        .groupBy(id_col)
        .agg(F.sum("_n_tok").cast("bigint").alias("n_bpe_tokens"))
    )


def bpe_encode_bytes(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Byte-level :func:`bpe_encode` (the GPT-2 convention): encode the
    corpus to token ids over a FIXED 256-byte base alphabet — no OOV is
    possible, and unlike the char-level path there is no alphabet
    window at all (the id of a base symbol IS its byte value; merge
    outputs take 256+step-1, earliest id on duplicate outputs).
    Pre-tokenization keeps whitespace (:func:`byte_pieces`), so the
    id stream is losslessly decodable (:func:`bpe_decode_bytes`);
    ``merges`` must come from a ``unit="byte"`` trainer (hex-pair
    symbols).

    Scale shape: folds on the distinct-piece vocabulary; corpus-
    proportional work is one explode + one equi-join + one per-doc
    row_number window (same as bpe_encode)."""
    spark = docs.sparkSession
    words = docs.select(
        F.col(id_col), F.posexplode(byte_pieces(text_col)).alias("wpos", "w")
    )
    # pinned once for the same reasons as bpe_encode: one corpus
    # distinct instead of one per consumer, true size visible to the
    # planner so the corpus is never the broadcast side.
    vocab_words = words.select("w").distinct().localCheckpoint(eager=True)
    folded = byte_syms("w")
    for a, b, merged in merges:
        folded = _bpe_apply_merge(folded, a, b, merged)
    seg = vocab_words.select("w", folded.alias("_syms"))
    merge_rows = spark.createDataFrame(
        [(m, i) for i, (_a, _b, m) in enumerate(merges)],
        "sym string, _step int",
    )
    merge_ids = merge_rows.groupBy("sym").agg(
        (F.lit(256) + F.min("_step")).cast("bigint").alias("token_id")
    )
    symrows = words.join(F.broadcast(seg), "w").select(
        F.col(id_col), "wpos", F.posexplode("_syms").alias("spos", "sym")
    )
    from pyspark.sql import Window

    w_seq = Window.partitionBy(id_col).orderBy("wpos", "spos")
    return (
        symrows.join(F.broadcast(merge_ids), "sym", "left")
        .select(
            F.col(id_col),
            "wpos",
            "spos",
            # base alphabet: a 2-hex-digit symbol is its byte value
            F.coalesce(
                F.col("token_id"), F.conv("sym", 16, 10).cast("bigint")
            ).alias("token_id"),
        )
        .select(
            F.col(id_col),
            (F.row_number().over(w_seq) - F.lit(1)).cast("bigint").alias(
                "seq_pos"
            ),
            "token_id",
        )
    )


def bpe_decode_bytes(
    encoded: DataFrame,
    merges: list[tuple[str, str, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Invert :func:`bpe_encode_bytes`: (id, seq_pos, token_id) back to
    (id, text). Every symbol is the hex of the exact bytes it covers,
    so decode = map ids to symbols (byte value or merge output),
    concatenate in sequence order, unhex, UTF-8 decode — exact byte
    round-trip (decode(encode(x)) == x), pinned by
    test_bpe_bytes_roundtrip and q_bpe_bytes_roundtrip.

    Scale shape: one bounded broadcast (the vocab is 256 + n_merges
    rows) + one doc-keyed sort_array aggregation."""
    spark = encoded.sparkSession
    base = spark.range(256).select(
        F.col("id").cast("bigint").alias("token_id"),
        F.lpad(F.hex("id"), 2, "0").alias("sym"),
    )
    merge_rows = spark.createDataFrame(
        [(m, i) for i, (_a, _b, m) in enumerate(merges)],
        "sym string, _step int",
    )
    mids = merge_rows.groupBy("sym").agg(
        (F.lit(256) + F.min("_step")).cast("bigint").alias("token_id")
    )
    vocab = base.unionByName(mids.select("token_id", "sym"))
    return (
        encoded.join(F.broadcast(vocab), "token_id")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("seq_pos", "sym"))
                    ),
                    lambda s: s["sym"],
                ),
                "",
            ).alias("_hex")
        )
        .select(
            F.col(id_col), F.decode(F.unhex("_hex"), "UTF-8").alias("text")
        )
    )
