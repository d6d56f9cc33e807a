"""Training-data pipeline contract queries (BASELINE.json north star):
dedup family, similarity search, text analysis, multimodal plumbing,
sessionization.

The DuckDB oracle SQL for the hash-based operators is GENERATED from the
same constants the Spark operators use (operators.lsh.MINHASH_PARAMS
etc.) — one source of truth, zero drift. All hashing is int64-safe
mod-2^31 arithmetic that evaluates identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import lsh, prefix_join, similarity, text as text_ops
from ..operators.sessionize import sessionize
from ..sources.tables import load_table

MP = lsh.MERSENNE_P
EMB_NEARDUP_THRESHOLD = 0.4
JACCARD_THRESHOLD = 0.2


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "embeddings")


# ------------------------------------------------------------- exact dedup
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact content-hash dedup over documents: one group per distinct
    text, min doc_id survivor, cluster size."""
    d = _docs(spark, sf)
    return (
        d.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY 1
"""


# ------------------------------------------------------------ text quality
def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = _docs(spark, sf)
    return text_ops.quality_features(d.select("doc_id", "text"), "text").drop("text")


def q_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Hashed-linear classifier quality filter (operators/text.py
    classifier_quality_score): per doc, mean of the hashed-bucket
    weights over its tokens, keep-flag at score >= 0 — the fasttext-
    style model-based filter stage with a disclosed deterministic
    weight placeholder. One narrow scan, no shuffle."""
    d = _docs(spark, sf)
    score = text_ops.classifier_quality_score("text")
    return d.select(
        "doc_id",
        score.alias("score"),
        (score >= 0.0).alias("kept"),
    )


_SQL_QC_WEIGHT = (
    "(((('0x' || substr(md5(tok || ':qc-v1'), 1, 15))::BIGINT % 2147483647)"
    " % 4096) % 2001 - 1000) / 1000.0"
)

SQL_QUALITY_CLASSIFIER = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
)
SELECT doc_id,
       list_sum(list_transform(toks, tok -> {_SQL_QC_WEIGHT}))
         / CAST(len(toks) AS DOUBLE) AS score,
       (list_sum(list_transform(toks, tok -> {_SQL_QC_WEIGHT}))
         / CAST(len(toks) AS DOUBLE)) >= 0.0 AS kept
FROM t
"""


def q_filter_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Filter-vs-filter eval harness: confusion counts of the
    hashed-linear classifier's keep decision against the rule-based
    quality label (q_score >= 0.6, i.e. >= 3 of 5 checks) — the
    calibration readout a curation pipeline checks before swapping a
    model-based filter in for rules. One row of exact integer
    counts."""
    d = _docs(spark, sf)
    rule = text_ops.quality_features(
        d.select("doc_id", "text"), "text"
    ).select("doc_id", (F.col("q_score") >= 0.6).alias("_rule"))
    score = text_ops.classifier_quality_score("text")
    kept = d.select("doc_id", (score >= 0.0).alias("_kept"))
    j = rule.join(kept, "doc_id")
    return j.agg(
        F.sum(F.when(F.col("_rule") & F.col("_kept"), 1).otherwise(0))
        .cast("bigint").alias("tp"),
        F.sum(F.when(~F.col("_rule") & F.col("_kept"), 1).otherwise(0))
        .cast("bigint").alias("fp"),
        F.sum(F.when(F.col("_rule") & ~F.col("_kept"), 1).otherwise(0))
        .cast("bigint").alias("fn"),
        F.sum(F.when(~F.col("_rule") & ~F.col("_kept"), 1).otherwise(0))
        .cast("bigint").alias("tn"),
    )


def _sql_stopword_hits(words: list[str]) -> str:
    terms = " + ".join(
        f"(CASE WHEN contains(' ' || lower(text) || ' ', ' {w} ') THEN 1 ELSE 0 END)"
        for w in words
    )
    return f"({terms})"


_SQL_NW = r"len(string_split_regex(trim(text), '\s+'))"
_SQL_NP = r"len(regexp_extract_all(text, '[^\w\s]'))"
_SQL_ND = r"len(regexp_extract_all(text, '[0-9]'))"

# the 5-check quality rule, one spelling for SQL_TEXT_QUALITY,
# SQL_FILTER_EVAL, and the composed corpus-pipeline oracle
_SQL_QRULE_CHECKS = f"""(CASE WHEN {_SQL_NW} >= 10 THEN 1 ELSE 0 END)
    + (CASE WHEN (length(text) / {_SQL_NW}) BETWEEN 2 AND 12 THEN 1 ELSE 0 END)
    + (CASE WHEN {_SQL_NP} * 3 <= {_SQL_NW} THEN 1 ELSE 0 END)
    + (CASE WHEN {_SQL_ND} * 2 <= length(text) THEN 1 ELSE 0 END)"""

SQL_TEXT_QUALITY = f"""
SELECT doc_id,
  length(text)::INT AS q_n_chars,
  {_SQL_NW}::INT AS q_n_words,
  {_SQL_NP}::INT AS q_n_punct,
  {_SQL_ND}::INT AS q_n_digit,
  {_sql_stopword_hits(text_ops.STOPWORDS)} AS q_stopword_hits,
  CAST(
    {_SQL_QRULE_CHECKS}
    + (CASE WHEN {_sql_stopword_hits(text_ops.STOPWORDS)} >= 1 THEN 1 ELSE 0 END)
  AS DOUBLE) / 5 AS q_score
FROM documents
"""


SQL_FILTER_EVAL = f"""
WITH r AS (
  SELECT doc_id,
         (CAST(
            {_SQL_QRULE_CHECKS}
            + (CASE WHEN {_sql_stopword_hits(text_ops.STOPWORDS)} >= 1 THEN 1 ELSE 0 END)
          AS DOUBLE) / 5) >= 0.6 AS _rule
  FROM documents
),
k AS (
  SELECT doc_id,
         (list_sum(list_transform(toks, tok -> {_SQL_QC_WEIGHT}))
            / CAST(len(toks) AS DOUBLE)) >= 0.0 AS _kept
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents)
)
SELECT
  CAST(SUM(CASE WHEN _rule AND _kept THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CAST(SUM(CASE WHEN NOT _rule AND _kept THEN 1 ELSE 0 END) AS BIGINT) AS fp,
  CAST(SUM(CASE WHEN _rule AND NOT _kept THEN 1 ELSE 0 END) AS BIGINT) AS fn,
  CAST(SUM(CASE WHEN NOT _rule AND NOT _kept THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM r JOIN k USING (doc_id)
"""


# ---------------------------------------------------------------- lang id
def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = _docs(spark, sf)
    return text_ops.lang_id(d.select("doc_id", "lang", "text"), "text").drop("text")


def _sql_lang_id() -> str:
    langs = sorted(text_ops.LANG_MARKERS)  # lexicographic tie-break order
    hits = {
        lang: _sql_stopword_hits(text_ops.LANG_MARKERS[lang]) for lang in langs
    }
    greatest = "GREATEST(" + ", ".join(hits[l] for l in langs) + ")"
    # ordered CASE = argmax with lexicographic tie-break
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"{hits[lang]} >= {hits[o]}" for o in langs[i + 1:]]
        cond = " AND ".join(conds) if conds else "TRUE"
        branches.append(f"WHEN {cond} THEN '{lang}'")
    case = " ".join(branches)
    return f"""
SELECT doc_id, lang,
  CASE WHEN {greatest} = 0 THEN 'und' {case} END AS pred_lang,
  {greatest} AS pred_hits
FROM documents
"""


SQL_LANG_ID = _sql_lang_id()


# ------------------------------------------------------------ token counts
def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        text_ops.token_count("text").alias("ws_tokens"),
        text_ops.regex_token_count("text").alias("bpe_tokens"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
  {_SQL_NW}::INT AS ws_tokens,
  len(regexp_extract_all(text, '{text_ops.BPE_TOKEN_RE}'))::INT AS bpe_tokens
FROM documents
"""


# ----------------------------------------------------------- fingerprinting
def q_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = _docs(spark, sf)
    return text_ops.fingerprint(d.select("doc_id", "text"), "text").drop("text")


SQL_DOC_FINGERPRINT = r"""
SELECT doc_id,
  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5,
  ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp_int
FROM documents
"""


# ------------------------------------------------------------ minhash + LSH
_SQL_SHINGLES = r"""
tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS shingle
  FROM tok, unnest(generate_series(0, len(toks)-3)) AS u(i)
  WHERE len(toks) >= 3
),
h AS (SELECT doc_id, ('0x' || substr(md5(shingle),1,15))::BIGINT % {p} AS h FROM sh)
""".replace("{p}", str(MP))

_SQL_SIG_COLS = ", ".join(
    f"min((h * {a} + {b}) % {MP}) AS s{i}"
    for i, (a, b) in enumerate(lsh.MINHASH_PARAMS)
)


def q_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    return lsh.minhash_signatures(
        _docs(spark, sf), parallelism=spark.sparkContext.defaultParallelism
    )


SQL_MINHASH_SIGNATURES = f"""
WITH {_SQL_SHINGLES}
SELECT doc_id, {_SQL_SIG_COLS} FROM h GROUP BY doc_id
"""


def q_minhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """LSH candidate pairs: same band-hash in any of the bands."""
    sigs = lsh.minhash_signatures(
        _docs(spark, sf), parallelism=spark.sparkContext.defaultParallelism
    )
    return lsh.lsh_candidate_pairs(sigs)


def _sql_band_rows() -> str:
    rows = []
    for b in range(lsh.BANDS):
        cols = [f"s{b * lsh.ROWS_PER_BAND + r}" for r in range(lsh.ROWS_PER_BAND)]
        concat = " || '_' || ".join(cols)
        rows.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS band_hash FROM sig"
        )
    return " UNION ALL ".join(rows)


SQL_MINHASH_PAIRS = f"""
WITH {_SQL_SHINGLES},
sig AS (SELECT doc_id, {_SQL_SIG_COLS} FROM h GROUP BY doc_id),
bands AS ({_sql_band_rows()})
SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
FROM bands l JOIN bands r
  ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
"""


def q_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Pair-level recall of the MinHash/LSH banding against the exact
    n-gram-Jaccard ground truth — the eval the band/row parameters must
    be tuned against before trusting LSH dedup at scale (the ANN twin
    is q_ann_recall). One row: true-pair count, candidate count, hit
    count, recall. The three addends are 1-row aggregates (whitelisted
    cartesian class); the pair computations are the existing linear
    operators unchanged."""
    docs = _docs(spark, sf)
    par = spark.sparkContext.defaultParallelism
    true_pairs = lsh.ngram_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, parallelism=par
    ).select("id_a", "id_b")
    cand = lsh.lsh_candidate_pairs(lsh.minhash_signatures(docs, parallelism=par))
    n_true = true_pairs.agg(F.count(F.lit(1)).alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    hits = true_pairs.join(cand, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        n_true.crossJoin(n_cand)
        .crossJoin(hits)
        .select(
            "n_true",
            "n_candidates",
            "n_hits",
            F.when(F.col("n_true") == 0, F.lit(1.0))
            .otherwise(F.col("n_hits") / F.col("n_true"))
            .alias("recall"),
        )
    )


SQL_LSH_RECALL = f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
pc AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
),
tp AS (
  SELECT id_a, id_b
  FROM pc JOIN sizes sa ON pc.id_a = sa.doc_id JOIN sizes sb ON pc.id_b = sb.doc_id
  WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= {JACCARD_THRESHOLD}
),
sig AS (SELECT doc_id, {_SQL_SIG_COLS} FROM h GROUP BY doc_id),
bands AS ({_sql_band_rows()}),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
),
counts AS (
  SELECT (SELECT count(*) FROM tp) AS n_true,
         (SELECT count(*) FROM cand) AS n_candidates,
         (SELECT count(*) FROM tp JOIN cand USING (id_a, id_b)) AS n_hits
)
SELECT n_true, n_candidates, n_hits,
       CASE WHEN n_true = 0 THEN 1.0
            ELSE CAST(n_hits AS DOUBLE) / n_true END AS recall
FROM counts
"""


def q_incremental_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental LSH index maintenance (operators/lsh.py
    incremental_lsh_pairs): 90% of the corpus is the standing index, the
    doc_id%10==0 slice arrives as a delta. Result = standing pairs ∪
    delta-induced pairs, computed WITHOUT re-pairing the corpus (the
    delta broadcasts into an equi-join against the index's band rows).
    The oracle is the FULL-corpus recompute — equality proves
    pairs(index ∪ delta) = pairs(index) ∪ new_pairs exactly."""
    docs = _docs(spark, sf)
    par = spark.sparkContext.defaultParallelism
    index_docs = docs.filter(F.col("doc_id") % 10 != 0)
    delta_docs = docs.filter(F.col("doc_id") % 10 == 0)
    index_sigs = lsh.minhash_signatures(index_docs, parallelism=par)
    delta_sigs = lsh.minhash_signatures(delta_docs, parallelism=par)
    index_rows = lsh.lsh_band_rows(index_sigs)
    standing = lsh.lsh_candidate_pairs(index_sigs)
    new_pairs, _updated = lsh.incremental_lsh_pairs(index_rows, delta_sigs)
    return standing.unionByName(new_pairs).distinct()


# ----------------------------------------------------------------- simhash
def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return lsh.simhash(
        _docs(spark, sf), parallelism=spark.sparkContext.defaultParallelism
    )


def _sql_simhash() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(lsh.SIMHASH_BITS)
    )
    val = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {2 ** j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(lsh.SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents
),
th AS (SELECT doc_id, ('0x' || substr(md5(t),1,15))::BIGINT % {MP} AS h FROM tok),
bits AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id)
SELECT doc_id, {val} AS simhash FROM bits
"""


SQL_SIMHASH = _sql_simhash()


# ---------------------------------------------------------- n-gram jaccard
def q_ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return lsh.ngram_jaccard_pairs(
        _docs(spark, sf),
        threshold=JACCARD_THRESHOLD,
        parallelism=spark.sparkContext.defaultParallelism,
    )


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
pc AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
FROM pc JOIN sizes sa ON pc.id_a = sa.doc_id JOIN sizes sb ON pc.id_b = sb.doc_id
WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= {JACCARD_THRESHOLD}
"""


# Stop-shingle cutoff for the SCALE path: shingles in > MAX_DF docs are
# dropped from the JOIN ONLY (denominators stay exact).  This is the
# variant the x100 scale-stress runs — without the cap the shingle
# self-join has O(df^2) fan-out on boilerplate shingles.
NGRAM_MAX_DF = 50


def q_ngram_jaccard_capped(spark: SparkSession, sf: str) -> DataFrame:
    """`ngram_jaccard_pairs` with the `max_df` stop-shingle cap — the
    designated 100 TB shape (operators/lsh.py ngram_jaccard_pairs
    docstring).  Oracle-expressible because the cap is a deterministic
    doc-frequency filter on the join side only."""
    return lsh.ngram_jaccard_pairs(
        _docs(spark, sf),
        threshold=JACCARD_THRESHOLD,
        parallelism=spark.sparkContext.defaultParallelism,
        max_df=NGRAM_MAX_DF,
    )


CONTAINMENT_THRESHOLD = 0.6


def q_containment_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Broder containment pairs (operators/lsh.py:containment_pairs) —
    the ASYMMETRIC resemblance measure: shared/|S(A)| per direction,
    kept when either direction reaches the threshold. Catches
    quote/aggregation/subset relationships Jaccard dilutes away."""
    return lsh.containment_pairs(
        _docs(spark, sf),
        threshold=CONTAINMENT_THRESHOLD,
        parallelism=spark.sparkContext.defaultParallelism,
    )


SQL_CONTAINMENT_PAIRS = f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
pc AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, shared, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(shared AS DOUBLE) / sa.n_sh AS containment_a,
       CAST(shared AS DOUBLE) / sb.n_sh AS containment_b
FROM pc JOIN sizes sa ON pc.id_a = sa.doc_id JOIN sizes sb ON pc.id_b = sb.doc_id
WHERE greatest(CAST(shared AS DOUBLE) / sa.n_sh,
               CAST(shared AS DOUBLE) / sb.n_sh) >= {CONTAINMENT_THRESHOLD}
"""


def q_jaccard_prefix_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """PPJoin-style prefix-filtered exact Jaccard pairs
    (operators/prefix_join.py). Deliberately shares the exact-pairs
    oracle with ``q_ngram_jaccard_pairs``: the prefix + size filters are
    candidate-generation-only, so losslessness IS the correctness claim
    being checked."""
    return prefix_join.jaccard_prefix_pairs(
        _docs(spark, sf),
        threshold=JACCARD_THRESHOLD,
        parallelism=spark.sparkContext.defaultParallelism,
    )


SQL_NGRAM_JACCARD_CAPPED = f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {NGRAM_MAX_DF}),
shj AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
pc AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared
  FROM shj l JOIN shj r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
FROM pc JOIN sizes sa ON pc.id_a = sa.doc_id JOIN sizes sb ON pc.id_b = sb.doc_id
WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= {JACCARD_THRESHOLD}
"""


# ----------------------------------------------------- embedding similarity
_SQL_EMB_D = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def q_embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 query vector."""
    emb = _emb(spark, sf)
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    scored = emb.crossJoin(F.broadcast(qv)).select(
        "vec_id",
        similarity.cosine(F.col("embedding"), F.col("qv")).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


SQL_EMBEDDING_TOPK = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT vec_id,
       list_dot_product(v, qv)
         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cosine
FROM e, q
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def q_embedding_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact near-dup pairs (cosine >= threshold) — quadratic validation
    baseline for the LSH/IVF-bucketed scale path."""
    return similarity.embedding_neardup_pairs(
        _emb(spark, sf), threshold=EMB_NEARDUP_THRESHOLD
    )


SQL_EMBEDDING_NEARDUP_PAIRS = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {EMB_NEARDUP_THRESHOLD}
"""


# 8 bands x 3 bits: collision p = (1 - theta/pi)^3 per band; at the query
# threshold (cos 0.4 -> p_bit ~ 0.63) any-of-8 recall ~ 0.9, and -> 1.0
# fast as cosine -> 1 (true near-dups). More bands buy recall linearly in
# compute; precision is always 1.0 (exact-cosine verification).
_LSH_BANDS = 8
_LSH_PLANES = 3
_LSH_DIM = 64
_LSH_SEED = 42


def q_embedding_neardup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Hyperplane-LSH near-dup pairs (the scale path); candidates
    verified with exact cosine so precision is 1.0 by construction.
    Oracle SQL is generated from the SAME numpy hyperplanes."""
    return similarity.embedding_neardup_lsh(
        _emb(spark, sf),
        threshold=EMB_NEARDUP_THRESHOLD,
        bands=_LSH_BANDS,
        planes_per_band=_LSH_PLANES,
        dim=_LSH_DIM,
        seed=_LSH_SEED,
    )


def _sql_neardup_lsh() -> str:
    planes = similarity.hyperplane_planes(_LSH_BANDS * _LSH_PLANES, _LSH_DIM, _LSH_SEED)

    def lit_arr(p: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in p) + "]"

    def band_expr(b: int) -> str:
        bits = " || ".join(
            f"(CASE WHEN list_dot_product(v, {lit_arr(planes[b * _LSH_PLANES + p])}) >= 0 "
            f"THEN '1' ELSE '0' END)"
            for p in range(_LSH_PLANES)
        )
        return f"SELECT vec_id, {b} AS band, {bits} AS bh FROM e"

    bands_sql = " UNION ALL ".join(band_expr(b) for b in range(_LSH_BANDS))
    return f"""
WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bh = r.bh AND l.vec_id < r.vec_id
)
SELECT id_a, id_b,
       list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
FROM cand JOIN e a ON cand.id_a = a.vec_id JOIN e b ON cand.id_b = b.vec_id
WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {EMB_NEARDUP_THRESHOLD}
"""


SQL_EMBEDDING_NEARDUP_LSH = _sql_neardup_lsh()


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF build step: nearest-centroid assignment (centroids = the first
    8 vectors), squared L2."""
    emb = _emb(spark, sf)
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    return similarity.ivf_assign(emb, centroids)


SQL_ANN_IVF = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
scored AS (
  SELECT e.vec_id,
         struct_pack(
           d2 := list_sum(list_transform(generate_series(1, len(v)),
                                         i -> (v[i] - cv[i]) * (v[i] - cv[i]))),
           cid := c.centroid_id
         ) AS sc
  FROM e CROSS JOIN c
)
SELECT vec_id, (min(sc)).cid AS centroid_id, (min(sc)).d2 AS dist2
FROM scored GROUP BY vec_id
"""


SEMDEDUP_CLUSTER_TARGET = 250  # target vectors per cluster: k scales with n


def q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (operators/similarity.py semantic_dedup): cluster via
    the IVF assignment (centroids = the first k corpus vectors, k =
    max(8, ceil(n / SEMDEDUP_CLUSTER_TARGET)) so per-cluster populations
    stay ~bounded as the corpus grows — the paper's own scale knob),
    drop every vector with a lower-id near-duplicate (cosine >=
    threshold) in its cluster, return the survivors with their cluster.
    The pair generation is cluster-equi-joined — the oracle recomputes
    the identical policy exactly, deriving k from the same count."""
    emb = _emb(spark, sf)
    k = max(8, -(-emb.count() // SEMDEDUP_CLUSTER_TARGET))
    centroids = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    out = similarity.semantic_dedup(
        emb, centroids, threshold=EMB_NEARDUP_THRESHOLD
    )
    return out.select("vec_id", "centroid_id")


SQL_SEMANTIC_DEDUP = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e
      WHERE vec_id < (SELECT greatest(8, CAST(ceil(count(*) / {SEMDEDUP_CLUSTER_TARGET}.0) AS BIGINT))
                      FROM embeddings)),
assign AS (
  SELECT e.vec_id,
         (min(struct_pack(
           d2 := list_sum(list_transform(generate_series(1, len(v)),
                                         i -> (v[i] - cv[i]) * (v[i] - cv[i]))),
           cid := c.centroid_id
         ))).cid AS centroid_id
  FROM e CROSS JOIN c GROUP BY e.vec_id
),
dups AS (
  SELECT DISTINCT bb.vec_id
  FROM e a
  JOIN assign aa ON a.vec_id = aa.vec_id
  JOIN assign ab ON aa.centroid_id = ab.centroid_id AND aa.vec_id < ab.vec_id
  JOIN e bb ON bb.vec_id = ab.vec_id
  WHERE list_dot_product(a.v, bb.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v)))
        >= {EMB_NEARDUP_THRESHOLD}
)
SELECT aa.vec_id, aa.centroid_id FROM assign aa
WHERE aa.vec_id NOT IN (SELECT vec_id FROM dups)
"""




def q_incremental_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup index maintenance (operators/similarity.py
    incremental_semantic_dedup): the vec_id%10==0 slice arrives as a
    delta against the standing clustered index (the q_incremental_lsh
    convention); delta vectors with a lower-id near-dup in their
    cluster (standing OR delta) are dropped WITHOUT re-pairing the
    standing corpus. The oracle is the full recompute over the union,
    restricted to delta ids — verdict equality is the contract."""
    emb = _emb(spark, sf)
    k = max(8, -(-emb.count() // SEMDEDUP_CLUSTER_TARGET))
    centroids = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    standing = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    standing_assigned = standing.join(
        similarity.ivf_assign(standing, centroids).select(
            "vec_id", "centroid_id"
        ),
        "vec_id",
    )
    return similarity.incremental_semantic_dedup(
        standing_assigned, delta, centroids, threshold=EMB_NEARDUP_THRESHOLD
    )


SQL_INCREMENTAL_SEMDEDUP = f"""
WITH e AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e
      WHERE vec_id < (SELECT greatest(8, CAST(ceil(count(*) / {SEMDEDUP_CLUSTER_TARGET}.0) AS BIGINT))
                      FROM embeddings)),
assign AS (
  SELECT e.vec_id,
         (min(struct_pack(
           d2 := list_sum(list_transform(generate_series(1, len(v)),
                                         i -> (v[i] - cv[i]) * (v[i] - cv[i]))),
           cid := c.centroid_id
         ))).cid AS centroid_id
  FROM e CROSS JOIN c GROUP BY e.vec_id
),
dups AS (
  SELECT DISTINCT bb.vec_id
  FROM e a
  JOIN assign aa ON a.vec_id = aa.vec_id
  JOIN assign ab ON aa.centroid_id = ab.centroid_id AND aa.vec_id < ab.vec_id
  JOIN e bb ON bb.vec_id = ab.vec_id
  WHERE list_dot_product(a.v, bb.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v)))
        >= {EMB_NEARDUP_THRESHOLD}
)
SELECT aa.vec_id, aa.centroid_id FROM assign aa
WHERE aa.vec_id % 10 = 0 AND aa.vec_id NOT IN (SELECT vec_id FROM dups)
"""


# ----------------------------------------------------------- chunking
_CHUNK_SIZE = 50
_CHUNK_OVERLAP = 10
_CHUNK_STRIDE = _CHUNK_SIZE - _CHUNK_OVERLAP


def q_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window training chunks (50 tokens, 10 overlap); emits
    per-chunk token count + content hash, not the text (compact compare)."""
    d = _docs(spark, sf)
    return text_ops.chunk_documents(
        d.select("doc_id", "text"),
        chunk_size=_CHUNK_SIZE,
        overlap=_CHUNK_OVERLAP,
    ).select("doc_id", "chunk_id", "chunk_tokens", "chunk_md5")


SQL_CHUNK_DOCUMENTS = f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
n AS (
  SELECT doc_id, toks, len(toks) AS nt,
         CAST(floor((greatest(len(toks) - {_CHUNK_OVERLAP}, 1) + {_CHUNK_STRIDE - 1})
                    / {_CHUNK_STRIDE}) AS INT) AS n_chunks
  FROM tok
)
SELECT doc_id, i AS chunk_id,
       len(toks[i*{_CHUNK_STRIDE}+1 : least(i*{_CHUNK_STRIDE}+{_CHUNK_SIZE}, nt)])::INT
         AS chunk_tokens,
       md5(array_to_string(
             toks[i*{_CHUNK_STRIDE}+1 : least(i*{_CHUNK_STRIDE}+{_CHUNK_SIZE}, nt)], ' '))
         AS chunk_md5
FROM n, unnest(generate_series(0, n_chunks - 1)) AS u(i)
"""


# ------------------------------------------------------- decontamination
def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: corpus docs (doc_id >= 10) sharing ANY
    5-gram with the benchmark set (doc_id < 10) are flagged. The shingle
    equi-join is the scale shape — contamination is detected without any
    pairwise comparison."""
    d = _docs(spark, sf)
    base = d.select("doc_id", lsh.tokens("text").alias("toks"))
    sh = base.select(
        "doc_id", F.explode(lsh.shingles_from_tokens(F.col("toks"), 5)).alias("s")
    )
    bench = sh.filter(F.col("doc_id") < 10).select(F.col("s").alias("bs")).distinct()
    corpus = sh.filter(F.col("doc_id") >= 10)
    return (
        corpus.join(F.broadcast(bench), corpus.s == bench.bs)
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )


SQL_DECONTAMINATE = """
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i+1 : i+5], ' ') AS s
  FROM tok, unnest(generate_series(0, len(toks) - 5)) AS u(i)
  WHERE len(toks) >= 5
)
SELECT DISTINCT c.doc_id, TRUE AS contaminated
FROM sh c JOIN (SELECT DISTINCT s FROM sh WHERE doc_id < 10) b ON c.s = b.s
WHERE c.doc_id >= 10
"""


# Span-level decontamination APPLY (VERDICT r10 #5): same benchmark
# convention as q_decontaminate (doc_id < 10 is the reference set), but
# instead of dropping the whole contaminated doc, the shared run is cut
# and the remainder kept — the production n-gram-overlap policy.
DECON_L = 5


def q_decontaminate_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Span-level benchmark decontamination
    (operators/text.py:decontaminate_apply): every corpus token covered
    by a >= 5-token run shared with the benchmark set is removed; tails
    stay intact. Whole-doc q_decontaminate flags exactly the docs this
    query rewrites."""
    from ..operators.text import decontaminate_apply

    d = _docs(spark, sf)
    return decontaminate_apply(
        d.filter(F.col("doc_id") >= 10),
        d.filter(F.col("doc_id") < 10),
        min_len=DECON_L,
    )


SQL_DECONTAMINATE_APPLY = f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
occ AS MATERIALIZED (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(t[u.i:u.i+{DECON_L - 1}], ' ')) AS gkey
  FROM t, unnest(generate_series(1, len(t) - {DECON_L - 1})) AS u(i)
  WHERE len(t) >= {DECON_L}
),
hit AS (
  SELECT DISTINCT o.doc_id, o.pos
  FROM occ o
  JOIN (SELECT DISTINCT gkey FROM occ WHERE doc_id < 10) b USING (gkey)
  WHERE o.doc_id >= 10
),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hit
),
spans AS (
  SELECT doc_id, min(pos) AS span_start,
         CAST(max(pos) + {DECON_L - 1} AS BIGINT) AS span_end
  FROM isl GROUP BY doc_id, grp
),
rem AS (
  SELECT DISTINCT doc_id, u.i AS tpos
  FROM spans, unnest(generate_series(span_start, span_end)) AS u(i)
),
tok AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS tpos, t[u.i] AS tok
  FROM t, unnest(generate_series(1, len(t))) AS u(i)
  WHERE doc_id >= 10
),
kept AS (
  SELECT tok.doc_id, tok.tpos, tok.tok
  FROM tok LEFT JOIN rem ON tok.doc_id = rem.doc_id AND tok.tpos = rem.tpos
  WHERE rem.tpos IS NULL
),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS kept_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY 1
)
SELECT t.doc_id, COALESCE(reb.kept_text, '') AS kept_text,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN reb USING (doc_id)
WHERE t.doc_id >= 10
"""


def q_decontaminate_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental decontamination: the benchmark gram index is the
    FROZEN standing artifact (operators/text.py:benchmark_gram_index
    — built once per benchmark release); an arriving corpus batch
    (the doc_id % 5 == 2 slice here) folds through
    decontaminate_apply_indexed at delta-sized cost. Corpus docs are
    independent given the index, so fold == full rebuild restricted to
    the delta ids (equivalence pytest); the oracle is the full
    decontamination statement restricted the same way."""
    from ..operators.text import (
        benchmark_gram_index,
        decontaminate_apply_indexed,
    )

    d = _docs(spark, sf)
    idx = benchmark_gram_index(d.filter(F.col("doc_id") < 10), min_len=DECON_L)
    delta = d.filter((F.col("doc_id") >= 10) & (F.col("doc_id") % 5 == 2))
    return decontaminate_apply_indexed(delta, idx, min_len=DECON_L)


SQL_DECONTAMINATE_DELTA = SQL_DECONTAMINATE_APPLY.replace(
    "WHERE t.doc_id >= 10", "WHERE t.doc_id >= 10 AND t.doc_id % 5 = 2"
)


# ----------------------------------------------------- train/test split
def q_train_test_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-based 90/10 split (portable md5 arithmetic, no
    RNG state): per-split doc count + mean length — the reproducible-split
    contract a training pipeline needs across reruns and engines."""
    d = _docs(spark, sf)
    bucket = lsh.base_hash31(F.col("doc_id").cast("string")) % 100
    return (
        d.select(
            F.when(bucket < 90, "train").otherwise("test").alias("split"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
        )
    )


SQL_TRAIN_TEST_SPLIT = f"""
SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % {MP} % 100 < 90
       THEN 'train' ELSE 'test' END AS split,
       count(*) AS n_docs,
       avg(CAST(n_chars AS DOUBLE)) AS avg_chars
FROM documents GROUP BY 1
"""


# --------------------------------------------------- stratified sampling
_MIX_RATES = {"en": 0.5, "de": 0.9, "fr": 0.25}
_MIX_DEFAULT = 0.1


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Training-mix construction: per-language keep rates (upsample rare,
    downsample dominant) with hash-threshold membership — deterministic
    across reruns, engines, and partitionings (operators/sampling.py).
    Emits the per-stratum sample census the mix designer checks."""
    from ..operators.sampling import stratified_sample

    d = _docs(spark, sf)
    kept = stratified_sample(
        d, _MIX_RATES, strata_col="lang", key_col="doc_id",
        default_rate=_MIX_DEFAULT,
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def _sql_stratified_sample() -> str:
    from ..operators.sampling import sql_stratified_sample

    inner = sql_stratified_sample(
        "documents", _MIX_RATES, strata_col="lang", key_col="doc_id",
        default_rate=_MIX_DEFAULT,
    )
    return (
        f"SELECT lang, count(*) AS n_docs, "
        f"CAST(sum(n_chars) AS BIGINT) AS total_chars "
        f"FROM ({inner}) GROUP BY lang"
    )


# ----------------------------------------------------- sequence packing
_PACK_SEQ_LEN = 512
_PACK_SHARDS = 8


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk packing of the document corpus into fixed
    512-token training sequences, sharded 8 ways (operators/packing.py):
    every doc's span + the training-sequence ids it lands in."""
    from ..operators.packing import pack_sequences

    d = _docs(spark, sf)
    with_tokens = d.select(
        "doc_id", text_ops.token_count("text").alias("n_tokens")
    )
    return pack_sequences(
        with_tokens, seq_len=_PACK_SEQ_LEN, num_shards=_PACK_SHARDS
    )


def _sql_pack_sequences() -> str:
    from ..operators.packing import sql_pack_sequences

    inner = f"SELECT doc_id, {_SQL_NW} AS n_tokens FROM documents"
    return sql_pack_sequences(
        inner, seq_len=_PACK_SEQ_LEN, num_shards=_PACK_SHARDS
    )


def q_pack_attention_spans(spark: SparkSession, sf: str) -> DataFrame:
    """The block-diagonal attention-mask manifest for the packed
    corpus (operators/packing.py:pack_attention_spans): one row per
    (training sequence, document) intersection in sequence-local
    token coordinates — what a trainer feeds its attention mask so
    packed documents cannot attend across their boundary."""
    from ..operators.packing import pack_attention_spans

    d = _docs(spark, sf)
    with_tokens = d.select(
        "doc_id", text_ops.token_count("text").alias("n_tokens")
    )
    return pack_attention_spans(
        with_tokens, seq_len=_PACK_SEQ_LEN, num_shards=_PACK_SHARDS
    )


def _sql_pack_attention_spans() -> str:
    from ..operators.packing import sql_pack_attention_spans

    inner = f"SELECT doc_id, {_SQL_NW} AS n_tokens FROM documents"
    return sql_pack_attention_spans(
        inner, seq_len=_PACK_SEQ_LEN, num_shards=_PACK_SHARDS
    )


# ---------------------------------------------------- int8 quantization
def q_embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (the 4x
    memory/shuffle lever for ANN inverted lists), exploded to
    (vec_id, dim, qval, scale) — bit-identical in both engines."""
    from ..operators.quantize import quantize_int8

    return quantize_int8(_emb(spark, sf))


def _sql_embedding_quantize() -> str:
    from ..operators.quantize import sql_quantize_int8

    return sql_quantize_int8("embeddings")


# ------------------------------------------------------ repetition quality
def q_repetition_score(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition (Gopher-style quality signal): fraction
    of duplicated word 3-grams, as pure array expressions — distinct vs
    total shingle counts, no per-doc explode or shuffle."""
    d = _docs(spark, sf)
    base = d.select("doc_id", lsh.tokens("text").alias("toks"))
    k = F.size("toks")
    n_grams = F.greatest(k - 2, F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 3, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
            F.element_at(F.col("toks"), i + 3),
        ),
    )
    n_distinct = F.when(k >= 3, F.size(F.array_distinct(grams))).otherwise(0)
    return base.select(
        "doc_id",
        n_grams.cast("int").alias("n_grams"),
        n_distinct.cast("int").alias("n_distinct"),
        F.when(
            k >= 3, 1.0 - n_distinct.cast("double") / n_grams.cast("double")
        ).otherwise(F.lit(0.0)).alias("dup_ratio"),
    )


SQL_REPETITION_SCORE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
),
g AS (
  SELECT doc_id, len(toks) AS k,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(0, len(toks)-3),
                          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
         ELSE [] END AS grams
  FROM tok
)
SELECT doc_id,
       greatest(k - 2, 0)::INT AS n_grams,
       (CASE WHEN k >= 3 THEN len(list_distinct(grams)) ELSE 0 END)::INT AS n_distinct,
       CASE WHEN k >= 3
            THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                       / CAST(greatest(k - 2, 0) AS DOUBLE)
            ELSE 0.0 END AS dup_ratio
FROM g
"""


# ------------------------------------------------------------- PII patterns
# dialect-neutral regexes (identical semantics in Java regex and RE2-ish)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# explicit whitespace class, not \s: Java \s includes U+000B, RE2's does
# not — spelled out so both dialects terminate URLs identically
_URL_RE = r"https?://[^ \t\r\n\x0B\f]+"
_LONGNUM_RE = r"[0-9]{9,}"


def q_pii_scan(spark: SparkSession, sf: str) -> DataFrame:
    """PII-risk surface scan: per-doc counts of emails, URLs, and long
    digit runs (SSN/CC-shaped) — the filter stage before redaction."""
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias("n_email"),
        F.size(F.regexp_extract_all("text", F.lit(_URL_RE), 0)).alias("n_url"),
        F.size(F.regexp_extract_all("text", F.lit(_LONGNUM_RE), 0)).alias("n_longnum"),
    )


SQL_PII_SCAN = f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{_EMAIL_RE}'))::INT AS n_email,
  len(regexp_extract_all(text, '{_URL_RE}'))::INT AS n_url,
  len(regexp_extract_all(text, '{_LONGNUM_RE}'))::INT AS n_longnum
FROM documents
"""


# -------------------------------------------------------- dedup clustering
def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end near-dup dedup: MinHash-LSH pairs -> connected
    components -> one canonical doc per cluster. The Spark side iterates
    min-label propagation; the oracle computes the same components as a
    recursive-CTE transitive closure over the identical LSH pair SQL, so
    the driver value-checks the full pipeline."""
    from ..operators.graph import dedup_clusters

    d = _docs(spark, sf)
    sigs = lsh.minhash_signatures(
        d, parallelism=spark.sparkContext.defaultParallelism
    )
    pairs = lsh.lsh_candidate_pairs(sigs)
    return dedup_clusters(d, pairs)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SQL_SHINGLES},
sig AS (SELECT doc_id, {_SQL_SIG_COLS} FROM h GROUP BY doc_id),
bands AS ({_sql_band_rows()}),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
),
edges AS (
  SELECT id_a AS v, id_b AS n FROM pairs
  UNION
  SELECT id_b AS v, id_a AS n FROM pairs
),
walk(v, label) AS (
  SELECT v, v AS label FROM edges GROUP BY v
  UNION
  SELECT e.v, w.label FROM edges e JOIN walk w ON w.v = e.n
),
comp AS (SELECT v, min(label) AS component FROM walk GROUP BY v)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster_id,
       coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON c.v = d.doc_id
"""


# ------------------------------------------------- composed curation funnel
def q_corpus_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The COMPOSED curation chain (plans/corpus.py): quality filter ->
    exact dedup -> MinHash near-dup clusters -> decontamination ->
    stratified mix -> sequence packing, emitted as the per-stage funnel
    census. The oracle rebuilds the identical funnel in one SQL chain
    from the same fragment generators, so the driver value-checks the
    stage interactions, not just each operator alone."""
    from ..plans.corpus import curate_corpus, curate_corpus_funnel

    d = _docs(spark, sf)
    stages = curate_corpus(
        d, _MIX_RATES, _MIX_DEFAULT,
        quality_min=0.6, eval_max_id=10,
        seq_len=_PACK_SEQ_LEN, num_shards=_PACK_SHARDS,
    )
    return curate_corpus_funnel(stages)


def _sql_corpus_pipeline() -> str:
    from ..operators.sampling import sql_stratified_sample

    q_checks = f"""(
        {_SQL_QRULE_CHECKS}
        + (CASE WHEN {_sql_stopword_hits(text_ops.STOPWORDS)} >= 1 THEN 1 ELSE 0 END)
    )"""
    shingles_over_src = _SQL_SHINGLES.replace("FROM documents)", "FROM src)")
    mixed_select = sql_stratified_sample(
        "clean", _MIX_RATES, strata_col="lang", key_col="doc_id",
        default_rate=_MIX_DEFAULT,
    )
    L = _PACK_SEQ_LEN
    return f"""
WITH RECURSIVE
base AS (
  SELECT doc_id, text, lang, {_SQL_NW} AS n_tokens FROM documents
),
corpus AS (SELECT * FROM base WHERE doc_id >= 10),
quality AS (
  SELECT * FROM corpus WHERE CAST({q_checks} AS DOUBLE) / 5 >= 0.6
),
exact AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
src AS (SELECT q.* FROM quality q JOIN exact USING (doc_id)),
{shingles_over_src},
sig AS (SELECT doc_id, {_SQL_SIG_COLS} FROM h GROUP BY doc_id),
bands AS ({_sql_band_rows()}),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
),
edges AS (
  SELECT id_a AS v, id_b AS n FROM pairs
  UNION
  SELECT id_b AS v, id_a AS n FROM pairs
),
walk(v, label) AS (
  SELECT v, v AS label FROM edges GROUP BY v
  UNION
  SELECT e.v, w.label FROM edges e JOIN walk w ON w.v = e.n
),
comp AS (SELECT v, min(label) AS component FROM walk GROUP BY v),
neardup AS (
  SELECT s.* FROM src s LEFT JOIN comp c ON c.v = s.doc_id
  WHERE c.component IS NULL OR c.component = s.doc_id
),
ev_tok AS (
  SELECT string_split_regex(trim(text), '\\s+') AS toks FROM base WHERE doc_id < 10
),
ev_sh AS (
  SELECT DISTINCT array_to_string(toks[i+1 : i+5], ' ') AS s
  FROM ev_tok, unnest(generate_series(0, len(toks) - 5)) AS u(i)
  WHERE len(toks) >= 5
),
nd_tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM neardup
),
nd_sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i+1 : i+5], ' ') AS s
  FROM nd_tok, unnest(generate_series(0, len(toks) - 5)) AS u(i)
  WHERE len(toks) >= 5
),
contaminated AS (SELECT DISTINCT c.doc_id FROM nd_sh c JOIN ev_sh b USING (s)),
clean AS (
  SELECT doc_id, lang, n_tokens FROM neardup
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
mixed AS ({mixed_select}),
shard_tokens AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % {MP} % {_PACK_SHARDS} AS shard,
         sum(n_tokens) AS t
  FROM mixed GROUP BY shard
)
SELECT 0 AS stage_id, 'raw' AS stage, count(*)::BIGINT AS n_docs,
       coalesce(sum(n_tokens), 0)::BIGINT AS n_tokens FROM corpus
UNION ALL SELECT 1, 'quality', count(*)::BIGINT,
       coalesce(sum(n_tokens), 0)::BIGINT FROM quality
UNION ALL SELECT 2, 'exact_dedup', count(*)::BIGINT,
       coalesce(sum(n_tokens), 0)::BIGINT FROM src
UNION ALL SELECT 3, 'neardup_dedup', count(*)::BIGINT,
       coalesce(sum(n_tokens), 0)::BIGINT FROM neardup
UNION ALL SELECT 4, 'decontaminated', count(*)::BIGINT,
       coalesce(sum(n_tokens), 0)::BIGINT FROM clean
UNION ALL SELECT 5, 'mixed', count(*)::BIGINT,
       coalesce(sum(n_tokens), 0)::BIGINT FROM mixed
UNION ALL SELECT 6, 'packed_sequences',
       coalesce(sum((t - 1) // {L} + 1), 0)::BIGINT,
       coalesce(sum(t), 0)::BIGINT FROM shard_tokens
"""


# ----------------------------------------------------------- k-means (IVF fit)
def q_kmeans_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """3 Lloyd's iterations, k=8, deterministic init (lowest vec_ids).
    Output: one row per centroid with member count and centroid norm.
    The oracle unrolls the same 3 fixed iterations in DuckDB: distances
    fold sequentially in dim order (list_reduce == F.aggregate), means
    route through the same decimal sums, so results are bit-identical."""
    from ..operators.kmeans import kmeans_fit

    fitted = kmeans_fit(_emb(spark, sf), k=8, iters=3)
    norm = F.aggregate(
        "centroid_vec", F.lit(0.0), lambda acc, v: acc + v * v
    )
    return fitted.select(
        "centroid_id", "n_members", F.sqrt(norm).alias("centroid_norm")
    )


def _sql_kmeans_iter(i: int) -> str:
    """One Lloyd round: assign to nearest centroid (squared L2, sequential
    fold over dims — same order as Spark's F.aggregate), recenter via
    decimal-routed per-dim means (stable.py discipline)."""
    return f"""
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_reduce(
               list_transform(list_zip(e.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM e CROSS JOIN c{i - 1} c
  ) WHERE rn = 1
),
m{i} AS (
  SELECT a.cid, u.i AS dim,
         CAST(CAST(SUM(CAST(e.v[u.i + 1] AS DECIMAL(27,8))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS m
  FROM a{i} a JOIN e USING (vec_id),
       unnest(generate_series(0, len(e.v) - 1)) AS u(i)
  GROUP BY a.cid, u.i
),
c{i} AS (SELECT cid, list(m ORDER BY dim) AS cv FROM m{i} GROUP BY cid)
"""


SQL_KMEANS_CENTROIDS = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id ASC LIMIT 8
),
{_sql_kmeans_iter(1)},
{_sql_kmeans_iter(2)},
{_sql_kmeans_iter(3)},
final_assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_reduce(
               list_transform(list_zip(e.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM e CROSS JOIN c3 c
  ) WHERE rn = 1
),
sizes AS (SELECT cid, count(*) AS n_members FROM final_assign GROUP BY cid)
SELECT c.cid AS centroid_id,
       coalesce(s.n_members, 0) AS n_members,
       sqrt(list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b))
         AS centroid_norm
FROM c3 c LEFT JOIN sizes s USING (cid)
"""


# --------------------------------------------------- product quantization
PQ_M = 4
PQ_KSUB = 16
PQ_ITERS = 2
PQ_K = 10
_PQ_DSUB = 64 // PQ_M  # contract embeddings are 64-dim


def q_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ's quantization half (Jegou et al. TPAMI'11): train m=4
    16-code product codebooks (2 Lloyd rounds each, deterministic
    init), PQ-encode the corpus, and run an asymmetric-distance top-10
    for vec 0's query — the compressed-candidate-scan path of a
    production vector store (operators/quantize.py:pq_*). The oracle
    unrolls all four subspace k-means fits + encode + ADC in DuckDB;
    ADC doubles are bit-identical (fixed-order folds)."""
    from ..operators.quantize import pq_adc_topk, pq_encode, pq_train

    emb = _emb(spark, sf)
    books = pq_train(emb, m=PQ_M, ksub=PQ_KSUB, iters=PQ_ITERS)
    books = books.localCheckpoint(eager=True)  # consumed by encode + dtable
    codes = pq_encode(emb, books)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    return pq_adc_topk(codes, books, qvec, k=PQ_K)


def _sql_pq_iter(s: int, i: int) -> str:
    """One Lloyd round in subspace ``s`` — the q_kmeans_centroids
    oracle pattern with per-subspace frame names."""
    return f"""
a{s}_{i} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_reduce(
               list_transform(list_zip(e.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM es{s} e CROSS JOIN c{s}_{i - 1} c
  ) WHERE rn = 1
),
m{s}_{i} AS (
  SELECT a.cid, u.i AS dim,
         CAST(CAST(SUM(CAST(e.v[u.i + 1] AS DECIMAL(27,8))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS m
  FROM a{s}_{i} a JOIN es{s} e USING (vec_id),
       unnest(generate_series(0, len(e.v) - 1)) AS u(i)
  GROUP BY a.cid, u.i
),
c{s}_{i} AS (SELECT cid, list(m ORDER BY dim) AS cv FROM m{s}_{i} GROUP BY cid)"""


def _sql_pq_fits(src: str) -> str:
    """The m subspace slice/init/iterate CTEs over source frame
    ``src`` (full vectors for plain PQ, residuals for IVF-PQ)."""
    d = _PQ_DSUB
    parts = []
    for s in range(PQ_M):
        lo, hi = s * d + 1, (s + 1) * d
        parts.append(f""",
es{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM {src}),
c{s}_0 AS (SELECT vec_id AS cid, v AS cv FROM es{s} ORDER BY vec_id ASC LIMIT {PQ_KSUB})""")
        for i in range(1, PQ_ITERS + 1):
            parts.append("," + _sql_pq_iter(s, i))
    return "".join(parts)


def _sql_pq_books_union() -> str:
    return "\n  UNION ALL\n".join(
        f"  SELECT {s} AS sub_id, cid AS code_id, cv AS code_vec FROM c{s}_{PQ_ITERS}"
        for s in range(PQ_M)
    )


def _sql_pq_enc_union() -> str:
    return "\n  UNION ALL\n".join(
        f"""  SELECT vec_id, {s} AS sub_id, cid AS code_id FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_reduce(
               list_transform(list_zip(e.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM es{s} e CROSS JOIN c{s}_{PQ_ITERS} c
  ) WHERE rn = 1"""
        for s in range(PQ_M)
    )


def _sql_pq() -> str:
    d = _PQ_DSUB
    parts = [
        """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)"""
    ]
    parts.append(_sql_pq_fits("e"))
    books_union = _sql_pq_books_union()
    enc_union = _sql_pq_enc_union()
    parts.append(f""",
books AS (
{books_union}
),
enc AS (
{enc_union}
),
qv AS (SELECT v FROM e WHERE vec_id = 0),
dt AS (
  SELECT b.sub_id, b.code_id,
         list_reduce(
           list_transform(
             list_zip(qv.v[(b.sub_id * {d} + 1):(b.sub_id * {d} + {d})],
                      b.code_vec),
             p -> (p[1] - p[2]) * (p[1] - p[2])),
           (acc, x) -> acc + x) AS d2
  FROM books b CROSS JOIN qv
),
adc AS (
  SELECT enc.vec_id,
         list_reduce(list(dt.d2 ORDER BY dt.sub_id), (a, b) -> a + b) AS adc_d2
  FROM enc JOIN dt USING (sub_id, code_id)
  GROUP BY enc.vec_id
)
SELECT vec_id, adc_d2, rank FROM (
  SELECT vec_id, adc_d2,
         row_number() OVER (ORDER BY adc_d2 ASC, vec_id ASC) AS rank
  FROM adc
) WHERE rank <= {PQ_K}""")
    return "".join(parts)


SQL_PQ_ADC_TOPK = _sql_pq()


# ------------------------------------------------------------- IVF-PQ
IVFPQ_COARSE_K = 8
IVFPQ_COARSE_ITERS = 2
IVFPQ_NPROBE = 2


def q_ivf_pq_search(spark: SparkSession, sf: str) -> DataFrame:
    """The full FAISS-shape IVF-PQ index + probe: coarse 8-list
    quantizer (2 Lloyd rounds), product quantizer trained on the
    RESIDUALS, nprobe=2 probe ranking only the probed lists' codes by
    per-list ADC (operators/quantize.py:ivf_pq_build/ivf_pq_search).
    The oracle unrolls the coarse fit, the residual computation, all
    four residual-subspace fits, the encode, and the per-list ADC in
    one DuckDB statement — bit-exact."""
    from ..operators.quantize import ivf_pq_build, ivf_pq_search

    emb = _emb(spark, sf)
    coarse, books, codes = ivf_pq_build(
        emb,
        coarse_k=IVFPQ_COARSE_K,
        coarse_iters=IVFPQ_COARSE_ITERS,
        m=PQ_M,
        ksub=PQ_KSUB,
        pq_iters=PQ_ITERS,
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    return ivf_pq_search(
        coarse, books, codes, qvec, nprobe=IVFPQ_NPROBE, k=PQ_K
    )


def _sql_ivfpq_ctes() -> str:
    """The IVF-PQ chain as CTEs ending in ``ivfpqr`` (vec_id, adc_d2,
    rank<=PQ_K) — shared by the standalone oracle and the recall eval."""
    d = _PQ_DSUB
    ci = IVFPQ_COARSE_ITERS
    coarse_iters = "".join("," + _sql_kmeans_iter(i) for i in range(1, ci + 1))
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id ASC LIMIT {IVFPQ_COARSE_K})
{coarse_iters},
af AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_reduce(
               list_transform(list_zip(e.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM e CROSS JOIN c{ci} c
  ) WHERE rn = 1
),
resid AS (
  SELECT e.vec_id, af.cid,
         list_transform(list_zip(e.v, c.cv), p -> p[1] - p[2]) AS v
  FROM e JOIN af USING (vec_id) JOIN c{ci} c ON c.cid = af.cid
)
{_sql_pq_fits("resid")},
books AS (
{_sql_pq_books_union()}
),
enc AS (
{_sql_pq_enc_union()}
),
encc AS (SELECT enc.vec_id, af.cid, enc.sub_id, enc.code_id
         FROM enc JOIN af USING (vec_id)),
qv AS (SELECT v FROM e WHERE vec_id = 0),
probed AS (
  SELECT cid, cv FROM (
    SELECT c.cid, c.cv,
           row_number() OVER (
             ORDER BY list_reduce(
               list_transform(list_zip(qv.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM c{ci} c CROSS JOIN qv
  ) WHERE rn <= {IVFPQ_NPROBE}
),
dt AS (
  SELECT p.cid, b.sub_id, b.code_id,
         list_reduce(
           list_transform(
             list_zip(
               (list_transform(list_zip(qv.v, p.cv), p2 -> p2[1] - p2[2]))
                 [(b.sub_id * {d} + 1):(b.sub_id * {d} + {d})],
               b.code_vec),
             p3 -> (p3[1] - p3[2]) * (p3[1] - p3[2])),
           (acc, x) -> acc + x) AS d2
  FROM probed p CROSS JOIN books b CROSS JOIN qv
),
adc AS (
  SELECT encc.vec_id,
         list_reduce(list(dt.d2 ORDER BY dt.sub_id), (a, b) -> a + b) AS adc_d2
  FROM encc JOIN dt USING (cid, sub_id, code_id)
  GROUP BY encc.vec_id
),
ivfpqr AS (
  SELECT vec_id, adc_d2, rank FROM (
    SELECT vec_id, adc_d2,
           row_number() OVER (ORDER BY adc_d2 ASC, vec_id ASC) AS rank
    FROM adc
  ) WHERE rank <= {PQ_K}
)"""


SQL_IVF_PQ_SEARCH = f"""{_sql_ivfpq_ctes()}
SELECT vec_id, adc_d2, rank FROM ivfpqr"""


def q_ivf_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Honest compression-loss eval: recall@k of the IVF-PQ probe
    against the exact squared-L2 top-k for the same query — the PQ
    twin of q_ann_recall. Output is the integer numerator/denominator
    (no float divide), 1 row."""
    from ..operators.quantize import ivf_pq_build, ivf_pq_search
    from ..operators.similarity import _pair_d2

    emb = _emb(spark, sf)
    coarse, books, codes = ivf_pq_build(
        emb,
        coarse_k=IVFPQ_COARSE_K,
        coarse_iters=IVFPQ_COARSE_ITERS,
        m=PQ_M,
        ksub=PQ_KSUB,
        pq_iters=PQ_ITERS,
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    approx = ivf_pq_search(
        coarse, books, codes, qvec, nprobe=IVFPQ_NPROBE, k=PQ_K
    )
    qlit = F.array(*[F.lit(x) for x in qvec])
    exact = (
        emb.select(
            "vec_id",
            _pair_d2(
                F.transform("embedding", lambda v: v.cast("double")), qlit
            ).alias("_d2"),
        )
        .orderBy(F.asc("_d2"), F.asc("vec_id"))
        .limit(PQ_K)
    )
    return (
        approx.join(exact, "vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
        .select("n_hit", F.lit(PQ_K).alias("k_total"))
    )


SQL_IVF_PQ_RECALL = f"""{_sql_ivfpq_ctes()},
exact AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
           row_number() OVER (
             ORDER BY list_reduce(
               list_transform(list_zip(e.v, qv.v),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, e.vec_id ASC
           ) AS rn
    FROM e CROSS JOIN qv
  ) WHERE rn <= {PQ_K}
)
SELECT CAST(count(*) AS BIGINT) AS n_hit, {PQ_K} AS k_total
FROM ivfpqr JOIN exact USING (vec_id)"""


# ------------------------------------------ incremental IVF-PQ encode
def q_ivf_pq_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental index maintenance: the 80% standing corpus trains
    the coarse quantizer + residual codebooks; the 20% delta is
    encoded against the FROZEN index
    (operators/quantize.py:ivf_pq_encode_delta) — standing vectors are
    never re-encoded. Output: the delta's code rows."""
    from ..operators.quantize import ivf_pq_build, ivf_pq_encode_delta

    emb = _emb(spark, sf)
    standing = emb.filter(F.col("vec_id") % 10 < 8)
    delta = emb.filter(F.col("vec_id") % 10 >= 8)
    coarse, books, _codes = ivf_pq_build(
        standing,
        coarse_k=IVFPQ_COARSE_K,
        coarse_iters=IVFPQ_COARSE_ITERS,
        m=PQ_M,
        ksub=PQ_KSUB,
        pq_iters=PQ_ITERS,
    )
    return ivf_pq_encode_delta(delta, coarse, books)


def _sql_ivfpq_delta() -> str:
    d = _PQ_DSUB
    ci = IVFPQ_COARSE_ITERS
    coarse_iters = "".join("," + _sql_kmeans_iter(i) for i in range(1, ci + 1))
    enc_d_union = "\n  UNION ALL\n".join(
        f"""  SELECT vec_id, {s} AS sub_id, cid AS code_id FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_reduce(
               list_transform(list_zip(e.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM (SELECT vec_id, v[{s * d + 1}:{(s + 1) * d}] AS v FROM residd) e
    CROSS JOIN c{s}_{PQ_ITERS} c
  ) WHERE rn = 1"""
        for s in range(PQ_M)
    )
    return f"""
WITH eall AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
e AS (SELECT * FROM eall WHERE vec_id % 10 < 8),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id ASC LIMIT {IVFPQ_COARSE_K})
{coarse_iters},
af AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_reduce(
               list_transform(list_zip(e.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM e CROSS JOIN c{ci} c
  ) WHERE rn = 1
),
resid AS (
  SELECT e.vec_id, af.cid,
         list_transform(list_zip(e.v, c.cv), p -> p[1] - p[2]) AS v
  FROM e JOIN af USING (vec_id) JOIN c{ci} c ON c.cid = af.cid
)
{_sql_pq_fits("resid")},
ed AS (SELECT * FROM eall WHERE vec_id % 10 >= 8),
afd AS (
  SELECT vec_id, cid FROM (
    SELECT ed.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY ed.vec_id
             ORDER BY list_reduce(
               list_transform(list_zip(ed.v, c.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2])),
               (acc, x) -> acc + x) ASC, c.cid ASC
           ) AS rn
    FROM ed CROSS JOIN c{ci} c
  ) WHERE rn = 1
),
residd AS (
  SELECT ed.vec_id, afd.cid,
         list_transform(list_zip(ed.v, c.cv), p -> p[1] - p[2]) AS v
  FROM ed JOIN afd USING (vec_id) JOIN c{ci} c ON c.cid = afd.cid
),
encd AS (
{enc_d_union}
)
SELECT encd.vec_id, encd.sub_id, encd.code_id, afd.cid AS centroid_id
FROM encd JOIN afd USING (vec_id)"""


SQL_IVF_PQ_DELTA = _sql_ivfpq_delta()


# ------------------------------------------------- exact phrase match
PHRASE_QUERIES = [
    (1, "table hash"),
    (2, "part filter small"),
    (3, "big order scan"),
]


def q_phrase_match(spark: SparkSession, sf: str) -> DataFrame:
    """Positional-index phrase retrieval: documents containing each
    query's tokens consecutively, with match counts
    (operators/retrieval.py:phrase_match)."""
    from ..operators.retrieval import phrase_match

    d = _docs(spark, sf).select("doc_id", "text")
    q = spark.createDataFrame(
        PHRASE_QUERIES, "query_id int, query_text string"
    )
    return phrase_match(d, q)


def _sql_phrase() -> str:
    legs = []
    for qid, phrase in PHRASE_QUERIES:
        terms = phrase.split(" ")
        conds = " AND ".join(
            f"p.t[u.i + {off}] = '{t}'" for off, t in enumerate(terms)
        )
        legs.append(f"""  SELECT {qid} AS query_id, doc_id,
         CAST(count(*) AS BIGINT) AS n_matches
  FROM ptok p, unnest(generate_series(1, len(p.t) - {len(terms) - 1})) AS u(i)
  WHERE {conds}
  GROUP BY 2""")
    union = "\n  UNION ALL\n".join(legs)
    return rf"""
WITH ptok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
)
{union}"""


SQL_PHRASE_MATCH = _sql_phrase()


# ------------------------------------------ phrase-boosted hybrid rank
PB_LEG_K = 20
PB_K = 10


def q_phrase_boost(spark: SparkSession, sf: str) -> DataFrame:
    """Proximity-aware lexical ranking: the BM25 bag-of-words leg and
    the exact-phrase leg (ranked by consecutive-occurrence count) for
    the SAME phrase workload, fused by quantized RRF — the classic
    'phrase boost' a lexical engine applies so documents containing
    the query verbatim outrank bag-of-words matches. Composes
    bm25_topk + the one-plan phrase_match + rrf_fuse; both legs are
    top-k'd before the workload-bounded fusion."""
    from ..operators.retrieval import phrase_match, rrf_fuse

    d = _docs(spark, sf).select("doc_id", "text")
    q = spark.createDataFrame(
        PHRASE_QUERIES, "query_id int, query_text string"
    )
    lex = text_ops.bm25_topk(d, q, k=PB_LEG_K)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_matches"), F.asc("doc_id")
    )
    phr = (
        phrase_match(d, q)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PB_LEG_K)
    )
    return rrf_fuse([lex, phr], k=PB_K, k_rrf=RRF_K)


def _sql_phrase_boost() -> str:
    return f"""
WITH {_sql_bm25_ctes(PB_LEG_K, PHRASE_QUERIES)},
phrase AS (
{SQL_PHRASE_MATCH}
),
phr AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY n_matches DESC, doc_id ASC) AS rank
    FROM phrase
  ) WHERE rank <= {PB_LEG_K}
),
legs AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(1000000000.0 / ({RRF_K}.0 + CAST(rank AS DOUBLE))) AS BIGINT)
           AS _c
  FROM lexr
  UNION ALL
  SELECT query_id, doc_id,
         CAST(FLOOR(1000000000.0 / ({RRF_K}.0 + CAST(rank AS DOUBLE))) AS BIGINT)
           AS _c
  FROM phr
),
fused AS (
  SELECT query_id, doc_id, CAST(SUM(_c) AS BIGINT) AS rrf_x1e9,
         CAST(count(*) AS BIGINT) AS n_legs
  FROM legs GROUP BY 1, 2
)
SELECT query_id, doc_id, rrf_x1e9, n_legs, rank FROM (
  SELECT query_id, doc_id, rrf_x1e9, n_legs,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_x1e9 DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {PB_K}
"""


# --------------------------------------------------- BPE merge training
BPE_MERGES = 5


def q_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Train 5 BPE merges on the documents corpus (Sennrich et al.
    ACL'16, operators/text.py:bpe_train): word-frequency table once,
    then vocabulary-sized merge rounds. Output = the merges.txt
    artifact (step, pair, merged, freq). The oracle unrolls the same
    5 rounds — pair counting, deterministic argmax, greedy fold
    application — in one DuckDB statement."""
    return text_ops.bpe_train(_docs(spark, sf), n_merges=BPE_MERGES)


def _sql_bpe_ctes() -> str:
    """The BPE training chain as CTEs (wf, s0..sN, p1..pN, t1..tN) —
    shared by the merges oracle and the tokenize oracle. Rounds that
    run out of pairs degrade to no-ops (LEFT JOIN ON TRUE + the CASE's
    NULL fall-through), matching Spark's early break."""
    parts = [r"""
WITH wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents
  ) WHERE w != '' GROUP BY w
),
s0 AS (
  SELECT string_split(trim(regexp_replace(w, '(.)', '\1 ', 'g')), ' ') AS arr,
         freq
  FROM wf
)"""]
    for i in range(1, BPE_MERGES + 1):
        parts.append(f""",
p{i} AS (
  SELECT arr[u.i] || ' ' || arr[u.i + 1] AS pair,
         CAST(SUM(freq) AS BIGINT) AS f
  FROM s{i - 1}, unnest(generate_series(1, len(arr) - 1)) AS u(i)
  GROUP BY 1
),
t{i} AS (
  SELECT pair, replace(pair, ' ', '') AS merged, f FROM (
    SELECT pair, f, row_number() OVER (ORDER BY f DESC, pair ASC) AS rn
    FROM p{i}
  ) WHERE rn = 1
),
s{i} AS (
  SELECT list_reduce(
           list_transform(arr, tk -> [tk]),
           (acc, tk) -> CASE
             WHEN len(acc) > 0
                  AND acc[-1] = split_part(t.pair, ' ', 1)
                  AND tk[1] = split_part(t.pair, ' ', 2)
             THEN acc[1:len(acc) - 1] || [t.merged]
             ELSE acc || tk END) AS arr,
         freq
  FROM s{i - 1} LEFT JOIN t{i} t ON TRUE
)""")
    return "".join(parts)


def _sql_bpe_union() -> str:
    return "\nUNION ALL\n".join(
        f"SELECT {i} AS step, pair, merged, f AS freq FROM t{i}"
        for i in range(1, BPE_MERGES + 1)
    )


def q_bpe_merges_batched(spark: SparkSession, sf: str) -> DataFrame:
    """bpe_train_batched (operators/text.py): the exact conflict-free
    batched trainer — same merge table as q_bpe_merges by construction
    (rank-order-prefix batching with the new-pair bound), checked here
    against the SAME unrolled sequential DuckDB oracle."""
    return text_ops.bpe_train_batched(_docs(spark, sf), n_merges=BPE_MERGES)


def q_bpe_merges_local(spark: SparkSession, sf: str) -> DataFrame:
    """bpe_train_local (operators/text.py): the driver-side merge
    FINISHER — one corpus pass to the vocabulary-sized word-frequency
    table, capped collect, then pure-Python incremental merge rounds
    (pair counts + inverted index + lazy heap). Bit-identical to
    bpe_train by the determinism-parity argument in its docstring,
    checked here against the SAME unrolled sequential DuckDB oracle."""
    return text_ops.bpe_train_local(_docs(spark, sf), n_merges=BPE_MERGES)


SQL_BPE_MERGES = f"""{_sql_bpe_ctes()}
{_sql_bpe_union()}"""


def q_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenize the corpus with the 5 trained merges
    (operators/text.py:bpe_segment): per-document BPE token count.
    The merge list is the collected artifact (n_merges rows — it IS
    the tokenizer file); application runs on the distinct-word
    vocabulary and joins counts back. Trained via bpe_train_batched —
    provably the same merge sequence as bpe_train (the conflict-free
    rank-prefix argument, pinned by
    test_bpe_batched_equals_sequential) in far fewer Spark rounds."""
    d = _docs(spark, sf)
    trained = text_ops.bpe_train_batched(d, n_merges=BPE_MERGES)
    merges = [
        (r["pair"].split(" ", 1)[0], r["pair"].split(" ", 1)[1], r["merged"])
        for r in trained.orderBy("step").collect()
    ]
    return text_ops.bpe_segment(d, merges)


def q_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Encode the corpus to TOKEN IDS with the trained merges
    (operators/text.py:bpe_encode) — the artifact consumer a training
    pipeline feeds: one row per BPE symbol in document order, ids in
    the tokenizer-file convention (sorted base alphabet, then merges
    in training order). The oracle re-derives the training chain,
    re-applies the keyed folds, assigns the same ids, and emits the
    same (doc, seq_pos, token_id) rows. Trained via bpe_train_batched
    (same artifact as bpe_train, proven — see q_bpe_tokenize) so the
    driver pays one candidate-collect round instead of one per
    merge."""
    d = _docs(spark, sf)
    trained = text_ops.bpe_train_batched(d, n_merges=BPE_MERGES)
    merges = [
        (r["pair"].split(" ", 1)[0], r["pair"].split(" ", 1)[1], r["merged"])
        for r in trained.orderBy("step").collect()
    ]
    return text_ops.bpe_encode(d, merges)


def _sql_bpe_encode() -> str:
    parts = [_sql_bpe_ctes()]
    parts.append(""",
v0 AS (
  SELECT w, string_split(trim(regexp_replace(w, '(.)', '\\1 ', 'g')), ' ')
           AS arr
  FROM wf
)""")
    for i in range(1, BPE_MERGES + 1):
        parts.append(f""",
v{i} AS (
  SELECT w, list_reduce(
           list_transform(arr, tk -> [tk]),
           (acc, tk) -> CASE
             WHEN len(acc) > 0
                  AND acc[-1] = split_part(t.pair, ' ', 1)
                  AND tk[1] = split_part(t.pair, ' ', 2)
             THEN acc[1:len(acc) - 1] || [t.merged]
             ELSE acc || tk END) AS arr
  FROM v{i - 1} LEFT JOIN t{i} t ON TRUE
)""")
    merge_union = "\n  UNION ALL ".join(
        f"SELECT {i} AS step, merged FROM t{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    parts.append(f""",
chars AS (
  SELECT DISTINCT unnest(string_split(trim(regexp_replace(w, '(.)', '\\1 ', 'g')), ' ')) AS sym
  FROM wf
),
cid AS (
  SELECT sym, CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT)
           AS token_id
  FROM chars
),
nch AS (SELECT count(*) AS c FROM cid),
mid AS (
  SELECT m.merged AS sym, CAST(nch.c + m.step - 1 AS BIGINT) AS token_id
  FROM (SELECT merged, min(step) AS step FROM ({merge_union}) GROUP BY 1) m,
       nch
),
voc2 AS (SELECT * FROM cid UNION ALL SELECT * FROM mid),
dw AS (
  SELECT doc_id, u.i AS wpos, t[u.i] AS w
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents),
       unnest(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] != ''
),
sy AS (
  SELECT dw.doc_id, dw.wpos, s.i AS spos, v.arr[s.i] AS sym
  FROM dw JOIN v{BPE_MERGES} v ON v.w = dw.w,
       unnest(generate_series(1, len(v.arr))) AS s(i)
)
SELECT sy.doc_id,
       CAST(row_number() OVER (PARTITION BY sy.doc_id
                               ORDER BY sy.wpos, sy.spos) - 1 AS BIGINT)
         AS seq_pos,
       voc2.token_id
FROM sy JOIN voc2 ON voc2.sym = sy.sym""")
    return "".join(parts)


SQL_BPE_ENCODE = _sql_bpe_encode()


def _sql_bpe_tokenize() -> str:
    # re-derive the trained chain, then segment the per-doc words with
    # the same folds; the s{i} vocabulary frames lost the word key, so
    # build a keyed twin v{i} alongside
    parts = [_sql_bpe_ctes()]
    parts.append(""",
v0 AS (
  SELECT w, string_split(trim(regexp_replace(w, '(.)', '\\1 ', 'g')), ' ')
           AS arr
  FROM wf
)""")
    for i in range(1, BPE_MERGES + 1):
        parts.append(f""",
v{i} AS (
  SELECT w, list_reduce(
           list_transform(arr, tk -> [tk]),
           (acc, tk) -> CASE
             WHEN len(acc) > 0
                  AND acc[-1] = split_part(t.pair, ' ', 1)
                  AND tk[1] = split_part(t.pair, ' ', 2)
             THEN acc[1:len(acc) - 1] || [t.merged]
             ELSE acc || tk END) AS arr
  FROM v{i - 1} LEFT JOIN t{i} t ON TRUE
)""")
    parts.append(f""",
dw AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents
)
SELECT dw.doc_id, CAST(SUM(len(v.arr)) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN v{BPE_MERGES} v ON v.w = dw.w
WHERE dw.w != ''
GROUP BY dw.doc_id""")
    return "".join(parts)


SQL_BPE_TOKENIZE = _sql_bpe_tokenize()


# ----------------------------------------------- feature-hashed embedding
HASH_EMBED_DIM = 16
HASH_EMBED_K = 5


def q_hash_embed_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Text->vector without a learned encoder: 16-dim feature-hashed
    embeddings (hashing trick, operators/text.py:hash_embed — integer
    sums of +/-1 signs per hashed bucket), then the top-5 documents
    most similar to doc 0 by sparse-dot cosine. Candidates share at
    least one active dimension with the query; the only floats are the
    final cosine's one divide over integer dot/norms."""
    emb = text_ops.hash_embed(_docs(spark, sf), dim=HASH_EMBED_DIM)
    emb = emb.localCheckpoint(eager=True)  # query/norms/dots all read it
    qd = emb.filter(F.col("doc_id") == 0).select(
        "dim_idx", F.col("val").alias("qval")
    )
    norms = emb.groupBy("doc_id").agg(F.sum(F.col("val") * F.col("val")).alias("n2"))
    qn = norms.filter(F.col("doc_id") == 0).select(F.col("n2").alias("qn2"))
    dots = (
        emb.join(F.broadcast(qd), "dim_idx")
        .filter(F.col("doc_id") != 0)
        .groupBy("doc_id")
        .agg(F.sum(F.col("val") * F.col("qval")).cast("bigint").alias("dot"))
    )
    scored = (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            "dot",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("n2").cast("double"))
                    * F.sqrt(F.col("qn2").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HASH_EMBED_K)
        .select("doc_id", "dot", "cosine", "rank")
    )


SQL_HASH_EMBED_SIM = rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
hh AS (
  SELECT doc_id,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
  FROM tok WHERE term != ''
),
f AS (
  SELECT doc_id, (h // 2) % {HASH_EMBED_DIM} AS dim_idx,
         CAST(SUM(1 - 2 * (h % 2)) AS BIGINT) AS val
  FROM hh GROUP BY 1, 2
  HAVING CAST(SUM(1 - 2 * (h % 2)) AS BIGINT) != 0
),
qd AS (SELECT dim_idx, val AS qval FROM f WHERE doc_id = 0),
n AS (SELECT doc_id, SUM(val * val) AS n2 FROM f GROUP BY 1),
qn AS (SELECT n2 AS qn2 FROM n WHERE doc_id = 0),
dots AS (
  SELECT f.doc_id, CAST(SUM(f.val * qd.qval) AS BIGINT) AS dot
  FROM f JOIN qd USING (dim_idx)
  WHERE f.doc_id <> 0
  GROUP BY 1
),
scored AS (
  SELECT d.doc_id, d.dot,
         CAST(d.dot AS DOUBLE)
           / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(qn.qn2 AS DOUBLE)))
           AS cosine
  FROM dots d JOIN n USING (doc_id) CROSS JOIN qn
)
SELECT doc_id, dot, cosine, rank FROM (
  SELECT doc_id, dot, cosine,
         row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {HASH_EMBED_K}
"""


# ------------------------------------------------------ multimodal plumbing
def q_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Opaque-binary metadata pass (multimodal plumbing): byte length +
    sha256, payload bytes never decoded — the metadata-only plan."""
    d = _docs(spark, sf)
    return d.select(
        F.col("doc_id").alias("content_id"),
        F.col("source").alias("media_type"),
        F.octet_length("text").alias("byte_len"),
        F.sha2(F.col("text"), 256).alias("sha256"),
    )


SQL_BINARY_META = """
SELECT doc_id AS content_id, source AS media_type,
       octet_length(text::BLOB)::INT AS byte_len, sha256(text) AS sha256
FROM documents
"""


def q_ahash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """The image near-dup PAIR stage, oracle-checked: banding + exact
    bit_count hamming verify (operators/multimodal.py:
    image_neardup_pairs) over a deterministic 60-bit hash frame —
    planted triplets (md5 of doc_id // 3, members XOR-perturbed by
    <= 2 bits) stand in for real aHashes, whose PNG/JPEG decode is
    binary and pytest-pinned instead. This puts the banded join +
    pigeonhole-guaranteed verify — the part that must survive 100 TB —
    in the DuckDB sweep."""
    from ..operators.multimodal import image_neardup_pairs

    d = _docs(spark, sf)
    h60 = F.conv(
        F.substring(
            F.md5(F.floor(F.col("doc_id") / 3).cast("string")), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    hashes = d.select(
        "doc_id", h60.bitwiseXOR((F.col("doc_id") % 3) * 3).alias("ahash")
    )
    return image_neardup_pairs(
        hashes, max_hamming=3, n_bands=4, id_col="doc_id", hash_col="ahash"
    )


SQL_AHASH_NEARDUP = """
WITH h AS (
  SELECT doc_id,
         xor(('0x' || substr(md5(CAST(doc_id // 3 AS VARCHAR)), 1, 15))::BIGINT,
             (doc_id % 3) * 3) AS ahash
  FROM documents
),
bands AS (
  SELECT doc_id, ahash, b.i AS band_idx,
         (ahash >> (16 * b.i)) & 65535 AS band_val
  FROM h, (SELECT unnest(generate_series(0, 3)) AS i) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.ahash AS ha, b.ahash AS hb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
"""


def q_ahash_index_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental perceptual-hash index maintenance == full rebuild,
    pinned by the oracle (operators/multimodal.py:hamming_index_delta —
    the banded hamming path's incremental twin, serving image aHash /
    audio fingerprints / video signatures alike): the 80% standing
    hash table folds with the 20% delta, the delta side probes the
    folded bands, and the NEW pairs must equal the full-corpus banded
    pairs restricted to pairs touching a delta id — EXACT because
    banding recall is pigeonhole-guaranteed below the band count.
    Same planted-triplet stand-in hashes as q_ahash_neardup."""
    from ..operators.multimodal import hamming_index_delta

    d = _docs(spark, sf)
    h60 = F.conv(
        F.substring(
            F.md5(F.floor(F.col("doc_id") / 3).cast("string")), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    hashes = d.select(
        "doc_id", h60.bitwiseXOR((F.col("doc_id") % 3) * 3).alias("ahash")
    )
    standing = hashes.filter(F.col("doc_id") % 10 < 8)
    delta = hashes.filter(F.col("doc_id") % 10 >= 8)
    _folded, pairs = hamming_index_delta(
        standing, delta, max_hamming=3, n_bands=4, id_col="doc_id"
    )
    return pairs


SQL_AHASH_INDEX_DELTA = """
WITH h AS (
  SELECT doc_id,
         xor(('0x' || substr(md5(CAST(doc_id // 3 AS VARCHAR)), 1, 15))::BIGINT,
             (doc_id % 3) * 3) AS ahash
  FROM documents
),
bands AS (
  SELECT doc_id, ahash, b.i AS band_idx,
         (ahash >> (16 * b.i)) & 65535 AS band_val
  FROM h, (SELECT unnest(generate_series(0, 3)) AS i) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.ahash AS ha, b.ahash AS hb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
  AND (id_a % 10 >= 8 OR id_b % 10 >= 8)
"""


def q_video_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Video near-dup, the signature + pair stages oracle-checked
    (operators/multimodal.py:video_signature + image_neardup_pairs):
    per-video majority-vote bit fold over the frame-hash sequence, then
    the banded hamming path. Deterministic stand-in frame hashes (8
    frames per 'video' = doc_id//3 group: 60-bit md5 of the group XOR
    frame_idx, members XOR a per-member 2-bit delta on EVERY frame so
    planted near-dups land at hamming 1-2) stand in for the real frame
    decode, which is binary and pytest-pinned
    (test_video_neardup_chain) — the q_ahash_neardup discipline."""
    from ..operators.multimodal import image_neardup_pairs, video_signature

    d = _docs(spark, sf)
    base = F.conv(
        F.substring(
            F.md5(F.floor(F.col("doc_id") / 3).cast("string")), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    frames = d.select(
        F.col("doc_id").alias("content_id"),
        base.alias("_base"),
        (F.col("doc_id") % 3).alias("_m"),
    ).select(
        "content_id",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("frame_idx"),
        "_base",
        "_m",
    ).select(
        "content_id",
        "frame_idx",
        F.col("_base")
        .bitwiseXOR(F.col("frame_idx").cast("bigint"))
        .bitwiseXOR(F.col("_m") * F.lit(16))
        .alias("fhash"),
    )
    sigs = video_signature(frames, id_col="content_id", n_bits=60)
    return image_neardup_pairs(
        sigs,
        max_hamming=3,
        n_bands=4,
        id_col="content_id",
        hash_col="vhash",
    )


def _sql_video_neardup() -> str:
    vote = " + ".join(
        f"(CASE WHEN 2 * sum((fhash >> {i}) & 1) > count(*) "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(60)
    )
    return f"""
WITH fr AS (
  SELECT doc_id AS content_id, u.i AS frame_idx,
         xor(xor(('0x' || substr(md5(CAST(doc_id // 3 AS VARCHAR)), 1, 15))::BIGINT,
                 u.i),
             (doc_id % 3) * 16) AS fhash
  FROM documents, (SELECT unnest(generate_series(0, 7)) AS i) u
),
sig AS (
  SELECT content_id, CAST({vote} AS BIGINT) AS vhash
  FROM fr GROUP BY 1
),
bands AS (
  SELECT content_id, vhash, b.i AS band_idx,
         (vhash >> (16 * b.i)) & 65535 AS band_val
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS i) b
),
cand AS (
  SELECT DISTINCT a.content_id AS id_a, b.content_id AS id_b,
                  a.vhash AS ha, b.vhash AS hb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.content_id < b.content_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
"""


# ------------------------------------------------------------ sessionization
def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return sessionize(ev, gap_seconds=1800).select(
        "event_id", "user_id", "ts", "session_seq"
    )


SQL_SESSIONIZE = """
SELECT event_id, user_id, ts,
  CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM (
  SELECT event_id, user_id, ts, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
  FROM events
)
"""


def q_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 characteristic terms per document (rational-idf TF-IDF,
    operators/text.py:tfidf_topk)."""
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    return text_ops.tfidf_topk(d, k=3)


SQL_TFIDF_TOPK = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, score, rank FROM (
  SELECT tf.doc_id, tf.term,
         tf.tf * (n.n_docs + 1.0) / (dfq.df_t + 1.0) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * (n.n_docs + 1.0) / (dfq.df_t + 1.0) DESC, tf.term ASC
         ) AS rank
  FROM tf JOIN dfq USING (term) CROSS JOIN n
) WHERE rank <= 3
"""


# ------------------------------------------------------- BM25 retrieval
BM25_QUERIES = [
    (1, "hash join spark"),
    (2, "window sort merge"),
    (3, "fast table scan"),
]


def q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 documents per query under rational-idf BM25
    (operators/text.py:bm25_topk) for a fixed 3-query workload."""
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    return text_ops.bm25_topk(d, q, k=5)


# literal spellings mirror the Spark expression tree exactly:
# k1=1.2, k1+1 computed python-side = 2.2, 1-b written (1.0 - 0.75);
# shared between the base BM25 oracle and the PRF rescore so the
# formula can't diverge between passes
_SQL_BM25_CONTRIB = """CAST(FLOOR(
           ((CAST(n_docs AS DOUBLE) - CAST(df_t AS DOUBLE) + 0.5)
              / (CAST(df_t AS DOUBLE) + 0.5))
           * ((CAST(tf AS DOUBLE) * 2.2)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * ((1.0 - 0.75)
                          + 0.75 * (CAST(dl AS DOUBLE)
                                    / (CAST(sum_dl AS DOUBLE)
                                       / CAST(n_docs AS DOUBLE))))))
           * 1000000.0) AS BIGINT)"""


def _sql_bm25_ctes(k: int, qs: list | None = None) -> str:
    """The BM25 pipeline as a CTE chain ending in ``lexr`` (query_id,
    doc_id, score_x1e6, rank<=k) — shared between the standalone oracle
    and every composed-retrieval oracle so the spellings can't diverge.
    ``qs`` overrides the query workload (default BM25_QUERIES)."""
    vals = ", ".join(f"({i}, '{t}')" for i, t in (qs or BM25_QUERIES))
    return rf"""q(query_id, query_text) AS (VALUES {vals}),
qt AS (
  SELECT DISTINCT query_id,
         unnest(string_split_regex(trim(query_text), '\s+')) AS term
  FROM q
),
base AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents)
),
tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
       FROM base GROUP BY 1, 2),
dfq AS (
  SELECT term, count(*) AS df_t FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY 1
),
stats AS (
  SELECT count(*) AS n_docs,
         SUM(len(string_split_regex(trim(text), '\s+'))) AS sum_dl
  FROM documents
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         {_SQL_BM25_CONTRIB} AS _sq
  FROM tf JOIN qt USING (term) JOIN dfq USING (term) CROSS JOIN stats
),
bm25agg AS (SELECT query_id, doc_id, CAST(SUM(_sq) AS BIGINT) AS score_x1e6
            FROM scored GROUP BY 1, 2),
lexr AS (
  SELECT query_id, doc_id, score_x1e6, rank FROM (
    SELECT query_id, doc_id, score_x1e6,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_x1e6 DESC, doc_id ASC) AS rank
    FROM bm25agg
  ) WHERE rank <= {k}
)"""


SQL_BM25_TOPK = f"""
WITH {_sql_bm25_ctes(5)}
SELECT query_id, doc_id, score_x1e6, rank FROM lexr
"""


# -------------------------------------- winnowing local fingerprints
WINNOW_K = 3
WINNOW_W = 4


def q_winnow_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """MOSS winnowing fingerprints over the document corpus
    (operators/text.py:winnow_fingerprint): k=3-gram hashes, window
    w=4, leftmost-min selection — the partial-overlap detection
    primitive (any shared run >= w+k-1 tokens shares a fingerprint)."""
    d = _docs(spark, sf)
    return text_ops.winnow_fingerprint(d, k=WINNOW_K, w=WINNOW_W)


def _sql_winnow_ctes(src: str) -> str:
    """The winnowing chain as CTEs (t, g, sel, ex) over a source table
    expression yielding (doc_id, text) — shared by the fingerprint
    oracle and the overlap-pairs oracle."""
    return rf"""t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM {src}
),
g AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(toks) - {WINNOW_K - 1}),
           i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT
                  % 2147483647
         ) AS gh
  FROM t
  WHERE len(toks) >= {WINNOW_K + WINNOW_W - 1}
),
sel AS (
  -- (pos, fp) packed into one BIGINT (fp < 2^31 by base_hash31's
  -- mersenne mod) so list_distinct works (DuckDB lacks struct-list
  -- dedup); decoded after unnest — the decoded set equals Spark's
  -- struct array_distinct set exactly
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(gh) - {WINNOW_W - 1}),
           i -> CAST(i + list_position(gh[i:i+{WINNOW_W - 1}],
                                       list_min(gh[i:i+{WINNOW_W - 1}])) - 1
                     AS BIGINT) * 2147483648
                + list_min(gh[i:i+{WINNOW_W - 1}])
         )) AS fps
  FROM g
),
ex AS (SELECT doc_id, unnest(fps) AS code FROM sel)"""


SQL_WINNOW_FINGERPRINT = f"""
WITH {_sql_winnow_ctes("documents")}
SELECT doc_id, code // 2147483648 AS pos,
       CAST(code % 2147483648 AS BIGINT) AS fp_hash
FROM ex
"""


# ------------------------------------- winnowing overlap-pair match
WINNOW_BOILER = "qq0 ww1 ee2 rr3 tt4 yy5 uu6 ii7"  # 8 synthetic tokens
WINNOW_MIN_SHARED = 2
WINNOW_MAX_DF = 20


def q_winnow_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """The MOSS match step, oracle-checked end-to-end: each doc pair
    (doc_id % 50 < 2, grouped by doc_id // 50) gets a shared 9-token
    run (8 boiler tokens + a group token — >= w+k-1, synthesized
    in-engine per the q_url_dedup fixture convention), so the
    winnowing guarantee forces those pairs to share fingerprints at
    df=2 — BELOW the stop-fingerprint cap at any scale (a run shared
    corpus-wide would be df-capped away, by design: that is
    line_dedup's job). winnow_overlap returns pairs sharing >= 2
    selected hashes (operators/text.py:winnow_overlap); natural
    fixture overlaps surface alongside the planted ones."""
    d = _docs(spark, sf).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 < 2,
            F.concat(
                F.col("text"),
                F.lit(" " + WINNOW_BOILER + " g"),
                F.floor(F.col("doc_id") / 50).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    fps = text_ops.winnow_fingerprint(d, k=WINNOW_K, w=WINNOW_W)
    return text_ops.winnow_overlap(
        fps, min_shared=WINNOW_MIN_SHARED, max_df=WINNOW_MAX_DF
    )


def _sql_winnow_overlap() -> str:
    src = (
        "(SELECT doc_id, CASE WHEN doc_id % 50 < 2 "
        f"THEN text || ' {WINNOW_BOILER} g' || CAST(doc_id // 50 AS VARCHAR) "
        "ELSE text END AS text "
        "FROM documents)"
    )
    return f"""
WITH {_sql_winnow_ctes(src)},
fpd AS (
  SELECT DISTINCT doc_id, CAST(code % 2147483648 AS BIGINT) AS fp_hash
  FROM ex
),
keep AS (
  SELECT fp_hash FROM fpd GROUP BY 1 HAVING count(*) <= {WINNOW_MAX_DF}
),
ff AS (SELECT fpd.doc_id, fpd.fp_hash FROM fpd JOIN keep USING (fp_hash))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM ff a JOIN ff b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


def q_winnow_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental winnowing maintenance == full rebuild, pinned by
    the oracle: the 80% standing corpus's fingerprint table folds with
    the 20% delta (operators/text.py:winnow_index_delta — delta-sized
    fingerprinting, fp-keyed delta-side probe, merged-df stop-
    fingerprint cap) and the NEW pairs must equal the full-corpus
    winnow_overlap restricted to pairs touching a delta doc."""
    d = _docs(spark, sf).select("doc_id", "text")
    standing_docs = d.filter(F.col("doc_id") % 10 < 8)
    delta = d.filter(F.col("doc_id") % 10 >= 8)
    standing_fps = text_ops.winnow_fingerprint(
        standing_docs, k=WINNOW_K, w=WINNOW_W
    )
    _folded, pairs = text_ops.winnow_index_delta(
        standing_fps,
        delta,
        k=WINNOW_K,
        w=WINNOW_W,
        min_shared=WINNOW_MIN_SHARED,
        max_df=WINNOW_MAX_DF,
    )
    return pairs


def _sql_winnow_incremental() -> str:
    return f"""
WITH {_sql_winnow_ctes("documents")},
fpd AS (
  SELECT DISTINCT doc_id, CAST(code % 2147483648 AS BIGINT) AS fp_hash
  FROM ex
),
keep AS (
  SELECT fp_hash FROM fpd GROUP BY 1 HAVING count(*) <= {WINNOW_MAX_DF}
),
ff AS (SELECT fpd.doc_id, fpd.fp_hash FROM fpd JOIN keep USING (fp_hash)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM ff a JOIN ff b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {WINNOW_MIN_SHARED}
)
SELECT id_a, id_b, n_shared FROM pairs
WHERE id_a % 10 >= 8 OR id_b % 10 >= 8
"""


# ------------------------- query-likelihood retrieval (Dirichlet)
QLD_MU = 300


def q_qld_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 documents per query under Dirichlet-smoothed query
    likelihood (Zhai & Lafferty SIGIR'01, operators/text.py:qld_topk)
    — the LM-based classic next to BM25, ranked by exact integer
    surprisal bits (lower = more likely)."""
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    return text_ops.qld_topk(d, q, k=5, mu=QLD_MU)


SQL_QLD_TOPK = rf"""
WITH q(query_id, query_text) AS (VALUES {", ".join(f"({i}, '{t}')" for i, t in BM25_QUERIES)}),
qt AS (
  SELECT DISTINCT query_id, t AS term FROM (
    SELECT query_id,
           unnest(string_split_regex(trim(query_text), '\s+')) AS t
    FROM q
  ) WHERE t != ''
),
base AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents)
),
tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
       FROM base GROUP BY 1, 2),
cf AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cf_w FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY 1
),
stats AS (
  SELECT CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           AS cf_total
  FROM documents
),
matched AS (SELECT qt.query_id, tf.doc_id, tf.dl FROM tf JOIN qt USING (term)),
cand AS (
  SELECT query_id, doc_id, min(dl) AS dl,
         CAST(count(*) AS BIGINT) AS n_hit_terms
  FROM matched GROUP BY 1, 2
),
fullt AS (
  SELECT c.query_id, c.doc_id, c.n_hit_terms,
         (CAST(c.dl AS BIGINT) + {QLD_MU}) * s.cf_total AS num,
         CAST(coalesce(tf.tf, 0) AS BIGINT) * s.cf_total
           + {QLD_MU} * cf.cf_w AS den
  FROM cand c JOIN qt USING (query_id)
  LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.term = qt.term
  JOIN cf ON cf.term = qt.term
  CROSS JOIN stats s
),
per AS (
  SELECT query_id, doc_id, n_hit_terms,
         CAST(length(bin(num // den)) - 1 AS BIGINT) AS bits
  FROM fullt
),
agg AS (
  SELECT query_id, doc_id, max(n_hit_terms) AS n_hit_terms,
         CAST(sum(bits) AS BIGINT) AS sum_bits
  FROM per GROUP BY 1, 2
)
SELECT query_id, doc_id, n_hit_terms, sum_bits, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sum_bits ASC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= 5
"""


def q_bm25_index_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental index maintenance == full rebuild, pinned by the
    oracle: the 80% standing corpus's BM25 index frames are folded
    with the 20% delta (operators/text.py:bm25_index_delta — delta-
    sized tokenize, append-only tf, 1-row stats addition) and the
    merged index answers the standard 3-query top-5. The oracle is
    the FULL-CORPUS rebuild chain — identical output proves the
    maintenance path."""
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    standing = d.filter(F.col("doc_id") % 10 < 8)
    delta = d.filter(F.col("doc_id") % 10 >= 8)
    tf0, stats0 = text_ops.bm25_index(standing)
    tf2, stats2 = text_ops.bm25_index_delta(tf0, stats0, delta)
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    qt = q.select(
        "query_id", F.explode(text_ops.tokens("query_text")).alias("term")
    ).distinct()
    scored = text_ops.bm25_score_terms(tf2, stats2, qt)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_x1e6"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "score_x1e6", "rank")
    )


# --------------------------------- BM25 pseudo-relevance feedback (RM3)
PRF_FB_K = 3  # feedback docs per query
PRF_N_EXP = 5  # expansion terms per query
PRF_W_ORIG = 2  # original-term weight  } the quantized lambda=2/3
PRF_W_EXP = 1  # expansion-term weight  } RM3 interpolation
PRF_K = 5


def q_bm25_prf(spark: SparkSession, sf: str) -> DataFrame:
    """RM3-lite pseudo-relevance feedback: BM25 top-3 feedback docs per
    query, 5 heaviest feedback terms appended at weight 1 vs 2 for the
    originals, rescored to a top-5
    (operators/retrieval.py:bm25_prf_topk)."""
    from ..operators.retrieval import bm25_prf_topk

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    return bm25_prf_topk(
        d, q, k=PRF_K, fb_k=PRF_FB_K, n_exp=PRF_N_EXP,
        w_orig=PRF_W_ORIG, w_exp=PRF_W_EXP,
    )


def _sql_bm25_prf_ctes(k2: int) -> str:
    """The PRF pipeline as a CTE chain ending in ``prfr`` (query_id,
    doc_id, score_x1e6, rank<=k2) — shared by the standalone oracle and
    the composed RAG-retrieval oracle."""
    return f"""{_sql_bm25_ctes(PRF_FB_K)},
fb AS (SELECT query_id, doc_id FROM lexr),
cand AS (
  SELECT fb.query_id, tf.term, CAST(SUM(tf.tf) AS BIGINT) AS fb_tf
  FROM tf JOIN fb ON fb.doc_id = tf.doc_id
  GROUP BY 1, 2
),
candx AS (
  SELECT c.query_id, c.term, c.fb_tf
  FROM cand c LEFT JOIN qt ON qt.query_id = c.query_id AND qt.term = c.term
  WHERE qt.term IS NULL
),
expn AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY fb_tf DESC, term ASC) AS r
    FROM candx
  ) WHERE r <= {PRF_N_EXP}
),
eq AS (
  SELECT query_id, term, {PRF_W_ORIG} AS w FROM qt
  UNION ALL
  SELECT query_id, term, {PRF_W_EXP} AS w FROM expn
),
dfq2 AS (
  SELECT term, count(*) AS df_t FROM tf
  WHERE term IN (SELECT term FROM eq) GROUP BY 1
),
scored2 AS (
  SELECT eq.query_id, tf.doc_id,
         {_SQL_BM25_CONTRIB} * CAST(eq.w AS BIGINT) AS _sq
  FROM tf JOIN eq USING (term) JOIN dfq2 USING (term) CROSS JOIN stats
),
agg2 AS (SELECT query_id, doc_id, CAST(SUM(_sq) AS BIGINT) AS score_x1e6
         FROM scored2 GROUP BY 1, 2),
prfr AS (
  SELECT query_id, doc_id, score_x1e6, rank FROM (
    SELECT query_id, doc_id, score_x1e6,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_x1e6 DESC, doc_id ASC) AS rank
    FROM agg2
  ) WHERE rank <= {k2}
)"""


SQL_BM25_PRF = f"""
WITH {_sql_bm25_prf_ctes(PRF_K)}
SELECT query_id, doc_id, score_x1e6, rank FROM prfr
"""


# -------------------------------------------- hybrid retrieval (RRF)
HYBRID_LEG_K = 20
HYBRID_K = 10
RRF_K = 60


def q_hybrid_retrieval(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-20 + embedding-cosine
    semantic top-20 per query, fused by quantized Reciprocal Rank
    Fusion (operators/retrieval.py:rrf_fuse) into a top-10. Query
    vectors are the embeddings of vec_id 0-2 standing in for encoded
    query text (the engine ships no encoder; vec_id ~ doc_id)."""
    from ..operators.retrieval import rrf_fuse
    from ..operators.similarity import cosine_topk_batch

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    lex = text_ops.bm25_topk(d, q, k=HYBRID_LEG_K)
    emb = _emb(spark, sf)
    qv = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1).cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    sem = cosine_topk_batch(emb, qv, k=HYBRID_LEG_K).withColumnRenamed(
        "vec_id", "doc_id"
    )
    return rrf_fuse([lex, sem], k=HYBRID_K, k_rrf=RRF_K)


SQL_HYBRID_RETRIEVAL = f"""
WITH {_sql_bm25_ctes(HYBRID_LEG_K)},
el AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
qv AS (SELECT CAST(vec_id + 1 AS INTEGER) AS query_id, v AS qvec
       FROM el WHERE vec_id < 3),
semscored AS (
  SELECT qv.query_id, el.vec_id AS doc_id,
         list_dot_product(v, qvec)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec)))
           AS cosine
  FROM el, qv
),
semr AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM semscored
  ) WHERE rank <= {HYBRID_LEG_K}
),
legs AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(1000000000.0 / ({RRF_K}.0 + CAST(rank AS DOUBLE))) AS BIGINT)
           AS _c
  FROM lexr
  UNION ALL
  SELECT query_id, doc_id,
         CAST(FLOOR(1000000000.0 / ({RRF_K}.0 + CAST(rank AS DOUBLE))) AS BIGINT)
           AS _c
  FROM semr
),
fused AS (
  SELECT query_id, doc_id, CAST(SUM(_c) AS BIGINT) AS rrf_x1e9,
         CAST(count(*) AS BIGINT) AS n_legs
  FROM legs GROUP BY 1, 2
)
SELECT query_id, doc_id, rrf_x1e9, n_legs, rank FROM (
  SELECT query_id, doc_id, rrf_x1e9, n_legs,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_x1e9 DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {HYBRID_K}
"""


SNIPPET_WINDOW = 16


# ------------------------------------------- composed RAG retrieval v2
def q_rag_retrieve(spark: SparkSession, sf: str) -> DataFrame:
    """The COMPOSED retrieval pipeline, one oracle end-to-end:
    PRF-expanded BM25 lexical leg (top-20) + embedding-cosine semantic
    leg (top-20) -> quantized RRF fusion (top-10) -> densest-window
    snippet per fused hit (left join: semantic-only hits report NULL
    span honestly). The retrieval twin of q_corpus_pipeline_v4's
    composed-funnel discipline."""
    from ..operators.retrieval import (
        best_snippet_window,
        bm25_prf_topk,
        rrf_fuse,
    )
    from ..operators.similarity import cosine_topk_batch

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    lex = bm25_prf_topk(
        d, q, k=HYBRID_LEG_K, fb_k=PRF_FB_K, n_exp=PRF_N_EXP,
        w_orig=PRF_W_ORIG, w_exp=PRF_W_EXP,
    )
    emb = _emb(spark, sf)
    qv = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1).cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    sem = cosine_topk_batch(emb, qv, k=HYBRID_LEG_K).withColumnRenamed(
        "vec_id", "doc_id"
    )
    fused = rrf_fuse([lex, sem], k=HYBRID_K, k_rrf=RRF_K)
    snips = best_snippet_window(
        d, q, fused.select("query_id", "doc_id"), window=SNIPPET_WINDOW
    )
    return fused.join(snips, ["query_id", "doc_id"], "left").select(
        "query_id", "doc_id", "rrf_x1e9", "n_legs", "rank",
        "win_start", "n_hits",
    )


SQL_RAG_RETRIEVE = f"""
WITH {_sql_bm25_prf_ctes(HYBRID_LEG_K)},
el AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
qv AS (SELECT CAST(vec_id + 1 AS INTEGER) AS query_id, v AS qvec
       FROM el WHERE vec_id < 3),
semscored AS (
  SELECT qv.query_id, el.vec_id AS doc_id,
         list_dot_product(v, qvec)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec)))
           AS cosine
  FROM el, qv
),
semr AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM semscored
  ) WHERE rank <= {HYBRID_LEG_K}
),
legs AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(1000000000.0 / ({RRF_K}.0 + CAST(rank AS DOUBLE))) AS BIGINT)
           AS _c
  FROM prfr
  UNION ALL
  SELECT query_id, doc_id,
         CAST(FLOOR(1000000000.0 / ({RRF_K}.0 + CAST(rank AS DOUBLE))) AS BIGINT)
           AS _c
  FROM semr
),
fused AS (
  SELECT query_id, doc_id, CAST(SUM(_c) AS BIGINT) AS rrf_x1e9,
         CAST(count(*) AS BIGINT) AS n_legs
  FROM legs GROUP BY 1, 2
),
fusedr AS (
  SELECT query_id, doc_id, rrf_x1e9, n_legs, rank FROM (
    SELECT query_id, doc_id, rrf_x1e9, n_legs,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rrf_x1e9 DESC, doc_id ASC) AS rank
    FROM fused
  ) WHERE rank <= {HYBRID_K}
),
ptok AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(generate_series(0, len(toks) - 1)) AS pos
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents)
),
shits AS (
  SELECT qt.query_id, p.doc_id, p.pos
  FROM ptok p
  JOIN qt USING (term)
  JOIN fusedr c ON c.query_id = qt.query_id AND c.doc_id = p.doc_id
),
swins AS (
  SELECT a.query_id, a.doc_id, a.pos AS win_start, count(*) AS n_hits
  FROM shits a
  JOIN shits b ON b.query_id = a.query_id AND b.doc_id = a.doc_id
            AND b.pos >= a.pos AND b.pos <= a.pos + {SNIPPET_WINDOW - 1}
  GROUP BY 1, 2, 3
),
snip AS (
  SELECT query_id, doc_id, win_start, n_hits FROM (
    SELECT query_id, doc_id, win_start, n_hits,
           row_number() OVER (PARTITION BY query_id, doc_id
                              ORDER BY n_hits DESC, win_start ASC) AS r
    FROM swins
  ) WHERE r = 1
)
SELECT f.query_id, f.doc_id, f.rrf_x1e9, f.n_legs, f.rank,
       s.win_start, s.n_hits
FROM fusedr f LEFT JOIN snip s
  ON s.query_id = f.query_id AND s.doc_id = f.doc_id
"""


# ------------------------------------------------- retrieval evaluation
METRICS_K = 10


def _conjunctive_qrels(d: DataFrame, qt: DataFrame) -> DataFrame:
    """Ground truth shared by the metrics and hard-negative queries: a
    doc is relevant iff it contains EVERY query term (the Python twin
    of _SQL_QRELS_CTES)."""
    n_terms = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("_nt"))
    return (
        d.select("doc_id", F.explode_outer(text_ops.tokens("text")).alias("term"))
        .distinct()
        .join(qt, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("_matched"))
        .join(n_terms, "query_id")
        .filter(F.col("_matched") == F.col("_nt"))
        .select("query_id", "doc_id")
    )


def q_retrieval_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """IR eval harness: BM25 top-10 per query scored against conjunctive
    ground truth (a doc is relevant iff it contains EVERY query term) —
    per-query hits@k, n_rel, first relevant rank, quantized MRR
    (operators/retrieval.py:retrieval_metrics)."""
    from ..operators.retrieval import retrieval_metrics

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    results = text_ops.bm25_topk(d, q, k=METRICS_K)
    qt = q.select(
        "query_id", F.explode(text_ops.tokens("query_text")).alias("term")
    ).distinct()
    qrels = _conjunctive_qrels(d, qt)
    return retrieval_metrics(results, qrels, k=METRICS_K)


from ..operators.retrieval import ndcg_discounts as _ndcg_discounts

_MDISC = _ndcg_discounts(METRICS_K)
_MIDCG = [sum(_MDISC[:i + 1]) for i in range(METRICS_K)]

# conjunctive ground truth (doc relevant iff it contains EVERY query
# term) as a CTE chunk over the _sql_bm25_ctes frames — shared by the
# metrics oracle and the hard-negative-mining oracle
_SQL_QRELS_CTES = """nt AS (SELECT query_id, count(*) AS _nt FROM qt GROUP BY 1),
dterm AS (
  SELECT DISTINCT doc_id, term FROM base
),
qrels AS (
  SELECT d.query_id, d.doc_id FROM (
    SELECT qt.query_id, dterm.doc_id, count(*) AS _matched
    FROM dterm JOIN qt USING (term)
    GROUP BY 1, 2
  ) d JOIN nt ON nt.query_id = d.query_id
  WHERE d._matched = nt._nt
)"""

SQL_RETRIEVAL_METRICS = f"""
WITH {_sql_bm25_ctes(METRICS_K)},
{_SQL_QRELS_CTES},
hitrows AS (
  SELECT lexr.query_id, lexr.rank,
         row_number() OVER (PARTITION BY lexr.query_id
                            ORDER BY lexr.rank ASC) AS _h
  FROM lexr JOIN qrels
    ON qrels.query_id = lexr.query_id AND qrels.doc_id = lexr.doc_id
),
hits AS (
  SELECT query_id, count(*) AS n_hits_at_k, min(rank) AS _first,
         SUM(({_MDISC!r}::BIGINT[])[rank]) AS _dcg,
         SUM((1000000000 * _h) // rank) AS _ap
  FROM hitrows
  GROUP BY 1
),
nrel AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY 1),
qs AS (SELECT DISTINCT query_id FROM lexr)
SELECT qs.query_id,
       CAST(COALESCE(n_hits_at_k, 0) AS BIGINT) AS n_hits_at_k,
       CAST(COALESCE(n_rel, 0) AS BIGINT) AS n_rel,
       CAST(COALESCE(_first, 0) AS BIGINT) AS first_rel_rank,
       CASE WHEN COALESCE(_first, 0) > 0
            THEN CAST(FLOOR(1000000000.0 / CAST(_first AS DOUBLE)) AS BIGINT)
            ELSE 0 END AS mrr_x1e9,
       CAST(COALESCE(_ap, 0) AS BIGINT) AS ap_num_x1e9,
       CAST(LEAST(COALESCE(n_rel, 0), {METRICS_K}) AS BIGINT) AS ap_den,
       CAST(COALESCE(_dcg, 0) AS BIGINT) AS dcg_x1e9,
       CASE WHEN COALESCE(n_rel, 0) > 0
            THEN ({_MIDCG!r}::BIGINT[])[LEAST(n_rel, {METRICS_K})]
            ELSE 0 END AS idcg_x1e9
FROM qs LEFT JOIN hits ON hits.query_id = qs.query_id
        LEFT JOIN nrel ON nrel.query_id = qs.query_id
"""


# --------------------------------------------- hard-negative mining
HN_NEG = 3


def q_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Contrastive pair mining over the BM25 top-10 vs conjunctive
    ground truth: retrieved relevants label 1, the 3 highest-ranked
    non-relevant retrieved docs label 0
    (operators/retrieval.py:hard_negatives)."""
    from ..operators.retrieval import hard_negatives

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    results = text_ops.bm25_topk(d, q, k=METRICS_K)
    qt = q.select(
        "query_id", F.explode(text_ops.tokens("query_text")).alias("term")
    ).distinct()
    qrels = _conjunctive_qrels(d, qt)
    return hard_negatives(results, qrels, k=METRICS_K, n_neg=HN_NEG)


SQL_HARD_NEGATIVES = f"""
WITH {_sql_bm25_ctes(METRICS_K)},
{_SQL_QRELS_CTES}
SELECT query_id, doc_id, rank, 1 AS label
FROM lexr
WHERE EXISTS (SELECT 1 FROM qrels r
              WHERE r.query_id = lexr.query_id AND r.doc_id = lexr.doc_id)
UNION ALL
SELECT query_id, doc_id, rank, 0 AS label FROM (
  SELECT query_id, doc_id, rank,
         row_number() OVER (PARTITION BY query_id ORDER BY rank ASC) AS _r
  FROM lexr
  WHERE NOT EXISTS (SELECT 1 FROM qrels r
                    WHERE r.query_id = lexr.query_id
                      AND r.doc_id = lexr.doc_id)
) WHERE _r <= {HN_NEG}
"""


# --------------------------------------------------- learned reranker
# VERDICT r10 #6: close the RAG chain with a trained logistic head over
# quantized per-candidate features (BM25 leg score, cosine leg score,
# RRF contribution + bias), trained by the SAME fixed-point trainer as
# the quality classifier (valued-feature mode, x_col='x') on labels
# from the conjunctive qrels. 8 unrolled rounds in the oracle.
RERANK_STEPS = 8
RERANK_LR_NUM = 4
RERANK_LR_DEN = 1
RERANK_CB = 2  # ~ N_pos/N_neg on the fused top-10 vs conjunctive qrels
RERANK_BASE = 1_000_000_000  # pair_id = query_id * BASE + doc_id


def _rerank_frames(spark: SparkSession, sf: str):
    """Shared legs/candidates/features/labels for the reranker pair:
    hybrid candidates (q_hybrid_retrieval's exact plan), quantized
    features, conjunctive-qrels labels."""
    from ..operators.retrieval import reranker_features, rrf_fuse
    from ..operators.similarity import cosine_topk_batch

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    lex = text_ops.bm25_topk(d, q, k=HYBRID_LEG_K)
    emb = _emb(spark, sf)
    qv = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1).cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    sem = cosine_topk_batch(emb, qv, k=HYBRID_LEG_K).withColumnRenamed(
        "vec_id", "doc_id"
    )
    cands = rrf_fuse([lex, sem], k=HYBRID_K, k_rrf=RRF_K)
    feats = reranker_features(cands, lex, sem, pair_base=RERANK_BASE)
    qt = q.select(
        "query_id", F.explode(text_ops.tokens("query_text")).alias("term")
    ).distinct()
    qrels = _conjunctive_qrels(d, qt)
    labels = (
        cands.join(qrels.withColumn("_rel", F.lit(1)), ["query_id", "doc_id"], "left")
        .select(
            (
                F.col("query_id").cast("bigint") * RERANK_BASE
                + F.col("doc_id")
            ).alias("pair_id"),
            F.coalesce(F.col("_rel"), F.lit(0)).cast("bigint").alias("y"),
        )
    )
    return cands, feats, labels, qrels


def _rerank_weights(spark: SparkSession, sf: str):
    from ..operators import classifier as _clf

    cands, feats, labels, qrels = _rerank_frames(spark, sf)
    w = _clf.train_logreg_fixed_point(
        feats,
        labels,
        id_col="pair_id",
        steps=RERANK_STEPS,
        lr_num=RERANK_LR_NUM,
        lr_den=RERANK_LR_DEN,
        cb_neg=RERANK_CB,
        x_col="x",
    )
    return cands, feats, w, qrels


def q_reranker_train(spark: SparkSession, sf: str) -> DataFrame:
    """Train the logistic reranker head in-engine: valued-feature
    fixed-point gradient descent (operators/classifier.py, x_col mode)
    over the hybrid candidates' quantized (BM25, cosine, RRF) features
    against conjunctive-qrels labels. Output (bucket, w): buckets
    0/1/2 = bm25/cosine/rrf, -1 = bias. The oracle unrolls the same
    8 rounds with DuckDB integer division — weights bit-exact."""
    _cands, _feats, w, _qrels = _rerank_weights(spark, sf)
    return w


def q_rag_retrieve_reranked(spark: SparkSession, sf: str) -> DataFrame:
    """The reranked RAG chain end-to-end: hybrid retrieval -> train the
    reranker head -> re-order the fused top-10 by the learned logit
    (operators/retrieval.py:rerank_apply, weights broadcast). Emits
    both orderings (rank = RRF, rerank = learned) so the contrast is
    part of the checked contract; test_reranker.py pins that they
    differ and that the learned order improves the fixture metrics."""
    from ..operators.retrieval import rerank_apply

    cands, feats, w, _qrels = _rerank_weights(spark, sf)
    return rerank_apply(cands, feats, w, pair_base=RERANK_BASE)


def _sql_rerank_ctes() -> str:
    """Hybrid candidates + quantized features + labels + the unrolled
    valued-feature gradient rounds rw0..rw{RERANK_STEPS} — mirrors
    operators/retrieval.py reranker_features + classifier.py's valued
    mode term for term."""
    from ..operators.classifier import SCALE as _CS, XSCALE as _XS, ZCLAMP as _CZ

    rounds = []
    prev = "rw0"
    for i in range(1, RERANK_STEPS + 1):
        rounds.append(f"""
rz{i} AS (
  SELECT f.pair_id, min(f.y) AS y,
         COALESCE(sum((COALESCE(w.w, 0) * f.x) // {_XS}), 0) AS z
  FROM rfj f LEFT JOIN {prev} w USING (bucket) GROUP BY 1
),
re{i} AS (
  SELECT pair_id,
         (({_CS} // 2)
          + (greatest(-{_CZ}, least({_CZ}, z)) * {_CS})
            // (2 * ({_CS} + abs(greatest(-{_CZ}, least({_CZ}, z)))))
          - y * {_CS})
         * (CASE WHEN y = 0 THEN {RERANK_CB} ELSE 1 END) AS err
  FROM rz{i}
),
rg{i} AS (
  SELECT f.bucket, sum((e.err * f.x) // {_XS}) AS g
  FROM rfj f JOIN re{i} e USING (pair_id) GROUP BY 1
),
rw{i} AS MATERIALIZED (
  SELECT w.bucket,
         CAST(w.w - (COALESCE(g.g, 0) * {RERANK_LR_NUM})
                    // ({RERANK_LR_DEN} * rnd.n) AS BIGINT) AS w
  FROM {prev} w LEFT JOIN rg{i} g USING (bucket), rnd
)""")
        prev = f"rw{i}"
    return f"""{_sql_bm25_ctes(HYBRID_LEG_K)},
{_SQL_QRELS_CTES},
el AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
qv AS (SELECT CAST(vec_id + 1 AS INTEGER) AS query_id, v AS qvec
       FROM el WHERE vec_id < 3),
semscored AS (
  SELECT qv.query_id, el.vec_id AS doc_id,
         list_dot_product(v, qvec)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec)))
           AS cosine
  FROM el, qv
),
semr AS (
  SELECT query_id, doc_id, cosine, rank FROM (
    SELECT query_id, doc_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM semscored
  ) WHERE rank <= {HYBRID_LEG_K}
),
rlegs AS (
  SELECT query_id, doc_id,
         CAST(FLOOR(1000000000.0 / ({RRF_K}.0 + CAST(rank AS DOUBLE))) AS BIGINT)
           AS _c
  FROM lexr
  UNION ALL
  SELECT query_id, doc_id,
         CAST(FLOOR(1000000000.0 / ({RRF_K}.0 + CAST(rank AS DOUBLE))) AS BIGINT)
           AS _c
  FROM semr
),
rfused AS (
  SELECT query_id, doc_id, CAST(SUM(_c) AS BIGINT) AS rrf_x1e9,
         CAST(count(*) AS BIGINT) AS n_legs
  FROM rlegs GROUP BY 1, 2
),
rcand AS MATERIALIZED (
  SELECT query_id, doc_id, rrf_x1e9, n_legs, rank FROM (
    SELECT query_id, doc_id, rrf_x1e9, n_legs,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rrf_x1e9 DESC, doc_id ASC) AS rank
    FROM rfused
  ) WHERE rank <= {HYBRID_K}
),
rquant AS (
  SELECT CAST(c.query_id AS BIGINT) * {RERANK_BASE} + c.doc_id AS pair_id,
         least(COALESCE(l.score_x1e6, 0) // 20, {_XS}) AS x0,
         greatest(-{_XS}, least({_XS},
           CAST(floor(COALESCE(s.cosine, 0.0) * {_XS}) AS BIGINT))) AS x1,
         least(c.rrf_x1e9 // 40, {_XS}) AS x2
  FROM rcand c
  LEFT JOIN lexr l ON l.query_id = c.query_id AND l.doc_id = c.doc_id
  LEFT JOIN semr s ON s.query_id = c.query_id AND s.doc_id = c.doc_id
),
rfeats AS MATERIALIZED (
  SELECT pair_id, CAST(0 AS BIGINT) AS bucket, CAST(x0 AS BIGINT) AS x FROM rquant
  UNION ALL
  SELECT pair_id, CAST(1 AS BIGINT), CAST(x1 AS BIGINT) FROM rquant
  UNION ALL
  SELECT pair_id, CAST(2 AS BIGINT), CAST(x2 AS BIGINT) FROM rquant
  UNION ALL
  SELECT pair_id, CAST(-1 AS BIGINT), CAST({_XS} AS BIGINT) FROM rquant
),
rlab AS (
  SELECT CAST(c.query_id AS BIGINT) * {RERANK_BASE} + c.doc_id AS pair_id,
         CAST(CASE WHEN EXISTS (SELECT 1 FROM qrels r
                                WHERE r.query_id = c.query_id
                                  AND r.doc_id = c.doc_id)
              THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM rcand c
),
rfj AS MATERIALIZED (
  SELECT f.pair_id, f.bucket, f.x, l.y
  FROM rfeats f JOIN rlab l USING (pair_id)
),
rnd AS (SELECT CAST(count(DISTINCT pair_id) AS BIGINT) AS n FROM rfj),
rw0 AS (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w FROM rfj),{",".join(rounds)}
"""


SQL_RERANKER_TRAIN = (
    "WITH " + _sql_rerank_ctes() + f"SELECT bucket, w FROM rw{RERANK_STEPS}"
)

SQL_RAG_RETRIEVE_RERANKED = (
    "WITH " + _sql_rerank_ctes() + f""",
rzf AS (
  SELECT f.pair_id,
         COALESCE(sum((COALESCE(w.w, 0) * f.x) // 1000000), 0) AS score_scaled
  FROM rfeats f LEFT JOIN rw{RERANK_STEPS} w USING (bucket) GROUP BY 1
)
SELECT c.query_id, c.doc_id, c.rrf_x1e9, c.rank,
       CAST(z.score_scaled AS BIGINT) AS score_scaled,
       CAST(row_number() OVER (PARTITION BY c.query_id
                               ORDER BY z.score_scaled DESC, c.doc_id ASC)
            AS INTEGER) AS rerank
FROM rcand c
JOIN rzf z ON z.pair_id = CAST(c.query_id AS BIGINT) * {RERANK_BASE} + c.doc_id
"""
)


def q_rerank_eval(spark: SparkSession, sf: str) -> DataFrame:
    """The reranker's report card: retrieval_metrics over the SAME
    candidate set under both orderings (RRF rank vs learned rerank),
    against the same conjunctive qrels — one row per (ordering,
    query). Hits@k and n_rel are ordering-invariant by construction
    (same candidates); MRR / AP / DCG move with the order, so the
    improvement the trainer buys is a checked contract value, not a
    claim in prose."""
    from ..operators.retrieval import rerank_apply, retrieval_metrics

    cands, feats, w, qrels = _rerank_weights(spark, sf)
    rer = rerank_apply(cands, feats, w, pair_base=RERANK_BASE)
    m_rrf = retrieval_metrics(
        cands.select("query_id", "doc_id", "rank"), qrels, k=HYBRID_K
    ).select(F.lit("rrf").alias("ordering"), "*")
    m_rer = retrieval_metrics(
        rer.select("query_id", "doc_id", F.col("rerank").alias("rank")),
        qrels,
        k=HYBRID_K,
    ).select(F.lit("reranked").alias("ordering"), "*")
    return m_rrf.unionByName(m_rer)


def _sql_rerank_metric_block(p: str, results_cte: str, label: str) -> str:
    """Per-ordering metrics CTEs over a (query_id, doc_id, rank)
    results CTE — mirrors operators/retrieval.py retrieval_metrics
    with the shared _MDISC/_MIDCG literal tables (k = HYBRID_K =
    METRICS_K). Expects ``qrels`` and ``rnrel`` in scope."""
    return f"""
{p}hitrows AS (
  SELECT r.query_id, r.rank,
         row_number() OVER (PARTITION BY r.query_id
                            ORDER BY r.rank ASC) AS _h
  FROM {results_cte} r
  JOIN qrels ON qrels.query_id = r.query_id AND qrels.doc_id = r.doc_id
  WHERE r.rank <= {HYBRID_K}
),
{p}hits AS (
  SELECT query_id, count(*) AS n_hits_at_k, min(rank) AS _first,
         SUM(({_MDISC!r}::BIGINT[])[rank]) AS _dcg,
         SUM((1000000000 * _h) // rank) AS _ap
  FROM {p}hitrows GROUP BY 1
),
{p}met AS (
  SELECT '{label}' AS ordering, qs.query_id,
         CAST(COALESCE(n_hits_at_k, 0) AS BIGINT) AS n_hits_at_k,
         CAST(COALESCE(rnrel.n_rel, 0) AS BIGINT) AS n_rel,
         CAST(COALESCE(_first, 0) AS BIGINT) AS first_rel_rank,
         CASE WHEN COALESCE(_first, 0) > 0
              THEN CAST(FLOOR(1000000000.0 / CAST(_first AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS mrr_x1e9,
         CAST(COALESCE(_ap, 0) AS BIGINT) AS ap_num_x1e9,
         CAST(LEAST(COALESCE(rnrel.n_rel, 0), {HYBRID_K}) AS BIGINT) AS ap_den,
         CAST(COALESCE(_dcg, 0) AS BIGINT) AS dcg_x1e9,
         CASE WHEN COALESCE(rnrel.n_rel, 0) > 0
              THEN ({_MIDCG!r}::BIGINT[])[LEAST(rnrel.n_rel, {HYBRID_K})]
              ELSE 0 END AS idcg_x1e9
  FROM (SELECT DISTINCT query_id FROM {results_cte}) qs
  LEFT JOIN {p}hits ON {p}hits.query_id = qs.query_id
  LEFT JOIN rnrel ON rnrel.query_id = qs.query_id
)"""


SQL_RERANK_EVAL = (
    "WITH " + _sql_rerank_ctes() + f""",
rzf AS (
  SELECT f.pair_id,
         COALESCE(sum((COALESCE(w.w, 0) * f.x) // 1000000), 0) AS score_scaled
  FROM rfeats f LEFT JOIN rw{RERANK_STEPS} w USING (bucket) GROUP BY 1
),
rrfres AS (SELECT query_id, doc_id, rank FROM rcand),
rerres AS (
  SELECT c.query_id, c.doc_id,
         CAST(row_number() OVER (PARTITION BY c.query_id
                                 ORDER BY z.score_scaled DESC, c.doc_id ASC)
              AS INTEGER) AS rank
  FROM rcand c
  JOIN rzf z ON z.pair_id = CAST(c.query_id AS BIGINT) * {RERANK_BASE} + c.doc_id
),
rnrel AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY 1),"""
    + _sql_rerank_metric_block("mr_", "rrfres", "rrf") + ","
    + _sql_rerank_metric_block("me_", "rerres", "reranked") + """
SELECT * FROM mr_met
UNION ALL
SELECT * FROM me_met
"""
)

# ------------------------ composed contrastive-training-pairs product
TP_CAP = 64              # per-pair token budget (query + doc + specials)
TP_SEQ_LEN = 256         # packed training-sequence length
TP_SHARDS = 4            # output shard count
TP_PAIR_BASE = 1_000_000_000  # pair_id = query_id * BASE + doc_id


def q_training_pairs_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The contrastive-training data product end-to-end — the
    retrieval twin of q_corpus_pipeline_v4's curation chain:

        BM25 retrieval (top-10/query)
          -> hard-negative mining   (retrieved relevants label 1, the
                                     3 top-ranked non-relevants label 0
                                     — the DPR data-prep step)
          -> per-pair token budget  (query + doc + 3 specials, capped
                                     at 64 — the reranker input clamp)
          -> packed training shards (concat-and-chunk into 256-token
                                     sequences, 4 md5 shards)

    Returns the training-shard MANIFEST a data loader consumes: one
    row per mined pair with full provenance (rank, label, raw vs
    budgeted tokens, truncation flag) and its packed span (shard,
    start_offset, first/last sequence id). Every funnel census — pairs
    mined, positives, truncations, tokens per stage, sequences per
    shard — is an aggregate over these rows. Verified against ONE
    composed DuckDB statement.

    Scale shape: corpus-proportional work lives entirely in the BM25
    index and the conjunctive-qrels term scan; everything after the
    mine is workload-bounded (q x k rows), and the packing prefix-sum
    shuffles only pair-sized rows."""
    from ..operators.packing import pack_sequences
    from ..operators.retrieval import hard_negatives

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    results = text_ops.bm25_topk(d, q, k=METRICS_K)
    qt = q.select(
        "query_id", F.explode(text_ops.tokens("query_text")).alias("term")
    ).distinct()
    qrels = _conjunctive_qrels(d, qt)
    mined = hard_negatives(results, qrels, k=METRICS_K, n_neg=HN_NEG)

    dlen = d.select("doc_id", text_ops.token_count("text").alias("_dt"))
    qlen = q.select(
        "query_id", text_ops.token_count("query_text").alias("_qt")
    )
    raw = F.col("_qt") + F.col("_dt") + F.lit(3)
    sized = (
        mined.join(dlen, "doc_id")
        .join(qlen, "query_id")
        .select(
            "query_id",
            "doc_id",
            "rank",
            "label",
            raw.cast("bigint").alias("raw_tokens"),
            F.least(raw, F.lit(TP_CAP)).cast("bigint").alias("pair_tokens"),
            (raw > TP_CAP).alias("truncated"),
            (
                F.col("query_id").cast("bigint") * TP_PAIR_BASE
                + F.col("doc_id")
            ).alias("pair_id"),
        )
    )
    packed = pack_sequences(
        sized,
        seq_len=TP_SEQ_LEN,
        num_shards=TP_SHARDS,
        id_col="pair_id",
        tokens_col="pair_tokens",
    )
    prov = sized.select(
        "pair_id", "query_id", "doc_id", "rank", "label",
        "raw_tokens", "truncated",
    )
    return packed.join(prov, "pair_id").select(
        "query_id",
        "doc_id",
        "rank",
        "label",
        "raw_tokens",
        F.col("n_tokens").alias("pair_tokens"),
        "truncated",
        "shard",
        "start_offset",
        "first_seq",
        "last_seq",
    )


def _sql_training_pairs() -> str:
    from ..operators.packing import sql_pack_sequences

    pack = sql_pack_sequences(
        "SELECT pair_id, pair_tokens FROM sized",
        seq_len=TP_SEQ_LEN,
        num_shards=TP_SHARDS,
        id_col="pair_id",
        tokens_col="pair_tokens",
    )
    return rf"""
WITH {_sql_bm25_ctes(METRICS_K)},
{_SQL_QRELS_CTES},
mined AS (
  SELECT query_id, doc_id, rank, 1 AS label
  FROM lexr
  WHERE EXISTS (SELECT 1 FROM qrels r
                WHERE r.query_id = lexr.query_id AND r.doc_id = lexr.doc_id)
  UNION ALL
  SELECT query_id, doc_id, rank, 0 AS label FROM (
    SELECT query_id, doc_id, rank,
           row_number() OVER (PARTITION BY query_id ORDER BY rank ASC) AS _r
    FROM lexr
    WHERE NOT EXISTS (SELECT 1 FROM qrels r
                      WHERE r.query_id = lexr.query_id
                        AND r.doc_id = lexr.doc_id)
  ) WHERE _r <= {HN_NEG}
),
dlen AS (SELECT doc_id, {_SQL_NW} AS _dt FROM documents),
qlen AS (SELECT query_id,
                len(string_split_regex(trim(query_text), '\s+')) AS _qt
         FROM q),
sized AS (
  SELECT m.query_id, m.doc_id, m.rank, m.label,
         CAST(_qt + _dt + 3 AS BIGINT) AS raw_tokens,
         CAST(least(_qt + _dt + 3, {TP_CAP}) AS BIGINT) AS pair_tokens,
         (_qt + _dt + 3) > {TP_CAP} AS truncated,
         CAST(m.query_id AS BIGINT) * {TP_PAIR_BASE} + m.doc_id AS pair_id
  FROM mined m JOIN dlen USING (doc_id) JOIN qlen USING (query_id)
),
packed AS (
{pack}
)
SELECT s.query_id, s.doc_id, s.rank, s.label, s.raw_tokens,
       p.n_tokens AS pair_tokens, s.truncated,
       p.shard, p.start_offset, p.first_seq, p.last_seq
FROM packed p JOIN sized s USING (pair_id)
"""


SQL_TRAINING_PAIRS = _sql_training_pairs()


# ----------------------------------------------- MMR diversified rerank
MMR_CAND_K = 10
MMR_K = 4
MMR_LAM_X10 = 7


def q_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal-Marginal-Relevance rerank of the cosine top-10 per query
    into a diversified top-4 (lambda=0.7, quantized greedy —
    operators/retrieval.py:mmr_rerank). Query vectors as in
    q_hybrid_retrieval."""
    from ..operators.retrieval import mmr_rerank
    from ..operators.similarity import cosine_topk_batch

    emb = _emb(spark, sf)
    qv = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1).cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cand = (
        cosine_topk_batch(emb, qv, k=MMR_CAND_K)
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.floor(F.col("cosine") * F.lit(1000000.0))
            .cast("bigint")
            .alias("rel_x1e6"),
        )
        .join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
        )
    )
    return mmr_rerank(cand, k=MMR_K, lam_x10=MMR_LAM_X10)


def _sql_mmr() -> str:
    """The greedy MMR selection unrolled to MMR_K steps — plain ANSI
    SQL (each step is a window argmax over the not-yet-selected
    candidates against the union of prior picks), generated by the
    same constants as the Spark path."""
    lam, oml = MMR_LAM_X10, 10 - MMR_LAM_X10
    head = f"""
WITH el AS (SELECT vec_id, {_SQL_EMB_D} AS v FROM embeddings),
qv AS (SELECT CAST(vec_id + 1 AS INTEGER) AS query_id, v AS qvec
       FROM el WHERE vec_id < 3),
semscored AS (
  SELECT qv.query_id, el.vec_id AS doc_id, el.v,
         list_dot_product(v, qvec)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qvec, qvec)))
           AS cosine
  FROM el, qv
),
cand AS (
  SELECT query_id, doc_id, v,
         CAST(FLOOR(cosine * 1000000.0) AS BIGINT) AS rel_x1e6
  FROM (
    SELECT query_id, doc_id, v, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id ASC) AS r
    FROM semscored
  ) WHERE r <= {MMR_CAND_K}
),
sims AS (
  SELECT a.query_id, a.doc_id AS ida, b.doc_id AS idb,
         CAST(FLOOR(
           (list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))))
           * 1000000.0) AS BIGINT) AS sim_x1e6
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
),
sel1 AS (
  SELECT query_id, doc_id, rel_x1e6,
         CAST({lam} AS BIGINT) * rel_x1e6 AS mmr_x1e6, 1 AS sel_order
  FROM (
    SELECT query_id, doc_id, rel_x1e6,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {lam} * rel_x1e6 DESC, doc_id ASC) AS r
    FROM cand
  ) WHERE r = 1
),
acc1 AS (SELECT * FROM sel1)"""
    steps = []
    for i in range(2, MMR_K + 1):
        steps.append(f""",
sel{i} AS (
  SELECT query_id, doc_id, rel_x1e6, mmr_x1e6, {i} AS sel_order FROM (
    SELECT c.query_id, c.doc_id, c.rel_x1e6,
           CAST({lam} AS BIGINT) * c.rel_x1e6
             - CAST({oml} AS BIGINT) * COALESCE(m.maxsim, 0) AS mmr_x1e6,
           row_number() OVER (
             PARTITION BY c.query_id
             ORDER BY {lam} * c.rel_x1e6 - {oml} * COALESCE(m.maxsim, 0) DESC,
                      c.doc_id ASC) AS r
    FROM cand c
    LEFT JOIN (
      SELECT s.query_id, s.ida AS doc_id, MAX(s.sim_x1e6) AS maxsim
      FROM sims s JOIN acc{i - 1} p
        ON p.query_id = s.query_id AND p.doc_id = s.idb
      GROUP BY 1, 2
    ) m ON m.query_id = c.query_id AND m.doc_id = c.doc_id
    WHERE NOT EXISTS (SELECT 1 FROM acc{i - 1} p
                      WHERE p.query_id = c.query_id AND p.doc_id = c.doc_id)
  ) WHERE r = 1
),
acc{i} AS (SELECT * FROM acc{i - 1} UNION ALL SELECT * FROM sel{i})""")
    tail = f"""
SELECT query_id, doc_id, rel_x1e6, mmr_x1e6, sel_order FROM acc{MMR_K}"""
    return head + "".join(steps) + tail


SQL_MMR_RERANK = _sql_mmr()


def q_snippet_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Passage extraction over the BM25 top-5 candidates: the 16-token
    window with the most query-term hits per (query, doc)
    (operators/retrieval.py:best_snippet_window)."""
    from ..operators.retrieval import best_snippet_window

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    q = spark.createDataFrame(BM25_QUERIES, "query_id int, query_text string")
    cand = text_ops.bm25_topk(d, q, k=5).select("query_id", "doc_id")
    return best_snippet_window(d, q, cand, window=SNIPPET_WINDOW)


SQL_SNIPPET_EXTRACT = f"""
WITH {_sql_bm25_ctes(5)},
cand AS (SELECT query_id, doc_id FROM lexr),
ptok AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(generate_series(0, len(toks) - 1)) AS pos
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents)
),
hits AS (
  SELECT qt.query_id, p.doc_id, p.pos
  FROM ptok p
  JOIN qt USING (term)
  JOIN cand c ON c.query_id = qt.query_id AND c.doc_id = p.doc_id
),
wins AS (
  SELECT a.query_id, a.doc_id, a.pos AS win_start, count(*) AS n_hits
  FROM hits a
  JOIN hits b ON b.query_id = a.query_id AND b.doc_id = a.doc_id
            AND b.pos >= a.pos AND b.pos <= a.pos + {SNIPPET_WINDOW - 1}
  GROUP BY 1, 2, 3
)
SELECT query_id, doc_id, win_start, n_hits FROM (
  SELECT query_id, doc_id, win_start, n_hits,
         row_number() OVER (PARTITION BY query_id, doc_id
                            ORDER BY n_hits DESC, win_start ASC) AS r
  FROM wins
) WHERE r = 1
"""


# ------------------------------------------------- boilerplate detection
BOILER_MIN_DF_BP = 60  # shingle is boilerplate above 0.6% document frequency


def q_boilerplate_score(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-frequency boilerplate scoring: two passes over the shingle
    set (df aggregate, mark-join back), frequency cut in exact integer
    arithmetic. See operators/text.py:boilerplate_flags."""
    return text_ops.boilerplate_flags(
        _docs(spark, sf),
        min_df_bp=BOILER_MIN_DF_BP,
        parallelism=spark.sparkContext.defaultParallelism,
    )


SQL_BOILERPLATE_SCORE = rf"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS shingle
  FROM tok, unnest(generate_series(0, len(toks)-3)) AS u(i)
  WHERE len(toks) >= 3
),
nd AS (SELECT count(*) AS n_docs FROM documents),
dfc AS (SELECT shingle, count(*) AS df_count FROM sh GROUP BY 1),
freq AS (SELECT shingle FROM dfc, nd WHERE df_count * 10000 > {BOILER_MIN_DF_BP} * n_docs),
per AS (
  SELECT s.doc_id, count(*) AS n_shingles, count(f.shingle) AS n_boiler
  FROM sh s LEFT JOIN freq f USING (shingle) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(n_shingles, 0) AS n_shingles,
       COALESCE(n_boiler, 0) AS n_boiler,
       CASE WHEN COALESCE(n_shingles, 0) > 0
            THEN CAST(n_boiler AS DOUBLE) / n_shingles ELSE 0.0 END AS boiler_frac,
       COALESCE(n_boiler, 0) * 2 > COALESCE(n_shingles, 0) AS is_boilerplate
FROM documents d LEFT JOIN per USING (doc_id)
"""


# ------------------------------------------------- global training shuffle
def q_global_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic epoch shuffle: salted md5 order key + scalable
    two-pass global enumerate (range sort, per-partition offsets — no
    single-partition window). See operators/ordering.py."""
    from ..operators.ordering import global_shuffle

    return global_shuffle(_docs(spark, sf).select("doc_id"))


SQL_GLOBAL_SHUFFLE = f"""
WITH keyed AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || ':shuf42'), 1, 15))::BIGINT % {MP}
           AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key,
       row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS pos
FROM keyed
"""


QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_boilerplate_score": q_boilerplate_score,
    "q_global_shuffle": q_global_shuffle,
    "q_text_quality": q_text_quality,
    "q_lang_id": q_lang_id,
    "q_token_count": q_token_count,
    "q_tfidf_topk": q_tfidf_topk,
    "q_bm25_topk": q_bm25_topk,
    "q_qld_topk": q_qld_topk,
    "q_winnow_fingerprint": q_winnow_fingerprint,
    "q_winnow_overlap": q_winnow_overlap,
    "q_winnow_incremental": q_winnow_incremental,
    "q_bm25_prf": q_bm25_prf,
    "q_bm25_index_delta": q_bm25_index_delta,
    "q_mmr_rerank": q_mmr_rerank,
    "q_retrieval_metrics": q_retrieval_metrics,
    "q_hard_negatives": q_hard_negatives,
    "q_reranker_train": q_reranker_train,
    "q_rag_retrieve_reranked": q_rag_retrieve_reranked,
    "q_rerank_eval": q_rerank_eval,
    "q_training_pairs_pipeline": q_training_pairs_pipeline,
    "q_filter_eval": q_filter_eval,
    "q_hybrid_retrieval": q_hybrid_retrieval,
    "q_rag_retrieve": q_rag_retrieve,
    "q_snippet_extract": q_snippet_extract,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_minhash_signatures": q_minhash_signatures,
    "q_minhash_pairs": q_minhash_pairs,
    "q_incremental_lsh": q_incremental_lsh,
    "q_simhash": q_simhash,
    "q_ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "q_containment_pairs": q_containment_pairs,
    "q_ngram_jaccard_capped": q_ngram_jaccard_capped,
    "q_jaccard_prefix_pairs": q_jaccard_prefix_pairs,
    "q_embedding_topk": q_embedding_topk,
    "q_embedding_neardup_pairs": q_embedding_neardup_pairs,
    "q_embedding_neardup_lsh": q_embedding_neardup_lsh,
    "q_ann_ivf": q_ann_ivf,
    "q_semantic_dedup": q_semantic_dedup,
    "q_incremental_semdedup": q_incremental_semdedup,
    "q_quality_classifier": q_quality_classifier,
    "q_lsh_recall": q_lsh_recall,
    "q_binary_meta": q_binary_meta,
    "q_ahash_neardup": q_ahash_neardup,
    "q_ahash_index_delta": q_ahash_index_delta,
    "q_video_neardup": q_video_neardup,
    "q_sessionize": q_sessionize,
    "q_chunk_documents": q_chunk_documents,
    "q_decontaminate": q_decontaminate,
    "q_decontaminate_apply": q_decontaminate_apply,
    "q_decontaminate_delta": q_decontaminate_delta,
    "q_train_test_split": q_train_test_split,
    "q_stratified_sample": q_stratified_sample,
    "q_embedding_quantize": q_embedding_quantize,
    "q_pack_sequences": q_pack_sequences,
    "q_pack_attention_spans": q_pack_attention_spans,
    "q_corpus_pipeline": q_corpus_pipeline,
    "q_repetition_score": q_repetition_score,
    "q_pii_scan": q_pii_scan,
    # iterative; no oracle_sql -> driver rows-only check
    "q_kmeans_centroids": q_kmeans_centroids,
    "q_pq_adc_topk": q_pq_adc_topk,
    "q_ivf_pq_search": q_ivf_pq_search,
    "q_ivf_pq_delta": q_ivf_pq_delta,
    "q_ivf_pq_recall": q_ivf_pq_recall,
    "q_hash_embed_sim": q_hash_embed_sim,
    "q_bpe_merges": q_bpe_merges,
    "q_bpe_merges_batched": q_bpe_merges_batched,
    "q_bpe_merges_local": q_bpe_merges_local,
    "q_bpe_tokenize": q_bpe_tokenize,
    "q_bpe_encode": q_bpe_encode,
    "q_phrase_match": q_phrase_match,
    "q_phrase_boost": q_phrase_boost,
    "q_dedup_clusters": q_dedup_clusters,
}

ORACLES = {
    "q_dedup_exact": SQL_DEDUP_EXACT,
    "q_boilerplate_score": SQL_BOILERPLATE_SCORE,
    "q_global_shuffle": SQL_GLOBAL_SHUFFLE,
    "q_text_quality": SQL_TEXT_QUALITY,
    "q_lang_id": SQL_LANG_ID,
    "q_token_count": SQL_TOKEN_COUNT,
    "q_tfidf_topk": SQL_TFIDF_TOPK,
    "q_bm25_topk": SQL_BM25_TOPK,
    "q_qld_topk": SQL_QLD_TOPK,
    "q_winnow_fingerprint": SQL_WINNOW_FINGERPRINT,
    "q_winnow_overlap": _sql_winnow_overlap(),
    "q_winnow_incremental": _sql_winnow_incremental(),
    "q_bm25_prf": SQL_BM25_PRF,
    "q_bm25_index_delta": SQL_BM25_TOPK,
    "q_mmr_rerank": SQL_MMR_RERANK,
    "q_retrieval_metrics": SQL_RETRIEVAL_METRICS,
    "q_hard_negatives": SQL_HARD_NEGATIVES,
    "q_reranker_train": SQL_RERANKER_TRAIN,
    "q_rag_retrieve_reranked": SQL_RAG_RETRIEVE_RERANKED,
    "q_rerank_eval": SQL_RERANK_EVAL,
    "q_training_pairs_pipeline": SQL_TRAINING_PAIRS,
    "q_filter_eval": SQL_FILTER_EVAL,
    "q_hybrid_retrieval": SQL_HYBRID_RETRIEVAL,
    "q_rag_retrieve": SQL_RAG_RETRIEVE,
    "q_snippet_extract": SQL_SNIPPET_EXTRACT,
    "q_doc_fingerprint": SQL_DOC_FINGERPRINT,
    "q_minhash_signatures": SQL_MINHASH_SIGNATURES,
    "q_minhash_pairs": SQL_MINHASH_PAIRS,
    "q_incremental_lsh": SQL_MINHASH_PAIRS,
    "q_simhash": SQL_SIMHASH,
    "q_ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "q_containment_pairs": SQL_CONTAINMENT_PAIRS,
    "q_ngram_jaccard_capped": SQL_NGRAM_JACCARD_CAPPED,
    # same oracle as the exact pairs: prefix filtering must be lossless
    "q_jaccard_prefix_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "q_embedding_topk": SQL_EMBEDDING_TOPK,
    "q_embedding_neardup_pairs": SQL_EMBEDDING_NEARDUP_PAIRS,
    "q_embedding_neardup_lsh": SQL_EMBEDDING_NEARDUP_LSH,
    "q_ann_ivf": SQL_ANN_IVF,
    "q_semantic_dedup": SQL_SEMANTIC_DEDUP,
    "q_incremental_semdedup": SQL_INCREMENTAL_SEMDEDUP,
    "q_quality_classifier": SQL_QUALITY_CLASSIFIER,
    "q_lsh_recall": SQL_LSH_RECALL,
    "q_binary_meta": SQL_BINARY_META,
    "q_ahash_neardup": SQL_AHASH_NEARDUP,
    "q_ahash_index_delta": SQL_AHASH_INDEX_DELTA,
    "q_video_neardup": _sql_video_neardup(),
    "q_sessionize": SQL_SESSIONIZE,
    "q_chunk_documents": SQL_CHUNK_DOCUMENTS,
    "q_decontaminate": SQL_DECONTAMINATE,
    "q_decontaminate_apply": SQL_DECONTAMINATE_APPLY,
    "q_decontaminate_delta": SQL_DECONTAMINATE_DELTA,
    "q_train_test_split": SQL_TRAIN_TEST_SPLIT,
    "q_stratified_sample": _sql_stratified_sample(),
    "q_embedding_quantize": _sql_embedding_quantize(),
    "q_pack_sequences": _sql_pack_sequences(),
    "q_pack_attention_spans": _sql_pack_attention_spans(),
    "q_corpus_pipeline": _sql_corpus_pipeline(),
    "q_repetition_score": SQL_REPETITION_SCORE,
    "q_pii_scan": SQL_PII_SCAN,
    "q_dedup_clusters": SQL_DEDUP_CLUSTERS,
    "q_kmeans_centroids": SQL_KMEANS_CENTROIDS,
    "q_pq_adc_topk": SQL_PQ_ADC_TOPK,
    "q_ivf_pq_search": SQL_IVF_PQ_SEARCH,
    "q_ivf_pq_delta": SQL_IVF_PQ_DELTA,
    "q_ivf_pq_recall": SQL_IVF_PQ_RECALL,
    "q_hash_embed_sim": SQL_HASH_EMBED_SIM,
    "q_bpe_merges": SQL_BPE_MERGES,
    "q_bpe_merges_batched": SQL_BPE_MERGES,
    "q_bpe_merges_local": SQL_BPE_MERGES,
    "q_bpe_tokenize": SQL_BPE_TOKENIZE,
    "q_bpe_encode": SQL_BPE_ENCODE,
    "q_phrase_match": SQL_PHRASE_MATCH,
    "q_phrase_boost": _sql_phrase_boost(),
}
