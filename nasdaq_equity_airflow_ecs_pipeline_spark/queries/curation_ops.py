"""Corpus-curation contract queries: URL canonicalization dedup, domain
mixture reweighting, line-level dedup, and DSIR-lite importance weights
(operators/curation.py), each with a mirrored DuckDB oracle.

Fixture note: the ``documents`` table carries no URL column and no
newlines, so ``q_url_dedup`` synthesizes URL variants (case / www /
default-port / tracking-param / fragment noise over a shared canonical
target) and ``q_line_dedup`` re-lines the text every 8 tokens — both
with expressions evaluated identically in Spark and DuckDB, so the
operator logic (not the fixture) is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import lm_score
from ..operators.curation import (
    TRACKING_PARAM_RE,
    importance_weights,
    line_dedup,
    mixture_weights,
    temperature_mixture_weights,
    url_dedup,
)
from ..sources.tables import load_table

IMPORTANCE_BUCKETS = 1024
LINE_DEDUP_MAX_DOCS = 2
# target mixture: linearly tilted toward the higher-numbered sources;
# shares (i+1)/210 sum to exactly 1 over the 20 fixture sources
MIX_TARGETS = {f"src{i}": (i + 1) / 210.0 for i in range(20)}


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


# -------------------------------------------------------------- URL dedup
def _url_expr() -> F.Column:
    """Three URL spellings per doc; variants 0 and 1 share a canonical
    form (case, www, :443, trailing slash, tracking param, param order),
    variant 2 differs (no query; :80 + fragment noise of its own)."""
    n = (F.col("doc_id") % 100).cast("string")
    v = F.col("doc_id") % 3
    return (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTPS://WWW."), F.col("source"),
                F.lit(".Example.COM:443/Docs/"), n,
                F.lit("/?b=2&utm_source=feed&a=1"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example.com/Docs/"), n, F.lit("?a=1&b=2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://"), F.col("source"),
                F.lit(".example.com:80/Docs/"), n, F.lit("/#section"),
            ),
        )
    )


def q_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Canonicalize-then-dedup keyed on the canonical URL."""
    d = _docs(spark, sf).select("doc_id", _url_expr().alias("url"))
    return url_dedup(d)


_SQL_URL_CASE = """CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Docs/'
                  || CAST(doc_id % 100 AS VARCHAR) || '/?b=2&utm_source=feed&a=1'
      WHEN 1 THEN 'https://' || source || '.example.com/Docs/'
                  || CAST(doc_id % 100 AS VARCHAR) || '?a=1&b=2'
      ELSE 'http://' || source || '.example.com:80/Docs/'
                  || CAST(doc_id % 100 AS VARCHAR) || '/#section'
    END"""


def _sql_canon_ctes(src: str) -> str:
    """CTE chain ``s1..s4`` mirroring ``canonicalize_url`` over a table
    ``src(doc_id, url)``; the canonical form is
    ``scheme || '://' || host || path || ('?' params)?`` over s4."""
    return f"""s1 AS (
  SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS u FROM {src}
),
s2 AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
  FROM s1
),
s3 AS (
  SELECT doc_id, scheme,
         regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)), '^www\\.', '') AS host0,
         regexp_replace(regexp_extract(rest, '^[^/?]*([^?]*)', 1), '/+$', '') AS path,
         regexp_extract(rest, '\\?(.*)$', 1) AS query
  FROM s2
),
s4 AS (
  SELECT doc_id, scheme, path,
         CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
              ELSE host0 END AS host,
         array_to_string(list_sort(list_filter(string_split(query, '&'),
             p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))), '&') AS params
  FROM s3
)"""


SQL_URL_DEDUP = f"""
WITH urls AS (SELECT doc_id, {_SQL_URL_CASE} AS url FROM documents),
{_sql_canon_ctes("urls")}
SELECT scheme || '://' || host || path
         || CASE WHEN params <> '' THEN '?' || params ELSE '' END AS canonical_url,
       min(doc_id) AS survivor_id,
       count(*) AS dup_count
FROM s4
GROUP BY 1
"""


# ------------------------------------------------------- mixture weights
def q_mixture_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Domain reweighting toward the MIX_TARGETS target mixture."""
    return mixture_weights(_docs(spark, sf), "source", MIX_TARGETS)


def _sql_mixture_weights() -> str:
    values = ",\n    ".join(
        f"('{s}', '{t!r}'::DOUBLE)" for s, t in MIX_TARGETS.items()
    )
    return f"""
WITH t(source, target_share) AS (VALUES
    {values}
),
c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c)
SELECT c.source,
       c.n_docs,
       CAST(c.n_docs AS DOUBLE) / CAST(tot.total AS DOUBLE) AS actual_share,
       coalesce(t.target_share, 0.0) AS target_share,
       coalesce(t.target_share, 0.0) * CAST(tot.total AS DOUBLE)
         / CAST(c.n_docs AS DOUBLE) AS sample_weight,
       CAST(round(coalesce(t.target_share, 0.0) * CAST(tot.total AS DOUBLE))
            AS BIGINT) AS planned_docs
FROM c LEFT JOIN t USING (source), tot
"""


def q_temperature_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """tau=0.5 temperature sampling weights over document sources (the
    multilingual upsampling trick), max-normalized for cross-engine
    exactness."""
    return temperature_mixture_weights(_docs(spark, sf), "source")


SQL_TEMPERATURE_MIXTURE = """
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
sh AS (
  SELECT source, n_docs,
         CAST(n_docs AS DOUBLE) / CAST(tot.total AS DOUBLE) AS share
  FROM c, tot
),
mx AS (SELECT max(sqrt(share)) AS m FROM sh)
SELECT source, n_docs, share, sqrt(share) AS sqrt_share,
       sqrt(share) / mx.m AS rel_weight
FROM sh, mx
"""


# --------------------------------------------------- UniMax allocation
UNIMAX_BUDGET_NUM, UNIMAX_BUDGET_DEN = 9, 10
UNIMAX_CAP_X100 = 100


def q_unimax_weights(spark: SparkSession, sf: str) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023,
    operators/curation.py:unimax_allocation): waterfill 9/10 of the
    corpus token mass across languages at a 1.0-epoch cap — on this
    corpus the four low-resource languages hit their caps and English
    absorbs the remainder, the paper's core story. Integer-exact
    waterfilling; the oracle replays the identical recurrence as a
    recursive CTE."""
    from ..operators.curation import unimax_allocation

    return unimax_allocation(
        _docs(spark, sf),
        "lang",
        budget_num=UNIMAX_BUDGET_NUM,
        budget_den=UNIMAX_BUDGET_DEN,
        epoch_cap_x100=UNIMAX_CAP_X100,
    )


SQL_UNIMAX_WEIGHTS = rf"""
WITH RECURSIVE wc AS (
  SELECT lang AS grp,
         CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x != ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS l FROM wc),
ranked AS (
  SELECT grp, n_tokens, (n_tokens * {UNIMAX_CAP_X100}) // 100 AS cap,
         row_number() OVER (
           ORDER BY (n_tokens * {UNIMAX_CAP_X100}) // 100 ASC, grp ASC
         ) AS r
  FROM wc
),
fill AS (
  SELECT CAST(0 AS BIGINT) AS r,
         (tot.t * {UNIMAX_BUDGET_NUM}) // {UNIMAX_BUDGET_DEN} AS b,
         CAST(NULL AS VARCHAR) AS grp, CAST(0 AS BIGINT) AS n_tokens,
         CAST(0 AS BIGINT) AS cap, CAST(0 AS BIGINT) AS alloc
  FROM tot
  UNION ALL
  SELECT rk.r, f.b - least(rk.cap, f.b // (tot.l - rk.r + 1)),
         rk.grp, rk.n_tokens, rk.cap,
         least(rk.cap, f.b // (tot.l - rk.r + 1))
  FROM fill f
  JOIN ranked rk ON rk.r = f.r + 1
  CROSS JOIN tot
  WHERE f.r < tot.l
),
res AS (SELECT grp, n_tokens, cap, alloc FROM fill WHERE r >= 1),
ta AS (SELECT CAST(sum(alloc) AS BIGINT) AS s FROM res)
SELECT grp, n_tokens, cap, alloc,
       CAST(CASE WHEN ta.s > 0 THEN (alloc * 1000000000) // ta.s
                 ELSE 0 END AS BIGINT) AS share_x1e9,
       CAST(CASE WHEN n_tokens > 0 THEN (alloc * 100) // n_tokens
                 ELSE 0 END AS BIGINT) AS epochs_x100
FROM res CROSS JOIN ta
"""


def q_unimax_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental UniMax (operators/curation.py
    unimax_allocation_delta — the domain_stats_delta discipline): the
    80% standing corpus publishes its (lang, n_tokens) artifact, the
    20% delta batch folds in (counts are a monoid), and the
    re-waterfill must equal the full rebuild over the union EXACTLY —
    the oracle is the full-rebuild SQL verbatim."""
    from ..operators.curation import unimax_allocation, unimax_allocation_delta

    d = _docs(spark, sf)
    standing = unimax_allocation(
        d.filter(F.col("doc_id") % 10 < 8),
        "lang",
        budget_num=UNIMAX_BUDGET_NUM,
        budget_den=UNIMAX_BUDGET_DEN,
        epoch_cap_x100=UNIMAX_CAP_X100,
    ).select("grp", "n_tokens")
    return unimax_allocation_delta(
        standing,
        d.filter(F.col("doc_id") % 10 >= 8),
        "lang",
        budget_num=UNIMAX_BUDGET_NUM,
        budget_den=UNIMAX_BUDGET_DEN,
        epoch_cap_x100=UNIMAX_CAP_X100,
    )


# ----------------------------------------------------------- line dedup
_RELINE_PAT = r"((?:\S+ ){7}\S+) "  # break after every 8th token


def q_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """RefinedWeb-style exact line dedup over the re-lined corpus: lines
    appearing in > LINE_DEDUP_MAX_DOCS docs are removed everywhere."""
    d = _docs(spark, sf).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
    )
    return line_dedup(d, max_docs=LINE_DEDUP_MAX_DOCS)


SQL_LINE_DEDUP = f"""
WITH relined AS (
  SELECT doc_id,
         regexp_replace(text, '{_RELINE_PAT}', '\\1' || chr(10), 'g') AS text
  FROM documents
),
ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM relined),
lines AS (
  SELECT doc_id, unnest(arr) AS line, unnest(range(1, len(arr) + 1)) AS pos
  FROM ls
),
freq AS (
  SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY 1
),
kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l JOIN freq f USING (line)
  WHERE f.nd <= {LINE_DEDUP_MAX_DOCS}
),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS kept_text,
         count(*) AS n_kept
  FROM kept GROUP BY 1
)
SELECT ls.doc_id,
       coalesce(reb.kept_text, '') AS kept_text,
       CAST(len(ls.arr) AS INT) AS n_lines,
       CAST(len(ls.arr) - coalesce(reb.n_kept, 0) AS INT) AS n_removed
FROM ls LEFT JOIN reb USING (doc_id)
"""


# ---------------------------------------------------- importance weights
def q_importance_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-lite importance of every document against the English-subset
    target distribution (hashed unigrams, 1024 buckets)."""
    return importance_weights(
        _docs(spark, sf),
        F.col("lang") == "en",
        n_buckets=IMPORTANCE_BUCKETS,
    )


SQL_IMPORTANCE_WEIGHTS = f"""
WITH tk AS (
  SELECT doc_id, lang = 'en' AS is_target, tok,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {IMPORTANCE_BUCKETS} AS bucket
  FROM (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
),
stats AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
         count(*) AS a_cnt
  FROM tk GROUP BY 1
),
tot AS (
  SELECT CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS total_target,
         count(*) AS total_corpus
  FROM tk
),
per AS (
  SELECT tk.doc_id,
         CAST(sum(s.t_cnt + 1) AS BIGINT) AS target_mass,
         CAST(sum(s.a_cnt + 1) AS BIGINT) AS corpus_mass,
         count(*) AS n_tokens
  FROM tk JOIN stats s USING (bucket)
  GROUP BY 1
)
SELECT doc_id, n_tokens, target_mass, corpus_mass,
       CAST(target_mass AS DOUBLE) * CAST(tot.total_corpus AS DOUBLE)
         / (CAST(corpus_mass AS DOUBLE) * CAST(tot.total_target AS DOUBLE))
         AS importance
FROM per, tot
"""


def q_importance_bigram(spark: SparkSession, sf: str) -> DataFrame:
    """Paper-faithful DSIR features (Xie et al. 2023 section 3 hashes
    unigrams AND bigrams): importance of every document against the
    English-target distribution with the feature stream = tokens plus
    adjacent "tok_i tok_i+1" pairs. Same rational log-free form and
    plan shape as q_importance_weights (< 2x exploded rows); the
    order-affinity it adds over the bag of unigrams is pinned by the
    constructed-corpus pytest (tests/test_importance_bigram.py)."""
    return importance_weights(
        _docs(spark, sf),
        F.col("lang") == "en",
        n_buckets=IMPORTANCE_BUCKETS,
        ngram=2,
    )


SQL_IMPORTANCE_BIGRAM = f"""
WITH t0 AS (
  SELECT doc_id, lang = 'en' AS is_target,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
),
tk AS (
  SELECT doc_id, is_target, tok,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {IMPORTANCE_BUCKETS} AS bucket
  FROM (
    SELECT doc_id, is_target,
           unnest(list_concat(t,
             list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                            i -> t[i] || ' ' || t[i + 1]))) AS tok
    FROM t0
  )
),
stats AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
         count(*) AS a_cnt
  FROM tk GROUP BY 1
),
tot AS (
  SELECT CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS total_target,
         count(*) AS total_corpus
  FROM tk
),
per AS (
  SELECT tk.doc_id,
         CAST(sum(s.t_cnt + 1) AS BIGINT) AS target_mass,
         CAST(sum(s.a_cnt + 1) AS BIGINT) AS corpus_mass,
         count(*) AS n_tokens
  FROM tk JOIN stats s USING (bucket)
  GROUP BY 1
)
SELECT doc_id, n_tokens, target_mass, corpus_mass,
       CAST(target_mass AS DOUBLE) * CAST(tot.total_corpus AS DOUBLE)
         / (CAST(corpus_mass AS DOUBLE) * CAST(tot.total_target AS DOUBLE))
         AS importance
FROM per, tot
"""


# ------------------------------------------------- composed v2 pipeline
V2_IMPORTANCE_MIN = 1.0
V2_ALPHA = 0.5


def q_corpus_pipeline_v2(spark: SparkSession, sf: str) -> DataFrame:
    """The round-4 curation family COMPOSED (plans/corpus.py
    curate_corpus_v2): URL dedup -> line dedup -> DSIR-lite importance
    filter -> deterministic mixture resample, emitted as the per-stage
    funnel census. The oracle rebuilds the whole chain in one SQL
    statement from the same fragments, value-checking the stage
    interactions (survivor joins, emptied-doc drops, weight propagation)
    rather than each operator alone."""
    from ..plans.corpus import curate_corpus_v2, curate_corpus_v2_funnel

    d = _docs(spark, sf).select(
        "doc_id",
        _url_expr().alias("url"),
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
        "lang",
        "source",
    )
    stages = curate_corpus_v2(
        d,
        MIX_TARGETS,
        importance_min=V2_IMPORTANCE_MIN,
        alpha=V2_ALPHA,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
        n_buckets=IMPORTANCE_BUCKETS,
    )
    return curate_corpus_v2_funnel(stages)


def _sql_corpus_pipeline_v2() -> str:
    from ..operators.lsh import MERSENNE_P

    values = ",\n    ".join(
        f"('{s}', '{t!r}'::DOUBLE)" for s, t in MIX_TARGETS.items()
    )
    ntok = r"CAST(coalesce(sum(len(string_split_regex(trim(text), '\s+'))), 0) AS BIGINT)"
    return f"""
WITH base AS (
  SELECT doc_id, {_SQL_URL_CASE} AS url,
         regexp_replace(text, '{_RELINE_PAT}', '\\1' || chr(10), 'g') AS text,
         lang, source
  FROM documents
),
{_sql_canon_ctes("base")},
url_surv AS (
  SELECT b.doc_id, b.text, b.lang, b.source
  FROM (
    SELECT min(doc_id) AS doc_id
    FROM (
      SELECT doc_id, scheme || '://' || host || path
               || CASE WHEN params <> '' THEN '?' || params ELSE '' END AS cu
      FROM s4
    ) GROUP BY cu
  ) s JOIN base b USING (doc_id)
),
ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM url_surv),
lines AS (
  SELECT doc_id, unnest(arr) AS line, unnest(range(1, len(arr) + 1)) AS pos
  FROM ls
),
freq AS (SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY 1),
kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l JOIN freq f USING (line)
  WHERE f.nd <= {LINE_DEDUP_MAX_DOCS}
),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY 1
),
line_kept AS (
  SELECT r.doc_id, r.text, u.lang, u.source
  FROM reb r JOIN url_surv u USING (doc_id)
),
tk AS (
  SELECT doc_id, lang = 'en' AS is_target, tok,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {IMPORTANCE_BUCKETS} AS bucket
  FROM (
    SELECT doc_id, lang,
           unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM line_kept
  )
  WHERE tok <> ''
),
stats AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
         count(*) AS a_cnt
  FROM tk GROUP BY 1
),
tot AS (
  SELECT CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS total_target,
         count(*) AS total_corpus
  FROM tk
),
per AS (
  SELECT tk.doc_id,
         CAST(sum(s.t_cnt + 1) AS BIGINT) AS target_mass,
         CAST(sum(s.a_cnt + 1) AS BIGINT) AS corpus_mass
  FROM tk JOIN stats s USING (bucket)
  GROUP BY 1
),
important AS (
  SELECT lk.* FROM line_kept lk JOIN per p USING (doc_id), tot
  WHERE CAST(p.target_mass AS DOUBLE) * CAST(tot.total_corpus AS DOUBLE)
          / (CAST(p.corpus_mass AS DOUBLE) * CAST(tot.total_target AS DOUBLE))
        >= {V2_IMPORTANCE_MIN!r}
),
t(source, target_share) AS (VALUES
    {values}
),
c AS (SELECT source, count(*) AS n_docs FROM important GROUP BY 1),
ctot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
w AS (
  SELECT c.source,
         coalesce(t.target_share, 0.0) * CAST(ctot.total AS DOUBLE)
           / CAST(c.n_docs AS DOUBLE) AS sample_weight
  FROM c LEFT JOIN t USING (source), ctot
),
resampled AS (
  SELECT i.* FROM important i JOIN w USING (source)
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % {MERSENNE_P} % 10000 AS DOUBLE)
        < least(10000.0, {V2_ALPHA!r} * sample_weight * 10000.0)
)
SELECT 0 AS stage_id, 'raw' AS stage, count(*)::BIGINT AS n_docs,
       {ntok} AS n_tokens FROM base
UNION ALL SELECT 1, 'url_dedup', count(*)::BIGINT, {ntok} FROM url_surv
UNION ALL SELECT 2, 'line_dedup', count(*)::BIGINT, {ntok} FROM line_kept
UNION ALL SELECT 3, 'importance', count(*)::BIGINT, {ntok} FROM important
UNION ALL SELECT 4, 'resampled', count(*)::BIGINT, {ntok} FROM resampled
"""


# ------------------------------------------------- token-budget selection
TOKEN_BUDGET = 10_000


def q_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget corpus cut (operators/curation.py
    token_budget_select): walk the documents in a deterministic
    pseudo-random priority order (the portable md5 shuffle key) and keep
    rows while the inclusive running whitespace-token sum stays within
    the budget — the final "take the best N tokens" step of a curated
    mix. Executes as the distributed two-pass prefix sum
    (global_sort_index shape), bit-equal to the oracle's single window."""
    from ..operators.curation import token_budget_select
    from ..operators.ordering import shuffle_key
    from ..operators.text import token_count

    d = _docs(spark, sf).select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        shuffle_key("doc_id").alias("pri"),
    )
    out = token_budget_select(d, TOKEN_BUDGET, ["pri", "doc_id"])
    return out.select(
        "doc_id", "n_tokens", F.col("cum_tokens").cast("long").alias("cum_tokens")
    )


def _sql_token_budget() -> str:
    from ..operators.lsh import MERSENNE_P

    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf42'), 1, 15))::BIGINT
           % {MERSENNE_P} AS pri
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY pri, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= {TOKEN_BUDGET}
"""


# ------------------------------------------------- balanced output shards
N_SHARDS = 8


def q_balanced_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Equal-token output sharding (operators/curation.py
    balanced_shards): each document gets the shard its exclusive
    running token sum falls into — shard = (excl * N) div total,
    contiguous in the deterministic shuffle order, every shard within
    one max-document of the ideal token share. The 'write N balanced
    training shards' final step; integer-exact, so the oracle's
    single-window spelling matches bit-for-bit."""
    from ..operators.curation import balanced_shards
    from ..operators.ordering import shuffle_key
    from ..operators.text import token_count

    d = _docs(spark, sf).select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        shuffle_key("doc_id").alias("pri"),
    )
    out = balanced_shards(d, N_SHARDS, ["pri", "doc_id"])
    return out.select("doc_id", "n_tokens", "shard")


def _sql_balanced_shards() -> str:
    from ..operators.lsh import MERSENNE_P

    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf42'), 1, 15))::BIGINT
           % {MERSENNE_P} AS pri
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY pri, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl,
         (SELECT sum(n_tokens) FROM t) AS total
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(least(({N_SHARDS} * excl) // total, {N_SHARDS - 1}) AS INT) AS shard
FROM c
"""




# -------------------------------------------- composed v3 pipeline
V3_BUDGET = 10_000
V3_SHARDS = 8
V3_NEARDUP = 0.4
V3_CLUSTER_TARGET = 250


def q_corpus_pipeline_v3(spark: SparkSession, sf: str) -> DataFrame:
    """The round-5 curation family COMPOSED (plans/corpus.py
    curate_corpus_v3): classifier filter -> SemDeDup semantic dedup ->
    token-budget cut -> balanced output shards, emitted as the
    per-stage funnel census (final row audits the shard balance: shard
    count + heaviest shard mass). The oracle rebuilds the whole chain
    in ONE SQL statement, value-checking the stage interactions —
    classifier-kept set feeding the dedup clustering, k derived from
    the SURVIVING embedding count, the prefix-sum cut over the deduped
    order, and the integer shard assignment over the cut."""
    from ..plans.corpus import curate_corpus_v3, curate_corpus_v3_funnel

    d = _docs(spark, sf).select("doc_id", "text", "lang", "source")
    emb = load_table(spark, sf, "embeddings")
    stages = curate_corpus_v3(
        d,
        emb,
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        budget=V3_BUDGET,
        n_shards=V3_SHARDS,
    )
    return curate_corpus_v3_funnel(stages)


def _sql_corpus_pipeline_v3() -> str:
    from ..operators.lsh import MERSENNE_P

    w = ("(((('0x' || substr(md5(tok || ':qc-v1'), 1, 15))::BIGINT % 2147483647)"
         " % 4096) % 2001 - 1000) / 1000.0")
    ntok = r"CAST(coalesce(sum(len(string_split_regex(trim(text), '\s+'))), 0) AS BIGINT)"
    d2 = ("list_sum(list_transform(generate_series(1, len({a})), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
    return f"""
WITH scored AS (
  SELECT doc_id, text, lang, source,
         list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                 tok -> {w}))
           / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS score
  FROM documents
),
kept AS (SELECT doc_id, text, lang, source FROM scored WHERE score >= 0.0),
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings JOIN kept ON embeddings.vec_id = kept.doc_id
),
kk AS (SELECT greatest(8, CAST(ceil(count(*) / {V3_CLUSTER_TARGET}.0) AS BIGINT)) AS k FROM e),
c AS (
  SELECT vec_id AS centroid_id, v AS cv
  FROM (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn FROM e), kk
  WHERE rn <= kk.k
),
assign AS (
  SELECT e.vec_id,
         (min(struct_pack(d2 := {d2.format(a='v', b='cv')},
                          cid := c.centroid_id))).cid AS centroid_id
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
        >= {V3_NEARDUP}
),
sem AS (
  SELECT kept.doc_id, kept.text, kept.lang, kept.source
  FROM kept JOIN assign ON kept.doc_id = assign.vec_id
  WHERE assign.vec_id NOT IN (SELECT vec_id FROM dups)
),
sized AS (
  SELECT doc_id, text,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf42'), 1, 15))::BIGINT
           % {MERSENNE_P} AS pri
  FROM sem
),
cum AS (
  SELECT doc_id, text, n_tokens, pri,
         sum(n_tokens) OVER (ORDER BY pri, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sized
),
budget AS (SELECT * FROM cum WHERE cum <= {V3_BUDGET}),
tot AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total FROM budget),
sh AS (
  SELECT doc_id, n_tokens,
         CAST(least(({V3_SHARDS} * (cum - n_tokens)) // tot.total,
                    {V3_SHARDS - 1}) AS INT) AS shard
  FROM budget, tot
),
mass AS (SELECT shard, CAST(sum(n_tokens) AS BIGINT) AS m FROM sh GROUP BY 1)
SELECT 0 AS stage_id, 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs, {ntok} AS n_tokens FROM documents
UNION ALL SELECT 1, 'classifier', CAST(count(*) AS BIGINT), {ntok} FROM kept
UNION ALL SELECT 2, 'semdedup', CAST(count(*) AS BIGINT), {ntok} FROM sem
UNION ALL SELECT 3, 'budget', CAST(count(*) AS BIGINT), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM budget
UNION ALL SELECT 4, 'sharded', CAST(count(*) AS BIGINT), CAST(coalesce(max(m), 0) AS BIGINT) FROM mass
"""


# -------------------------------------------- composed v4 pipeline
# quantized mean-surprisal gate: ~75th percentile of the line-deduped,
# classifier-kept corpus (measured r6: median 438-439, p75 446 at both
# sf0.001 and sf0.01) — a CCNet-style "keep the in-domain band" cut that
# removes a real fraction without starving the downstream stages
V4_LM_MAX_BITS = 445


def q_corpus_pipeline_v4(spark: SparkSession, sf: str) -> DataFrame:
    """The full CCNet-ordered curation product COMPOSED (plans/corpus.py
    curate_corpus_v4): line dedup -> classifier filter -> bigram-LM
    perplexity gate -> SemDeDup -> token-budget cut -> balanced shards,
    emitted as the per-stage funnel census (final row audits the shard
    balance). Wenzek et al. 2020's pipeline order: dedup first, THEN the
    LM filter trained on the surviving trusted slice, then selection.
    The oracle rebuilds the whole chain in ONE SQL statement — the LM
    trains on exactly the line-deduped, classifier-kept 'en' text, so
    the stage interactions (not just each operator) are value-checked."""
    from ..plans.corpus import curate_corpus_v4, curate_corpus_v4_funnel

    d = _docs(spark, sf).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
        "lang",
        "source",
    )
    emb = load_table(spark, sf, "embeddings")
    stages = curate_corpus_v4(
        d,
        emb,
        lm_max_avg_bits_x100=V4_LM_MAX_BITS,
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        budget=V3_BUDGET,
        n_shards=V3_SHARDS,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
    )
    return curate_corpus_v4_funnel(stages)


# v5 gate threshold: trigram avg_bits run higher than bigram (sparser
# counts); 450 sits at the sf0.01 survivor median — a real gate, like
# v4's 445 at the bigram tier
V5_LM_MAX_BITS = 450


def q_corpus_pipeline_v5(spark: SparkSession, sf: str) -> DataFrame:
    """The v4 CCNet curation chain with the LM gate upgraded one order
    (plans/corpus.py curate_corpus_v4 with lm_order=3): line dedup ->
    classifier -> TRIGRAM+backoff perplexity gate -> SemDeDup ->
    token-budget cut -> balanced shards, as the per-stage funnel
    census. The oracle rebuilds the whole chain in ONE SQL statement
    with the trigram CTEs spliced into the same composed plan, so the
    stage interactions under the higher-order gate are value-checked."""
    from ..plans.corpus import curate_corpus_v4, curate_corpus_v4_funnel

    d = _docs(spark, sf).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
        "lang",
        "source",
    )
    emb = load_table(spark, sf, "embeddings")
    stages = curate_corpus_v4(
        d,
        emb,
        lm_max_avg_bits_x100=V5_LM_MAX_BITS,
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        budget=V3_BUDGET,
        n_shards=V3_SHARDS,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
        lm_order=3,
    )
    return curate_corpus_v4_funnel(stages)


def q_corpus_pipeline_v6(spark: SparkSession, sf: str) -> DataFrame:
    """The CCNet-FAITHFUL curation chain (plans/corpus.py
    curate_corpus_v6): line dedup -> classifier -> interpolated-KN
    scoring + per-language perplexity TERCILES keeping head+middle
    (Wenzek et al. 2020 §4.4's actual selection — distribution-
    relative, not the fixed bits threshold v4/v5 gate on) -> SemDeDup
    -> token-budget cut -> balanced shards, as the per-stage funnel
    census. The oracle rebuilds the WHOLE chain — KN counts trained on
    exactly the classifier-kept 'en' slice, histogram tercile cuts,
    bucket assignment — in one SQL statement, so the stage
    interactions under the distribution-relative gate are
    value-checked."""
    from ..plans.corpus import curate_corpus_v4_funnel, curate_corpus_v6

    d = _docs(spark, sf).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
        "lang",
        "source",
    )
    emb = load_table(spark, sf, "embeddings")
    stages = curate_corpus_v6(
        d,
        emb,
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        budget=V3_BUDGET,
        n_shards=V3_SHARDS,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
        bucket_width=CCNET_BUCKET_WIDTH,
    )
    return curate_corpus_v4_funnel(stages)


def q_corpus_pipeline_v7(spark: SparkSession, sf: str) -> DataFrame:
    """The v6 CCNet chain gating on the TRAINED quality classifier
    (plans/corpus.py curate_corpus_v7 — VERDICT r9 #1's capstone): the
    16-round fixed-point logistic regression trains in-engine on the
    raw corpus (the labeler corpus, exactly q_classifier_train's
    setup), and its keep decision replaces the placeholder-weight
    expression at the classifier stage; every other stage is v6's. The
    oracle splices the unrolled 16-round training CTEs (prefix 'c')
    into the SAME one-statement chain rebuild and re-featurizes the
    line-deduped text for the gate, so the learned-weight stage
    interaction — not just the weights — is value-checked."""
    from ..plans.corpus import curate_corpus_v4_funnel, curate_corpus_v7

    d = _docs(spark, sf).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
        "lang",
        "source",
    )
    emb = load_table(spark, sf, "embeddings")
    stages = curate_corpus_v7(
        d,
        emb,
        # labeler corpus = RAW text (labels are rule scores on the raw
        # docs; \s+ tokenization makes raw/relined features identical)
        train_docs=_docs(spark, sf).select("doc_id", "text"),
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        budget=V3_BUDGET,
        n_shards=V3_SHARDS,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
        bucket_width=CCNET_BUCKET_WIDTH,
    )
    return curate_corpus_v4_funnel(stages)


def q_corpus_pipeline_v8(spark: SparkSession, sf: str) -> DataFrame:
    """The v7 trained-gate chain with SPAN-LEVEL BENCHMARK
    DECONTAMINATION composed in (plans/corpus.py curate_corpus_v8):
    the benchmark slice (doc_id < 10, q_decontaminate's convention) is
    excluded from the chain input and never rewritten; after line
    dedup, every corpus run sharing >= 5 tokens with the benchmark is
    cut (docs emptied entirely drop); the trained classifier (labeler
    = the benchmark-excluded slice), KN terciles, SemDeDup, budget and
    shards run on the cleaned text. One oracle statement rebuilds the
    whole chain including the decontamination rebuild and the spliced
    16-round training CTEs; the funnel census gains the 'decon' row."""
    from ..plans.corpus import (
        _STAGE_ORDER_V8,
        curate_corpus_v4_funnel,
        curate_corpus_v8,
    )

    raw = _docs(spark, sf)
    d = raw.filter(F.col("doc_id") >= 10).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
        "lang",
        "source",
    )
    emb = load_table(spark, sf, "embeddings")
    stages = curate_corpus_v8(
        d,
        emb,
        bench=raw.filter(F.col("doc_id") < 10).select("doc_id", "text"),
        decon_min_len=DECON_CHAIN_L,
        train_docs=raw.filter(F.col("doc_id") >= 10).select("doc_id", "text"),
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        budget=V3_BUDGET,
        n_shards=V3_SHARDS,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
        bucket_width=CCNET_BUCKET_WIDTH,
    )
    return curate_corpus_v4_funnel(stages, order=_STAGE_ORDER_V8)


def q_corpus_pipeline_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental COMPOSED curation (plans/corpus.py
    curate_corpus_delta — VERDICT r9 #2): the 80% standing corpus
    publishes its index artifacts (line-frequency index, static bigram
    LM, SemDeDup centroids + cluster assignments, sized prefix table)
    and the 20% delta batch folds through every stage's delta twin:
    merged-df line dedup -> classifier -> frozen-LM gate -> incremental
    SemDeDup -> union budget fill. The oracle rebuilds the SAME
    frozen-artifact union chain in one SQL statement and restricts to
    delta docs — the q_substring_index_delta equivalence pattern
    applied to the whole composition. Returns the admitted delta docs
    (doc_id, n_tokens, cum_tokens)."""
    from ..plans.corpus import curate_corpus_delta, curate_corpus_index

    d = _docs(spark, sf).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
        "lang",
        "source",
    )
    emb = load_table(spark, sf, "embeddings")
    standing = d.filter(F.col("doc_id") % 10 < 8)
    delta = d.filter(F.col("doc_id") % 10 >= 8)
    index = curate_corpus_index(
        standing,
        emb,
        lm_max_avg_bits_x100=V4_LM_MAX_BITS,
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
    )
    return curate_corpus_delta(
        index,
        delta,
        emb,
        lm_max_avg_bits_x100=V4_LM_MAX_BITS,
        budget=V3_BUDGET,
        neardup_threshold=V3_NEARDUP,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
    )


def _sql_corpus_pipeline_delta() -> str:
    """The frozen-artifact union rebuild, restricted to delta docs: the
    standing chain (v4-bigram) over doc_id%10<8 publishes freq/LM/
    centroid/assignment/sized artifacts; the delta chain consumes them
    with merged line dfs; one budget window over the union."""
    from ..operators.lsh import MERSENNE_P

    w = ("(((('0x' || substr(md5(tok || ':qc-v1'), 1, 15))::BIGINT % 2147483647)"
         " % 4096) % 2001 - 1000) / 1000.0")
    d2 = ("list_sum(list_transform(generate_series(1, len({a})), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
    score = (
        "list_sum(list_transform(string_split_regex(trim(text), '\\s+'), "
        f"tok -> {w})) "
        "/ CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)"
    )
    sql = f"""
WITH relined AS (
  SELECT doc_id, lang, source, (doc_id % 10 >= 8) AS is_delta,
         regexp_replace(text, '{_RELINE_PAT}', '\\1' || chr(10), 'g') AS text
  FROM documents
),
ls AS (
  SELECT doc_id, lang, source, is_delta, string_split(text, chr(10)) AS arr
  FROM relined
),
lns AS (
  SELECT doc_id, is_delta, unnest(arr) AS line,
         unnest(range(1, len(arr) + 1)) AS pos
  FROM ls
),
freq_s AS (
  SELECT line, count(DISTINCT doc_id) AS nd FROM lns
  WHERE NOT is_delta GROUP BY 1
),
freq_d AS (
  SELECT line, count(DISTINCT doc_id) AS nd FROM lns
  WHERE is_delta GROUP BY 1
),
keptl_s AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lns l JOIN freq_s f USING (line)
  WHERE NOT l.is_delta AND f.nd <= {LINE_DEDUP_MAX_DOCS}
),
reb_s AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS kept_text
  FROM keptl_s GROUP BY 1
),
clf_s AS (
  SELECT * FROM (
    SELECT ls.doc_id, reb_s.kept_text AS text, ls.lang, ls.source
    FROM ls JOIN reb_s USING (doc_id)
  ) WHERE {score} >= 0.0
),
toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM clf_s
),
bg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2
  FROM toks, unnest(generate_series(0, len(t)-2)) AS u(i)
  WHERE len(t) >= 2
),
model AS (SELECT w1, w2, count(*) AS c12 FROM bg WHERE lang = 'en' GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM model GROUP BY 1),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
),
per_s AS (
  SELECT bg.doc_id,
         CAST(length(bin(CAST(floor(((coalesce(ctx.c1, 0) + v) * 1.0)
                                    / (coalesce(model.c12, 0) + 1)) AS BIGINT)))
              - 1 AS BIGINT) AS bits
  FROM bg LEFT JOIN model USING (w1, w2) LEFT JOIN ctx USING (w1), voc
),
lmagg_s AS (SELECT doc_id, count(*) AS n, sum(bits) AS sbits FROM per_s GROUP BY 1),
lm_s AS (
  SELECT clf_s.doc_id, clf_s.text FROM clf_s JOIN lmagg_s USING (doc_id)
  WHERE CAST(floor((100.0 * sbits) / n) AS BIGINT) <= {V4_LM_MAX_BITS}
),
keptl_d AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lns l
  JOIN freq_d fd USING (line)
  LEFT JOIN freq_s fs USING (line)
  WHERE l.is_delta AND (coalesce(fs.nd, 0) + fd.nd) <= {LINE_DEDUP_MAX_DOCS}
),
reb_d AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS kept_text
  FROM keptl_d GROUP BY 1
),
clf_d AS (
  SELECT * FROM (
    SELECT ls.doc_id, reb_d.kept_text AS text, ls.lang, ls.source
    FROM ls JOIN reb_d USING (doc_id) WHERE ls.is_delta
  ) WHERE {score} >= 0.0
),
tokd AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM clf_d
),
bgd AS (
  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
  FROM tokd, unnest(generate_series(0, len(t)-2)) AS u(i)
  WHERE len(t) >= 2
),
per_d AS (
  SELECT bgd.doc_id,
         CAST(length(bin(CAST(floor(((coalesce(ctx.c1, 0) + v) * 1.0)
                                    / (coalesce(model.c12, 0) + 1)) AS BIGINT)))
              - 1 AS BIGINT) AS bits
  FROM bgd LEFT JOIN model USING (w1, w2) LEFT JOIN ctx USING (w1), voc
),
lmagg_d AS (SELECT doc_id, count(*) AS n, sum(bits) AS sbits FROM per_d GROUP BY 1),
lm_d AS (
  SELECT clf_d.doc_id, clf_d.text FROM clf_d JOIN lmagg_d USING (doc_id)
  WHERE CAST(floor((100.0 * sbits) / n) AS BIGINT) <= {V4_LM_MAX_BITS}
),
e_s AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings JOIN lm_s ON embeddings.vec_id = lm_s.doc_id
),
kk AS (SELECT greatest(8, CAST(ceil(count(*) / {V3_CLUSTER_TARGET}.0) AS BIGINT)) AS k FROM e_s),
c AS (
  SELECT vec_id AS centroid_id, v AS cv
  FROM (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn FROM e_s), kk
  WHERE rn <= kk.k
),
assign_s AS (
  SELECT e_s.vec_id,
         (min(struct_pack(d2 := {d2.format(a='v', b='cv')},
                          cid := c.centroid_id))).cid AS centroid_id
  FROM e_s CROSS JOIN c GROUP BY e_s.vec_id
),
dups_s AS (
  SELECT DISTINCT bb.vec_id
  FROM e_s a
  JOIN assign_s aa ON a.vec_id = aa.vec_id
  JOIN assign_s ab ON aa.centroid_id = ab.centroid_id AND aa.vec_id < ab.vec_id
  JOIN e_s bb ON bb.vec_id = ab.vec_id
  WHERE list_dot_product(a.v, bb.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v)))
        >= {V3_NEARDUP}
),
sem_s AS (
  SELECT lm_s.doc_id, lm_s.text
  FROM lm_s JOIN assign_s ON lm_s.doc_id = assign_s.vec_id
  WHERE assign_s.vec_id NOT IN (SELECT vec_id FROM dups_s)
),
e_d AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings JOIN lm_d ON embeddings.vec_id = lm_d.doc_id
),
assign_d AS (
  SELECT e_d.vec_id,
         (min(struct_pack(d2 := {d2.format(a='v', b='cv')},
                          cid := c.centroid_id))).cid AS centroid_id
  FROM e_d CROSS JOIN c GROUP BY e_d.vec_id
),
eall AS (
  SELECT e_s.vec_id, e_s.v, assign_s.centroid_id
  FROM e_s JOIN assign_s USING (vec_id)
  UNION ALL
  SELECT e_d.vec_id, e_d.v, assign_d.centroid_id
  FROM e_d JOIN assign_d USING (vec_id)
),
dups_d AS (
  SELECT DISTINCT y.vec_id
  FROM eall x
  JOIN (SELECT e_d.vec_id, e_d.v, assign_d.centroid_id
        FROM e_d JOIN assign_d USING (vec_id)) y
    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
  WHERE list_dot_product(x.v, y.v)
          / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
        >= {V3_NEARDUP}
),
sem_d AS (
  SELECT lm_d.doc_id, lm_d.text
  FROM lm_d JOIN assign_d ON lm_d.doc_id = assign_d.vec_id
  WHERE assign_d.vec_id NOT IN (SELECT vec_id FROM dups_d)
),
sized AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf42'), 1, 15))::BIGINT
           % {MERSENNE_P} AS pri
  FROM (SELECT doc_id, text FROM sem_s UNION ALL SELECT doc_id, text FROM sem_d)
),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY pri, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sized
)
SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
FROM cum WHERE cum <= {V3_BUDGET} AND doc_id % 10 >= 8
"""
    for cte in ("lns AS (", "clf_s AS (", "clf_d AS (", "toks AS (",
                "model AS (", "lm_s AS (", "lm_d AS (", "e_s AS (",
                "e_d AS (", "assign_s AS (", "assign_d AS (", "c AS ("):
        sql = sql.replace(cte, cte.replace("AS (", "AS MATERIALIZED ("))
    return sql


# v8's span-decontamination gram length — mirrors llm_ops.DECON_L (the
# standalone q_decontaminate_apply constant; kept as a literal here to
# avoid a curation_ops <-> llm_ops import cycle, pinned equal by test)
DECON_CHAIN_L = 5


def _sql_corpus_pipeline_v4(
    lm_order: int | str = 2, clf_gate: str = "placeholder",
    decon: bool = False,
    relined_rel: str | None = None,
    bench_rel: str = "documents WHERE doc_id < 10",
    front: list[tuple[str, str]] | None = None,
    budget_mode: str = "global",
) -> str:
    """``decon=True`` is the v8 shape: the chain input excludes the
    benchmark slice (doc_id < 10 — q_decontaminate's convention), a
    span-decontamination rebuild is spliced between line_kept and the
    classifier gate, the trained-gate labeler corpus is the excluded
    slice too, and the census gains the 'decon' row.

    v9 extensions (composed by c4_ops._sql_corpus_pipeline_v9):
    ``relined_rel`` overrides the relined CTE's source relation (the
    webified corpus); ``bench_rel`` overrides the decon gram source;
    ``front`` splices extra stages between line_kept and decon — each
    entry is (stage_name, multi_cte_sql) where the SQL defines CTEs
    ending with one named ``stage_name`` reading ``{prev}`` (formatted
    with the previous stage's relation), and the census gains one row
    per front stage."""
    from ..operators.lsh import MERSENNE_P

    if lm_order not in (2, 3, "kn"):  # mirror curate_corpus_v4's guard
        raise ValueError(f"lm_order must be 2, 3 or 'kn', got {lm_order!r}")
    if clf_gate not in ("placeholder", "trained"):
        raise ValueError(f"clf_gate must be placeholder|trained, got {clf_gate!r}")
    if decon and clf_gate != "trained":
        raise ValueError("decon (v8/v9) composes on the trained gate")
    if front and not decon:
        raise ValueError("front (v9) composes on the decon chain")
    if budget_mode not in ("global", "unimax"):
        raise ValueError(f"budget_mode must be global|unimax, got {budget_mode!r}")
    prev = "line_kept"
    front_ctes = ""
    for stage_name, cte_sql in front or []:
        front_ctes += "\n" + cte_sql.format(prev=prev).strip() + ","
        prev = stage_name
    decon_src = prev
    clf_src = "decon" if decon else "line_kept"

    w = ("(((('0x' || substr(md5(tok || ':qc-v1'), 1, 15))::BIGINT % 2147483647)"
         " % 4096) % 2001 - 1000) / 1000.0")
    ntok = r"CAST(coalesce(sum(len(string_split_regex(trim(text), '\s+'))), 0) AS BIGINT)"
    d2 = ("list_sum(list_transform(generate_series(1, len({a})), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
    if lm_order == "kn":
        # v6's CCNet-faithful gate: interpolated KN scoring (trained on
        # the classifier-survivor 'en' slice) + per-language perplexity
        # TERCILES via the histogram sketch; keep head + middle
        bw = repr(CCNET_BUCKET_WIDTH)
        qlist = ", ".join(f"'{q!r}'::DOUBLE" for q in CCNET_QS)
        lm_block = f"""toks AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM clf),
tg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3
  FROM toks, unnest(generate_series(0, len(t)-3)) AS u(i)
  WHERE len(t) >= 3
),
tri AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg WHERE lang = 'en' GROUP BY 1, 2, 3),
kctx AS (SELECT w1, w2, sum(c123) AS c12, count(*) AS n1pp FROM tri GROUP BY 1, 2),
kcbg AS (SELECT w2, w3, count(*) AS cont23 FROM tri GROUP BY 1, 2),
kcctx AS (SELECT w2, sum(cont23) AS cont2 FROM kcbg GROUP BY 1),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
),
ksc AS (
  SELECT tg.doc_id,
         coalesce(tri.c123, 0) AS c123, coalesce(kctx.c12, 0) AS c12,
         coalesce(kctx.n1pp, 0) AS n1pp, coalesce(kcbg.cont23, 0) AS cont23,
         coalesce(kcctx.cont2, 0) AS cont2
  FROM tg LEFT JOIN tri USING (w1, w2, w3)
          LEFT JOIN kctx USING (w1, w2)
          LEFT JOIN kcbg USING (w2, w3)
          LEFT JOIN kcctx USING (w2)
),
kpc AS (
  SELECT doc_id, c123, c12, n1pp, cont23,
         CAST(floor((1000000.0 * (cont23 + 1)) / (cont2 + v)) AS BIGINT) AS pcppm
  FROM ksc, voc
),
kpm AS (
  SELECT doc_id,
         CASE WHEN c12 > 0
              THEN CAST(floor((1000000.0 * greatest(4 * c123 - 3, 0))
                              / (4.0 * c12)) AS BIGINT)
                 + CAST(floor(((3 * n1pp * pcppm) * 1.0)
                              / (4.0 * c12)) AS BIGINT)
              ELSE pcppm END AS ppm
  FROM kpc
),
kper AS (
  SELECT doc_id,
         CASE WHEN ppm > 0
              THEN CAST(length(bin(CAST(floor(1000000.0 / ppm) AS BIGINT))) - 1
                        AS BIGINT)
              ELSE CAST(20 AS BIGINT) END AS bits
  FROM kpm
),
kagg AS (SELECT doc_id, count(*) AS n, sum(bits) AS sbits FROM kper GROUP BY 1),
kscore AS (
  SELECT clf.doc_id, clf.lang,
         CAST(floor((100.0 * sbits) / n) AS BIGINT) AS ab
  FROM clf JOIN kagg USING (doc_id) WHERE n > 0
),
khist AS (
  SELECT lang, CAST(floor(ab / {bw}) AS BIGINT) AS bucket, count(*) AS n
  FROM kscore GROUP BY 1, 2
),
khc AS (
  SELECT lang, bucket, n,
         CAST(sum(n) OVER (PARTITION BY lang ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_rows
  FROM khist
),
khq AS (SELECT khc.*, q FROM khc, (SELECT unnest([{qlist}]) AS q)),
kcand AS (
  SELECT *, greatest(CAST(1 AS BIGINT),
                     CAST(ceil(q * CAST(n_rows AS DOUBLE)) AS BIGINT)) AS r
  FROM khq
),
kpick AS (
  SELECT lang, q, min(bucket) AS bucket
  FROM kcand WHERE cum >= r GROUP BY 1, 2
),
kest AS (
  SELECT p.lang, p.q,
         CAST(a.bucket AS DOUBLE) * {bw}
           + {bw} * (CAST(a.r - (a.cum - a.n) AS DOUBLE) / CAST(a.n AS DOUBLE))
           AS est_quantile
  FROM kpick p
  JOIN kcand a ON a.lang = p.lang AND a.q = p.q AND a.bucket = p.bucket
),
kcuts AS (
  SELECT lang,
         min(CASE WHEN q >= 0.5 THEN est_quantile END) AS t_middle
  FROM kest GROUP BY 1
),
lm AS (
  SELECT clf.doc_id, clf.text, clf.lang, clf.source
  FROM clf
  JOIN kscore USING (doc_id)
  JOIN kcuts ON kcuts.lang = clf.lang
  WHERE kscore.ab <= kcuts.t_middle
)"""
    elif lm_order == 3:
        # v5's trigram+backoff gate (SQL_LM_SCORE3's CTE chain, trained
        # on the classifier-survivor 'en' slice, thresholded at V5)
        lm_block = f"""toks AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM clf),
tg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3
  FROM toks, unnest(generate_series(0, len(t)-3)) AS u(i)
  WHERE len(t) >= 3
),
bgall AS (
  SELECT doc_id, lang, t[i+1] AS w2, t[i+2] AS w3
  FROM toks, unnest(generate_series(0, len(t)-2)) AS u(i)
  WHERE len(t) >= 2
),
tri AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg WHERE lang = 'en' GROUP BY 1, 2, 3),
trictx AS (SELECT w1, w2, sum(c123) AS c12 FROM tri GROUP BY 1, 2),
bi AS (SELECT w2, w3, count(*) AS c23 FROM bgall WHERE lang = 'en' GROUP BY 1, 2),
bictx AS (SELECT w2, sum(c23) AS c2 FROM bi GROUP BY 1),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
),
sc AS (
  SELECT tg.doc_id,
         coalesce(tri.c123, 0) AS c123, coalesce(trictx.c12, 0) AS c12,
         coalesce(bi.c23, 0) AS c23, coalesce(bictx.c2, 0) AS c2
  FROM tg LEFT JOIN tri USING (w1, w2, w3)
          LEFT JOIN trictx USING (w1, w2)
          LEFT JOIN bi USING (w2, w3)
          LEFT JOIN bictx USING (w2)
),
per AS (
  SELECT doc_id,
         CAST(length(bin(CAST(floor((((CASE WHEN c12 = 0 THEN c2 ELSE c12 END) + v) * 1.0)
                                    / ((CASE WHEN c12 = 0 THEN c23 ELSE c123 END) + 1))
                              AS BIGINT))) - 1 AS BIGINT) AS bits
  FROM sc, voc
),
lmagg AS (SELECT doc_id, count(*) AS n, sum(bits) AS sbits FROM per GROUP BY 1),
lm AS (
  SELECT clf.doc_id, clf.text, clf.lang, clf.source
  FROM clf JOIN lmagg USING (doc_id)
  WHERE CAST(floor((100.0 * sbits) / n) AS BIGINT) <= {V5_LM_MAX_BITS}
)"""
    else:
        lm_block = f"""toks AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM clf),
bg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2
  FROM toks, unnest(generate_series(0, len(t)-2)) AS u(i)
  WHERE len(t) >= 2
),
model AS (SELECT w1, w2, count(*) AS c12 FROM bg WHERE lang = 'en' GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM model GROUP BY 1),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
),
sc AS (
  SELECT bg.doc_id, coalesce(model.c12, 0) AS c12, coalesce(ctx.c1, 0) AS c1
  FROM bg LEFT JOIN model USING (w1, w2) LEFT JOIN ctx USING (w1)
),
per AS (
  SELECT doc_id,
         CAST(length(bin(CAST(floor(((c1 + v) * 1.0) / (c12 + 1)) AS BIGINT))) - 1
              AS BIGINT) AS bits
  FROM sc, voc
),
lmagg AS (SELECT doc_id, count(*) AS n, sum(bits) AS sbits FROM per GROUP BY 1),
lm AS (
  SELECT clf.doc_id, clf.text, clf.lang, clf.source
  FROM clf JOIN lmagg USING (doc_id)
  WHERE CAST(floor((100.0 * sbits) / n) AS BIGINT) <= {V4_LM_MAX_BITS}
)"""
    # classifier stage: the placeholder-weight expression score, or the
    # 16-round TRAINED fixed-point weights (v7) — training CTEs spliced
    # in under a 'c' prefix (trained on RAW documents, the labeler
    # corpus; tokenization is \s+ so raw vs relined makes no difference
    # to the features, but the LABELS come from raw text exactly like
    # q_classifier_train), then the gate re-featurizes the LINE-DEDUPED
    # text and keeps z >= 0 (trained_score's keep decision).
    if clf_gate == "trained":
        from .ml_ops import _SQL_CLF_BUCKET, _sql_clf_prefix, CLF_STEPS

        clf_train_src = (
            "(SELECT * FROM documents WHERE doc_id >= 10)"
            if decon
            else "documents"
        )
        train_ctes = (
            _sql_clf_prefix(p="c", src=clf_train_src)
            .strip().removeprefix("WITH ").rstrip()
        ) + ",\n"
        clf_block = f"""scored AS (
  SELECT f.doc_id, COALESCE(sum(w.w), 0) AS z
  FROM (
    SELECT DISTINCT doc_id, CAST({_SQL_CLF_BUCKET} AS BIGINT) AS bucket
    FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
          FROM {clf_src})
    UNION ALL
    SELECT doc_id, CAST(-1 AS BIGINT) AS bucket FROM {clf_src}
  ) f LEFT JOIN cw{CLF_STEPS} w USING (bucket)
  GROUP BY f.doc_id
),
clf AS (
  SELECT {clf_src}.doc_id, {clf_src}.text, {clf_src}.lang, {clf_src}.source
  FROM {clf_src} JOIN scored USING (doc_id) WHERE scored.z >= 0
)"""
    else:
        train_ctes = ""
        clf_block = f"""scored AS (
  SELECT doc_id, text, lang, source,
         list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                 tok -> {w}))
           / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS score
  FROM line_kept
),
clf AS (SELECT doc_id, text, lang, source FROM scored WHERE score >= 0.0)"""
    decon_block = ""
    if decon:
        _DL = DECON_CHAIN_L
        decon_block = f"""
dbg AS (
  SELECT DISTINCT md5(array_to_string(t[u.i:u.i+{_DL - 1}], ' ')) AS gkey
  FROM (SELECT string_split_regex(trim(text), '\\s+') AS t
        FROM {bench_rel}) b,
       unnest(generate_series(1, len(t) - {_DL - 1})) AS u(i)
  WHERE len(t) >= {_DL}
),
dtk AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM {decon_src}
),
docc AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(t[u.i:u.i+{_DL - 1}], ' ')) AS gkey
  FROM dtk, unnest(generate_series(1, len(t) - {_DL - 1})) AS u(i)
  WHERE len(t) >= {_DL}
),
dhit AS (SELECT DISTINCT o.doc_id, o.pos FROM docc o JOIN dbg USING (gkey)),
disl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dhit
),
dspan AS (
  SELECT doc_id, min(pos) AS s, CAST(max(pos) + {_DL - 1} AS BIGINT) AS e2
  FROM disl GROUP BY doc_id, grp
),
drem AS (
  SELECT DISTINCT doc_id, u.i AS tpos
  FROM dspan, unnest(generate_series(s, e2)) AS u(i)
),
dtok AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS tpos, t[u.i] AS tok
  FROM dtk, unnest(generate_series(1, len(t))) AS u(i)
),
dkept AS (
  SELECT dtok.doc_id, dtok.tpos, dtok.tok
  FROM dtok LEFT JOIN drem
    ON dtok.doc_id = drem.doc_id AND dtok.tpos = drem.tpos
  WHERE drem.tpos IS NULL
),
dreb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS kept_text
  FROM dkept GROUP BY 1
),
decon AS MATERIALIZED (
  SELECT lk.doc_id, dreb.kept_text AS text, lk.lang, lk.source
  FROM {decon_src} lk JOIN dreb USING (doc_id)
  WHERE dreb.kept_text != ''
),"""
    relined_body = (
        f"SELECT doc_id, lang, source, text FROM {relined_rel}"
        if relined_rel
        else (
            "SELECT doc_id, lang, source,\n"
            f"         regexp_replace(text, '{_RELINE_PAT}', "
            "'\\1' || chr(10), 'g') AS text\n"
            f"  FROM documents{' WHERE doc_id >= 10' if decon else ''}"
        )
    )
    stage_rels = [("raw", "relined"), ("line_dedup", "line_kept")]
    stage_rels += [(nm, nm) for nm, _ in front or []]
    if decon:
        stage_rels.append(("decon", "decon"))
    stage_rels += [("classifier", "clf"), ("lm_gate", "lm"),
                   ("semdedup", "sem")]
    census_rows = "\nUNION ALL ".join(
        (
            f"SELECT {i} AS stage_id, '{nm}' AS stage, "
            f"CAST(count(*) AS BIGINT) AS n_docs, {ntok} AS n_tokens "
            f"FROM {rel}"
            if i == 0
            else f"SELECT {i}, '{nm}', CAST(count(*) AS BIGINT), {ntok} "
                 f"FROM {rel}"
        )
        for i, (nm, rel) in enumerate(stage_rels)
    )
    nb = len(stage_rels)
    census_rows += (
        f"\nUNION ALL SELECT {nb}, 'budget', CAST(count(*) AS BIGINT), "
        "CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM budget"
        f"\nUNION ALL SELECT {nb + 1}, 'sharded', "
        "CAST(count(*) AS BIGINT), "
        "CAST(coalesce(max(m), 0) AS BIGINT) FROM mass"
    )
    if budget_mode == "global":
        budget_block = f"""cum AS (
  SELECT doc_id, text, n_tokens, pri,
         sum(n_tokens) OVER (ORDER BY pri, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sized
),
budget AS (SELECT * FROM cum WHERE cum <= {V3_BUDGET}),
tot AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total FROM budget),
sh AS (
  SELECT doc_id, n_tokens,
         CAST(least(({V3_SHARDS} * (cum - n_tokens)) // tot.total,
                    {V3_SHARDS - 1}) AS INT) AS shard
  FROM budget, tot
)"""
    else:
        # the v10 UniMax cut: per-language waterfilled allocations
        # (operators/curation.py unimax_allocation, replayed as the
        # recursive-CTE recurrence of SQL_UNIMAX_WEIGHTS), each language
        # filling its own prefix in (pri, doc_id) order; shards then
        # rebalance on a RECOMPUTED global cumsum (the per-language
        # prefixes interleave, so the per-lang cum is not the global one)
        budget_block = f"""uwc AS (
  SELECT lang AS grp, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM sized GROUP BY 1
),
utot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
                CAST(count(*) AS BIGINT) AS l FROM uwc),
uranked AS (
  SELECT grp, (n_tokens * {UNIMAX_CAP_X100}) // 100 AS cap,
         row_number() OVER (
           ORDER BY (n_tokens * {UNIMAX_CAP_X100}) // 100 ASC, grp ASC
         ) AS r
  FROM uwc
),
ufill AS (
  SELECT CAST(0 AS BIGINT) AS r,
         (utot.t * {UNIMAX_BUDGET_NUM}) // {UNIMAX_BUDGET_DEN} AS b,
         CAST(NULL AS VARCHAR) AS grp, CAST(0 AS BIGINT) AS alloc
  FROM utot
  UNION ALL
  SELECT rk.r, f.b - least(rk.cap, f.b // (utot.l - rk.r + 1)),
         rk.grp, least(rk.cap, f.b // (utot.l - rk.r + 1))
  FROM ufill f
  JOIN uranked rk ON rk.r = f.r + 1
  CROSS JOIN utot
  WHERE f.r < utot.l
),
cum AS (
  SELECT doc_id, text, lang, n_tokens, pri,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY pri, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sized
),
budget AS (
  SELECT c.* FROM cum c JOIN ufill u ON u.grp = c.lang
  WHERE c.cum <= u.alloc
),
tot AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total FROM budget),
gcum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY pri, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM budget
),
sh AS (
  SELECT doc_id, n_tokens,
         CAST(least(({V3_SHARDS} * (cum - n_tokens)) // tot.total,
                    {V3_SHARDS - 1}) AS INT) AS shard
  FROM gcum, tot
)"""
    recursive_kw = "RECURSIVE " if budget_mode == "unimax" else ""
    sql = f"""
WITH {recursive_kw}{train_ctes}relined AS (
  {relined_body}
),
ls AS (SELECT doc_id, lang, source, string_split(text, chr(10)) AS arr FROM relined),
lns AS (
  SELECT doc_id, unnest(arr) AS line, unnest(range(1, len(arr) + 1)) AS pos
  FROM ls
),
freq AS (SELECT line, count(DISTINCT doc_id) AS nd FROM lns GROUP BY 1),
keptl AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lns l JOIN freq f USING (line)
  WHERE f.nd <= {LINE_DEDUP_MAX_DOCS}
),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS kept_text
  FROM keptl GROUP BY 1
),
line_kept AS (
  SELECT ls.doc_id, reb.kept_text AS text, ls.lang, ls.source
  FROM ls JOIN reb USING (doc_id)
),{front_ctes}{decon_block}
{clf_block},
{lm_block},
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings JOIN lm ON embeddings.vec_id = lm.doc_id
),
kk AS (SELECT greatest(8, CAST(ceil(count(*) / {V3_CLUSTER_TARGET}.0) AS BIGINT)) AS k FROM e),
c AS (
  SELECT vec_id AS centroid_id, v AS cv
  FROM (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn FROM e), kk
  WHERE rn <= kk.k
),
assign AS (
  SELECT e.vec_id,
         (min(struct_pack(d2 := {d2.format(a='v', b='cv')},
                          cid := c.centroid_id))).cid AS centroid_id
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
        >= {V3_NEARDUP}
),
sem AS (
  SELECT lm.doc_id, lm.text, lm.lang, lm.source
  FROM lm JOIN assign ON lm.doc_id = assign.vec_id
  WHERE assign.vec_id NOT IN (SELECT vec_id FROM dups)
),
sized AS (
  SELECT doc_id, text, lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf42'), 1, 15))::BIGINT
           % {MERSENNE_P} AS pri
  FROM sem
),
{budget_block},
mass AS (SELECT shard, CAST(sum(n_tokens) AS BIGINT) AS m FROM sh GROUP BY 1)
{census_rows}
"""
    # MATERIALIZE the multiply-referenced heavy CTEs: DuckDB inlines
    # plain CTEs per reference, so the KN/LM pyramid hanging off `clf`
    # re-evaluates once per consumer — 143 s -> 0.3 s at sf0.01 for the
    # kn variant when pinned (results identical; it is purely a
    # materialization hint)
    for cte in ("line_kept AS (", "clf AS (", "toks AS (", "tri AS (",
                "model AS (", "kscore AS (", "lm AS ("):
        sql = sql.replace(cte, cte.replace("AS (", "AS MATERIALIZED ("))
    return sql


# ----------------------------------------------- bigram-LM quality score
def q_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style LM quality scoring (operators/lm_score.py): train an
    add-one bigram LM on the 'en' slice, score EVERY document's
    likelihood under it — the trusted-corpus-scores-the-crawl pattern.
    Output is the engine-exact quantized statistics (probability in ppm,
    surprisal in whole bits); the double convenience column is dropped
    because libm never matches across engines."""
    docs = _docs(spark, sf)
    model = lm_score.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    return lm_score.score_docs(docs, model).drop("avg_logprob_bits")


SQL_LM_SCORE = r"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t FROM documents
),
bg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2
  FROM toks, unnest(generate_series(0, len(t)-2)) AS u(i)
  WHERE len(t) >= 2
),
model AS (SELECT w1, w2, count(*) AS c12 FROM bg WHERE lang = 'en' GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM model GROUP BY 1),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
),
sc AS (
  SELECT bg.doc_id,
         coalesce(model.c12, 0) AS c12,
         coalesce(ctx.c1, 0) AS c1
  FROM bg LEFT JOIN model USING (w1, w2) LEFT JOIN ctx USING (w1)
),
per AS (
  SELECT doc_id,
         CASE WHEN c12 = 0 THEN 1 ELSE 0 END AS oov,
         CAST(floor((1000000.0 * (c12 + 1)) / (c1 + v)) AS BIGINT) AS ppm,
         CAST(length(bin(CAST(floor(((c1 + v) * 1.0) / (c12 + 1)) AS BIGINT))) - 1
              AS BIGINT) AS bits
  FROM sc, voc
),
agg AS (
  SELECT doc_id, count(*) AS n, sum(oov) AS oov,
         sum(ppm) AS sppm, sum(bits) AS sbits
  FROM per GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(a.oov, 0) AS BIGINT) AS n_oov,
       CAST(coalesce(a.sppm, 0) AS BIGINT) AS sum_prob_ppm,
       CAST(coalesce(a.sbits, 0) AS BIGINT) AS sum_bits,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(floor((a.sppm * 1.0) / a.n) AS BIGINT) END AS mean_prob_ppm,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(floor((100.0 * a.sbits) / a.n) AS BIGINT) END AS avg_bits_x100
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ------------------------------------ trigram-LM with bigram backoff
def q_lm_score3(spark: SparkSession, sf: str) -> DataFrame:
    """Trigram-LM quality scoring with deterministic bigram backoff
    (operators/lm_score.py:score_docs3) — one order closer to CCNet's
    5-gram Kneser-Ney than q_lm_score's bigram analog: train on the
    'en' slice, score every document; a trigram whose (w1,w2) context
    is unseen backs off to the bigram tier. Same quantized integer
    statistics; the libm convenience column is dropped."""
    docs = _docs(spark, sf)
    model = lm_score.train_trigram_lm(docs.filter(F.col("lang") == "en"))
    return lm_score.score_docs3(docs, model).drop("avg_logprob_bits")


SQL_LM_SCORE3 = r"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t FROM documents
),
tg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3
  FROM toks, unnest(generate_series(0, len(t)-3)) AS u(i)
  WHERE len(t) >= 3
),
bgall AS (
  SELECT doc_id, lang, t[i+1] AS w2, t[i+2] AS w3
  FROM toks, unnest(generate_series(0, len(t)-2)) AS u(i)
  WHERE len(t) >= 2
),
tri AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg WHERE lang = 'en' GROUP BY 1, 2, 3),
trictx AS (SELECT w1, w2, sum(c123) AS c12 FROM tri GROUP BY 1, 2),
bi AS (SELECT w2, w3, count(*) AS c23 FROM bgall WHERE lang = 'en' GROUP BY 1, 2),
bictx AS (SELECT w2, sum(c23) AS c2 FROM bi GROUP BY 1),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
),
sc AS (
  SELECT tg.doc_id,
         coalesce(tri.c123, 0) AS c123,
         coalesce(trictx.c12, 0) AS c12,
         coalesce(bi.c23, 0) AS c23,
         coalesce(bictx.c2, 0) AS c2
  FROM tg LEFT JOIN tri USING (w1, w2, w3)
          LEFT JOIN trictx USING (w1, w2)
          LEFT JOIN bi USING (w2, w3)
          LEFT JOIN bictx USING (w2)
),
per AS (
  SELECT doc_id,
         CASE WHEN c12 = 0 THEN 1 ELSE 0 END AS backoff,
         CASE WHEN (CASE WHEN c12 = 0 THEN c23 ELSE c123 END) = 0
              THEN 1 ELSE 0 END AS oov,
         CAST(floor((1000000.0 * ((CASE WHEN c12 = 0 THEN c23 ELSE c123 END) + 1))
                    / ((CASE WHEN c12 = 0 THEN c2 ELSE c12 END) + v)) AS BIGINT) AS ppm,
         CAST(length(bin(CAST(floor((((CASE WHEN c12 = 0 THEN c2 ELSE c12 END) + v) * 1.0)
                                    / ((CASE WHEN c12 = 0 THEN c23 ELSE c123 END) + 1))
                              AS BIGINT))) - 1 AS BIGINT) AS bits
  FROM sc, voc
),
agg AS (
  SELECT doc_id, count(*) AS n, sum(backoff) AS bo, sum(oov) AS oov,
         sum(ppm) AS sppm, sum(bits) AS sbits
  FROM per GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_trigrams,
       CAST(coalesce(a.bo, 0) AS BIGINT) AS n_backoff,
       CAST(coalesce(a.oov, 0) AS BIGINT) AS n_oov,
       CAST(coalesce(a.sppm, 0) AS BIGINT) AS sum_prob_ppm,
       CAST(coalesce(a.sbits, 0) AS BIGINT) AS sum_bits,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(floor((a.sppm * 1.0) / a.n) AS BIGINT) END AS mean_prob_ppm,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(floor((100.0 * a.sbits) / a.n) AS BIGINT) END AS avg_bits_x100
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ------------------------------ interpolated Kneser-Ney trigram tier
def q_lm_score_kn(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram scoring (operators/lm_score.py:
    score_docs_kn) — the smoothing CCNet's 5-gram gate actually uses
    (Wenzek et al. 2020), here at order 3: absolute discount D=3/4 on
    the trigram tier, interpolated with a smoothed CONTINUATION-bigram
    lower tier (type counts, not token counts — the KN insight). Train
    on the 'en' slice, score every document. All arithmetic is the
    module's quantized-ppm discipline, so the oracle floors the same
    IEEE doubles; the libm convenience column is dropped."""
    docs = _docs(spark, sf)
    model = lm_score.train_kn_trigram_lm(docs.filter(F.col("lang") == "en"))
    return lm_score.score_docs_kn(docs, model).drop("avg_logprob_bits")


# the KN chain as CTEs (toks .. agg) — shared by the score oracle and
# the composed CCNet-buckets oracle
_SQL_KN_CTES = r"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t FROM documents
),
tg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3
  FROM toks, unnest(generate_series(0, len(t)-3)) AS u(i)
  WHERE len(t) >= 3
),
tri AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg WHERE lang = 'en' GROUP BY 1, 2, 3),
ctx AS (SELECT w1, w2, sum(c123) AS c12, count(*) AS n1pp FROM tri GROUP BY 1, 2),
cbg AS (SELECT w2, w3, count(*) AS cont23 FROM tri GROUP BY 1, 2),
cctx AS (SELECT w2, sum(cont23) AS cont2 FROM cbg GROUP BY 1),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
),
sc AS (
  SELECT tg.doc_id,
         coalesce(tri.c123, 0) AS c123,
         coalesce(ctx.c12, 0) AS c12,
         coalesce(ctx.n1pp, 0) AS n1pp,
         coalesce(cbg.cont23, 0) AS cont23,
         coalesce(cctx.cont2, 0) AS cont2
  FROM tg LEFT JOIN tri USING (w1, w2, w3)
          LEFT JOIN ctx USING (w1, w2)
          LEFT JOIN cbg USING (w2, w3)
          LEFT JOIN cctx USING (w2)
),
pc AS (
  SELECT doc_id, c123, c12, n1pp, cont23,
         CAST(floor((1000000.0 * (cont23 + 1)) / (cont2 + v)) AS BIGINT) AS pcppm
  FROM sc, voc
),
pm AS (
  SELECT doc_id,
         CASE WHEN c12 = 0 THEN 1 ELSE 0 END AS backoff,
         CASE WHEN c123 = 0 AND cont23 = 0 THEN 1 ELSE 0 END AS oov,
         CASE WHEN c12 > 0
              THEN CAST(floor((1000000.0 * greatest(4 * c123 - 3, 0))
                              / (4.0 * c12)) AS BIGINT)
                 + CAST(floor(((3 * n1pp * pcppm) * 1.0)
                              / (4.0 * c12)) AS BIGINT)
              ELSE pcppm END AS ppm
  FROM pc
),
per AS (
  SELECT doc_id, backoff, oov, ppm,
         CASE WHEN ppm > 0
              THEN CAST(length(bin(CAST(floor(1000000.0 / ppm) AS BIGINT))) - 1
                        AS BIGINT)
              ELSE CAST(20 AS BIGINT) END AS bits
  FROM pm
),
agg AS (
  SELECT doc_id, count(*) AS n, sum(backoff) AS bo, sum(oov) AS oov,
         sum(ppm) AS sppm, sum(bits) AS sbits
  FROM per GROUP BY 1
)"""

SQL_LM_SCORE_KN = (
    _SQL_KN_CTES
    + r"""
SELECT d.doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_trigrams,
       CAST(coalesce(a.bo, 0) AS BIGINT) AS n_backoff,
       CAST(coalesce(a.oov, 0) AS BIGINT) AS n_oov,
       CAST(coalesce(a.sppm, 0) AS BIGINT) AS sum_prob_ppm,
       CAST(coalesce(a.sbits, 0) AS BIGINT) AS sum_bits,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(floor((a.sppm * 1.0) / a.n) AS BIGINT) END AS mean_prob_ppm,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(floor((100.0 * a.sbits) / a.n) AS BIGINT) END AS avg_bits_x100
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
)


def q_lm_score_kn_full(spark: SparkSession, sf: str) -> DataFrame:
    """FULLY recursive interpolated Kneser-Ney (operators/lm_score.py:
    score_docs_kn_full — Chen & Goodman 1999's textbook form at order
    3): discount 3/4 and interpolation at the trigram AND
    continuation-bigram tiers, smoothed continuation-unigram floor.
    Each tier's discount mass exactly funds the tier below; all
    arithmetic stays in the quantized-ppm discipline so the oracle
    floors the same IEEE doubles."""
    docs = _docs(spark, sf)
    model = lm_score.train_kn_full_lm(docs.filter(F.col("lang") == "en"))
    return lm_score.score_docs_kn_full(docs, model).drop("avg_logprob_bits")


SQL_LM_SCORE_KN_FULL = r"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t FROM documents
),
tg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3
  FROM toks, unnest(generate_series(0, len(t)-3)) AS u(i)
  WHERE len(t) >= 3
),
tri AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg WHERE lang = 'en' GROUP BY 1, 2, 3),
ctx AS (SELECT w1, w2, sum(c123) AS c12, count(*) AS n1pp FROM tri GROUP BY 1, 2),
cbg AS (SELECT w2, w3, count(*) AS cont23 FROM tri GROUP BY 1, 2),
cctx AS (SELECT w2, sum(cont23) AS cont2, count(*) AS n1pp2 FROM cbg GROUP BY 1),
cuni AS (SELECT w3, count(*) AS cu3 FROM tri GROUP BY 1),
tt AS (SELECT count(*) AS t_types FROM tri),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = 'en')
),
sc AS (
  SELECT tg.doc_id,
         coalesce(tri.c123, 0) AS c123,
         coalesce(ctx.c12, 0) AS c12,
         coalesce(ctx.n1pp, 0) AS n1pp,
         coalesce(cbg.cont23, 0) AS cont23,
         coalesce(cctx.cont2, 0) AS cont2,
         coalesce(cctx.n1pp2, 0) AS n1pp2,
         coalesce(cuni.cu3, 0) AS cu3
  FROM tg LEFT JOIN tri USING (w1, w2, w3)
          LEFT JOIN ctx USING (w1, w2)
          LEFT JOIN cbg USING (w2, w3)
          LEFT JOIN cctx USING (w2)
          LEFT JOIN cuni USING (w3)
),
p1t AS (
  SELECT sc.*,
         CAST(floor((1000000.0 * (cu3 + 1)) / (t_types + v)) AS BIGINT) AS p1
  FROM sc, tt, voc
),
p2t AS (
  SELECT doc_id, c123, c12, n1pp, cont23, cu3,
         CASE WHEN cont2 > 0
              THEN CAST(floor((1000000.0 * greatest(4 * cont23 - 3, 0))
                              / (4.0 * cont2)) AS BIGINT)
                 + CAST(floor(((3 * n1pp2 * p1) * 1.0)
                              / (4.0 * cont2)) AS BIGINT)
              ELSE p1 END AS p2
  FROM p1t
),
pm AS (
  SELECT doc_id,
         CASE WHEN c12 = 0 THEN 1 ELSE 0 END AS backoff,
         CASE WHEN c123 = 0 AND cont23 = 0 AND cu3 = 0 THEN 1 ELSE 0 END AS oov,
         CASE WHEN c12 > 0
              THEN CAST(floor((1000000.0 * greatest(4 * c123 - 3, 0))
                              / (4.0 * c12)) AS BIGINT)
                 + CAST(floor(((3 * n1pp * p2) * 1.0)
                              / (4.0 * c12)) AS BIGINT)
              ELSE p2 END AS ppm
  FROM p2t
),
per AS (
  SELECT doc_id, backoff, oov, ppm,
         CASE WHEN ppm > 0
              THEN CAST(length(bin(CAST(floor(1000000.0 / ppm) AS BIGINT))) - 1
                        AS BIGINT)
              ELSE CAST(20 AS BIGINT) END AS bits
  FROM pm
),
agg AS (
  SELECT doc_id, count(*) AS n, sum(backoff) AS bo, sum(oov) AS oov,
         sum(ppm) AS sppm, sum(bits) AS sbits
  FROM per GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_trigrams,
       CAST(coalesce(a.bo, 0) AS BIGINT) AS n_backoff,
       CAST(coalesce(a.oov, 0) AS BIGINT) AS n_oov,
       CAST(coalesce(a.sppm, 0) AS BIGINT) AS sum_prob_ppm,
       CAST(coalesce(a.sbits, 0) AS BIGINT) AS sum_bits,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(floor((a.sppm * 1.0) / a.n) AS BIGINT) END AS mean_prob_ppm,
       CASE WHEN coalesce(a.n, 0) > 0
            THEN CAST(floor((100.0 * a.sbits) / a.n) AS BIGINT) END AS avg_bits_x100
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ------------------------- CCNet head/middle/tail perplexity buckets
CCNET_BUCKET_WIDTH = 25.0
CCNET_QS = [1.0 / 3.0, 2.0 / 3.0]


def q_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet's ACTUAL selection mechanism (Wenzek et al. 2020 §4.4):
    per-language perplexity TERCILES assign every document to a head /
    middle / tail bucket (downstream corpora keep head+middle), instead
    of the fixed threshold the v4/v5 pipelines gate on. Composition
    (operators/lm_score.py:ppl_buckets): KN trigram scoring -> per-lang
    hist_build/hist_quantiles tercile cuts (the mergeable deterministic
    sketch, one-bucket-width accuracy) -> bucket assignment — verified
    against ONE composed DuckDB oracle."""
    docs = _docs(spark, sf)
    model = lm_score.train_kn_trigram_lm(docs.filter(F.col("lang") == "en"))
    return lm_score.ppl_buckets(
        docs, model, group_col="lang", width=CCNET_BUCKET_WIDTH
    )


def _sql_ccnet_assign_ctes() -> str:
    """The KN-score -> per-lang tercile -> bucket-assignment chain as
    CTEs ending in ``assigned`` — shared by the buckets oracle and the
    bucket-sampling oracle."""
    w = repr(CCNET_BUCKET_WIDTH)
    qlist = ", ".join(f"'{q!r}'::DOUBLE" for q in CCNET_QS)
    return (
        _SQL_KN_CTES
        + f""",
score AS (
  SELECT d.doc_id, d.lang,
         CAST(floor((100.0 * a.sbits) / a.n) AS BIGINT) AS avg_bits_x100
  FROM documents d JOIN agg a USING (doc_id) WHERE a.n > 0
),
hist AS (
  SELECT lang, CAST(floor(avg_bits_x100 / {w}) AS BIGINT) AS bucket,
         count(*) AS n
  FROM score GROUP BY 1, 2
),
hc AS (
  SELECT lang, bucket, n,
         CAST(sum(n) OVER (PARTITION BY lang ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_rows
  FROM hist
),
hq AS (SELECT hc.*, q FROM hc, (SELECT unnest([{qlist}]) AS q)),
cand AS (
  SELECT *, greatest(CAST(1 AS BIGINT),
                     CAST(ceil(q * CAST(n_rows AS DOUBLE)) AS BIGINT)) AS r
  FROM hq
),
pick AS (
  SELECT lang, q, min(bucket) AS bucket
  FROM cand WHERE cum >= r GROUP BY 1, 2
),
est AS (
  SELECT p.lang, p.q,
         CAST(a.bucket AS DOUBLE) * {w}
           + {w} * (CAST(a.r - (a.cum - a.n) AS DOUBLE) / CAST(a.n AS DOUBLE))
           AS est_quantile
  FROM pick p
  JOIN cand a ON a.lang = p.lang AND a.q = p.q AND a.bucket = p.bucket
),
cuts AS (
  SELECT lang,
         min(CASE WHEN q < 0.5 THEN est_quantile END) AS t_head,
         min(CASE WHEN q >= 0.5 THEN est_quantile END) AS t_middle
  FROM est GROUP BY 1
),
assigned AS (
  SELECT s.doc_id, s.lang, s.avg_bits_x100,
         CASE WHEN s.avg_bits_x100 <= c.t_head THEN 'head'
              WHEN s.avg_bits_x100 <= c.t_middle THEN 'middle'
              ELSE 'tail' END AS ppl_bucket
  FROM score s JOIN cuts c USING (lang)
)
"""
    )


def _sql_ccnet_buckets() -> str:
    return _sql_ccnet_assign_ctes() + "SELECT * FROM assigned"


# CCNet keep-head / SAMPLE-middle / drop-tail selection rates
CCNET_SAMPLE_RATES = {"head": 1.0, "middle": 0.5, "tail": 0.1}


def q_ccnet_sample(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet selection with per-bucket SAMPLING (operators/lm_score.py:
    ppl_bucket_sample): keep the head fully, sample the middle at 50%,
    keep a 10% tail slice (some pipelines keep a hard-example sliver
    rather than dropping the tail outright). Membership is the
    deterministic hash-threshold discipline (operators/sampling.py) —
    a pure function of doc_id, reproducible across partitionings and
    engines — composed over the tercile assignment."""
    docs = _docs(spark, sf)
    model = lm_score.train_kn_trigram_lm(docs.filter(F.col("lang") == "en"))
    return lm_score.ppl_bucket_sample(
        docs.select("doc_id", "text", "lang"),
        model,
        rates=CCNET_SAMPLE_RATES,
        width=CCNET_BUCKET_WIDTH,
    ).select("doc_id", "lang", "ppl_bucket")


def _sql_ccnet_sample() -> str:
    from ..operators.sampling import sql_stratified_sample

    inner = sql_stratified_sample(
        "assigned", CCNET_SAMPLE_RATES, "ppl_bucket", "doc_id"
    )
    return (
        _sql_ccnet_assign_ctes()
        + f"SELECT doc_id, lang, ppl_bucket FROM ({inner})"
    )



# ------------------------------------ Moore-Lewis contrastive selection
ML_MAX_DELTA_X100 = 0


def q_moore_lewis(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-entropy difference selection (operators/lm_score.py
    moore_lewis_scores — Moore & Lewis 2010): per-doc surprisal under
    the in-domain ('en'-trained) bigram LM MINUS surprisal under the
    general (all-docs-trained) LM, kept when the delta favors the
    domain. Both pyramids are the add-one bigram machinery of
    q_lm_score; the oracle replays them side by side and differences
    the same quantized integers."""
    docs = _docs(spark, sf)
    return lm_score.moore_lewis_scores(
        docs, F.col("lang") == "en", ML_MAX_DELTA_X100
    )


def _sql_moore_lewis() -> str:
    def pyramid(p: str, where: str) -> str:
        return f"""{p}model AS (SELECT w1, w2, count(*) AS c12 FROM bg {where} GROUP BY 1, 2),
{p}ctx AS (SELECT w1, sum(c12) AS c1 FROM {p}model GROUP BY 1),
{p}voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM toks {where})
),
{p}per AS (
  SELECT bg.doc_id,
         CAST(length(bin(CAST(floor(((coalesce({p}ctx.c1, 0) + v) * 1.0)
                                    / (coalesce({p}model.c12, 0) + 1)) AS BIGINT)))
              - 1 AS BIGINT) AS bits
  FROM bg LEFT JOIN {p}model USING (w1, w2)
          LEFT JOIN {p}ctx USING (w1), {p}voc
),
{p}agg AS (SELECT doc_id, count(*) AS n, sum(bits) AS sbits FROM {p}per GROUP BY 1)"""

    return f"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
bg AS (
  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2
  FROM toks, unnest(generate_series(0, len(t)-2)) AS u(i)
  WHERE len(t) >= 2
),
{pyramid('i', "WHERE lang = 'en'")},
{pyramid('g', '')}
SELECT d.doc_id,
       CAST(coalesce(ia.n, 0) AS BIGINT) AS n_bigrams,
       CASE WHEN coalesce(ia.n, 0) > 0
            THEN CAST(floor((100.0 * ia.sbits) / ia.n) AS BIGINT) END
         AS bits_in_x100,
       CASE WHEN coalesce(ga.n, 0) > 0
            THEN CAST(floor((100.0 * ga.sbits) / ga.n) AS BIGINT) END
         AS bits_gen_x100,
       CASE WHEN coalesce(ia.n, 0) > 0
            THEN CAST(floor((100.0 * ia.sbits) / ia.n) AS BIGINT)
                 - CAST(floor((100.0 * ga.sbits) / ga.n) AS BIGINT) END
         AS delta_x100,
       CASE WHEN coalesce(ia.n, 0) > 0
            THEN (CAST(floor((100.0 * ia.sbits) / ia.n) AS BIGINT)
                  - CAST(floor((100.0 * ga.sbits) / ga.n) AS BIGINT))
                 <= {ML_MAX_DELTA_X100} END AS kept
FROM documents d
LEFT JOIN iagg ia USING (doc_id)
LEFT JOIN gagg ga USING (doc_id)
"""


SQL_MOORE_LEWIS = _sql_moore_lewis()


# ------------------------------------- Gopher-faithful filter front
def q_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher quality rule set (Rae et al. 2021 A1.1,
    operators/gopher.py) with the paper's thresholds, one boolean per
    rule + the keep conjunction, on the relined corpus (the line rules
    need the line structure the reline transform restores)."""
    from ..operators.gopher import gopher_quality_flags

    d = _docs(spark, sf).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
    )
    return gopher_quality_flags(d)


def q_gopher_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """The 13 Gopher repetition metrics (dup line/paragraph fractions
    + char fractions, top 2-4-gram char fractions, dup 5-10-gram char
    fractions) as exact integer pairs with the paper's thresholds —
    long format (doc_id, metric, numer, denom, ok)."""
    from ..operators.gopher import gopher_repetition_stats

    d = _docs(spark, sf).select(
        "doc_id",
        F.regexp_replace("text", _RELINE_PAT, "$1\n").alias("text"),
    )
    return gopher_repetition_stats(d)


def _sql_gopher_quality() -> str:
    from ..operators.gopher import GOPHER_STOPWORDS, WORD_MAX, WORD_MIN

    stop = " + ".join(
        f"(CASE WHEN list_contains(lw, '{s}') THEN 1 ELSE 0 END)"
        for s in GOPHER_STOPWORDS
    )
    return rf"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(text, '{_RELINE_PAT}', '\1' || chr(10), 'g') AS text
  FROM documents
),
m AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\s+') AS w,
         list_transform(string_split_regex(trim(text), '\s+'),
                        x -> lower(x)) AS lw,
         string_split(text, chr(10)) AS lines
  FROM d
),
c AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
           AS sum_chars,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS n_alpha,
         CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS n_hash,
         CAST(len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS n_ell,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines,
              l -> regexp_matches(trim(l), '^[•*-]'))) AS BIGINT) AS n_bullet,
         CAST(len(list_filter(lines,
              l -> regexp_matches(l, '\.\.\.$'))) AS BIGINT) AS n_ellend,
         CAST({stop} AS BIGINT) AS n_stop
  FROM m
)
SELECT doc_id,
       n_words >= {WORD_MIN} AND n_words <= {WORD_MAX} AS ok_word_count,
       3 * n_words <= sum_chars AND sum_chars <= 10 * n_words
         AS ok_mean_word_len,
       10 * n_hash <= n_words AND 10 * n_ell <= n_words AS ok_symbol_ratio,
       10 * n_bullet <= 9 * n_lines AS ok_bullet_lines,
       10 * n_ellend <= 3 * n_lines AS ok_ellipsis_lines,
       5 * n_alpha >= 4 * n_words AS ok_alpha_words,
       n_stop >= 2 AS ok_stop_words,
       (n_words >= {WORD_MIN} AND n_words <= {WORD_MAX})
         AND (3 * n_words <= sum_chars AND sum_chars <= 10 * n_words)
         AND (10 * n_hash <= n_words AND 10 * n_ell <= n_words)
         AND (10 * n_bullet <= 9 * n_lines)
         AND (10 * n_ellend <= 3 * n_lines)
         AND (5 * n_alpha >= 4 * n_words)
         AND (n_stop >= 2) AS keep
FROM c
"""


def _sql_gopher_repetition() -> str:
    from ..operators.gopher import (
        DUP_CHAR_THR_X100,
        DUP_NGRAM_THR_X100,
        DUP_UNIT_THR_X100,
        TOP_NGRAM_THR_X100,
    )

    rows = [
        ("dup_line_frac", "line", "dup_units", "n_units",
         DUP_UNIT_THR_X100, False),
        ("dup_line_char_frac", "line", "dup_chars", None,
         DUP_CHAR_THR_X100, True),
        ("dup_para_frac", "para", "dup_units", "n_units",
         DUP_UNIT_THR_X100, False),
        ("dup_para_char_frac", "para", "dup_chars", None,
         DUP_CHAR_THR_X100, True),
    ] + [
        (f"top_ngram_char_{n}", f"g{n}", "top_chars", None, t, True)
        for n, t in TOP_NGRAM_THR_X100.items()
    ] + [
        (f"dup_ngram_char_{n}", f"g{n}", "dup_chars", None, t, True)
        for n, t in DUP_NGRAM_THR_X100.items()
    ]
    sel = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, '{name}' AS metric, {numer} AS numer, "
        f"{udenom if udenom else 'CAST(NULL AS BIGINT)'} AS udenom "
        f"FROM a WHERE kind = '{kind}'"
        for name, kind, numer, udenom, _thr, _c in rows
    )
    vals = ",\n              ".join(
        f"('{name}', {thr}, {'TRUE' if is_char else 'FALSE'})"
        for name, _k, _n, _u, thr, is_char in rows
    )
    ns = sorted(list(TOP_NGRAM_THR_X100) + list(DUP_NGRAM_THR_X100))
    return rf"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(text, '{_RELINE_PAT}', '\1' || chr(10), 'g') AS text
  FROM documents
),
units AS (
  SELECT doc_id, 'line' AS kind, unnest(string_split(text, chr(10))) AS unit
  FROM d
  UNION ALL
  SELECT doc_id, 'para', unnest(string_split(text, chr(10) || chr(10)))
  FROM d
  UNION ALL
  SELECT doc_id, 'g' || CAST(n AS VARCHAR) AS kind,
         array_to_string(t[u.i:u.i+n-1], ' ') AS unit
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM d),
       unnest([{", ".join(map(str, ns))}]) AS nn(n),
       unnest(generate_series(1, len(t) - n + 1)) AS u(i)
  WHERE len(t) >= n
),
g AS (
  SELECT doc_id, kind, unit, CAST(count(*) AS BIGINT) AS cnt
  FROM units GROUP BY 1, 2, 3
),
a AS MATERIALIZED (
  SELECT doc_id, kind,
         CAST(sum(cnt) AS BIGINT) AS n_units,
         CAST(sum(CASE WHEN cnt >= 2 THEN cnt - 1 ELSE 0 END) AS BIGINT)
           AS dup_units,
         CAST(sum(CASE WHEN cnt >= 2 THEN (cnt - 1) * length(unit)
                       ELSE 0 END) AS BIGINT) AS dup_chars,
         CAST((max(struct_pack(c := cnt, u := unit,
                               ch := cnt * length(unit)))).ch AS BIGINT)
           AS top_chars
  FROM g GROUP BY 1, 2
),
mrows AS (
{sel}
),
grid AS (
  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS doc_chars,
         v.metric, v.thr, v.is_char
  FROM d, (VALUES {vals}) AS v(metric, thr, is_char)
)
SELECT grid.doc_id, grid.metric,
       CAST(COALESCE(r.numer, 0) AS BIGINT) AS numer,
       CAST(CASE WHEN grid.is_char THEN grid.doc_chars
                 ELSE COALESCE(r.udenom, 0) END AS BIGINT) AS denom,
       COALESCE(r.numer, 0) * 100
         <= (CASE WHEN grid.is_char THEN grid.doc_chars
                  ELSE COALESCE(r.udenom, 0) END) * grid.thr AS ok
FROM grid LEFT JOIN mrows r USING (doc_id, metric)
"""


SQL_GOPHER_QUALITY = _sql_gopher_quality()
SQL_GOPHER_REPETITION = _sql_gopher_repetition()


QUERIES = {
    "q_gopher_quality": q_gopher_quality,
    "q_gopher_repetition": q_gopher_repetition,
    "q_url_dedup": q_url_dedup,
    "q_token_budget": q_token_budget,
    "q_balanced_shards": q_balanced_shards,
    "q_mixture_weights": q_mixture_weights,
    "q_temperature_mixture": q_temperature_mixture,
    "q_unimax_weights": q_unimax_weights,
    "q_unimax_delta": q_unimax_delta,
    "q_line_dedup": q_line_dedup,
    "q_importance_weights": q_importance_weights,
    "q_importance_bigram": q_importance_bigram,
    "q_corpus_pipeline_v2": q_corpus_pipeline_v2,
    "q_corpus_pipeline_v3": q_corpus_pipeline_v3,
    "q_corpus_pipeline_v4": q_corpus_pipeline_v4,
    "q_corpus_pipeline_delta": q_corpus_pipeline_delta,
    "q_corpus_pipeline_v5": q_corpus_pipeline_v5,
    "q_corpus_pipeline_v6": q_corpus_pipeline_v6,
    "q_corpus_pipeline_v7": q_corpus_pipeline_v7,
    "q_corpus_pipeline_v8": q_corpus_pipeline_v8,
    "q_lm_score": q_lm_score,
    "q_lm_score3": q_lm_score3,
    "q_lm_score_kn": q_lm_score_kn,
    "q_lm_score_kn_full": q_lm_score_kn_full,
    "q_ccnet_buckets": q_ccnet_buckets,
    "q_ccnet_sample": q_ccnet_sample,
    "q_moore_lewis": q_moore_lewis,
}

ORACLES = {
    "q_gopher_quality": SQL_GOPHER_QUALITY,
    "q_gopher_repetition": SQL_GOPHER_REPETITION,
    "q_moore_lewis": SQL_MOORE_LEWIS,
    "q_url_dedup": SQL_URL_DEDUP,
    "q_token_budget": _sql_token_budget(),
    "q_balanced_shards": _sql_balanced_shards(),
    "q_mixture_weights": _sql_mixture_weights(),
    "q_temperature_mixture": SQL_TEMPERATURE_MIXTURE,
    "q_unimax_weights": SQL_UNIMAX_WEIGHTS,
    # fold == rebuild exactly (token counts are a monoid), so the
    # oracle is the full-rebuild statement verbatim
    "q_unimax_delta": SQL_UNIMAX_WEIGHTS,
    "q_line_dedup": SQL_LINE_DEDUP,
    "q_importance_weights": SQL_IMPORTANCE_WEIGHTS,
    "q_importance_bigram": SQL_IMPORTANCE_BIGRAM,
    "q_corpus_pipeline_v2": _sql_corpus_pipeline_v2(),
    "q_corpus_pipeline_v3": _sql_corpus_pipeline_v3(),
    "q_corpus_pipeline_v4": _sql_corpus_pipeline_v4(),
    "q_corpus_pipeline_delta": _sql_corpus_pipeline_delta(),
    "q_corpus_pipeline_v5": _sql_corpus_pipeline_v4(lm_order=3),
    "q_corpus_pipeline_v6": _sql_corpus_pipeline_v4(lm_order="kn"),
    "q_corpus_pipeline_v7": _sql_corpus_pipeline_v4(lm_order="kn", clf_gate="trained"),
    "q_corpus_pipeline_v8": _sql_corpus_pipeline_v4(
        lm_order="kn", clf_gate="trained", decon=True),
    "q_lm_score": SQL_LM_SCORE,
    "q_lm_score3": SQL_LM_SCORE3,
    "q_lm_score_kn": SQL_LM_SCORE_KN,
    "q_lm_score_kn_full": SQL_LM_SCORE_KN_FULL,
    "q_ccnet_buckets": _sql_ccnet_buckets(),
    "q_ccnet_sample": _sql_ccnet_sample(),
}
