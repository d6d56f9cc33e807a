"""Privacy + domain-policy contract queries: PII redaction apply
(operators/privacy.py) and the RefinedWeb-style URL/domain filtering
front (operators/curation.py url_host / domain_stats / blocklist_filter
/ url_word_score), each with a mirrored DuckDB oracle.

Fixture note: the ``documents`` table carries no URLs and no PII, so —
the q_url_dedup convention — each query synthesizes its fixture column
with ONE expression evaluated identically in Spark and DuckDB (doc_id /
source arithmetic only), so the oracle checks the operator, not the
fixture. PII docs where ``doc_id % 4 == 0`` get NO planted PII (the
zero-count rows a redactor must pass through untouched); URL variants
``doc_id % 5`` cover exact-match block, subdomain block, an INFIX
blocklist string that must NOT block (suffix semantics), a clean host,
and a scheme/port/userinfo-noise exact block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import (
    blocklist_filter,
    domain_stats,
    url_host,
    url_word_score,
)
from ..operators.privacy import PII_PATTERNS, pii_redact
from ..sources.tables import load_table

# shared with operators/curation.py url_host — dialect-neutral (Java
# regex and RE2 agree: no backrefs, no lookaround, (?:) supported)
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#]*@)?([^/:?#]+)"

BLOCKLIST = ("spam-domain.com", "ads.example.net", "tracker2.example.com")
FLAG_WORDS = ("ads", "banner", "spam", "tracker")


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


# ------------------------------------------------------------- PII redact
def _pii_text() -> F.Column:
    """text ++ a planted PII tail (email + mixed-case URL + long digit
    run) for 3 of every 4 docs; doc_id % 4 == 0 stays clean."""
    return F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("")).otherwise(
            F.concat(
                F.lit(" Contact user"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit(".name@mail-"),
                F.col("source"),
                F.lit(".example.com or visit https://Mirror-"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example.org/path?id="),
                F.col("doc_id").cast("string"),
                F.lit(" ref "),
                (F.lit(900000000) + F.col("doc_id") * 13).cast("string"),
            )
        ),
    )


def q_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction APPLY (operators/privacy.py pii_redact): typed
    placeholders in fixed order (URL, then email, then long digit
    runs), per-type apply-side counts. Pure column expressions — one
    linear scan per pattern, no shuffle."""
    d = _docs(spark, sf).select("doc_id", _pii_text().alias("text"))
    return pii_redact(d)


def _sql_pii_redact() -> str:
    base = """
SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 THEN '' ELSE
  ' Contact user' || CAST(doc_id % 50 AS VARCHAR) || '.name@mail-' ||
  source || '.example.com or visit https://Mirror-' ||
  CAST(doc_id % 7 AS VARCHAR) || '.example.org/path?id=' ||
  CAST(doc_id AS VARCHAR) || ' ref ' ||
  CAST(900000000 + doc_id * 13 AS VARCHAR) END AS t
FROM documents"""
    parts = [f"WITH s0 AS ({base})"]
    cols = []
    for i, (name, rx, ph) in enumerate(PII_PATTERNS, start=1):
        cols.append(f"n_{name}")
        passthrough = ", ".join(cols[:-1])
        passthrough = (passthrough + ", ") if passthrough else ""
        parts.append(
            f""",
s{i} AS (
  SELECT doc_id, {passthrough}
         CAST(len(regexp_extract_all(t, '{rx}')) AS INT) AS n_{name},
         regexp_replace(t, '{rx}', '{ph}', 'g') AS t
  FROM s{i - 1}
)"""
        )
    parts.append(
        f"""
SELECT doc_id, {', '.join(cols)}, t AS redacted FROM s{len(PII_PATTERNS)}"""
    )
    return "".join(parts)


SQL_PII_REDACT = _sql_pii_redact()


# --------------------------------------------------------- domain filtering
def _url_expr() -> F.Column:
    n = (F.col("doc_id") % 1000).cast("string")
    m = (F.col("doc_id") % 3).cast("string")
    v = F.col("doc_id") % 5
    return (
        F.when(
            v == 0,
            F.concat(
                F.lit("https://user:pw@Ads.Example.NET:443/banner?id="), n
            ),
        )
        .when(
            v == 1,
            F.concat(F.lit("https://sub"), m, F.lit(".ads.example.net/p/"), n),
        )
        .when(
            v == 2,
            F.concat(F.lit("https://www.spam-domain.com.evil.org/"), n),
        )
        .when(v == 3, F.concat(F.lit("https://news.example.com/a/"), n))
        .otherwise(
            F.concat(F.lit("http://spam-domain.com/"), n, F.lit("?x=1"))
        )
    )


_SQL_URLS = """
SELECT doc_id, CASE
  WHEN doc_id % 5 = 0 THEN
    'https://user:pw@Ads.Example.NET:443/banner?id=' ||
    CAST(doc_id % 1000 AS VARCHAR)
  WHEN doc_id % 5 = 1 THEN
    'https://sub' || CAST(doc_id % 3 AS VARCHAR) ||
    '.ads.example.net/p/' || CAST(doc_id % 1000 AS VARCHAR)
  WHEN doc_id % 5 = 2 THEN
    'https://www.spam-domain.com.evil.org/' ||
    CAST(doc_id % 1000 AS VARCHAR)
  WHEN doc_id % 5 = 3 THEN
    'https://news.example.com/a/' || CAST(doc_id % 1000 AS VARCHAR)
  ELSE 'http://spam-domain.com/' || CAST(doc_id % 1000 AS VARCHAR) || '?x=1'
  END AS url
FROM documents"""

_SQL_HOST = f"lower(regexp_extract(url, '{HOST_RE}', 1))"


def q_domain_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-host corpus profile (operators/curation.py domain_stats):
    doc count + integer-exact corpus share in basis points — the triage
    table a domain-filter policy is written against."""
    d = _docs(spark, sf).select("doc_id", _url_expr().alias("url"))
    return domain_stats(d)


SQL_DOMAIN_STATS = f"""
WITH urls AS ({_SQL_URLS}),
per AS (
  SELECT {_SQL_HOST} AS host, CAST(count(*) AS BIGINT) AS n_docs
  FROM urls GROUP BY 1
)
SELECT host, n_docs,
       CAST((10000 * n_docs) // (SELECT SUM(n_docs) FROM per) AS BIGINT)
         AS share_bp
FROM per
"""


def q_blocklist_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Suffix-chain domain blocking (operators/curation.py
    blocklist_filter): survivors after dropping hosts equal to or under
    any blocklist entry. The infix variant (spam-domain.com.evil.org)
    MUST survive — suffix semantics, not substring."""
    d = _docs(spark, sf).select("doc_id", _url_expr().alias("url"))
    bl = spark.createDataFrame(
        [(b,) for b in BLOCKLIST], "domain string"
    )
    return blocklist_filter(d, bl)


SQL_BLOCKLIST_FILTER = f"""
WITH urls AS ({_SQL_URLS}),
hosts AS (SELECT doc_id, url, {_SQL_HOST} AS host FROM urls),
sfx AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(
             greatest(len(string_split(host, '.')) - 7, 1),
             len(string_split(host, '.'))),
           i -> array_to_string(
             list_slice(string_split(host, '.'), i,
                        len(string_split(host, '.'))), '.'))) AS sfx
  FROM hosts
),
doomed AS (
  SELECT DISTINCT s.doc_id
  FROM sfx s
  JOIN (VALUES {', '.join(f"('{b}')" for b in BLOCKLIST)}) b(domain)
    ON s.sfx = lower(b.domain)
)
SELECT u.doc_id, u.url
FROM urls u LEFT JOIN doomed d ON u.doc_id = d.doc_id
WHERE d.doc_id IS NULL
"""


def q_url_word_score(spark: SparkSession, sf: str) -> DataFrame:
    """RefinedWeb's soft URL signal (operators/curation.py
    url_word_score): flagged-fragment count per URL plus the >= 2
    hard-drop flag — a bounded expression, no join."""
    d = _docs(spark, sf).select("doc_id", _url_expr().alias("url"))
    score = url_word_score("url", list(FLAG_WORDS))
    return d.select(
        "doc_id",
        score.alias("u_score"),
        (score >= 2).alias("flagged"),
    )


SQL_URL_WORD_SCORE = f"""
WITH urls AS ({_SQL_URLS})
SELECT doc_id,
       ({' + '.join(
           f"CASE WHEN contains(lower(url), '{w}') THEN 1 ELSE 0 END"
           for w in FLAG_WORDS)}) AS u_score,
       ({' + '.join(
           f"CASE WHEN contains(lower(url), '{w}') THEN 1 ELSE 0 END"
           for w in FLAG_WORDS)}) >= 2 AS flagged
FROM urls
"""


QUERIES = {
    "q_pii_redact": q_pii_redact,
    "q_domain_stats": q_domain_stats,
    "q_blocklist_filter": q_blocklist_filter,
    "q_url_word_score": q_url_word_score,
}

ORACLES = {
    "q_pii_redact": SQL_PII_REDACT,
    "q_domain_stats": SQL_DOMAIN_STATS,
    "q_blocklist_filter": SQL_BLOCKLIST_FILTER,
    "q_url_word_score": SQL_URL_WORD_SCORE,
}


# -------------------------------------------------- content word screen
# policy list with real fixture hits (slow/batch/scan occur in the word
# soup) plus a never-hits entry (exercises the unmatched-list path) and
# a mixed-case entry (matching is lowercased both sides)
CONTENT_FLAG_WORDS = ("slow", "batch", "Scan", "zzz-never-present")


def q_flagged_words(spark: SparkSession, sf: str) -> DataFrame:
    """Content-level flagged-word screen (operators/curation.py
    flagged_word_stats — the C4/RefinedWeb wordlist filter on document
    TEXT): per-doc policy-word hits + integer density in basis points.
    The wordlist is a joined frame (policy data, not code), so the plan
    is one explode + one bounded semi-join + one doc-keyed agg."""
    d = _docs(spark, sf)
    wl = spark.createDataFrame(
        [(w,) for w in CONTENT_FLAG_WORDS], "word string"
    )
    from ..operators.curation import flagged_word_stats

    return flagged_word_stats(d, wl)


SQL_FLAGGED_WORDS = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     x -> x != '') AS t
  FROM documents
),
wl AS (
  SELECT DISTINCT lower(word) AS w
  FROM (VALUES {', '.join(f"('{w}')" for w in CONTENT_FLAG_WORDS)}) v(word)
),
hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN (SELECT w FROM wl)
  GROUP BY 1
)
SELECT toks.doc_id,
       CAST(len(toks.t) AS BIGINT) AS n_tokens,
       COALESCE(hits.n_flagged, 0) AS n_flagged,
       CAST(CASE WHEN len(toks.t) > 0
                 THEN (10000 * COALESCE(hits.n_flagged, 0)) // len(toks.t)
                 ELSE 0 END AS BIGINT) AS density_bp
FROM toks LEFT JOIN hits USING (doc_id)
"""


# -------------------------------------------- incremental domain stats
def q_domain_stats_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental domain stats (operators/curation.py
    domain_stats_delta — the incremental-index discipline on the
    domain-filter front): the 80% standing corpus publishes its
    (host, n_docs) table, the 20% delta batch folds in, and the result
    must equal the full rebuild over the union — which is exactly what
    the oracle computes."""
    from ..operators.curation import domain_stats, domain_stats_delta

    d = _docs(spark, sf).select("doc_id", _url_expr().alias("url"))
    standing = domain_stats(d.filter(F.col("doc_id") % 10 < 8))
    return domain_stats_delta(standing, d.filter(F.col("doc_id") % 10 >= 8))


SQL_DOMAIN_STATS_DELTA = f"""
WITH urls AS ({_SQL_URLS}),
per AS (
  SELECT {_SQL_HOST} AS host, CAST(count(*) AS BIGINT) AS n_docs
  FROM urls GROUP BY 1
)
SELECT host, n_docs,
       CAST((10000 * n_docs) // (SELECT SUM(n_docs) FROM per) AS BIGINT)
         AS share_bp
FROM per
"""

QUERIES.update(
    {
        "q_flagged_words": q_flagged_words,
        "q_domain_stats_delta": q_domain_stats_delta,
    }
)
ORACLES.update(
    {
        "q_flagged_words": SQL_FLAGGED_WORDS,
        "q_domain_stats_delta": SQL_DOMAIN_STATS_DELTA,
    }
)


# ------------------------------------------------------ corpus profile
def q_corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """One-row corpus profile — the first query anyone runs on a new
    crawl before any curation decision: doc/token/byte totals, language
    mix (en share in integer basis points), exact-duplicate pressure
    (docs minus distinct normalized fingerprints — operators/text.py
    fingerprint's md5-of-normalized-text), and mean doc length. All
    integer-exact (div, basis points), so the profile is comparable
    across engines and runs. One corpus pass: a single hash-agg with
    map-side partials plus the fingerprint-distinct count."""
    from ..operators.text import fingerprint

    d = _docs(spark, sf)
    toks = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    )
    base = d.select(
        "doc_id",
        "lang",
        toks.cast("bigint").alias("_nt"),
        F.octet_length("text").cast("bigint").alias("_nb"),
    )
    fp = fingerprint(d.select("doc_id", "text"))
    agg = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.sum("_nb").alias("n_bytes"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_en"),
    )
    ndup = fp.agg(
        (F.count(F.lit(1)) - F.count_distinct("fp_md5"))
        .cast("bigint")
        .alias("n_exact_dups")
    )
    return agg.join(F.broadcast(ndup)).select(
        "n_docs",
        "n_tokens",
        "n_bytes",
        "n_langs",
        F.expr("(10000 * n_en) div n_docs").cast("bigint").alias(
            "en_share_bp"
        ),
        F.expr("n_tokens div n_docs").cast("bigint").alias(
            "mean_doc_tokens"
        ),
        "n_exact_dups",
    )


SQL_CORPUS_REPORT = """
WITH base AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x != '')) AS BIGINT) AS nt,
         CAST(strlen(text) AS BIGINT) AS nb,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(nb) AS BIGINT) AS n_bytes,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST((10000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS en_share_bp,
       CAST(sum(nt) // count(*) AS BIGINT) AS mean_doc_tokens,
       CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
FROM base
"""

QUERIES["q_corpus_report"] = q_corpus_report
ORACLES["q_corpus_report"] = SQL_CORPUS_REPORT
