"""Round-12 contract queries: the C4-faithful filter front
(operators/c4.py — VERDICT r11 item #1).

Fixture note (the _RELINE_PAT precedent, one level further): the
synthetic documents corpus is a punctuation-free word soup — no
periods, braces, or web boilerplate — so C4's rules would be vacuous
(terminal punctuation drops every line; the trigger phrases never
occur). The queries therefore first apply a deterministic WEBIFY
transform that restores exactly the features C4's rules inspect:

1. reline: break after every 8th token (the existing _RELINE_PAT);
2. terminal punctuation: append '.' to every line whose length is not
   divisible by 3 (a text-derived rule, ~2/3 of lines — so the
   terminal-punct rule keeps a real, doc-varying subset);
3. trigger lines keyed on doc_id residues (each isolates ONE rule):
   javascript banner (%13==3), "lorem ipsum" (%17==5), curly-brace
   code line (%19==7), bad-word line (%23==11), cookie/privacy policy
   line (%29==13);
4. shared 4-sentence boilerplate block (%7==2) — the cross-document
   duplicated three-sentence spans the span dedup must cut.

The transform is pure column arithmetic, implemented identically in
the Spark query and the DuckDB oracle (both committed here), so the
oracle comparison still value-checks the OPERATOR, not the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.c4 import (
    C4_CITATION_PAT,
    C4_POLICY_PHRASES,
    C4_SENT_EXTRACT_PAT,
    C4_SENT_PAT,
    C4_TERMINAL_PAT,
    MIN_SENTENCES,
    MIN_WORDS_PER_LINE,
    c4_apply,
    c4_quality_flags,
    c4_span_dedup,
)
from .curation_ops import _RELINE_PAT, _docs

# the bad-words list is DATA (a frame at runtime); the fixture list has
# exactly one planted hit plus a never-occurring entry (unmatched path)
C4_FLAG_WORDS = ("badword", "verbotenword")
WEB_JS_LINE = "enable javascript to view this page."
WEB_LOREM_LINE = "lorem ipsum dolor sit amet."
WEB_BRACE_LINE = "function f() { return 1 }"
WEB_BAD_LINE = "that badword should never appear here."
WEB_POLICY_LINE = "we use cookies and a privacy policy."
WEB_BOILER = (
    "share this page with friends.",
    "follow us on the network.",
    "thanks for reading our words.",
    "subscribe for more content today.",
)
_WEB_TRIGGERS = (
    (7, 2, "\n".join(WEB_BOILER)),
    (13, 3, WEB_JS_LINE),
    (17, 5, WEB_LOREM_LINE),
    (19, 7, WEB_BRACE_LINE),
    (23, 11, WEB_BAD_LINE),
    (29, 13, WEB_POLICY_LINE),
)


def _webified(spark: SparkSession, sf: str) -> DataFrame:
    relined = F.regexp_replace("text", _RELINE_PAT, "$1\n")
    dotted = F.array_join(
        F.transform(
            F.split(relined, "\n"),
            lambda l: F.when(
                F.length(l) % 3 != 0, F.concat(l, F.lit("."))
            ).otherwise(l),
        ),
        "\n",
    )
    t = dotted
    for mod, rem, block in _WEB_TRIGGERS:
        t = F.when(
            F.col("doc_id") % mod == rem, F.concat(t, F.lit("\n" + block))
        ).otherwise(t)
    return _docs(spark, sf).select("doc_id", t.alias("text"))


def _sql_webified() -> str:
    cases = "\n         ".join(
        "|| CASE WHEN doc_id % {m} = {r} THEN chr(10) || {block}"
        " ELSE '' END".format(
            m=mod,
            r=rem,
            block=" || chr(10) || ".join(
                "'" + ln + "'" for ln in block.split("\n")
            ),
        )
        for mod, rem, block in _WEB_TRIGGERS
    )
    return (
        """
  SELECT doc_id,
         dotted
         """
        + cases
        + """ AS text
  FROM (
    SELECT doc_id,
           array_to_string(list_transform(
             string_split(regexp_replace(text, '"""
        + _RELINE_PAT
        + r"""', '\1' || chr(10), 'g'), chr(10)),
             l -> CASE WHEN length(l) % 3 <> 0 THEN l || '.' ELSE l END),
             chr(10)) AS dotted
    FROM documents)
"""
    )


def q_c4_quality(spark: SparkSession, sf: str) -> DataFrame:
    """The C4 quality rule set (Raffel et al. 2020 §2.2,
    operators/c4.py): line-filter census (lines kept by the terminal-
    punct / min-words / javascript / policy rules, sentences remaining)
    plus one boolean per page rule and the keep conjunction, on the
    webified corpus (module docstring)."""
    wl = spark.createDataFrame([(w,) for w in C4_FLAG_WORDS], "word string")
    return c4_quality_flags(_webified(spark, sf), flag_words=wl)


def q_c4_apply(spark: SparkSession, sf: str) -> DataFrame:
    """The C4 front APPLIED (operators/c4.py c4_apply): surviving docs
    with their line-filtered text — the frame the next pipeline stage
    consumes."""
    wl = spark.createDataFrame([(w,) for w in C4_FLAG_WORDS], "word string")
    return c4_apply(_webified(spark, sf), flag_words=wl)


def q_c4_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """C4's three-sentence span dedup over the C4-filtered corpus (the
    paper's pipeline order): any 3-sentence run occurring more than
    once keeps its first occurrence (min (doc_id, pos)) and is cut
    everywhere else. The webified boilerplate block (docs with
    doc_id%7==2) is the planted cross-document duplicate family."""
    wl = spark.createDataFrame([(w,) for w in C4_FLAG_WORDS], "word string")
    return c4_span_dedup(c4_apply(_webified(spark, sf), flag_words=wl))


def _sql_line_block() -> str:
    """Shared CTE block: webified corpus -> citation-scrubbed lines ->
    kept lines + page flags. Mirrors operators/c4.py term for term."""
    policy = "\n          ".join(
        f"AND NOT contains(lower(l), '{p}')" for p in C4_POLICY_PHRASES
    )
    return rf"""
WITH w AS ({_sql_webified()}),
cl AS (
  SELECT doc_id, text,
         list_transform(string_split(text, chr(10)),
           l -> trim(regexp_replace(l, '{C4_CITATION_PAT}', '', 'g'))) AS lines
  FROM w
),
k AS MATERIALIZED (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
           regexp_matches(l, '{C4_TERMINAL_PAT}')
           AND len(list_filter(string_split_regex(l, '\s+'),
                               x -> x != '')) >= {MIN_WORDS_PER_LINE}
           AND NOT contains(lower(l), 'javascript')
          {policy}) AS kept
  FROM cl
),
bad AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id,
               lower(unnest(string_split_regex(trim(text), '\s+'))) AS tok
        FROM w)
  WHERE tok IN ({", ".join("'" + x + "'" for x in C4_FLAG_WORDS)})
),
flags AS (
  SELECT k.doc_id,
         CAST(len(string_split(k.text, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(k.kept) AS BIGINT) AS n_kept_lines,
         -- COALESCE: DuckDB's array_to_string([]) is NULL where
         -- Spark's array_join([]) is ''
         CAST(len(regexp_extract_all(
              COALESCE(array_to_string(k.kept, chr(10)), ''),
              '{C4_SENT_PAT}')) AS BIGINT) AS n_sentences,
         NOT contains(lower(k.text), 'lorem ipsum') AS ok_lorem_ipsum,
         NOT contains(k.text, chr(123)) AS ok_curly_brace,
         bad.doc_id IS NULL AS ok_flagged_word,
         COALESCE(array_to_string(k.kept, chr(10)), '') AS kept_text
  FROM k LEFT JOIN bad ON k.doc_id = bad.doc_id
)"""


SQL_C4_QUALITY = (
    _sql_line_block()
    + f"""
SELECT doc_id, n_lines, n_kept_lines, n_sentences, ok_lorem_ipsum,
       ok_curly_brace, ok_flagged_word,
       n_sentences >= {MIN_SENTENCES} AS ok_min_sentences,
       ok_lorem_ipsum AND ok_curly_brace AND ok_flagged_word
         AND n_sentences >= {MIN_SENTENCES} AS keep
FROM flags
"""
)

SQL_C4_APPLY = (
    _sql_line_block()
    + f"""
SELECT doc_id, kept_text AS text
FROM flags
WHERE ok_lorem_ipsum AND ok_curly_brace AND ok_flagged_word
  AND n_sentences >= {MIN_SENTENCES}
"""
)

SQL_C4_SPAN_DEDUP = (
    _sql_line_block()
    + f""",
sd AS (
  SELECT doc_id, kept_text AS text
  FROM flags
  WHERE ok_lorem_ipsum AND ok_curly_brace AND ok_flagged_word
    AND n_sentences >= {MIN_SENTENCES}
),
sarr AS MATERIALIZED (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '{C4_SENT_EXTRACT_PAT}'),
                        s -> trim(s)) AS s
  FROM sd
),
sents AS MATERIALIZED (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, s[u.i] AS sent
  FROM sarr, unnest(generate_series(1, len(s))) AS u(i)
),
spans AS MATERIALIZED (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(s[u.i] || chr(1) || s[u.i + 1] || chr(1) || s[u.i + 2]) AS gkey
  FROM sarr, unnest(generate_series(1, len(s) - 2)) AS u(i)
  WHERE len(s) >= 3
),
stats AS (
  SELECT gkey, count(*) AS n,
         min(struct_pack(d := doc_id, p := pos)) AS first
  FROM spans GROUP BY 1
),
hits AS (
  SELECT s.doc_id, s.pos
  FROM spans s JOIN stats USING (gkey)
  WHERE stats.n > 1
    AND NOT (s.doc_id = (stats.first).d AND s.pos = (stats.first).p)
),
removed AS (
  SELECT DISTINCT doc_id, CAST(u.i AS BIGINT) AS pos
  FROM hits, unnest(generate_series(pos, pos + 2)) AS u(i)
),
kept AS (
  SELECT sents.doc_id, sents.pos, sents.sent
  FROM sents LEFT JOIN removed
    ON sents.doc_id = removed.doc_id AND sents.pos = removed.pos
  WHERE removed.pos IS NULL
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sent FROM sents GROUP BY 1)
SELECT kept.doc_id,
       string_agg(kept.sent, ' ' ORDER BY kept.pos) AS text,
       CAST(tot.n_sent - count(*) AS BIGINT) AS n_removed
FROM kept JOIN tot ON kept.doc_id = tot.doc_id
GROUP BY kept.doc_id, tot.n_sent
"""
)

QUERIES = {
    "q_c4_quality": q_c4_quality,
    "q_c4_apply": q_c4_apply,
    "q_c4_span_dedup": q_c4_span_dedup,
}

ORACLES = {
    "q_c4_quality": SQL_C4_QUALITY,
    "q_c4_apply": SQL_C4_APPLY,
    "q_c4_span_dedup": SQL_C4_SPAN_DEDUP,
}
