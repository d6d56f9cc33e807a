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


def _webified(
    spark: SparkSession, sf: str, extra: tuple[str, ...] = ()
) -> DataFrame:
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
    return _docs(spark, sf).select("doc_id", *extra, t.alias("text"))


def _sql_webified(extra: str = "", where: str = "") -> str:
    """``extra`` carries additional columns through (e.g.
    'lang, source, '); ``where`` filters the source relation (e.g.
    ' WHERE doc_id >= 10' — the v9 chain's benchmark exclusion)."""
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
        f"""
  SELECT doc_id, {extra}
         dotted
         """
        + cases
        + f""" AS text
  FROM (
    SELECT doc_id, {extra}
           array_to_string(list_transform(
             string_split(regexp_replace(text, '"""
        + _RELINE_PAT
        + r"""', '\1' || chr(10), 'g'), chr(10)),
             l -> CASE WHEN length(l) % 3 <> 0 THEN l || '.' ELSE l END),
             chr(10)) AS dotted
    FROM documents"""
        + where
        + """)
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


def q_c4_span_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental C4 span dedup (operators/c4.py c4_span_dedup_delta
    — the substring_index_delta discipline on sentence spans): the
    standing 80% of the C4-filtered corpus publishes its span-key
    index (the frozen artifact); the delta 20% folds against it —
    delta-sized cost, standing text untouched. With the monotone id
    split, fold == the full rebuild restricted to delta ids, which is
    exactly what the oracle computes."""
    from ..operators.c4 import c4_span_dedup_delta, c4_span_index

    wl = spark.createDataFrame([(w,) for w in C4_FLAG_WORDS], "word string")
    applied = c4_apply(_webified(spark, sf), flag_words=wl)
    mx = _docs(spark, sf).agg(F.max("doc_id")).collect()[0][0]
    thr = int(mx) * 4 // 5
    standing = applied.filter(F.col("doc_id") <= thr)
    delta = applied.filter(F.col("doc_id") > thr)
    idx = c4_span_index(standing)
    _folded, result = c4_span_dedup_delta(idx, delta)
    return result


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

def _sql_c4_span_dedup(restrict_delta: bool = False) -> str:
    """The full span-dedup rebuild; ``restrict_delta=True`` emits the
    q_c4_span_delta oracle — the SAME rebuild restricted to delta docs
    (doc_id > max*4//5), which equals the incremental fold because the
    id split is monotone (standing occurrences always win the
    keep-first min, so standing text never changes)."""
    tail = (
        """
 WHERE kept.doc_id > (SELECT (max(doc_id) * 4) // 5 FROM documents)"""
        if restrict_delta
        else ""
    )
    return (
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
FROM kept JOIN tot ON kept.doc_id = tot.doc_id{tail}
GROUP BY kept.doc_id, tot.n_sent
"""
    )


SQL_C4_SPAN_DEDUP = _sql_c4_span_dedup()

# ===================================== v9: FineWeb-shaped rule-front chain
# chain thresholds: Gopher word bounds are the paper's; stop_min is the
# one fixture-scale re-ablation (the synthetic vocabulary carries a
# single Gopher stopword, 'the' — FineWeb §3.1 re-ablates thresholds
# per corpus exactly like this)
V9_GOPHER_WORD_MIN = 50
V9_GOPHER_WORD_MAX = 100_000
V9_GOPHER_STOP_MIN = 1


def q_corpus_pipeline_v9(spark: SparkSession, sf: str) -> DataFrame:
    """The FineWeb-shaped curation chain (plans/corpus.py
    curate_corpus_v9 — VERDICT r11 #2): the v8 decontamination +
    trained-gate chain with the RULE FRONT composed before them:

        raw (webified, benchmark excluded) -> line dedup
          -> Gopher front (7 quality rules + 13 repetition metrics)
          -> C4 front (line rules rewrite, page rules drop)
          -> span decontamination -> trained classifier gate
          -> KN terciles -> SemDeDup -> budget -> shards

    Input is the WEBIFIED corpus (module docstring) — C4's rules need
    the web-text features the raw fixture lacks; the benchmark slice
    (doc_id < 10) is webified identically so the decon gram space
    matches. ONE oracle statement rebuilds the whole chain: webify,
    line dedup, both rule fronts, the decon rebuild, the spliced
    16-round training CTEs, KN terciles, SemDeDup, budget, shards.
    The funnel census gains 'gopher' and 'c4' rows."""
    from ..plans.corpus import (
        _STAGE_ORDER_V9,
        curate_corpus_v4_funnel,
        curate_corpus_v9,
    )
    from ..sources.tables import load_table
    from .curation_ops import (
        CCNET_BUCKET_WIDTH,
        DECON_CHAIN_L,
        LINE_DEDUP_MAX_DOCS,
        V3_BUDGET,
        V3_CLUSTER_TARGET,
        V3_NEARDUP,
        V3_SHARDS,
    )

    web = _webified(spark, sf, extra=("lang", "source"))
    d = web.filter(F.col("doc_id") >= 10)
    bench = web.filter(F.col("doc_id") < 10).select("doc_id", "text")
    emb = load_table(spark, sf, "embeddings")
    wl = spark.createDataFrame([(w,) for w in C4_FLAG_WORDS], "word string")
    raw = _docs(spark, sf)
    stages = curate_corpus_v9(
        d,
        emb,
        bench=bench,
        decon_min_len=DECON_CHAIN_L,
        gopher_word_min=V9_GOPHER_WORD_MIN,
        gopher_word_max=V9_GOPHER_WORD_MAX,
        gopher_stop_min=V9_GOPHER_STOP_MIN,
        c4_flag_words=wl,
        # labeler corpus = benchmark-excluded RAW text (the v8
        # convention: labels come from raw rule scores; the gate then
        # re-featurizes the chain's decontaminated text)
        train_docs=raw.filter(F.col("doc_id") >= 10).select(
            "doc_id", "text"
        ),
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        budget=V3_BUDGET,
        n_shards=V3_SHARDS,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
        bucket_width=CCNET_BUCKET_WIDTH,
    )
    return curate_corpus_v4_funnel(stages, order=_STAGE_ORDER_V9)


def q_corpus_pipeline_v10(spark: SparkSession, sf: str) -> DataFrame:
    """The v9 chain with the GLOBAL token budget replaced by UniMax
    per-language allocation (plans/corpus.py curate_corpus_v10): the
    final mix is waterfilled across languages at a 1.0-epoch cap
    instead of one corpus-wide prefix a dominant language would
    monopolize. Same census keys as v9; the 'budget' row now reports
    the UniMax cut (per-language prefixes, shards rebalanced over the
    union). ONE oracle statement: v9's composed chain with the
    recursive-CTE waterfill spliced into the budget stage."""
    from ..plans.corpus import (
        _STAGE_ORDER_V9,
        curate_corpus_v4_funnel,
        curate_corpus_v10,
    )
    from ..sources.tables import load_table
    from .curation_ops import (
        CCNET_BUCKET_WIDTH,
        DECON_CHAIN_L,
        LINE_DEDUP_MAX_DOCS,
        UNIMAX_BUDGET_DEN,
        UNIMAX_BUDGET_NUM,
        UNIMAX_CAP_X100,
        V3_CLUSTER_TARGET,
        V3_NEARDUP,
        V3_SHARDS,
    )

    web = _webified(spark, sf, extra=("lang", "source"))
    d = web.filter(F.col("doc_id") >= 10)
    bench = web.filter(F.col("doc_id") < 10).select("doc_id", "text")
    emb = load_table(spark, sf, "embeddings")
    wl = spark.createDataFrame([(w,) for w in C4_FLAG_WORDS], "word string")
    raw = _docs(spark, sf)
    stages = curate_corpus_v10(
        d,
        emb,
        bench=bench,
        unimax_budget_num=UNIMAX_BUDGET_NUM,
        unimax_budget_den=UNIMAX_BUDGET_DEN,
        unimax_cap_x100=UNIMAX_CAP_X100,
        decon_min_len=DECON_CHAIN_L,
        gopher_word_min=V9_GOPHER_WORD_MIN,
        gopher_word_max=V9_GOPHER_WORD_MAX,
        gopher_stop_min=V9_GOPHER_STOP_MIN,
        c4_flag_words=wl,
        train_docs=raw.filter(F.col("doc_id") >= 10).select(
            "doc_id", "text"
        ),
        neardup_threshold=V3_NEARDUP,
        cluster_target=V3_CLUSTER_TARGET,
        n_shards=V3_SHARDS,
        max_line_docs=LINE_DEDUP_MAX_DOCS,
        bucket_width=CCNET_BUCKET_WIDTH,
    )
    return curate_corpus_v4_funnel(stages, order=_STAGE_ORDER_V9)


def _sql_corpus_pipeline_v10() -> str:
    from .curation_ops import _sql_corpus_pipeline_v4

    return _sql_corpus_pipeline_v4(
        lm_order="kn",
        clf_gate="trained",
        decon=True,
        relined_rel=(
            "("
            + _sql_webified(extra="lang, source,", where=" WHERE doc_id >= 10")
            + ") wsrc"
        ),
        bench_rel=(
            "(" + _sql_webified(where=" WHERE doc_id < 10") + ") wb"
        ),
        front=[
            ("gopher", _sql_gopher_front()),
            ("c4", _sql_c4_front()),
        ],
        budget_mode="unimax",
    )


def _sql_gopher_front() -> str:
    """The Gopher stage as spliceable CTEs reading ``{prev}``: quality
    keep set (chain thresholds) + repetition violators (doc-length
    denominators, the operators/gopher.py convention) + the surviving
    frame. Mirrors gopher_quality_flags / gopher_repetition_stats term
    for term."""
    from ..operators.gopher import (
        DUP_CHAR_THR_X100,
        DUP_NGRAM_THR_X100,
        DUP_UNIT_THR_X100,
        GOPHER_STOPWORDS,
        TOP_NGRAM_THR_X100,
    )

    stop = " + ".join(
        f"(CASE WHEN list_contains(lw, '{s}') THEN 1 ELSE 0 END)"
        for s in GOPHER_STOPWORDS
    )
    ns = sorted(list(TOP_NGRAM_THR_X100) + list(DUP_NGRAM_THR_X100))
    viol = " OR ".join(
        [
            f"(kind = 'line' AND (dup_units * 100 > n_units * "
            f"{DUP_UNIT_THR_X100} OR dup_chars * 100 > dc * "
            f"{DUP_CHAR_THR_X100}))",
            f"(kind = 'para' AND (dup_units * 100 > n_units * "
            f"{DUP_UNIT_THR_X100} OR dup_chars * 100 > dc * "
            f"{DUP_CHAR_THR_X100}))",
        ]
        + [
            f"(kind = 'g{n}' AND top_chars * 100 > dc * {t})"
            for n, t in TOP_NGRAM_THR_X100.items()
        ]
        + [
            f"(kind = 'g{n}' AND dup_chars * 100 > dc * {t})"
            for n, t in DUP_NGRAM_THR_X100.items()
        ]
    )
    return rf"""gm AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\s+') AS w,
         list_transform(string_split_regex(trim(text), '\s+'),
                        x -> lower(x)) AS lw,
         string_split(text, chr(10)) AS lines
  FROM {{prev}}
),
gc AS (
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
  FROM gm
),
gk AS (
  SELECT doc_id FROM gc
  WHERE n_words >= {V9_GOPHER_WORD_MIN} AND n_words <= {V9_GOPHER_WORD_MAX}
    AND 3 * n_words <= sum_chars AND sum_chars <= 10 * n_words
    AND 10 * n_hash <= n_words AND 10 * n_ell <= n_words
    AND 10 * n_bullet <= 9 * n_lines
    AND 10 * n_ellend <= 3 * n_lines
    AND 5 * n_alpha >= 4 * n_words
    AND n_stop >= {V9_GOPHER_STOP_MIN}
),
gu AS (
  SELECT doc_id, 'line' AS kind, unnest(string_split(text, chr(10))) AS unit
  FROM {{prev}}
  UNION ALL
  SELECT doc_id, 'para', unnest(string_split(text, chr(10) || chr(10)))
  FROM {{prev}}
  UNION ALL
  SELECT doc_id, 'g' || CAST(n AS VARCHAR) AS kind,
         array_to_string(t[u.i:u.i+n-1], ' ') AS unit
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM {{prev}}),
       unnest([{", ".join(map(str, ns))}]) AS nn(n),
       unnest(generate_series(1, len(t) - n + 1)) AS u(i)
  WHERE len(t) >= n
),
gg AS (
  SELECT doc_id, kind, unit, CAST(count(*) AS BIGINT) AS cnt
  FROM gu GROUP BY 1, 2, 3
),
ga AS (
  SELECT doc_id, kind,
         CAST(sum(cnt) AS BIGINT) AS n_units,
         CAST(sum(CASE WHEN cnt >= 2 THEN cnt - 1 ELSE 0 END) AS BIGINT)
           AS dup_units,
         CAST(sum(CASE WHEN cnt >= 2 THEN (cnt - 1) * length(unit)
                       ELSE 0 END) AS BIGINT) AS dup_chars,
         CAST((max(struct_pack(c := cnt, u := unit,
                               ch := cnt * length(unit)))).ch AS BIGINT)
           AS top_chars
  FROM gg GROUP BY 1, 2
),
grl AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS dc FROM {{prev}}),
grv AS (
  SELECT DISTINCT ga.doc_id
  FROM ga JOIN grl USING (doc_id)
  WHERE {viol}
),
gopher AS MATERIALIZED (
  SELECT p.doc_id, p.text, p.lang, p.source
  FROM {{prev}} p
  JOIN gk USING (doc_id)
  LEFT JOIN grv ON p.doc_id = grv.doc_id
  WHERE grv.doc_id IS NULL
)"""


def _sql_c4_front() -> str:
    """The C4 stage as spliceable CTEs reading ``{prev}``: line rules
    rewrite (kept lines), page rules drop. Mirrors c4_apply term for
    term (chr(123) = '{{' keeps the template format()-safe)."""
    policy = "\n           ".join(
        f"AND NOT contains(lower(l), '{p}')" for p in C4_POLICY_PHRASES
    )
    words = ", ".join("'" + x + "'" for x in C4_FLAG_WORDS)
    return rf"""ccl AS (
  SELECT doc_id, text, lang, source,
         list_transform(string_split(text, chr(10)),
           l -> trim(regexp_replace(l, '{C4_CITATION_PAT}', '', 'g')))
           AS lines
  FROM {{prev}}
),
cck AS (
  SELECT doc_id, text, lang, source,
         list_filter(lines, l ->
           regexp_matches(l, '{C4_TERMINAL_PAT}')
           AND len(list_filter(string_split_regex(l, '\s+'),
                               x -> x != '')) >= {MIN_WORDS_PER_LINE}
           AND NOT contains(lower(l), 'javascript')
           {policy}) AS kept
  FROM ccl
),
ccb AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id,
               lower(unnest(string_split_regex(trim(text), '\s+'))) AS tok
        FROM {{prev}})
  WHERE tok IN ({words})
),
c4 AS MATERIALIZED (
  SELECT cck.doc_id,
         COALESCE(array_to_string(cck.kept, chr(10)), '') AS text,
         cck.lang, cck.source
  FROM cck LEFT JOIN ccb ON cck.doc_id = ccb.doc_id
  WHERE NOT contains(lower(cck.text), 'lorem ipsum')
    AND NOT contains(cck.text, chr(123))
    AND ccb.doc_id IS NULL
    AND len(regexp_extract_all(
          COALESCE(array_to_string(cck.kept, chr(10)), ''),
          '{C4_SENT_PAT}')) >= {MIN_SENTENCES}
)"""


def q_filter_ablation(spark: SparkSession, sf: str) -> DataFrame:
    """FineWeb-style filter attribution over the webified corpus: for
    each rule front in the v9 order (Gopher quality, Gopher
    repetition, C4), the docs it fails STANDALONE (over the whole
    corpus) vs MARGINALLY (among docs surviving every earlier front),
    plus the running survivor count — the ablation readout a data
    engineer tunes thresholds against (standalone >> marginal means a
    front mostly re-rejects what earlier fronts already caught). One
    narrow flag projection + one aggregate; zero extra passes."""
    from ..operators.c4 import c4_quality_flags
    from ..operators.gopher import (
        gopher_quality_flags,
        gopher_repetition_stats,
    )

    w = _webified(spark, sf, extra=("lang", "source"))
    wl = spark.createDataFrame([(w_,) for w_ in C4_FLAG_WORDS], "word string")
    gq = gopher_quality_flags(
        w,
        word_min=V9_GOPHER_WORD_MIN,
        word_max=V9_GOPHER_WORD_MAX,
        stop_min=V9_GOPHER_STOP_MIN,
    ).select("doc_id", F.col("keep").alias("ok_gq"))
    grv = (
        gopher_repetition_stats(w)
        .filter(~F.col("ok"))
        .select("doc_id")
        .distinct()
        .withColumn("_v", F.lit(True))
    )
    c4f = c4_quality_flags(w, flag_words=wl).select(
        "doc_id", F.col("keep").alias("ok_c4")
    )
    flags = (
        w.select("doc_id")
        .join(gq, "doc_id")
        .join(grv, "doc_id", "left")
        .join(c4f, "doc_id")
        .select(
            "ok_gq",
            F.col("_v").isNull().alias("ok_grep"),
            "ok_c4",
        )
    )
    c = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    a = flags.agg(
        c(~F.col("ok_gq")).alias("f1"),
        c(F.col("ok_gq")).alias("s1"),
        c(~F.col("ok_grep")).alias("f2s"),
        c(F.col("ok_gq") & ~F.col("ok_grep")).alias("f2m"),
        c(F.col("ok_gq") & F.col("ok_grep")).alias("s2"),
        c(~F.col("ok_c4")).alias("f3s"),
        c(F.col("ok_gq") & F.col("ok_grep") & ~F.col("ok_c4")).alias("f3m"),
        c(F.col("ok_gq") & F.col("ok_grep") & F.col("ok_c4")).alias("s3"),
    )
    row = lambda i, nm, fs, fm, s: F.struct(  # noqa: E731
        F.lit(i).cast("int").alias("stage_id"),
        F.lit(nm).alias("front"),
        F.col(fs).alias("n_fail_standalone"),
        F.col(fm).alias("n_fail_marginal"),
        F.col(s).alias("n_survivors"),
    )
    return a.select(
        F.explode(
            F.array(
                row(1, "gopher_quality", "f1", "f1", "s1"),
                row(2, "gopher_repetition", "f2s", "f2m", "s2"),
                row(3, "c4", "f3s", "f3m", "s3"),
            )
        ).alias("r")
    ).select(
        F.col("r.stage_id").alias("stage_id"),
        F.col("r.front").alias("front"),
        F.col("r.n_fail_standalone").alias("n_fail_standalone"),
        F.col("r.n_fail_marginal").alias("n_fail_marginal"),
        F.col("r.n_survivors").alias("n_survivors"),
    )


def _sql_filter_ablation() -> str:
    front = (
        _sql_gopher_front().format(prev="w").strip()
        + ",\n"
        + _sql_c4_front().format(prev="w").strip()
    )
    cnt = "CAST(sum(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT)"
    return f"""
WITH w AS ({_sql_webified(extra="lang, source,")}),
{front},
fl AS (
  SELECT w.doc_id,
         gk.doc_id IS NOT NULL AS ok_gq,
         grv.doc_id IS NULL AS ok_grep,
         c4.doc_id IS NOT NULL AS ok_c4
  FROM w
  LEFT JOIN gk ON w.doc_id = gk.doc_id
  LEFT JOIN grv ON w.doc_id = grv.doc_id
  LEFT JOIN c4 ON w.doc_id = c4.doc_id
)
SELECT 1 AS stage_id, 'gopher_quality' AS front,
       {cnt.format(c="NOT ok_gq")} AS n_fail_standalone,
       {cnt.format(c="NOT ok_gq")} AS n_fail_marginal,
       {cnt.format(c="ok_gq")} AS n_survivors
FROM fl
UNION ALL
SELECT 2, 'gopher_repetition',
       {cnt.format(c="NOT ok_grep")},
       {cnt.format(c="ok_gq AND NOT ok_grep")},
       {cnt.format(c="ok_gq AND ok_grep")}
FROM fl
UNION ALL
SELECT 3, 'c4',
       {cnt.format(c="NOT ok_c4")},
       {cnt.format(c="ok_gq AND ok_grep AND NOT ok_c4")},
       {cnt.format(c="ok_gq AND ok_grep AND ok_c4")}
FROM fl
"""


def _sql_corpus_pipeline_v9() -> str:
    from .curation_ops import _sql_corpus_pipeline_v4

    return _sql_corpus_pipeline_v4(
        lm_order="kn",
        clf_gate="trained",
        decon=True,
        relined_rel=(
            "("
            + _sql_webified(extra="lang, source,", where=" WHERE doc_id >= 10")
            + ") wsrc"
        ),
        bench_rel=(
            "(" + _sql_webified(where=" WHERE doc_id < 10") + ") wb"
        ),
        front=[
            ("gopher", _sql_gopher_front()),
            ("c4", _sql_c4_front()),
        ],
    )


# ------------------------------------------- readability (Flesch 1948)
def q_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade level as integer-
    exact quality signals (operators/readability.py) over the webified
    corpus (sentences require the terminal-dot transform — the module-
    docstring fixture): (doc_id, n_words, n_sentences, n_syllables,
    fre_x1000, fkgl_x1000), one narrow zero-shuffle projection."""
    from ..operators.readability import readability_stats

    return readability_stats(_webified(spark, sf))


SQL_READABILITY = rf"""
WITH wv AS ({_sql_webified()}),
cnt AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x != '')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                              s -> trim(s) != '')) AS BIGINT) AS n_sentences,
         CAST(list_sum(list_transform(
           list_filter(string_split_regex(trim(text), '\s+'), x -> x != ''),
           x -> greatest(len(regexp_extract_all(lower(x), '[aeiouy]+')), 1)
         )) AS BIGINT) AS n_syllables
  FROM wv
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(206835 - (1015 * n_words) // greatest(n_sentences, 1)
                   - (84600 * n_syllables) // greatest(n_words, 1)
            AS BIGINT) AS fre_x1000,
       CAST((390 * n_words) // greatest(n_sentences, 1)
            + (11800 * n_syllables) // greatest(n_words, 1) - 15590
            AS BIGINT) AS fkgl_x1000
FROM cnt
"""


QUERIES = {
    "q_readability": q_readability,
    "q_c4_quality": q_c4_quality,
    "q_c4_apply": q_c4_apply,
    "q_c4_span_dedup": q_c4_span_dedup,
    "q_c4_span_delta": q_c4_span_delta,
    "q_corpus_pipeline_v9": q_corpus_pipeline_v9,
    "q_corpus_pipeline_v10": q_corpus_pipeline_v10,
    "q_filter_ablation": q_filter_ablation,
}

ORACLES = {
    "q_readability": SQL_READABILITY,
    "q_c4_quality": SQL_C4_QUALITY,
    "q_c4_apply": SQL_C4_APPLY,
    "q_c4_span_dedup": SQL_C4_SPAN_DEDUP,
    "q_c4_span_delta": _sql_c4_span_dedup(restrict_delta=True),
    "q_corpus_pipeline_v9": _sql_corpus_pipeline_v9(),
    "q_corpus_pipeline_v10": _sql_corpus_pipeline_v10(),
    "q_filter_ablation": _sql_filter_ablation(),
}
