"""C4-faithful filter front (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning...", §2.2) — the canonical rule set next to Gopher
that every production curation pipeline (C4, mC4, Dolma, FineWeb)
implements. Rules follow the paper's published list with DataTrove's
placement conventions, integer-/string-exact so the DuckDB oracle can
mirror them term for term:

Line-level (each line is stripped and citation-scrubbed first; a line
is KEPT iff all pass — failing lines are removed, not the page):
- ends in a terminal punctuation mark ('.', '!', '?', '"')
- contains at least ``min_words_per_line`` words (default 3, the
  DataTrove default; the paper's prose says 5 — the threshold is a
  parameter precisely because the two canonical sources disagree)
- does not contain the word "javascript" (lowercased substring — the
  paper's rule targets boilerplate "enable javascript" banners)
- does not contain a policy phrase ("terms of use", "privacy policy",
  "cookie policy", "uses cookies", "use of cookies", "use cookies") —
  DataTrove's filter_policy addition to the paper list
- citation scrub: "[1]"-style / "[edit]" / "[citation needed]" markers
  are removed from the line before the checks (C4's remove_citations)

Page-level (a document is DROPPED iff any fires):
- contains the lowercased phrase "lorem ipsum" anywhere
- contains a curly bracket '{' anywhere (code page heuristic)
- contains any word on the bad-words list (token-level, lowercased
  both sides — the paper's "List of Dirty, Naughty, Obscene or
  Otherwise Bad Words" rule; the list is DATA, passed as a frame)
- fewer than ``min_sentences`` sentences remain AFTER line filtering
  (default 3, the paper's count; sentences are maximal terminal-punct
  runs — see ``_SENT_PAT`` for the deterministic cross-engine
  convention standing in for a sentence model)

Span dedup (the paper's corpus-level rule): "we removed all but one of
any three-sentence span occurring more than once in the data set."
:func:`c4_span_dedup` keeps the lexicographically FIRST occurrence
(min (doc_id, position) — deterministic in both engines; the paper does
not pin which copy survives) and cuts every sentence covered by a
non-surviving duplicated span; documents emptied entirely drop.

Scale shape: the quality flags are ONE narrow map (pure column
expressions over the line array, zero shuffle) plus, when a bad-words
frame is supplied, one exploded-token broadcast semi-join + doc-keyed
distinct (the flagged_word_stats shape). Span dedup is the
decontamination discipline on sentence units: one sentence explode ->
one stride-1 span-hash explode -> ONE hash-agg keyed by span hash
(count + first occurrence) -> join back (span-proportional) -> cover
explode + anti-join + per-doc rebuild. No pairwise joins, no windows
over the corpus, no UDFs.

Reference parity: the reference is a row-level OHLCV ETL
(/root/reference/glue/jobs/build_stock_fact_table.py) with no text
surface; this is engine-extension surface (SURVEY.md section 8,
VERDICT r11 item #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

C4_TERMINAL_PAT = '[.!?"]$'
C4_CITATION_PAT = r"\[\d*\]|\[edit\]|\[citation needed\]"
# maximal run of terminal punctuation, optionally closed by a quote —
# the deterministic stand-in for a sentence tokenizer, identical in
# Java regex (Spark) and RE2 (DuckDB)
C4_SENT_PAT = '[.!?]+"?'
# a sentence with its text: everything up to and including the next
# terminal-punct run (an unterminated tail is not a sentence — the
# line filter has already removed unterminated lines anyway)
C4_SENT_EXTRACT_PAT = '[^.!?]*[.!?]+"?'
C4_POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)
MIN_WORDS_PER_LINE = 3
MIN_SENTENCES = 3
SPAN_SENTENCES = 3


def _kept_lines(text_col: str, min_words: int):
    """Array of lines surviving the C4 line rules, each stripped and
    citation-scrubbed — a single nested array expression, no shuffle."""
    cleaned = F.transform(
        F.split(F.col(text_col), "\n"),
        lambda l: F.trim(F.regexp_replace(l, C4_CITATION_PAT, "")),
    )

    def _keep(l):
        words = F.filter(
            F.split(l, r"\s+"), lambda x: x != F.lit("")
        )
        cond = (
            l.rlike(C4_TERMINAL_PAT)
            & (F.size(words) >= min_words)
            & ~F.lower(l).contains("javascript")
        )
        for p in C4_POLICY_PHRASES:
            cond = cond & ~F.lower(l).contains(p)
        return cond

    return F.filter(cleaned, _keep)


def c4_quality_flags(
    df: DataFrame,
    flag_words: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = MIN_WORDS_PER_LINE,
    min_sentences: int = MIN_SENTENCES,
    word_col: str = "word",
) -> DataFrame:
    """Per-doc C4 readout: line-filter census (n_lines, n_kept_lines,
    n_sentences) + one boolean per page rule + the conjunction
    (``keep``). ``flag_words`` is the bad-words list as a frame (data,
    not code — the flagged_word_stats convention); None disables the
    rule (reported as ok). The input is widened first (sources.tables
    widen_small_scan, optimization r13): the line rules are
    regex-per-line folds and a small single-split scan serializes
    them; at production input sizes the widen gate is a no-op."""
    from ..sources.tables import widen_small_scan

    df = widen_small_scan(df, id_col)
    kept = _kept_lines(text_col, min_words_per_line)
    kept_text = F.array_join(kept, "\n")
    base = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).cast("bigint").alias(
            "n_lines"
        ),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        F.size(F.regexp_extract_all(kept_text, F.lit(C4_SENT_PAT), 0))
        .cast("bigint")
        .alias("n_sentences"),
        (~F.lower(F.col(text_col)).contains("lorem ipsum")).alias(
            "ok_lorem_ipsum"
        ),
        (~F.col(text_col).contains("{")).alias("ok_curly_brace"),
    )
    if flag_words is None:
        base = base.withColumn("ok_flagged_word", F.lit(True))
    else:
        wl = flag_words.select(
            F.lower(F.col(word_col)).alias("_tok")
        ).distinct()
        bad = (
            df.select(
                F.col(id_col),
                F.explode(tokens(text_col)).alias("_raw"),
            )
            .select(F.col(id_col), F.lower("_raw").alias("_tok"))
            .join(F.broadcast(wl), "_tok", "left_semi")
            .select(id_col)
            .distinct()
            .withColumn("_bad", F.lit(True))
        )
        base = base.join(bad, id_col, "left").withColumn(
            "ok_flagged_word", F.col("_bad").isNull()
        ).drop("_bad")
    return base.select(
        id_col,
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "ok_lorem_ipsum",
        "ok_curly_brace",
        "ok_flagged_word",
        (F.col("n_sentences") >= min_sentences).alias("ok_min_sentences"),
        (
            F.col("ok_lorem_ipsum")
            & F.col("ok_curly_brace")
            & F.col("ok_flagged_word")
            & (F.col("n_sentences") >= min_sentences)
        ).alias("keep"),
    )


def c4_apply(
    df: DataFrame,
    flag_words: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = MIN_WORDS_PER_LINE,
    min_sentences: int = MIN_SENTENCES,
    word_col: str = "word",
) -> DataFrame:
    """The C4 front APPLIED: surviving docs with their line-filtered
    text — (id, text). Same plan as the flags plus the kept-text
    projection; the page gate consumes the flags' conjunction. Widened
    once here so the flags branch and the kept-text projection both
    run at full parallelism on small inputs (widen_small_scan no-ops
    at production sizes and on already-shuffled chain inputs)."""
    from ..sources.tables import widen_small_scan

    df = widen_small_scan(df, id_col)
    flags = c4_quality_flags(
        df, flag_words, id_col, text_col, min_words_per_line,
        min_sentences, word_col,
    )
    cleaned = df.select(
        F.col(id_col),
        F.array_join(_kept_lines(text_col, min_words_per_line), "\n").alias(
            text_col
        ),
    )
    return cleaned.join(
        flags.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )


def _doc_sentences(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _s): each doc's sentence ARRAY — the shared doc-level base
    the span explode and the rebuild both consume (r12 optimization:
    the heavy text stays one row per doc end to end; only span keys
    and hit positions ever explode). Widened on small inputs
    (widen_small_scan): the sentence regex-extract is row-expensive
    and this base feeds every downstream branch."""
    from ..sources.tables import widen_small_scan

    df = widen_small_scan(df, id_col)
    # explicit one-arg lambda: passing F.trim directly would let
    # transform() bind the array index to trim's optional trimStr param
    sarr = F.transform(
        F.regexp_extract_all(
            F.col(text_col), F.lit(C4_SENT_EXTRACT_PAT), 0
        ),
        lambda s: F.trim(s),
    )
    return df.select(F.col(id_col), sarr.alias("_s"))


def _span_rows_from_base(base: DataFrame, id_col: str, span: int) -> DataFrame:
    """(id, pos, gkey) from a :func:`_doc_sentences` base: every
    stride-1 ``span``-sentence window, keyed by md5 over the
    \\x01-joined sentences (the exact-equality class)."""
    skey = F.transform(
        F.sequence(F.lit(1), F.size("_s") - F.lit(span - 1)),
        lambda i: F.struct(
            i.cast("bigint").alias("pos"),
            F.md5(
                F.concat_ws(
                    "\x01", *[F.element_at(F.col("_s"), i + j)
                              for j in range(span)]
                )
            ).alias("gkey"),
        ),
    )
    return (
        base.filter(F.size("_s") >= span)
        .select(F.col(id_col), F.explode(skey).alias("g"))
        .select(
            id_col, F.col("g.pos").alias("pos"), F.col("g.gkey").alias("gkey")
        )
    )


def _span_rows(
    df: DataFrame, id_col: str, text_col: str, span: int
) -> DataFrame:
    """(id, pos, gkey): every stride-1 ``span``-sentence window, keyed
    by md5 over the \\x01-joined sentences (the exact-equality class)."""
    return _span_rows_from_base(
        _doc_sentences(df, id_col, text_col), id_col, span
    )


def _rebuild_without(
    base: DataFrame, hits: DataFrame, id_col: str, text_col: str, span: int
) -> DataFrame:
    """Remove every sentence covered by a hit span and rebuild:
    (id, text, n_removed) for docs with >= 1 surviving sentence.

    Doc-level (r12 optimization): hit spans collapse to ONE removed-
    position set per doc (a doc-bounded array), attached to the
    :func:`_doc_sentences` base by a single doc-keyed join; surviving
    text rebuilds with an index-aware array filter. The old shape —
    sentence explode, (id, pos) anti-join, doc-keyed collect_list,
    second agg + join for totals — shuffled every sentence string
    twice; here the only shuffled rows are hit positions."""
    rm = (
        hits.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(span - 1))
            ).alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_rm"))
    )
    kept = F.filter(
        F.col("_s"),
        lambda s, i: F.col("_rm").isNull()
        | ~F.array_contains(F.col("_rm"), (i + 1).cast("bigint")),
    )
    return (
        base.join(rm, [id_col], "left")
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias(text_col),
            (F.size("_s") - F.size(kept)).cast("bigint").alias("n_removed"),
            F.size(kept).alias("_n_kept"),
        )
        .filter(F.col("_n_kept") >= 1)
        .drop("_n_kept")
    )


def c4_span_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = SPAN_SENTENCES,
) -> DataFrame:
    """The standing corpus's span-hash set — the frozen artifact an
    incremental span dedup consumes (one distinct over the span
    explode; grows with the corpus's distinct spans, published to the
    lake like any index table). A delta occurrence whose key is here
    is a duplicate BY DEFINITION (the standing first occurrence
    already survived), so the fold never touches standing text."""
    return _span_rows(df, id_col, text_col, span).select("gkey").distinct()


def c4_span_dedup_delta(
    standing_keys: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = SPAN_SENTENCES,
) -> tuple[DataFrame, DataFrame]:
    """Incremental C4 span dedup (the substring_index_delta
    discipline): fold a delta batch against the standing span-key
    index. A delta span occurrence is cut iff its key is in the
    standing index (the standing occurrence survived first) OR it is
    a non-first duplicate WITHIN the delta batch. With a monotone id
    split (standing ids < delta ids), the fold equals the full
    rebuild restricted to delta ids — pinned by pytest and the
    restricted oracle. Returns (folded_index, delta_result); cost is
    delta-sized (the standing side enters only as the key semi-join)."""
    base_d = _doc_sentences(delta, id_col, text_col).localCheckpoint(
        eager=False
    )
    spans_d = _span_rows_from_base(base_d, id_col, span)
    standing_hit = spans_d.join(standing_keys, "gkey", "left_semi").select(
        id_col, "pos"
    )
    # intra-delta duplicates via one gkey-window pass (see
    # c4_span_dedup); the union needs no distinct — the rebuild's
    # collect_set dedups covered positions.
    w = Window.partitionBy("gkey")
    intra_hit = (
        spans_d.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn(
            "_first", F.min(F.struct(F.col(id_col), F.col("pos"))).over(w)
        )
        .filter(
            (F.col("_n") > 1)
            & ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
        .select(id_col, "pos")
    )
    hits = standing_hit.unionByName(intra_hit)
    result = _rebuild_without(base_d, hits, id_col, text_col, span)
    folded = standing_keys.unionByName(
        spans_d.select("gkey")
    ).distinct()
    return folded, result


def c4_span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = SPAN_SENTENCES,
) -> DataFrame:
    """C4's three-sentence span dedup: any ``span``-sentence run
    occurring more than once in the corpus keeps its first occurrence
    (min (doc_id, position)) and is cut everywhere else; cut = every
    sentence covered by a non-surviving duplicated span. Returns
    (id, text, n_removed) for docs with at least one surviving
    sentence — text is the surviving sentences joined by single
    spaces (the newline structure is consumed, the decontamination
    convention)."""
    base = _doc_sentences(df, id_col, text_col).localCheckpoint(eager=False)
    spans = _span_rows_from_base(base, id_col, span)
    # duplicate detection as two window functions over ONE gkey
    # exchange of the span-key rows (the old groupBy + join-back
    # spelling exchanged the span frame twice); the sentence text
    # itself stays doc-level (base is pinned: one upstream-chain
    # evaluation feeds both the span explode and the rebuild).
    w = Window.partitionBy("gkey")
    hits = (
        spans.withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn(
            "_first", F.min(F.struct(F.col(id_col), F.col("pos"))).over(w)
        )
        .filter(
            (F.col("_n") > 1)
            & ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
        .select(id_col, "pos")
    )
    return _rebuild_without(base, hits, id_col, text_col, span)
