"""Gopher-faithful quality and repetition filters (Rae et al. 2021,
"Scaling Language Models: ... Gopher", Appendix A1.1) — the rule set
most production curation pipelines (MassiveText, RefinedWeb, Dolma,
FineWeb) start from. The repo's quality_features is the SIMPLIFIED
composite; this module implements the paper's actual rules with the
paper's actual thresholds, integer-exactly:

Quality rules (a document is kept iff ALL pass):
- word count in [50, 100000]
- mean word length in [3, 10]              (3*W <= chars <= 10*W)
- symbol-to-word ratio <= 0.1 PER SYMBOL, '#' and '...' each
  (10*hashes <= W AND 10*ellipses <= W — the paper/DataTrove apply
  the threshold to each symbol separately, not to their sum)
- <= 90% of lines start with a bullet       (10*bullets <= 9*L)
- <= 30% of lines end with an ellipsis      (10*ell <= 3*L)
- >= 80% of words contain an alphabetic char (5*alpha >= 4*W)
- at least 2 of the 8 Gopher stop words present

Repetition rules, long format (doc_id, metric, numer, denom, ok),
every fraction an exact integer pair and every threshold comparison
``numer * 100 <= denom * thr_x100``. Every CHARACTER-fraction metric
divides by the DOCUMENT's character count (``length(text)``) — the
DataTrove convention the paper's thresholds were calibrated against
(a per-n-gram-mass denominator is mutually consistent but shifts
keep/drop behavior vs reference pipelines; ADVICE r11):
- dup_line_frac <= 0.30 / dup_para_frac <= 0.30 (occurrences beyond
  the first of each duplicated unit, over total units of that kind)
- dup_line_char_frac <= 0.20 / dup_para_char_frac <= 0.20 (characters
  of occurrences beyond the first, over document characters; the
  paper does not pin the first-occurrence treatment, so the
  DataTrove form is documented here and mirrored in the oracle)
- top_ngram_char_{2,3,4} <= {0.20, 0.18, 0.16}: characters of ALL
  occurrences of the most frequent word n-gram (ties to the
  lexicographically larger gram via struct max — deterministic in
  both engines), over document characters
- dup_ngram_char_{5..10} <= {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}:
  characters of beyond-first occurrences of duplicated n-grams,
  overlap-counted per occurrence (the standard approximation of the
  paper's covered-character measure), over document characters

Scale shape: the quality flags are ONE narrow map (pure column
expressions, zero shuffle, pushdown-friendly). The repetition stats
are one explode (units: lines + paragraphs + n-grams for n=2..10,
~9x token count rows) -> one hash-agg keyed (doc, kind, unit) -> one
hash-agg keyed (doc, kind) -> a 13-way metric projection joined back
to the doc list (rows absent for short docs surface as numer=denom=0,
ok=true — honest absence, never NULL). No windows, no UDFs, no
corpus-keyed shuffle beyond the per-doc aggs.

Reference parity: the reference is a row-level OHLCV ETL
(/root/reference/glue/jobs/build_stock_fact_table.py,
build_stock_aggregations.py) with no text surface; this is
engine-extension surface (SURVEY.md section 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
WORD_MIN, WORD_MAX = 50, 100_000
TOP_NGRAM_THR_X100 = {2: 20, 3: 18, 4: 16}
DUP_NGRAM_THR_X100 = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}
DUP_UNIT_THR_X100 = 30   # duplicate line / paragraph fraction
DUP_CHAR_THR_X100 = 20   # duplicate line / paragraph CHARACTER fraction


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_min: int = WORD_MIN,
    word_max: int = WORD_MAX,
    stop_min: int = 2,
) -> DataFrame:
    """One boolean per Gopher quality rule plus the conjunction
    (``keep``) — a single narrow projection. Defaults are the paper's
    thresholds; they are parameters because production pipelines
    re-ablate them per corpus (FineWeb §3.1 does exactly this)."""
    w = tokens(text_col)
    n_words = F.size(w)
    sum_chars = F.aggregate(
        w, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    n_hash = F.size(F.regexp_extract_all(F.col(text_col), F.lit("#"), 0))
    n_ell = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\.\.\."), 0)
    )
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike("^[•*-]"))
    )
    n_ellend = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$")))
    lw = F.transform(w, F.lower)
    n_stop = sum(
        (
            F.when(F.array_contains(lw, s), 1).otherwise(0)
            for s in GOPHER_STOPWORDS
        ),
        start=F.lit(0),
    )
    ok = {
        "ok_word_count": (n_words >= word_min) & (n_words <= word_max),
        "ok_mean_word_len": (F.lit(3) * n_words <= sum_chars)
        & (sum_chars <= F.lit(10) * n_words),
        "ok_symbol_ratio": (F.lit(10) * n_hash <= n_words)
        & (F.lit(10) * n_ell <= n_words),
        "ok_bullet_lines": F.lit(10) * n_bullet <= F.lit(9) * n_lines,
        "ok_ellipsis_lines": F.lit(10) * n_ellend <= F.lit(3) * n_lines,
        "ok_alpha_words": F.lit(5) * n_alpha >= F.lit(4) * n_words,
        "ok_stop_words": n_stop >= stop_min,
    }
    keep = None
    for c in ok.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in ok.items()],
        keep.alias("keep"),
    )


def _unit_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, kind, unit): every line, paragraph, and word n-gram
    (n = 2..10) of every doc — the single explode the repetition
    metrics aggregate over."""
    lines = df.select(
        F.col(id_col),
        F.lit("line").alias("kind"),
        F.explode(F.split(F.col(text_col), "\n")).alias("unit"),
    )
    paras = df.select(
        F.col(id_col),
        F.lit("para").alias("kind"),
        F.explode(F.split(F.col(text_col), "\n\n")).alias("unit"),
    )
    ns = sorted(list(TOP_NGRAM_THR_X100) + list(DUP_NGRAM_THR_X100))
    grams = (
        df.select(F.col(id_col), tokens(text_col).alias("_t"))
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"flatten(transform(array({','.join(map(str, ns))}), n -> "
                    f"CASE WHEN size(_t) >= n THEN "
                    f"transform(sequence(1, size(_t) - n + 1), i -> "
                    f"named_struct('kind', concat('g', CAST(n AS STRING)), "
                    f"'unit', array_join(slice(_t, i, n), ' '))) "
                    f"ELSE CAST(array() AS "
                    f"ARRAY<STRUCT<kind: STRING, unit: STRING>>) END))"
                )
            ).alias("e"),
        )
        .select(id_col, F.col("e.kind").alias("kind"), F.col("e.unit").alias("unit"))
    )
    return lines.unionByName(paras).unionByName(grams)


def gopher_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The 13 Gopher repetition metrics per doc, long format:
    (id, metric, numer, denom, ok) — see the module docstring for the
    exact integer definitions and thresholds."""
    agg = (
        _unit_rows(df, id_col, text_col)
        .groupBy(id_col, "kind", "unit")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col, "kind")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_units"),
            F.sum(
                F.when(F.col("cnt") >= 2, F.col("cnt") - 1).otherwise(0)
            ).cast("bigint").alias("dup_units"),
            F.sum(
                F.when(
                    F.col("cnt") >= 2,
                    (F.col("cnt") - 1) * F.length("unit"),
                ).otherwise(0)
            ).cast("bigint").alias("dup_chars"),
            F.max(
                F.struct(
                    F.col("cnt"),
                    F.col("unit"),
                    (F.col("cnt") * F.length("unit")).alias("ch"),
                )
            )["ch"].cast("bigint").alias("top_chars"),
        )
    )
    # one metric-array projection per agg row (the agg is scanned ONCE,
    # never per metric), exploded to the long format. CHARACTER-fraction
    # metrics carry no denominator here: the document character count
    # joins in from the grid side (the DataTrove doc-length convention);
    # unit-fraction metrics keep their per-kind unit count. Short docs
    # whose kind never materialized surface via the (doc x metric) grid
    # join as numer=0 (denom = doc chars for char metrics, 0 for unit
    # metrics), ok=true — honest absence, never NULL.
    def _m(name: str, numer: str, udenom: str | None):
        return F.struct(
            F.lit(name).alias("metric"),
            F.col(numer).cast("bigint").alias("numer"),
            (F.col(udenom) if udenom else F.lit(None))
            .cast("bigint")
            .alias("udenom"),
        )

    marr = (
        F.when(
            F.col("kind") == "line",
            F.array(
                _m("dup_line_frac", "dup_units", "n_units"),
                _m("dup_line_char_frac", "dup_chars", None),
            ),
        )
        .when(
            F.col("kind") == "para",
            F.array(
                _m("dup_para_frac", "dup_units", "n_units"),
                _m("dup_para_char_frac", "dup_chars", None),
            ),
        )
    )
    for n in TOP_NGRAM_THR_X100:
        marr = marr.when(
            F.col("kind") == f"g{n}",
            F.array(_m(f"top_ngram_char_{n}", "top_chars", None)),
        )
    for n in DUP_NGRAM_THR_X100:
        marr = marr.when(
            F.col("kind") == f"g{n}",
            F.array(_m(f"dup_ngram_char_{n}", "dup_chars", None)),
        )
    rows = agg.select(F.col(id_col), F.explode(marr).alias("m")).select(
        F.col(id_col),
        F.col("m.metric").alias("metric"),
        F.col("m.numer").alias("numer"),
        F.col("m.udenom").alias("udenom"),
    )
    specs = (
        [
            ("dup_line_frac", DUP_UNIT_THR_X100, False),
            ("dup_line_char_frac", DUP_CHAR_THR_X100, True),
            ("dup_para_frac", DUP_UNIT_THR_X100, False),
            ("dup_para_char_frac", DUP_CHAR_THR_X100, True),
        ]
        + [(f"top_ngram_char_{n}", t, True)
           for n, t in TOP_NGRAM_THR_X100.items()]
        + [(f"dup_ngram_char_{n}", t, True)
           for n, t in DUP_NGRAM_THR_X100.items()]
    )
    grid = df.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("_doc_chars"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"),
                        F.lit(thr).cast("int").alias("thr"),
                        F.lit(is_char).alias("is_char"),
                    )
                    for name, thr, is_char in specs
                ]
            )
        ).alias("s"),
    ).select(
        F.col(id_col),
        "_doc_chars",
        F.col("s.metric").alias("metric"),
        F.col("s.thr").alias("thr"),
        F.col("s.is_char").alias("is_char"),
    )
    numer = F.coalesce("numer", F.lit(0)).cast("bigint")
    denom = F.when(F.col("is_char"), F.col("_doc_chars")).otherwise(
        F.coalesce("udenom", F.lit(0))
    ).cast("bigint")
    return grid.join(rows, [id_col, "metric"], "left").select(
        F.col(id_col),
        "metric",
        numer.alias("numer"),
        denom.alias("denom"),
        (numer * 100 <= denom * F.col("thr")).alias("ok"),
    )
