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
are ALSO a zero-shuffle narrow map (r12 optimization): every unit
population (lines, paragraphs, each n-gram order) is per-document,
so per-kind duplicate-run folds over doc-local sorted unit arrays
(:func:`_run_stats`) replace the old ~9x-token-row explode whose
shuffle payload was the unit strings, and the 13 metrics project in
one explode of a literal-shaped array — numer/denom/ok inline, short
docs surface as numer=denom=0, ok=true (honest absence, never NULL).
No windows, no UDFs, no joins, no shuffle at all.

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
    re-ablate them per corpus (FineWeb §3.1 does exactly this). The
    input is widened first (sources.tables widen_small_scan,
    optimization r13): the per-row rule evaluation is regex/fold-heavy
    and a small single-split scan otherwise serializes it."""
    from ..sources.tables import widen_small_scan

    df = widen_small_scan(df, id_col)
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


def _dup_stats(units):
    """Doc-local duplicate statistics over one unit array, all native
    expressions — the zero-shuffle twin of the old explode +
    (doc, kind, unit) hash-agg: with cnt(u) the multiplicity of unit
    u,

    - dup_units = sum over u of (cnt-1) = size(arr) - #distinct
    - dup_chars = sum over duplicated u of (cnt-1)*len(u)
                = total chars - distinct-unit chars
      (cnt = 1 terms contribute 0, so the all-units/distinct-units
      difference is exactly the beyond-first character mass), and the
      character sums are one native concat each:
      ``length(array_join(arr, ''))``.

    Integer-exact; returns struct(n_units, dup_units, dup_chars)."""
    dis = F.array_distinct(units)
    all_ch = F.length(F.array_join(units, ""))
    dis_ch = F.length(F.array_join(dis, ""))
    return F.struct(
        F.size(units).cast("bigint").alias("n_units"),
        (F.size(units) - F.size(dis)).cast("bigint").alias("dup_units"),
        (all_ch - dis_ch).cast("bigint").alias("dup_chars"),
    )


def _top_chars(units):
    """Characters covered by ALL occurrences of the most frequent
    unit: ``array_sort`` groups equal units into adjacent runs, a slim
    sequential fold tracks the best (count, unit) run. Replays the old
    ``max(struct(cnt, unit, ch))`` tie-break exactly — iterating runs
    in ascending unit order, ``run >= best`` updates the best, so
    equal counts resolve to the lexicographically larger unit. Empty
    array yields 0 (downstream treats it identically to the old
    absent-(doc, kind) row, which the metric grid coalesced to
    numer = 0)."""

    def _acc(prev, run, bc, bu):
        return F.struct(
            prev.alias("prev"),
            run.cast("bigint").alias("run"),
            bc.cast("bigint").alias("bc"),
            bu.alias("bu"),
        )

    def _close(acc):
        upd = acc["run"] >= acc["bc"]
        return (
            F.when(upd, acc["run"]).otherwise(acc["bc"]),
            F.when(upd, acc["prev"]).otherwise(acc["bu"]),
        )

    def _step(acc, x):
        bc, bu = _close(acc)
        return (
            F.when(
                acc["prev"].isNull(), _acc(x, F.lit(1), acc["bc"], acc["bu"])
            )
            .when(x == acc["prev"], _acc(x, acc["run"] + 1, acc["bc"],
                                         acc["bu"]))
            .otherwise(_acc(x, F.lit(1), bc, bu))
        )

    def _fin(acc):
        bc, bu = _close(acc)
        return (
            F.when(acc["prev"].isNull(), F.lit(0).cast("bigint"))
            .otherwise((bc * F.length(bu)).cast("bigint"))
        )

    zero = _acc(
        F.lit(None).cast("string"), F.lit(0), F.lit(0),
        F.lit(None).cast("string"),
    )
    return F.aggregate(F.array_sort(units), zero, _step, _fin)


def gopher_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The 13 Gopher repetition metrics per doc, long format:
    (id, metric, numer, denom, ok) — see the module docstring for the
    exact integer definitions and thresholds.

    Scale shape (r12 optimization): every unit population (lines,
    paragraphs, each n-gram order) is per-DOCUMENT, so nothing ever
    needs to cross the network — the old explode (~9x token rows,
    the unit STRINGS as shuffle payload) into two doc-keyed hash-aggs
    plus a metric-grid join is now a single zero-shuffle projection:
    per-kind :func:`_run_stats` folds over doc-local unit arrays, one
    13-way metric explode, numer/denom/ok computed inline. Results
    identical (same integer counts, same struct-max tie-break, absent
    kinds surface as numer = 0 exactly as the old grid coalesce).

    The zero-shuffle shape has one operational hazard this round fixed
    (optimization r13): with no exchange anywhere, the whole query runs
    at the SCAN's parallelism, and a few-MB corpus file is one split
    under the stock 4 MiB openCostInBytes — all 13 per-doc array folds
    serialized on one task (measured 24.7 s at sf0.1/local[32]). The
    input is widened by sources.tables widen_small_scan: a deterministic
    doc-keyed repartition BELOW the folds whose gate turns itself off at
    production input sizes, preserving the zero-shuffle plan there."""
    from ..sources.tables import widen_small_scan

    df = widen_small_scan(df, id_col)
    ns = sorted(list(TOP_NGRAM_THR_X100) + list(DUP_NGRAM_THR_X100))
    base = df.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("_doc_chars"),
        F.split(F.col(text_col), "\n").alias("_lines"),
        F.split(F.col(text_col), "\n\n").alias("_paras"),
        tokens(text_col).alias("_t"),
    )

    def _grams(n: int):
        t = F.col("_t")
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.lit(n) + F.lit(1)),
                lambda i: F.array_join(F.slice(t, i, F.lit(n)), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    stats = base.select(
        F.col(id_col),
        "_doc_chars",
        _dup_stats(F.col("_lines")).alias("_line"),
        _dup_stats(F.col("_paras")).alias("_para"),
        *[_top_chars(_grams(n)).alias(f"_g{n}")
          for n in TOP_NGRAM_THR_X100],
        *[_dup_stats(_grams(n))["dup_chars"].alias(f"_g{n}")
          for n in DUP_NGRAM_THR_X100],
    )
    # (metric, numerator column, unit-denominator struct column or
    # None for the document-character denominator, threshold)
    specs = (
        [
            ("dup_line_frac", F.col("_line")["dup_units"], "_line",
             DUP_UNIT_THR_X100),
            ("dup_line_char_frac", F.col("_line")["dup_chars"], None,
             DUP_CHAR_THR_X100),
            ("dup_para_frac", F.col("_para")["dup_units"], "_para",
             DUP_UNIT_THR_X100),
            ("dup_para_char_frac", F.col("_para")["dup_chars"], None,
             DUP_CHAR_THR_X100),
        ]
        + [(f"top_ngram_char_{n}", F.col(f"_g{n}"), None, t)
           for n, t in TOP_NGRAM_THR_X100.items()]
        + [(f"dup_ngram_char_{n}", F.col(f"_g{n}"), None, t)
           for n, t in DUP_NGRAM_THR_X100.items()]
    )
    marr = F.array(
        *[
            F.struct(
                F.lit(name).alias("metric"),
                numer.cast("bigint").alias("numer"),
                (
                    F.col(dsrc)["n_units"] if dsrc else F.col("_doc_chars")
                ).cast("bigint").alias("denom"),
                F.lit(thr).cast("int").alias("thr"),
            )
            for name, numer, dsrc, thr in specs
        ]
    )
    return stats.select(F.col(id_col), F.explode(marr).alias("m")).select(
        F.col(id_col),
        F.col("m.metric").alias("metric"),
        F.col("m.numer").alias("numer"),
        F.col("m.denom").alias("denom"),
        (F.col("m.numer") * 100 <= F.col("m.denom") * F.col("m.thr")).alias(
            "ok"
        ),
    )
