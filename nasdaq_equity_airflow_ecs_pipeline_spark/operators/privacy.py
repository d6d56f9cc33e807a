"""PII redaction — the APPLY side of the privacy pass.

``queries/llm_ops.py q_pii_scan`` counts PII-shaped spans (the triage
scan that decides which shards need the rewrite pass); this module does
the rewrite itself: replace every matched span with a typed placeholder
token, in a FIXED pattern order, and report per-type replacement counts
so downstream audits can reconcile scan vs redact numbers.

Order matters and is part of the contract: URLs are redacted FIRST
(an email-shaped substring inside a URL's userinfo/query is part of the
URL and must disappear with it, not survive as a half-redacted email),
then emails, then long digit runs (phone/SSN/CC-shaped). Each type's
count is taken on the text as it stands AFTER the earlier types were
redacted — so ``n_email`` here can be LOWER than the scan's raw email
count on PII that overlaps a URL; that difference is the point of
running apply-side counts.

Everything is JVM-side column expressions (``regexp_extract_all`` /
``regexp_replace`` — one linear scan per pattern, no UDF, no shuffle);
the patterns are dialect-neutral (identical semantics under Java regex
and DuckDB's RE2) so the DuckDB oracle replays the same chain verbatim.
Placeholders contain no digits or '@' or '://', so a later pattern can
never match inside an earlier pattern's replacement.

At 100 TB this is a narrow map over the text column: no shuffle, no
state, pushdown-friendly (only ``id_col`` and ``text_col`` are read).

Reference parity: the reference pipeline is OHLCV rows with no
free-text/PII surface (/root/reference/glue/jobs/build_stock_fact_table.py
and build_stock_aggregations.py cover its entire column vocabulary);
this is LLM-curation engine-extension surface (SURVEY.md section 8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, regex, placeholder) — FIXED order, see module docstring.
# Regexes are shared with q_pii_scan's scan side and are valid with
# identical semantics in Java regex and RE2 (no backrefs, no lookaround).
# The URL terminator is an EXPLICIT whitespace class, not \s: Java's \s
# includes U+000B (vertical tab) while RE2's does not, so the spelled-out
# class [ \t\r\n\x0B\f] is the only way both dialects see the same set
# (ADVICE r10).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^ \t\r\n\x0B\f]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("longnum", r"[0-9]{9,}", "<NUM>"),
)


def pii_redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Redact PII spans with typed placeholders, sequentially per
    pattern; returns ``(id_col, n_<type>..., redacted)`` where each
    ``n_<type>`` counts the replacements that pattern actually made
    (i.e. matches remaining after earlier patterns consumed theirs).
    """
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, rx, placeholder in patterns:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(rx), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        cur = F.regexp_replace(cur, rx, placeholder)
    return df.select(F.col(id_col), *counts, cur.alias("redacted"))
