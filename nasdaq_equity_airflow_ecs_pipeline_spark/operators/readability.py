"""Flesch readability as a corpus quality signal (Flesch 1948,
"A New Readability Yardstick"; shipped as the ``flesch_reading_ease``
signal in Dolma / RedPajama-v2 style quality-signal bundles).

    FRE = 206.835 - 1.015 * (words / sentences)
                  - 84.6  * (syllables / words)

Integer-exact in the Gopher-front discipline (operators/gopher.py):
every count is an exact integer, the two ratio terms are single
truncating integer divisions at x1000 fixed point, and the score is

    fre_x1000 = 206835 - (1015 * n_words)     div max(n_sentences, 1)
                       - (84600 * n_syllables) div max(n_words, 1)

so both engines evaluate it bit-identically (no float crosses the
oracle boundary). Syllables use the standard vowel-group heuristic:
per word, the number of maximal ``[aeiouy]+`` runs (case-insensitive),
floored at 1 per word — the approximation every production readability
signal uses (true syllabification needs a dictionary).

Sentences are maximal non-empty segments between ``[.!?]`` runs.
Grade level (Kincaid et al. 1975) ships alongside:

    fkgl_x1000 = (390 * n_words)      div max(n_sentences, 1)
               + (11800 * n_syllables) div max(n_words, 1)
               - 15590

Scale shape: ONE narrow projection — pure column expressions over the
text column, zero shuffle, pushdown-friendly (the gopher_quality_flags
class). Nothing scales beyond the scan.

Reference parity: the reference is a row-level OHLCV ETL with no text
surface; engine-extension surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def readability_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, n_sentences, n_syllables, fre_x1000, fkgl_x1000)
    — one row per document, one narrow map."""
    w = F.filter(tokens(text_col), lambda x: x != "")
    n_words = F.size(w).cast("bigint")
    sents = F.split(F.col(text_col), r"[.!?]+")
    n_sent = F.size(
        F.filter(sents, lambda s: F.trim(s) != "")
    ).cast("bigint")
    syl = F.aggregate(
        w,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.greatest(
            F.size(F.regexp_extract_all(F.lower(x), F.lit("[aeiouy]+"), 0)),
            F.lit(1),
        ),
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        syl.alias("n_syllables"),
    ).select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "206835 - (1015 * n_words) div greatest(n_sentences, 1)"
            " - (84600 * n_syllables) div greatest(n_words, 1)"
        ).cast("bigint").alias("fre_x1000"),
        F.expr(
            "(390 * n_words) div greatest(n_sentences, 1)"
            " + (11800 * n_syllables) div greatest(n_words, 1) - 15590"
        ).cast("bigint").alias("fkgl_x1000"),
    )
