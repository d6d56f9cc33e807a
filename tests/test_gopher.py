"""Gopher-faithful filters (operators/gopher.py): every quality rule
and every repetition metric exercised both ways on constructed docs,
plus integer-exactness of the threshold comparisons."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.gopher import (
    gopher_quality_flags,
    gopher_repetition_stats,
)

# a doc that passes EVERY quality rule: 55 plain words incl. 2+ stop
# words, mean word length in [3, 10], no symbols/bullets/ellipses
_GOOD = (
    "the quick brown fox jumps over that lazy dog and runs with great "
    "speed across wide open fields where tall grass grows under warm "
    "summer skies while birds sing sweet songs from high branches and "
    "small streams flow gently past old stones toward distant hills "
    "carrying cool clear fresh water"
)


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return gopher_quality_flags(df).collect()[0].asDict()


def test_quality_good_doc_passes_all(spark):
    f = _flags(spark, _GOOD)
    assert all(v for k, v in f.items() if k != "doc_id"), f


def test_quality_each_rule_fails_its_violation(spark):
    words = _GOOD.split()
    cases = {
        # 10 words < 50
        "ok_word_count": " ".join(words[:10]),
        # mean word length 1 < 3 (50+ single-char words, keep stopwords
        # "be to of" for the stopword rule)
        "ok_mean_word_len": "be to of " + " ".join("a" for _ in range(60)),
        # >10% '#' symbols
        "ok_symbol_ratio": _GOOD + " " + " ".join("#" for _ in range(10)),
        # >90% bullet lines (every line bulleted)
        "ok_bullet_lines": "\n".join("- " + w for w in words),
        # >30% ellipsis-ended lines
        "ok_ellipsis_lines": "\n".join(
            w + ("..." if i % 2 == 0 else "") for i, w in enumerate(words)
        ),
        # >20% non-alphabetic words
        "ok_alpha_words": _GOOD + " " + " ".join(str(i) for i in range(20)),
        # fewer than 2 stop words
        "ok_stop_words": " ".join(f"w{i}" for i in range(60)),
    }
    for rule, text in cases.items():
        f = _flags(spark, text)
        assert not f[rule], (rule, f)
        assert not f["keep"], rule


def _metrics(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return {
        r["metric"]: (r["numer"], r["denom"], r["ok"])
        for r in gopher_repetition_stats(df).collect()
    }


def test_repetition_clean_doc_all_ok(spark):
    m = _metrics(spark, _GOOD)
    assert len(m) == 13
    assert all(ok for _n, _d, ok in m.values()), m
    # a one-line doc: line metrics have denom = 1, zero dups
    assert m["dup_line_frac"] == (0, 1, True)


def test_repetition_duplicate_lines_flagged(spark):
    text = "\n".join(["same exact line here"] * 4 + ["a unique closer"])
    m = _metrics(spark, text)
    # 3 beyond-first occurrences over 5 lines = 60% > 30%
    assert m["dup_line_frac"] == (3, 5, False)
    assert not m["dup_line_char_frac"][2]


def test_repetition_top_ngram_flagged(spark):
    # one dominant bigram: "buy now" repeated -> top 2-gram mass > 20%
    text = ("buy now " * 10) + " ".join(f"w{i}" for i in range(8))
    m = _metrics(spark, text)
    n, d, ok = m["top_ngram_char_2"]
    assert not ok and n * 100 > d * 20
    # and the integer pair is exact: numer = occurrences * gram chars
    assert n % len("buy now") == 0


def test_repetition_dup_ngram_flagged(spark):
    run = "alpha beta gamma delta epsilon zeta"  # 6 words
    text = (run + " ") * 3 + " ".join(f"u{i}" for i in range(6))
    m = _metrics(spark, text)
    assert not m["dup_ngram_char_6"][2], m["dup_ngram_char_6"]
    # short-doc honesty: a 3-word doc has no 5-grams -> numer 0 over
    # the doc's character count (the DataTrove denominator), ok
    m2 = _metrics(spark, "tiny doc here")
    assert m2["dup_ngram_char_5"] == (0, len("tiny doc here"), True)
    assert m2["top_ngram_char_4"] == (0, len("tiny doc here"), True)


def test_char_fraction_denominator_is_doc_length(spark):
    # DataTrove convention (ADVICE r11): every char-fraction metric
    # divides by length(text), not by the per-kind unit-char mass
    text = "\n".join(["same exact line here"] * 4 + ["a unique closer"])
    m = _metrics(spark, text)
    n, d, _ok = m["dup_line_char_frac"]
    assert d == len(text)
    assert n == 3 * len("same exact line here")


def test_symbol_ratio_is_per_symbol(spark):
    # paper/DataTrove apply the 0.1 threshold to '#' and '...' EACH:
    # 8% hash + 8% ellipsis must PASS (the old combined 16% failed it)
    both = _GOOD + " " + "# " * 4 + "... " * 4  # 58 words, 4 of each
    f = _flags(spark, both)
    assert f["ok_symbol_ratio"], f
    # but >10% of either single symbol still fails
    hash_heavy = _GOOD + " " + "# " * 8  # 58 words, 8 hashes
    assert not _flags(spark, hash_heavy)["ok_symbol_ratio"]
