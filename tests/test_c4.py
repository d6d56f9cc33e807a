"""C4-faithful filter front (operators/c4.py): every line rule and
page rule exercised both ways on constructed docs, plus the
three-sentence span dedup's keep-first semantics."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.c4 import (
    c4_apply,
    c4_quality_flags,
    c4_span_dedup,
)

# a page that passes every rule: 4 terminated lines of >= 3 words
_GOOD = (
    "the quick brown fox jumps today.\n"
    "lazy dogs sleep in warm sunshine!\n"
    "do birds sing sweet morning songs?\n"
    'she said the water was \"cold."'.replace("\\", "")
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _flags(spark, text, flag_words=None):
    wl = (
        spark.createDataFrame([(w,) for w in flag_words], "word string")
        if flag_words
        else None
    )
    return c4_quality_flags(_df(spark, [(1, text)]), flag_words=wl).collect()[
        0
    ].asDict()


def test_good_page_passes(spark):
    f = _flags(spark, _GOOD)
    assert f["keep"] and f["n_kept_lines"] == 4 and f["n_sentences"] == 4, f


def test_line_rules_drop_only_their_line(spark):
    cases = {
        # no terminal punctuation
        "an unterminated line of words": "terminal",
        # < 3 words
        "too short.": "min_words",
        # javascript banner (case-insensitive substring)
        "please enable JavaScript to continue.": "javascript",
        # policy phrase (DataTrove filter_policy)
        "this site uses cookies for tracking.": "policy",
    }
    for bad_line, label in cases.items():
        f = _flags(spark, _GOOD + "\n" + bad_line)
        assert f["n_lines"] == 5 and f["n_kept_lines"] == 4, (label, f)
        assert f["keep"], label  # line rules rewrite, never drop the page


def test_citation_scrub_runs_before_checks(spark):
    # the citation marker is removed BEFORE the terminal-punct check:
    # "....[1]" would fail raw, passes scrubbed
    f = _flags(spark, _GOOD + "\n" + "facts need citations sometimes.[1]")
    assert f["n_kept_lines"] == 5, f
    f2 = _flags(spark, _GOOD + "\n" + "disputed claim here.[citation needed]")
    assert f2["n_kept_lines"] == 5, f2


def test_page_rules_each_drop_the_page(spark):
    assert not _flags(spark, _GOOD + "\nsome Lorem Ipsum filler text.")["keep"]
    assert not _flags(spark, _GOOD + "\nvar f = function() { return 1 }")[
        "keep"
    ]
    assert not _flags(
        spark, _GOOD + "\nthis page has one badword inside.",
        flag_words=["badword"],
    )["keep"]
    # and the flag-words rule is token-level: substring-only is safe
    assert _flags(
        spark, _GOOD + "\nthis page has badwordish content only.",
        flag_words=["badword"],
    )["keep"]
    # fewer than 3 sentences AFTER line filtering drops the page
    two = "good first line stands here.\nanother decent line stays too."
    f = _flags(spark, two)
    assert f["n_sentences"] == 2 and not f["ok_min_sentences"] and not f["keep"]


def test_apply_rewrites_and_drops(spark):
    df = _df(
        spark,
        [
            (1, _GOOD + "\nan unterminated trailing line"),
            (2, _GOOD + "\nembedded lorem ipsum kills pages."),
        ],
    )
    out = {r["doc_id"]: r["text"] for r in c4_apply(df).collect()}
    assert set(out) == {1}
    assert out[1] == _GOOD  # the bad line is cut, the rest verbatim


def test_span_dedup_keeps_first_occurrence(spark):
    boiler = "alpha one two. beta three four. gamma five six."
    df = _df(
        spark,
        [
            (1, "unique opener sentence here. " + boiler),
            (2, "different first sentence again. " + boiler),
            (3, boiler),  # entirely the duplicated span -> doc drops
            (4, "totally unrelated page text. with two sentences."),
        ],
    )
    out = {r["doc_id"]: r for r in c4_span_dedup(df).collect()}
    # doc 1 holds the first (min doc_id, pos) occurrence -> untouched
    assert out[1]["n_removed"] == 0 and boiler in out[1]["text"]
    # doc 2 loses the 3-sentence block, keeps its unique opener
    assert out[2]["n_removed"] == 3
    assert out[2]["text"] == "different first sentence again."
    # doc 3 is emptied entirely -> absent
    assert 3 not in out
    # doc 4 shares nothing -> identity
    assert out[4]["n_removed"] == 0 and out[4]["text"] == (
        "totally unrelated page text. with two sentences."
    )


def test_filter_ablation_invariants(spark):
    """The attribution census's arithmetic invariants: marginal <=
    standalone per front, survivors monotonically non-increasing, and
    survivors(k) = survivors(k-1) - marginal(k)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.queries.c4_ops import (
        q_filter_ablation,
    )

    from .conftest import SF_SMALL

    rows = {
        r["stage_id"]: r
        for r in q_filter_ablation(spark, SF_SMALL).collect()
    }
    assert [rows[i]["front"] for i in (1, 2, 3)] == [
        "gopher_quality", "gopher_repetition", "c4",
    ]
    prev_surv = None
    for i in (1, 2, 3):
        r = rows[i]
        assert r["n_fail_marginal"] <= r["n_fail_standalone"]
        if prev_surv is not None:
            assert r["n_survivors"] == prev_surv - r["n_fail_marginal"]
            assert r["n_survivors"] <= prev_surv
        prev_surv = r["n_survivors"]
