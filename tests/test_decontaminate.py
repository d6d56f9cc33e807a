"""Span-level benchmark decontamination (operators/text.py:
decontaminate_spans/apply — VERDICT r10 #5): a planted benchmark
overlap mid-doc is cut with both tails intact, clean docs pass
through unchanged, and whole-doc q_decontaminate flags exactly the
rewritten docs."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
    decontaminate_apply,
    decontaminate_spans,
)

# benchmark doc carries the 6-token run; corpus doc 20 embeds 5 of its
# tokens MID-DOC (neither prefix- nor suffix-aligned); doc 21 is clean;
# doc 22 embeds a full 6-token overlap so two 5-gram windows merge into
# one maximal span
_BENCH = [(1, "aaa bbb ccc ddd eee fff")]
_CORPUS = [
    (20, "x1 x2 bbb ccc ddd eee fff y1 y2"),
    (21, "p1 p2 p3 p4 p5 p6 p7"),
    (22, "z1 aaa bbb ccc ddd eee fff z2"),
]


def _frames(spark):
    bench = spark.createDataFrame(_BENCH, "doc_id bigint, text string")
    corpus = spark.createDataFrame(_CORPUS, "doc_id bigint, text string")
    return corpus, bench


def test_planted_overlap_spans(spark):
    corpus, bench = _frames(spark)
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in decontaminate_spans(corpus, bench, min_len=5).collect()
    }
    # doc 20: run occupies tokens 3..7, one 5-gram window
    # doc 22: tokens 2..7, two overlapping windows merged to one span
    assert spans == {(20, 3, 7, 1), (22, 2, 7, 2)}


def test_planted_overlap_apply_keeps_tails(spark):
    corpus, bench = _frames(spark)
    got = {
        r["doc_id"]: (r["kept_text"], r["n_tokens"], r["n_removed"])
        for r in decontaminate_apply(corpus, bench, min_len=5).collect()
    }
    assert got[20] == ("x1 x2 y1 y2", 9, 5)  # span cut, tails intact
    assert got[21] == ("p1 p2 p3 p4 p5 p6 p7", 7, 0)  # clean: unchanged
    assert got[22] == ("z1 z2", 8, 6)
    assert set(got) == {20, 21, 22}  # benchmark docs never emitted


def test_indexed_fold_equals_full_rebuild(spark):
    """The incremental contract: decontaminate_apply_indexed over a
    delta slice against the frozen benchmark gram index == the full
    direct apply restricted to the delta ids."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
        benchmark_gram_index,
        decontaminate_apply_indexed,
    )

    corpus, bench = _frames(spark)
    idx = benchmark_gram_index(bench, min_len=5)
    delta = corpus.filter("doc_id >= 21")  # the 'new batch'
    fold = {
        tuple(r)
        for r in decontaminate_apply_indexed(delta, idx, min_len=5).collect()
    }
    full = {
        tuple(r)
        for r in decontaminate_apply(corpus, bench, min_len=5)
        .filter("doc_id >= 21")
        .collect()
    }
    assert fold == full and len(fold) == 2


def test_benchmark_itself_never_rewritten(spark):
    """The benchmark frame is reference-only: its own internal dups do
    not produce spans, and a corpus doc IDENTICAL to a benchmark doc is
    fully removed (total contamination)."""
    corpus, bench = _frames(spark)
    clone = corpus.sparkSession.createDataFrame(
        [(30, _BENCH[0][1])], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["kept_text"], r["n_removed"])
        for r in decontaminate_apply(clone, bench, min_len=5).collect()
    }
    assert got == {30: ("", 6)}
