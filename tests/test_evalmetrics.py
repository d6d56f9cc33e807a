"""Eval-harness metrics (operators/evalmetrics.py): SQuAD
normalization, multiset-F1 semantics, the empty-pair convention, and
the in-engine LCS fold against a pure-Python twin."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.evalmetrics import (
    EVAL_SCALE,
    rouge_l,
    token_f1,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id bigint, prediction string, reference string"
    )


def _f1(spark, pred, ref):
    return token_f1(_pairs(spark, [(1, pred, ref)])).collect()[0]


def test_squad_normalization_and_em(spark):
    # articles, punctuation, case, and whitespace are all ignored
    r = _f1(spark, "The  Cat, sat!", "cat sat")
    assert (r["n_pred"], r["n_ref"], r["n_overlap"]) == (2, 2, 2)
    assert r["em"] == 1 and r["f1_x1e6"] == EVAL_SCALE


def test_multiset_overlap_not_set(spark):
    # official squad_v1 counts DUPLICATES: pred has 'x' twice but the
    # reference once -> overlap 1, not 2 (a set metric would say 1 too,
    # so pin the reverse as well: both twice -> overlap 2)
    r = _f1(spark, "x x y", "x y y")
    assert r["n_overlap"] == 2  # min(2,1) + min(1,2)
    assert r["f1_x1e6"] == 2 * 2 * EVAL_SCALE // 6
    r2 = _f1(spark, "x x", "x x")
    assert r2["n_overlap"] == 2 and r2["em"] == 1


def test_empty_pair_conventions(spark):
    # both empty after normalization (article-only strings): F1 = 1
    r = _f1(spark, "the", "an a")
    assert r["n_pred"] == 0 and r["n_ref"] == 0
    assert r["f1_x1e6"] == EVAL_SCALE and r["em"] == 1
    # one side empty: F1 = 0
    r = _f1(spark, "the", "cat")
    assert r["f1_x1e6"] == 0 and r["em"] == 0


def _py_lcs(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(max(prev[j], cur[j - 1], prev[j - 1] + (x == y)))
        prev = cur
    return prev[-1]


def test_rouge_l_matches_python_lcs(spark):
    # no articles: the operator normalizes 'a/an/the' away, and the
    # twin here applies a plain split
    cases = [
        ("q b c d e", "b q c x e"),
        ("w1 w2 w3 w1 w2", "w2 w1 w2 w3"),
        ("same same same", "same same same"),
        ("abc", "xyz"),
    ]
    rows = [(i, p, r) for i, (p, r) in enumerate(cases)]
    got = {
        r["pair_id"]: (r["lcs"], r["rouge_l_f_x1e6"])
        for r in rouge_l(_pairs(spark, rows)).collect()
    }
    for i, (p, r) in enumerate(cases):
        a, b = p.split(), r.split()
        lcs = _py_lcs(a, b)
        f = (
            EVAL_SCALE
            if len(a) + len(b) == 0
            else 2 * lcs * EVAL_SCALE // (len(a) + len(b))
        )
        assert got[i] == (lcs, f), (i, got[i], lcs, f)


def test_rouge_l_subsequence_not_substring(spark):
    # 'p ... b ... c' is a subsequence of the reference though never
    # contiguous — LCS must see it
    r = rouge_l(_pairs(spark, [(1, "p b c", "p x b y c")])).collect()[0]
    assert r["lcs"] == 3


def test_lcs_bitparallel_matches_dp():
    # the Arrow-escape kernel (optimization r12) against the classic
    # DP, driver-side: random token sequences crossing the 64-bit
    # word boundary (m > 64) so the big-int carry path is exercised
    import random

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.evalmetrics import (
        _lcs_bitparallel,
    )

    rng = random.Random(7)
    ps, rs, want = [], [], []
    for _ in range(500):
        n, m = rng.randint(0, 90), rng.randint(0, 90)
        alpha = rng.randint(1, 8)
        p = [f"t{rng.randint(0, alpha)}" for _ in range(n)]
        r = [f"t{rng.randint(0, alpha)}" for _ in range(m)]
        ps.append(p)
        rs.append(r)
        want.append(_py_lcs(p, r))
    ps.append(None)
    rs.append(["x"])
    want.append(None)
    got = list(_lcs_bitparallel(ps, rs))
    assert got == want


def test_rouge_l_long_doc_crosses_word_boundary(spark):
    # one in-engine case with both sides > 64 tokens
    p = " ".join(f"w{i % 13}" for i in range(150))
    r = " ".join(f"w{(i * 3) % 13}" for i in range(140))
    row = rouge_l(_pairs(spark, [(1, p, r)])).collect()[0]
    assert row["lcs"] == _py_lcs(p.split(), r.split())
