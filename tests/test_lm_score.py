"""Bigram-LM quality scoring (operators/lm_score.py).

Checks the model math against hand-computed add-one probabilities, the
engine-exactness tricks (ppm floor, bitlength-as-log2), OOV and
short-document edges, and the lm_filter gate semantics.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators import lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_model_counts(spark):
    train = _docs(spark, [(1, "a b a b c"), (2, "a b")])
    model = lm_score.train_bigram_lm(train)
    bigrams = {
        (r["w1"], r["w2"]): r["c12"] for r in model.bigrams.collect()
    }
    # doc1: (a,b) (b,a) (a,b) (b,c); doc2: (a,b)
    assert bigrams == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    contexts = {r["w1"]: r["c1"] for r in model.contexts.collect()}
    assert contexts == {"a": 3, "b": 2}
    assert model.vocab_size == 3  # {a, b, c}


def test_score_matches_hand_computation(spark):
    train = _docs(spark, [(1, "a b a b c"), (2, "a b")])
    model = lm_score.train_bigram_lm(train)
    scored = {
        r["doc_id"]: r.asDict()
        for r in lm_score.score_docs(_docs(spark, [(9, "a b c")]), model)
        .collect()
    }[9]
    # (a,b): p = (3+1)/(3+3) = 2/3 -> ppm 666666, bits floor(log2(6/4)) = 0
    # (b,c): p = (1+1)/(2+3) = 2/5 -> ppm 400000, bits floor(log2(5/2)) = 1
    assert scored["n_bigrams"] == 2
    assert scored["n_oov"] == 0
    assert scored["sum_prob_ppm"] == 666666 + 400000
    assert scored["sum_bits"] == 0 + 1
    assert scored["mean_prob_ppm"] == (666666 + 400000) // 2
    assert scored["avg_bits_x100"] == 50
    assert scored["avg_logprob_bits"] == pytest.approx(0.5)


def test_oov_and_unseen_context(spark):
    model = lm_score.train_bigram_lm(_docs(spark, [(1, "a b")]))
    # V = 2; (z,q): context z unseen -> c1 = 0, p = 1/2, oov
    row = (
        lm_score.score_docs(_docs(spark, [(7, "z q")]), model)
        .collect()[0]
    )
    assert row["n_bigrams"] == 1 and row["n_oov"] == 1
    assert row["sum_prob_ppm"] == 500000
    assert row["sum_bits"] == 1  # floor(log2(2/1)) = 1


def test_short_docs_score_zero_with_null_means(spark):
    model = lm_score.train_bigram_lm(_docs(spark, [(1, "a b")]))
    rows = {
        r["doc_id"]: r.asDict()
        for r in lm_score.score_docs(
            _docs(spark, [(1, "solo"), (2, "")]), model
        ).collect()
    }
    for doc_id in (1, 2):
        assert rows[doc_id]["n_bigrams"] == 0
        assert rows[doc_id]["sum_bits"] == 0
        assert rows[doc_id]["mean_prob_ppm"] is None
        assert rows[doc_id]["avg_bits_x100"] is None


def test_bitlength_equals_floor_log2():
    # the no-libm identity the operator rests on, over a dense sweep
    for a in range(1, 400):
        for b in range(1, a + 1):
            expected = math.floor(math.log2(a / b))
            got = (a // b).bit_length() - 1
            # guard: only exact when floor(a/b) >= 1, which a >= b gives
            assert got == expected, (a, b)


def test_lm_filter_keeps_low_surprisal(spark):
    train = _docs(spark, [(1, "the cat sat on the mat " * 5)])
    model = lm_score.train_bigram_lm(train)
    corpus = _docs(
        spark,
        [
            (10, "the cat sat on the mat"),  # in-domain
            (11, "zz qq ww ee rr tt yy"),  # gibberish, all OOV
            (12, "x"),  # no bigrams -> dropped
        ],
    )
    scored = lm_score.score_docs(corpus, model)
    bits = {
        r["doc_id"]: r["avg_bits_x100"] for r in scored.collect()
    }
    assert bits[10] < bits[11]
    kept = lm_score.lm_filter(
        corpus, model, max_avg_bits_x100=int(bits[10])
    )
    assert [r["doc_id"] for r in kept.collect()] == [10]
    # filter preserves the input schema
    assert kept.columns == corpus.columns


def test_trigram_model_counts(spark):
    train = _docs(spark, [(1, "a b c a b c"), (2, "a b d")])
    model = lm_score.train_trigram_lm(train)
    tri = {
        (r["w1"], r["w2"], r["w3"]): r["c123"]
        for r in model.trigrams.collect()
    }
    # doc1: (a,b,c) (b,c,a) (c,a,b) (a,b,c); doc2: (a,b,d)
    assert tri == {
        ("a", "b", "c"): 2,
        ("b", "c", "a"): 1,
        ("c", "a", "b"): 1,
        ("a", "b", "d"): 1,
    }
    ctx = {(r["w1"], r["w2"]): r["c12"] for r in model.tri_contexts.collect()}
    assert ctx == {("a", "b"): 3, ("b", "c"): 1, ("c", "a"): 1}
    # backoff tier: bigram counts over the full stream, keyed (w2, w3)
    bi = {(r["w2"], r["w3"]): r["c23"] for r in model.bigrams.collect()}
    assert bi[("a", "b")] == 3 and bi[("b", "c")] == 2
    assert model.vocab_size == 4  # {a, b, c, d}


def test_trigram_backoff_hand_computation(spark):
    """Seen context scores at the trigram tier; unseen context backs
    off to the bigram tier; unseen everywhere hits the uniform row —
    all three hand-verified through the quantized columns."""
    train = _docs(spark, [(1, "a b c a b c a b d")])
    model = lm_score.train_trigram_lm(train)
    v = model.vocab_size  # {a,b,c,d} = 4
    assert v == 4
    # trigram tier: ctx (a,b) seen (c12=3), target c: c123=2
    # -> ppm = floor(1e6 * 3/7); bits = floor(log2(7/3)) = 1
    # backoff: doc "c b" -> trigram needs 3 tokens; use "x a b" style:
    corpus = _docs(
        spark,
        [
            (10, "a b c"),  # seen ctx (a,b): (2+1)/(3+4)
            (11, "b a b"),  # ctx (b,a) unseen -> backoff (a,b): c23=3, c2: a followed 3 times? see below
            (12, "q q q"),  # unseen everywhere: (0+1)/(0+4)
        ],
    )
    out = {r["doc_id"]: r for r in lm_score.score_docs3(corpus, model).collect()}
    # doc 10: 1 trigram, no backoff, ppm = floor(1e6*3/7) = 428571
    assert out[10]["n_trigrams"] == 1 and out[10]["n_backoff"] == 0
    assert out[10]["sum_prob_ppm"] == 428571
    assert out[10]["sum_bits"] == 1  # floor(log2(7/3)) = 1
    # doc 11: ctx (b,a) unseen -> bigram (a,b): c23=3; c2 = tokens after 'a' = 3
    # ppm = floor(1e6 * 4/7) = 571428; bits = floor(log2(7/4)) = 0
    assert out[11]["n_backoff"] == 1 and out[11]["n_oov"] == 0
    assert out[11]["sum_prob_ppm"] == 571428 and out[11]["sum_bits"] == 0
    # doc 12: all-unseen -> uniform (0+1)/(0+4): ppm=250000, bits=2, oov
    assert out[12]["n_backoff"] == 1 and out[12]["n_oov"] == 1
    assert out[12]["sum_prob_ppm"] == 250000 and out[12]["sum_bits"] == 2


def test_kn_model_counts_are_type_counts(spark):
    """The KN insight pinned at the count level: the continuation tier
    counts DISTINCT preceding contexts (types), not occurrences
    (tokens) — a bigram seen 3 times under 2 distinct w1's has
    cont23 = 2."""
    # trigrams: (a,z,w) x2, (b,z,w) x1, plus the connective ones
    train = _docs(spark, [(1, "a z w b z w a z w")])
    model = lm_score.train_kn_trigram_lm(train)
    cbg = {
        (r["w2"], r["w3"]): r["cont23"]
        for r in model.cont_bigrams.collect()
    }
    assert cbg[("z", "w")] == 2  # {a, b}, NOT the 3 occurrences
    ctx = {
        (r["w1"], r["w2"]): (r["c12"], r["n1pp"])
        for r in model.contexts.collect()
    }
    assert ctx[("a", "z")] == (2, 1)  # two tokens, one distinct w3
    cctx = {r["w2"]: r["cont2"] for r in model.cont_contexts.collect()}
    # cont2(z) = distinct (w1, w3) around z = {(a,w),(b,w)} = 2
    assert cctx["z"] == 2


def test_kn_hand_computation(spark):
    """Interpolated KN through the quantized columns, all three paths
    hand-verified: seen context (discount + interpolation), unseen
    context (continuation backoff), unseen everywhere (uniform row)."""
    train = _docs(spark, [(1, "a b c a b c a b d")])
    model = lm_score.train_kn_trigram_lm(train)
    assert model.vocab_size == 4  # {a,b,c,d}
    corpus = _docs(
        spark,
        [
            (10, "a b c"),  # seen ctx (a,b): c123=2, c12=3, n1pp=2
            (11, "b a b"),  # ctx (b,a) unseen -> continuation (a,b)
            (12, "q q q"),  # unseen everywhere -> uniform
        ],
    )
    out = {
        r["doc_id"]: r
        for r in lm_score.score_docs_kn(corpus, model).collect()
    }
    # doc 10: cont23(b,c)=1, cont2(b)=2 -> pc = floor(1e6*2/6) = 333333
    #   t1 = floor(1e6 * (4*2-3) / (4*3)) = floor(5e6/12)  = 416666
    #   t2 = floor(3*2*333333 / 12)       = floor(166666.5) = 166666
    #   ppm = 583332; bits = floor(log2(1e6/583332)) = 0
    assert out[10]["n_trigrams"] == 1 and out[10]["n_backoff"] == 0
    assert out[10]["sum_prob_ppm"] == 583332 and out[10]["sum_bits"] == 0
    assert out[10]["n_oov"] == 0
    # doc 11: ctx (b,a) unseen -> pc over cont23(a,b)=1, cont2(a)=1:
    #   ppm = floor(1e6*2/5) = 400000; bits = floor(log2(2.5)) = 1
    assert out[11]["n_backoff"] == 1 and out[11]["n_oov"] == 0
    assert out[11]["sum_prob_ppm"] == 400000 and out[11]["sum_bits"] == 1
    # doc 12: all-unseen -> uniform (0+1)/(0+4): ppm=250000, bits=2
    assert out[12]["n_backoff"] == 1 and out[12]["n_oov"] == 1
    assert out[12]["sum_prob_ppm"] == 250000 and out[12]["sum_bits"] == 2


def test_kn_distribution_normalizes(spark):
    """Engine-level sanity for the interpolation algebra: summing the
    quantized KN probability over the WHOLE vocabulary for a fixed
    seen context stays <= 1e6 (the floors only lose mass), and is
    close enough to 1e6 that the distribution is genuinely normalized
    (not accidentally a sub-probability)."""
    train = _docs(spark, [(1, "a b c a b c a b d b c d c d a")])
    model = lm_score.train_kn_trigram_lm(train)
    vocab = ["a", "b", "c", "d"]
    probe = _docs(
        spark, [(i, f"a b {w}") for i, w in enumerate(vocab)]
    )
    rows = lm_score.score_docs_kn(probe, model).collect()
    total = sum(r["sum_prob_ppm"] for r in rows)
    assert total <= 1_000_000
    assert total >= 1_000_000 - 4 * len(vocab)  # floors lose < ~4/term


def test_lm_filter_kn_gate(spark):
    """lm_filter_kn keeps low-surprisal docs, drops high, preserves
    schema, drops no-trigram docs (no-evidence policy)."""
    train = _docs(spark, [(1, "the cat sat on the mat " * 5)])
    model = lm_score.train_kn_trigram_lm(train)
    corpus = spark.createDataFrame(
        [
            (10, "the cat sat on the mat", "en"),
            (11, "zz qq ww rr tt yy", "xx"),
            (12, "hi", "en"),  # < 3 tokens: no evidence
        ],
        "doc_id long, text string, lang string",
    )
    scores = {
        r["doc_id"]: r["avg_bits_x100"]
        for r in lm_score.score_docs_kn(corpus, model).collect()
        if r["n_trigrams"] > 0
    }
    assert scores[10] < scores[11]
    kept = lm_score.lm_filter_kn(corpus, model, int(scores[10]))
    assert [r["doc_id"] for r in kept.collect()] == [10]
    assert kept.columns == corpus.columns


def test_ppl_buckets_terciles(spark):
    """CCNet bucket semantics: within each group, docs split into
    head/middle/tail by perplexity terciles — every head doc scores at
    or below every middle doc, every middle at or below every tail,
    and the split is roughly a third each. No-evidence docs are
    excluded."""
    train = _docs(
        spark, [(1, "the cat sat on the mat and the dog ran off " * 3)]
    )
    model = lm_score.train_kn_trigram_lm(train)
    rows = [
        # three score clusters (1-bit quantization ties docs within a
        # cluster): pure in-domain (0), one-OOV-token (100-133),
        # all-OOV uniform rows (300)
        (10, "the cat sat on the mat", "en"),
        (11, "the dog ran off", "en"),
        (12, "the cat sat on the mat and the dog", "en"),
        (13, "the cat sat on the mat zz", "en"),
        (14, "the dog ran off qq", "en"),
        (15, "the mat and the dog ww", "en"),
        (16, "zz qq ww rr tt", "en"),
        (17, "aa bb cc dd", "en"),
        (18, "ee ff gg hh ii jj", "en"),
        (19, "hi", "en"),  # no trigram -> excluded
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    out = lm_score.ppl_buckets(corpus, model, width=5.0).collect()
    assert len(out) == 9  # doc 19 excluded
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r["ppl_bucket"], []).append(
            r["avg_bits_x100"]
        )
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # terciles: each cluster of 3 lands in its own bucket
    assert all(len(v) == 3 for v in by_bucket.values())


def test_kn_full_hand_computation(spark):
    """Fully recursive KN through the quantized columns, all three
    paths hand-verified: seen context (two nested discount+interpolate
    tiers), unseen context (discounted continuation tier), unseen
    everywhere (continuation-unigram floor)."""
    train = _docs(spark, [(1, "a b c a b c a b d")])
    model = lm_score.train_kn_full_lm(train)
    assert model.vocab_size == 4 and model.n_tri_types == 4
    corpus = _docs(
        spark,
        [(10, "a b c"), (11, "b a b"), (12, "q q q")],
    )
    out = {
        r["doc_id"]: r
        for r in lm_score.score_docs_kn_full(corpus, model).collect()
    }
    # doc 10: p1(c)=floor(1e6*2/8)=250000;
    #   p2 = floor(1e6*1/8) + floor(3*2*250000/8) = 125000+187500 = 312500
    #   ppm = floor(1e6*5/12) + floor(3*2*312500/12) = 416666+156250 = 572916
    assert out[10]["sum_prob_ppm"] == 572916 and out[10]["sum_bits"] == 0
    assert out[10]["n_backoff"] == 0 and out[10]["n_oov"] == 0
    # doc 11: ctx (b,a) unseen -> p2 of (a,b): p1(b)=250000,
    #   p2 = floor(1e6/4) + floor(3*1*250000/4) = 250000+187500 = 437500
    assert out[11]["sum_prob_ppm"] == 437500 and out[11]["sum_bits"] == 1
    assert out[11]["n_backoff"] == 1 and out[11]["n_oov"] == 0
    # doc 12: zero evidence everywhere -> p1 floor = 1e6*1/8 = 125000
    assert out[12]["sum_prob_ppm"] == 125000 and out[12]["sum_bits"] == 3
    assert out[12]["n_backoff"] == 1 and out[12]["n_oov"] == 1


def test_kn_full_distribution_normalizes(spark):
    """The recursive interpolation algebra: each tier's discount mass
    funds the one below, so summing the quantized probability over the
    vocabulary for a fixed seen context stays <= 1e6 and close to it
    (floors only lose mass) — at every tier depth."""
    train = _docs(spark, [(1, "a b c a b c a b d b c d c d a")])
    model = lm_score.train_kn_full_lm(train)
    vocab = ["a", "b", "c", "d"]
    probe = _docs(spark, [(i, f"a b {w}") for i, w in enumerate(vocab)])
    rows = lm_score.score_docs_kn_full(probe, model).collect()
    total = sum(r["sum_prob_ppm"] for r in rows)
    assert total <= 1_000_000
    assert total >= 1_000_000 - 6 * len(vocab)  # nested floors, < ~6/term
