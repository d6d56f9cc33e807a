"""DoReMi mixture reweighting (operators/doremi.py): pure-Python
reference parity, specialist upweighting on planted heterogeneity, and
the honest negative — statistically identical domains stay uniform."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.doremi import (
    SCALE,
    doremi_weights,
)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _py_doremi(docs, rounds=3, en=1, ed=8, sn=1, sd=5):
    """Reference implementation over [(domain, text)] rows — same
    integer arithmetic, floor-log2 via bit_length."""
    dtc: Counter = Counter()
    ntd: Counter = Counter()
    for dom, text in docs:
        for t in text.strip().split():
            if t:
                dtc[(dom, t)] += 1
                ntd[dom] += 1
    doms = sorted(ntd)
    k = len(doms)

    def bits(q):  # floor(log2(q)), q >= 1
        return q.bit_length() - 1

    base = Counter()
    for (dom, t), c in dtc.items():
        base[dom] += c * bits(ntd[dom] // c)
    w = {d: SCALE // k for d in doms}
    for _ in range(rounds):
        mc: Counter = Counter()
        for (dom, t), c in dtc.items():
            mc[t] += w[dom] * c
        mt = sum(w[d] * ntd[d] for d in doms)
        lmix = Counter()
        for (dom, t), c in dtc.items():
            lmix[dom] += c * bits(mt // mc[t])
        upd = {}
        for d in doms:
            excess = max(0, _tdiv((lmix[d] - base[d]) * SCALE, ntd[d]))
            upd[d] = _tdiv(w[d] * (SCALE + _tdiv(excess * en, ed)), SCALE)
        tw = sum(upd.values())
        w = {
            d: _tdiv(_tdiv(upd[d] * SCALE, tw) * (sd - sn), sd)
            + _tdiv(SCALE * sn, sd * k)
            for d in doms
        }
    return w


HETERO = (
    [("news", "the quick brown fox jumped over the lazy dog again")] * 6
    + [("code", "def foo bar baz qux quux corge grault garply")] * 6
    # specialist: domain-unique rare tokens, cheap under its own model
    + [("law", "whereas heretofore aforesaid notwithstanding whereas heretofore")] * 2
)


def test_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, d, t) for i, (d, t) in enumerate(HETERO)],
        "doc_id bigint, source string, text string",
    )
    got = {
        r["domain"]: r["w"] for r in doremi_weights(df, rounds=3).collect()
    }
    want = _py_doremi(HETERO, rounds=3)
    assert got == want


def test_specialist_domain_upweighted(spark):
    """A domain whose tokens are rare in the mixture has positive
    excess code length and must end above the generalist domains."""
    df = spark.createDataFrame(
        [(i, d, t) for i, (d, t) in enumerate(HETERO)],
        "doc_id bigint, source string, text string",
    )
    w = {r["domain"]: r["w"] for r in doremi_weights(df, rounds=3).collect()}
    assert w["law"] > w["news"] and w["law"] > w["code"], w
    # weights still sum to ~SCALE (integer truncation only)
    assert abs(sum(w.values()) - SCALE) <= len(w) * 2


def test_identical_domains_stay_uniform(spark):
    """The honest negative: domains drawn from the same distribution
    have zero excess (own model == mixture model at integer-bit
    resolution), so MWU keeps the uniform mixture — DoReMi on an
    already-balanced corpus is a no-op by design."""
    rows = [(i, f"d{i % 4}", "alpha beta gamma delta epsilon") for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    w = {r["domain"]: r["w"] for r in doremi_weights(df, rounds=3).collect()}
    assert len(set(w.values())) == 1, w
