"""DoReMi-style iterative domain-mixture reweighting in scaled-integer
arithmetic (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up
Language Model Pretraining", arXiv:2305.10429 — the multiplicative-
weights outer loop, with an in-engine computable loss model).

DoReMi's loop: per round, compute each domain's EXCESS LOSS (proxy-model
loss minus reference-model loss) under the current mixture, then update
domain weights multiplicatively and renormalize with uniform smoothing.
The full method trains a proxy LM per round; the in-engine analogue
keeps the loop faithful while replacing the neural losses with exactly
computable code lengths:

- proxy loss  l_mix(d)  = total bits to code domain d's tokens under the
  CURRENT alpha-weighted mixture unigram model (so the loss genuinely
  depends on the current weights — the iteration is a real fixed-point,
  not a one-shot),
- reference loss l_own(d) = bits to code domain d under its OWN unigram
  model (the per-domain optimum a well-fit reference achieves).

Everything is integer-exact (the operators/pagerank.py fixed-point
discipline), so the trained weights are bit-reproducible on any engine
and any partitioning and the DuckDB oracle unrolls the same rounds:

- counts are integer sums; mixture counts are sums of w_d * cnt_d
  (weights are BIGINTs at SCALE=10^6);
- code lengths use integer floor-log2: bits(p) for p = total/count is
  length(bin(total div count)) - 1, exact in both engines via the
  identity floor(log2(a/b)) == floor(log2(a div b)) for a >= b >= 1
  (no float log anywhere);
- the multiplicative update is the standard linearized MWU factor
  (1 + eta * excess): w' = (w * (SCALE + eta_num*excess div eta_den))
  div SCALE, then integer renormalization to sum ~SCALE and uniform
  smoothing w <- (1-c)*w + c/k (c = smooth_num/smooth_den), which keeps
  every weight strictly positive like DoReMi's smoothing term.

Scale shape per round: one broadcast join (weights: k domains) + one
token-keyed hash-agg (mixture counts) + one token-keyed join of the
(domain, token, cnt) table against the mixture counts + one domain-keyed
hash-agg — vocabulary-sized work, no corpus re-scan after the single
upfront tokenize, no driver-side state beyond the k-row weight frame
(localCheckpoint-cut per round, the classifier/bpe_train convention).

Reference parity: the reference is a row-level OHLCV ETL with no ML
surface; engine-extension surface (SURVEY.md section 8, VERDICT r9 #7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

SCALE = 1_000_000  # 10^6 fixed-point scale for domain weights


def _bits(q):  # floor(log2(q)) for q >= 1, exact: binary digit count - 1
    return (F.length(F.bin(q)) - F.lit(1)).cast("bigint")


def domain_token_stats(
    docs: DataFrame, domain_col: str = "source", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The sufficient statistics DoReMi iterates over, computed in ONE
    corpus pass: (domain, tok, cnt) integer counts and (domain, n_tok)
    totals. Both are vocabulary/domain-sized — the corpus never gets
    re-read inside the loop."""
    toks = docs.select(
        F.col(domain_col).alias("domain"),
        F.explode(tokens(text_col)).alias("tok"),
    ).filter(F.col("tok") != "")
    dtc = toks.groupBy("domain", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ntd = toks.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    return dtc, ntd


def doremi_weights(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    rounds: int = 3,
    eta_num: int = 1,
    eta_den: int = 8,
    smooth_num: int = 1,
    smooth_den: int = 5,
) -> DataFrame:
    """Domain mixture weights after ``rounds`` multiplicative-weights
    rounds. Returns (domain, w) with w a BIGINT in units of 1/SCALE,
    summing to ~SCALE (integer truncation may shave a few units).

    Overflow bounds: w <= SCALE after each normalize; excess bits/token
    <= 63*SCALE; the widest product w * (SCALE + 63*SCALE*eta) stays
    < 10^14 — decades of BIGINT headroom at any corpus size."""
    dtc, ntd = domain_token_stats(docs, domain_col, text_col)
    dtc = dtc.persist()
    ntd = ntd.persist()

    # reference loss: bits to code each domain under its own unigram
    # model (computed once) — q_own = n_tok div cnt >= 1
    base = (
        dtc.join(F.broadcast(ntd), "domain")
        .select(
            "domain",
            (F.col("cnt") * _bits(F.expr("n_tok div cnt"))).alias("_b"),
        )
        .groupBy("domain")
        .agg(F.sum("_b").alias("l_own"))
    )
    k1 = ntd.agg(F.count(F.lit(1)).alias("k"))  # 1 row: n_domains

    weights = ntd.join(F.broadcast(k1)).select(
        "domain", F.expr(f"{SCALE} div k").cast("bigint").alias("w")
    )
    for _ in range(rounds):
        wd = F.broadcast(weights)
        mc = (
            dtc.join(wd, "domain")
            .groupBy("tok")
            .agg(F.sum(F.col("w") * F.col("cnt")).alias("mc"))
        )
        mt = (
            ntd.join(wd, "domain")
            .agg(F.sum(F.col("w") * F.col("n_tok")).alias("mt"))
        )
        lmix = (
            dtc.join(mc, "tok")
            .join(F.broadcast(mt))
            .select(
                "domain",
                (F.col("cnt") * _bits(F.expr("mt div mc"))).alias("_b"),
            )
            .groupBy("domain")
            .agg(F.sum("_b").alias("l_mix"))
        )
        upd = (
            weights.join(lmix, "domain")
            .join(F.broadcast(base), "domain")
            .join(F.broadcast(ntd), "domain")
            .select(
                "domain",
                F.expr(
                    f"greatest(0L, ((l_mix - l_own) * {SCALE}) div n_tok)"
                ).alias("excess"),
                "w",
            )
            .select(
                "domain",
                F.expr(
                    f"(w * ({SCALE} + (excess * {eta_num}) div {eta_den}))"
                    f" div {SCALE}"
                ).alias("w"),
            )
        )
        tot = upd.agg(F.sum("w").alias("tw"))
        weights = (
            upd.join(F.broadcast(tot))
            .join(F.broadcast(k1))
            .select(
                "domain",
                (
                    F.expr(
                        f"(((w * {SCALE}) div tw) * {smooth_den - smooth_num})"
                        f" div {smooth_den}"
                    )
                    + F.expr(
                        f"({SCALE} * {smooth_num}) div ({smooth_den} * k)"
                    )
                ).cast("bigint").alias("w"),
            )
        )
        # k-row frame (one row per domain), referenced 3x next round:
        # cut lineage with a bounded-artifact collect (the classifier
        # convention — a floating localCheckpoint leaves a pinned JVM
        # RDD per round until Python GC, which made executor-cache
        # contents nondeterministic across the test session)
        rows = [(r["domain"], r["w"]) for r in weights.collect()]
        weights = docs.sparkSession.createDataFrame(
            rows, schema="domain string, w bigint"
        )
    dtc.unpersist()
    ntd.unpersist()
    return weights
