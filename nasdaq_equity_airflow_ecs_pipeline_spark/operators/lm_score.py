"""Count-based n-gram language-model scoring (CCNet / KenLM analog).

CCNet's headline quality signal is the perplexity of a small LM trained
on a trusted corpus (Wikipedia) evaluated on every candidate document
(Wenzek et al. 2020, public literature — no reference-repo analog; the
reference's quality surface is the GX expectation set). This module is
the distributed, engine-exact version of that filter:

- ``train_bigram_lm``: add-one-smoothed bigram counts from a training
  slice — ``(w1, w2, c12)`` plus per-context totals ``(w1, c1)`` and the
  training vocabulary size ``V``. Pure map-side bigram explode (array
  ``transform`` over the token array, no self-join) into one hash
  aggregate; the model is corpus-sized state and is therefore NEVER
  broadcast (the lint-enforced class) — scoring reaches it through a
  shuffled equi-join.
- ``score_docs``: per-document likelihood statistics under the model.
  p(w2|w1) = (c12 + 1) / (c1 + V); a context unseen in training backs
  off to the uniform 1/V row, so every bigram has positive mass.

Cross-engine exactness (the repo's tfidf precedent, extended to the log
domain): no libm call ever reaches a compared column.

- ``prob_ppm = floor(1e6 * (c12+1) / (c1+V))`` — the product is an
  exact double (< 2^53), the single division is correctly rounded in
  IEEE, so both engines floor the same double.
- ``surprisal_bits = floor(log2(1/p))`` computed WITHOUT log2: for
  integers a = c1+V, b = c12+1 with a >= b, floor(log2(a/b)) equals
  ``len(bin(floor(a/b))) - 1`` (powers of two are integers, so flooring
  the ratio cannot cross a log2 boundary). Both engines spell this as
  string length of the binary expansion. Summing integer bits per doc
  gives a 1-bit-resolution total log2-likelihood — the quantity whose
  exp-mean IS perplexity — with exact, order-free integer addition
  where a double sum of log probs would be partitioning-dependent.

A production filter thresholds these quantized columns directly (CCNet
thresholds a perplexity band; 1-bit log resolution is far finer than
any published band edge). ``score_docs`` also emits a conventional
double ``avg_logprob_bits`` for human consumption; contract queries
drop it before comparison.

Scale shape: tokenize/bigram explode is narrow; model build is one
hash-agg keyed on (w1,w2); scoring is two linear equi-joins (bigram ->
model, bigram -> context totals) and one per-doc hash-agg. Nothing is
collected except the 1-row vocabulary size. Skewed contexts (stopwords)
are bounded by |vocab| fan-in on the c1 join, the same profile as the
df join in tfidf.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


class BigramLM(NamedTuple):
    """Trained model state: bigram counts, context totals, vocab size."""

    bigrams: DataFrame  # (w1, w2, c12)
    contexts: DataFrame  # (w1, c1) where c1 = sum_w2 c12
    vocab_size: int  # |distinct tokens in training slice|


def _bigram_rows(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, map-side only.

    Built with ``transform`` over the token array rather than a
    positional self-join: the whole expansion happens inside the scan
    stage, so the first exchange in any consumer is its own aggregate.
    """
    toks = tokens(text_col)
    pairs = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda w, i: F.struct(
            w.alias("w1"), F.element_at(toks, i + 2).alias("w2")
        ),
    )
    return df.select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(id_col, "bg.w1", "bg.w2")


def train_bigram_lm(
    train_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> BigramLM:
    """Fit add-one-smoothed bigram counts on ``train_df``.

    One action (the vocabulary count — 1-row scalar, the
    k-means-centroid class); the count frames stay lazy so a caller
    composing train+score pays a single job.
    """
    bg = _bigram_rows(train_df, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        train_df.select(
            F.explode(tokens(text_col)).alias("tok")
        )
        .agg(F.countDistinct("tok").alias("v"))
        .collect()[0]["v"]
    )
    return BigramLM(bigrams=bigrams, contexts=contexts, vocab_size=int(vocab))


def _prob_ppm(c12: Column, c1: Column, v: int) -> Column:
    """floor(1e6 * (c12+1)/(c1+V)) — engine-exact quantized probability."""
    return F.floor(
        F.lit(1000000.0) * (c12 + F.lit(1)) / (c1 + F.lit(v))
    ).cast("bigint")


def _surprisal_bits(c12: Column, c1: Column, v: int) -> Column:
    """floor(log2((c1+V)/(c12+1))) via binary string length — no libm.

    Valid because c12 <= c1 always (a bigram count never exceeds its
    context total), so the ratio is >= 1 and its floor is >= 1.
    """
    q = F.floor((c1 + F.lit(v)) / (c12 + F.lit(1))).cast("bigint")
    return (F.length(F.bin(q)) - F.lit(1)).cast("bigint")


def score_docs(
    df: DataFrame,
    model: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document likelihood statistics under ``model``.

    Returns one row per input document (docs with < 2 tokens score
    n_bigrams = 0 with null means):

    - ``n_bigrams``, ``n_oov`` (bigram unseen in training), exact ints
    - ``sum_prob_ppm``  — sum of quantized probabilities (linear domain)
    - ``mean_prob_ppm`` — floor(sum/n), null when n = 0
    - ``sum_bits``      — total quantized surprisal: the integer
      log2-likelihood whose per-token mean is log2(perplexity)
    - ``avg_bits_x100`` — floor(100 * sum_bits / n), the thresholdable
      perplexity proxy, null when n = 0
    - ``avg_logprob_bits`` — double convenience column (NOT engine-exact;
      contract queries drop it)
    """
    v = model.vocab_size
    bg = _bigram_rows(df, id_col, text_col)
    # merge-hint: the model frames are corpus-state (one row per distinct
    # bigram / context) whose DERIVED size estimates bottom out at the
    # compressed training-file size, so past ~the broadcast threshold of
    # raw input the static planner would broadcast them and the build
    # OOMs (the x100 stress run caught the identical failure in
    # prefix_join). The docstring's "never broadcast" claim is enforced
    # in the plan, not left to the estimator.
    scored = (
        bg.join(model.bigrams.hint("merge"), ["w1", "w2"], "left")
        .join(model.contexts.hint("merge"), ["w1"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
        )
    )
    per_bg = scored.select(
        id_col,
        (F.col("c12") == 0).cast("int").alias("oov"),
        _prob_ppm(F.col("c12"), F.col("c1"), v).alias("ppm"),
        _surprisal_bits(F.col("c12"), F.col("c1"), v).alias("bits"),
    )
    agg = per_bg.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov").alias("n_oov"),
        F.sum("ppm").alias("sum_prob_ppm"),
        F.sum("bits").alias("sum_bits"),
    )
    out = (
        df.select(id_col)
        .join(agg, [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
            F.coalesce("sum_prob_ppm", F.lit(0)).cast("bigint").alias(
                "sum_prob_ppm"
            ),
            F.coalesce("sum_bits", F.lit(0)).cast("bigint").alias("sum_bits"),
        )
    )
    n = F.col("n_bigrams")
    return out.select(
        id_col,
        "n_bigrams",
        "n_oov",
        "sum_prob_ppm",
        "sum_bits",
        F.when(n > 0, F.floor(F.col("sum_prob_ppm") / n).cast("bigint")).alias(
            "mean_prob_ppm"
        ),
        F.when(
            n > 0,
            F.floor(F.lit(100.0) * F.col("sum_bits") / n).cast("bigint"),
        ).alias("avg_bits_x100"),
        F.when(n > 0, F.col("sum_bits") / n).alias("avg_logprob_bits"),
    )


class TrigramLM(NamedTuple):
    """Trained trigram model state with its bigram backoff tier.

    All four count frames are corpus-sized model state (one row per
    distinct n-gram / context) and are therefore NEVER broadcast —
    scoring reaches them through merge-hinted equi-joins, exactly the
    bigram discipline."""

    trigrams: DataFrame  # (w1, w2, w3, c123)
    tri_contexts: DataFrame  # (w1, w2, c12) where c12 = sum_w3 c123
    bigrams: DataFrame  # (w2, w3, c23) — the backoff distribution
    bi_contexts: DataFrame  # (w2, c2) where c2 = sum_w3 c23
    vocab_size: int


def _trigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, w3) — one row per adjacent token triple, map-side
    only (same transform-over-token-array shape as _bigram_rows)."""
    toks = tokens(text_col)
    triples = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda w, i: F.struct(
            w.alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
            F.element_at(toks, i + 3).alias("w3"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(triples).alias("tg")
    ).select(id_col, "tg.w1", "tg.w2", "tg.w3")


def train_trigram_lm(
    train_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> TrigramLM:
    """Fit the trigram tier + its bigram backoff on ``train_df`` —
    one order closer to CCNet's 5-gram Kneser-Ney than the bigram
    analog, with the same engine-exact integer quantization.

    Counts: trigram (w1,w2,w3) with per-context totals keyed (w1,w2);
    backoff bigram p(w3|w2) trained on ALL adjacent pairs with totals
    keyed (w2). One action (the 1-row vocabulary count); everything
    else stays lazy."""
    tg = _trigram_rows(train_df, id_col, text_col)
    trigrams = tg.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c123")
    )
    tri_contexts = trigrams.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12")
    )
    bg = _bigram_rows(train_df, id_col, text_col)
    bigrams = bg.groupBy(
        F.col("w1").alias("w2"), F.col("w2").alias("w3")
    ).agg(F.count(F.lit(1)).alias("c23"))
    bi_contexts = bigrams.groupBy("w2").agg(F.sum("c23").alias("c2"))
    vocab = (
        train_df.select(F.explode(tokens(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
        .collect()[0]["v"]
    )
    return TrigramLM(
        trigrams=trigrams,
        tri_contexts=tri_contexts,
        bigrams=bigrams,
        bi_contexts=bi_contexts,
        vocab_size=int(vocab),
    )


def score_docs3(
    df: DataFrame,
    model: TrigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document likelihood statistics under the trigram+backoff
    model. Backoff rule (deterministic, engine-exact): a trigram whose
    context (w1,w2) was SEEN in training scores add-one within the
    trigram distribution, p = (c123+1)/(c12+V); an unseen context
    backs off to the bigram tier, p = (c23+1)/(c2+V); a context unseen
    at both tiers degrades to the uniform 1/V row via the zero
    coalesces — every trigram has positive mass.

    Returns one row per input document: n_trigrams, n_backoff (bigram
    tier used), n_oov (target count zero at the tier that scored it),
    sum_prob_ppm / sum_bits and their means — the same quantized,
    order-free integer statistics as score_docs, so the same
    thresholding discipline applies.

    Scale shape: the trigram explode is map-side narrow; four
    merge-hinted left equi-joins against model state (never broadcast
    — corpus-sized); one per-doc hash-agg. The (w2)-keyed backoff
    context join is the widest fan-in (stopword skew) — measured by
    tools/lm_skew_probe.py alongside the bigram rows."""
    v = model.vocab_size
    tg = _trigram_rows(df, id_col, text_col)
    scored = (
        tg.join(model.trigrams.hint("merge"), ["w1", "w2", "w3"], "left")
        .join(model.tri_contexts.hint("merge"), ["w1", "w2"], "left")
        .join(model.bigrams.hint("merge"), ["w2", "w3"], "left")
        .join(model.bi_contexts.hint("merge"), ["w2"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("c123"), F.lit(0)).alias("c123"),
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("c23"), F.lit(0)).alias("c23"),
            F.coalesce(F.col("c2"), F.lit(0)).alias("c2"),
        )
    )
    backed = F.col("c12") == 0
    cnum = F.when(backed, F.col("c23")).otherwise(F.col("c123"))
    cden = F.when(backed, F.col("c2")).otherwise(F.col("c12"))
    per_tg = scored.select(
        id_col,
        backed.cast("int").alias("backoff"),
        (cnum == 0).cast("int").alias("oov"),
        _prob_ppm(cnum, cden, v).alias("ppm"),
        _surprisal_bits(cnum, cden, v).alias("bits"),
    )
    agg = per_tg.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum("backoff").alias("n_backoff"),
        F.sum("oov").alias("n_oov"),
        F.sum("ppm").alias("sum_prob_ppm"),
        F.sum("bits").alias("sum_bits"),
    )
    out = (
        df.select(id_col)
        .join(agg, [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce("n_trigrams", F.lit(0)).cast("bigint").alias(
                "n_trigrams"
            ),
            F.coalesce("n_backoff", F.lit(0)).cast("bigint").alias(
                "n_backoff"
            ),
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
            F.coalesce("sum_prob_ppm", F.lit(0)).cast("bigint").alias(
                "sum_prob_ppm"
            ),
            F.coalesce("sum_bits", F.lit(0)).cast("bigint").alias("sum_bits"),
        )
    )
    n = F.col("n_trigrams")
    return out.select(
        id_col,
        "n_trigrams",
        "n_backoff",
        "n_oov",
        "sum_prob_ppm",
        "sum_bits",
        F.when(n > 0, F.floor(F.col("sum_prob_ppm") / n).cast("bigint")).alias(
            "mean_prob_ppm"
        ),
        F.when(
            n > 0,
            F.floor(F.lit(100.0) * F.col("sum_bits") / n).cast("bigint"),
        ).alias("avg_bits_x100"),
        F.when(n > 0, F.col("sum_bits") / n).alias("avg_logprob_bits"),
    )


def lm_filter3(
    df: DataFrame,
    model: TrigramLM,
    max_avg_bits_x100: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet gate at the trigram tier: keep documents whose
    quantized mean trigram surprisal (with bigram backoff) is at or
    below the threshold. Docs with no trigrams are dropped — same
    no-evidence policy as lm_filter."""
    scores = score_docs3(df, model, id_col, text_col).select(
        id_col, "avg_bits_x100"
    )
    return (
        df.join(scores, [id_col], "left")
        .filter(
            F.col("avg_bits_x100").isNotNull()
            & (F.col("avg_bits_x100") <= max_avg_bits_x100)
        )
        .drop("avg_bits_x100")
    )


def lm_filter(
    df: DataFrame,
    model: BigramLM,
    max_avg_bits_x100: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet gate: keep documents whose quantized mean surprisal is
    at or below the threshold (low surprisal = in-domain text). Docs
    with no bigrams are dropped — a one-token document carries no LM
    evidence and real pipelines length-filter it upstream anyway."""
    scores = score_docs(df, model, id_col, text_col).select(
        id_col, "avg_bits_x100"
    )
    return (
        df.join(scores, [id_col], "left")
        .filter(
            F.col("avg_bits_x100").isNotNull()
            & (F.col("avg_bits_x100") <= max_avg_bits_x100)
        )
        .drop("avg_bits_x100")
    )
