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


# Bounded pin registry for trained model COUNT FRAMES (optimization
# r13). A scoring pass left-joins 2-5 model frames, and every one of
# them re-executed the trainer's trigram/bigram aggregation subtree
# (Spark does not CSE shared subtrees) — measured 10.9 s for the KN
# tercile gate inside the v6+ chains, ~4 redundant corpus-token
# aggregations per pass. The trained counts are exactly CCNet's
# "published static artifact" (Wenzek et al. 2020 train once, ship),
# so each trainer pins its base count frame with an eager
# localCheckpoint. unpersist() on a checkpointed frame is a
# CacheManager no-op (ADVICE r12), so the checkpoint RDD itself is
# stashed and released when the group rotates out; keeping the last
# few generations (not just one) lets queries that hold TWO live
# models (moore_lewis trains in-domain + general) work unchanged.
from collections import deque

_PINNED: deque = deque()
_PIN_GENERATIONS = 6


def _pin_model_frame(frame: DataFrame) -> DataFrame:
    pinned = frame.localCheckpoint(eager=True)
    try:
        ckpt_rdd = pinned._jdf.queryExecution().analyzed().rdd()
    except Exception:
        ckpt_rdd = None
    _PINNED.append((pinned, ckpt_rdd))
    while len(_PINNED) > _PIN_GENERATIONS:
        old, old_rdd = _PINNED.popleft()
        try:
            if old_rdd is not None:
                old_rdd.unpersist(False)
            old.unpersist()
        except Exception:
            pass  # session already stopped
    return pinned


def _bigram_rows(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, map-side only.

    Built with ``transform`` over the token array rather than a
    positional self-join: the whole expansion happens inside the scan
    stage, so the first exchange in any consumer is its own aggregate.
    The input is widened on small scans (sources.tables
    widen_small_scan, optimization r13) so the tokenize+expand stage
    is not serialized on one split; at production sizes the gate is a
    no-op and the map-side-only shape is preserved.
    """
    from ..sources.tables import widen_small_scan

    df = widen_small_scan(df, id_col)
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
    bigrams = _pin_model_frame(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
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
    # Type-level scoring: per-bigram metrics depend only on the bigram
    # TYPE, so the model joins run over the distinct-type frame (Heaps-
    # law smaller than the token stream) and the corpus pays exactly
    # one merge join to pick up its per-type metrics — instead of
    # dragging every token row through both model joins.
    types = bg.select("w1", "w2").distinct()
    typed = (
        types.join(model.bigrams.hint("merge"), ["w1", "w2"], "left")
        .join(model.contexts.hint("merge"), ["w1"], "left")
        .select(
            "w1",
            "w2",
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
        )
    )
    per_type = typed.select(
        "w1",
        "w2",
        (F.col("c12") == 0).cast("int").alias("oov"),
        _prob_ppm(F.col("c12"), F.col("c1"), v).alias("ppm"),
        _surprisal_bits(F.col("c12"), F.col("c1"), v).alias("bits"),
    )
    per_bg = bg.join(per_type.hint("merge"), ["w1", "w2"]).select(
        id_col, "oov", "ppm", "bits"
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
    only (same transform-over-token-array shape as _bigram_rows,
    including its scale-adaptive small-scan widening)."""
    from ..sources.tables import widen_small_scan

    df = widen_small_scan(df, id_col)
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
    trigrams = _pin_model_frame(
        tg.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    )
    tri_contexts = trigrams.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12")
    )
    bg = _bigram_rows(train_df, id_col, text_col)
    bigrams = _pin_model_frame(
        bg.groupBy(
            F.col("w1").alias("w2"), F.col("w2").alias("w3")
        ).agg(F.count(F.lit(1)).alias("c23"))
    )
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
    # Type-level scoring (see score_docs): model joins over distinct
    # trigram types, one merge join to attach per-type metrics back to
    # the token stream.
    types = tg.select("w1", "w2", "w3").distinct()
    typed = (
        types.join(model.trigrams.hint("merge"), ["w1", "w2", "w3"], "left")
        .join(model.tri_contexts.hint("merge"), ["w1", "w2"], "left")
        .join(model.bigrams.hint("merge"), ["w2", "w3"], "left")
        .join(model.bi_contexts.hint("merge"), ["w2"], "left")
        .select(
            "w1",
            "w2",
            "w3",
            F.coalesce(F.col("c123"), F.lit(0)).alias("c123"),
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("c23"), F.lit(0)).alias("c23"),
            F.coalesce(F.col("c2"), F.lit(0)).alias("c2"),
        )
    )
    backed = F.col("c12") == 0
    cnum = F.when(backed, F.col("c23")).otherwise(F.col("c123"))
    cden = F.when(backed, F.col("c2")).otherwise(F.col("c12"))
    per_type = typed.select(
        "w1",
        "w2",
        "w3",
        backed.cast("int").alias("backoff"),
        (cnum == 0).cast("int").alias("oov"),
        _prob_ppm(cnum, cden, v).alias("ppm"),
        _surprisal_bits(cnum, cden, v).alias("bits"),
    )
    per_tg = tg.join(per_type.hint("merge"), ["w1", "w2", "w3"]).select(
        id_col, "backoff", "oov", "ppm", "bits"
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


class KNTrigramLM(NamedTuple):
    """Interpolated Kneser-Ney trigram state (single discount D = 3/4,
    smoothed continuation-bigram lower tier). All four count frames are
    corpus-sized model state and are NEVER broadcast — scoring reaches
    them through merge-hinted equi-joins, the module discipline.

    The two continuation frames are the KN novelty vs TrigramLM: the
    lower tier scores how many DISTINCT contexts a bigram continues
    (type counts), not how often it occurs (token counts) — Kneser &
    Ney 1995; the CCNet gate trains 5-gram KN (Wenzek et al. 2020).
    Both derive from the trigram count frame by hash-agg, so training
    stays a single corpus pass."""

    trigrams: DataFrame  # (w1, w2, w3, c123)
    contexts: DataFrame  # (w1, w2, c12, n1pp) — totals + distinct-w3 count
    cont_bigrams: DataFrame  # (w2, w3, cont23) = |{w1 : c123 > 0}|
    cont_contexts: DataFrame  # (w2, cont2) = |{(w1, w3) : c123 > 0}|
    vocab_size: int


def train_kn_trigram_lm(
    train_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> KNTrigramLM:
    """Fit interpolated Kneser-Ney counts on ``train_df``: trigram
    counts, per-context totals + distinct-continuation counts N1+(w1,
    w2,·), and the continuation-bigram tier N1+(·,w2,w3) / N1+(·,w2,·)
    — all hash-aggs over ONE trigram explode (the continuation frames
    aggregate the trigram count frame itself, not the corpus). One
    action (the 1-row vocabulary count), everything else lazy."""
    tg = _trigram_rows(train_df, id_col, text_col)
    trigrams = _pin_model_frame(
        tg.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    )
    contexts = trigrams.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12"),
        F.count(F.lit(1)).alias("n1pp"),
    )
    cont_bigrams = _pin_model_frame(
        trigrams.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("cont23"))
    )
    cont_contexts = cont_bigrams.groupBy("w2").agg(
        F.sum("cont23").alias("cont2")
    )
    vocab = (
        train_df.select(F.explode(tokens(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
        .collect()[0]["v"]
    )
    return KNTrigramLM(
        trigrams=trigrams,
        contexts=contexts,
        cont_bigrams=cont_bigrams,
        cont_contexts=cont_contexts,
        vocab_size=int(vocab),
    )


def score_docs_kn(
    df: DataFrame,
    model: KNTrigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document likelihood under interpolated Kneser-Ney (discount
    D = 3/4, quantized-ppm domain — the model's DEFINITION, engine-
    exact by construction):

    - lower tier (smoothed continuation bigram — normalizes to exactly
      1 over the vocabulary):
        pc_ppm = floor(1e6 * (cont23 + 1) / (cont2 + V))
    - seen context (c12 > 0), absolute discounting + interpolation:
        ppm = floor(1e6 * max(4*c123 - 3, 0) / (4*c12))        [t1]
            + floor(3 * n1pp * pc_ppm / (4*c12))               [t2]
      (exact form: max(c123-D,0)/c12 + D*(n1pp/c12)*pc — the discount
      mass 3/4 * n1pp / c12 is exactly what t1 leaves on the table, so
      the distribution sums to <= 1 and the quantization floors never
      push it over)
    - unseen context: ppm = pc_ppm (pure continuation backoff; both
      tiers empty degrades to the uniform 1/V row via the coalesces)
    - bits = floor(log2(1e6/ppm)) via binary string length; ppm = 0
      caps at the quantization resolution, 20 bits.

    No libm: the only non-integer ops are IEEE double products < 2^53
    (exact while per-context counts stay < ~2.25e9 — same documented
    headroom class as _prob_ppm's c1 < 9e9; a 100 TB corpus keeps
    per-(w1,w2)-context totals orders of magnitude below it) and
    correctly-rounded single divisions, so DuckDB floors the same
    doubles. Output shape mirrors score_docs3 (n_backoff counts
    continuation-tier fallbacks; n_oov counts trigrams with zero
    evidence at BOTH tiers).

    Scale shape: one map-side trigram explode; four merge-hinted left
    equi-joins against never-broadcast model state; one per-doc
    hash-agg. The (w2)-keyed continuation-context join is the widest
    fan-in (stopword skew) — measured by tools/lm_skew_probe.py."""
    v = model.vocab_size
    tg = _trigram_rows(df, id_col, text_col)
    # Type-level scoring (see score_docs): model joins over distinct
    # trigram types, one merge join to attach per-type metrics back to
    # the token stream.
    types = tg.select("w1", "w2", "w3").distinct()
    scored = (
        types.join(model.trigrams.hint("merge"), ["w1", "w2", "w3"], "left")
        .join(model.contexts.hint("merge"), ["w1", "w2"], "left")
        .join(model.cont_bigrams.hint("merge"), ["w2", "w3"], "left")
        .join(model.cont_contexts.hint("merge"), ["w2"], "left")
        .select(
            "w1",
            "w2",
            "w3",
            F.coalesce(F.col("c123"), F.lit(0)).alias("c123"),
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("n1pp"), F.lit(0)).alias("n1pp"),
            F.coalesce(F.col("cont23"), F.lit(0)).alias("cont23"),
            F.coalesce(F.col("cont2"), F.lit(0)).alias("cont2"),
        )
    )
    pc_ppm = F.floor(
        F.lit(1000000.0) * (F.col("cont23") + F.lit(1))
        / (F.col("cont2") + F.lit(v))
    ).cast("bigint")
    t1 = F.floor(
        F.lit(1000000.0)
        * F.greatest(F.lit(4) * F.col("c123") - F.lit(3), F.lit(0))
        / (F.lit(4.0) * F.col("c12"))
    ).cast("bigint")
    t2 = F.floor(
        (F.lit(3) * F.col("n1pp") * pc_ppm).cast("double")
        / (F.lit(4.0) * F.col("c12"))
    ).cast("bigint")
    seen = F.col("c12") > 0
    ppm = F.when(seen, t1 + t2).otherwise(pc_ppm)
    per_type = scored.select(
        "w1",
        "w2",
        "w3",
        (~seen).cast("int").alias("backoff"),
        ((F.col("c123") == 0) & (F.col("cont23") == 0))
        .cast("int")
        .alias("oov"),
        ppm.alias("ppm"),
        F.when(
            ppm > 0,
            (
                F.length(
                    F.bin(
                        F.floor(F.lit(1000000.0) / ppm).cast("bigint")
                    )
                )
                - F.lit(1)
            ).cast("bigint"),
        )
        .otherwise(F.lit(20))
        .cast("bigint")
        .alias("bits"),
    )
    per_tg = tg.join(per_type.hint("merge"), ["w1", "w2", "w3"]).select(
        id_col, "backoff", "oov", "ppm", "bits"
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


def lm_filter_kn(
    df: DataFrame,
    model: KNTrigramLM,
    max_avg_bits_x100: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet gate at the Kneser-Ney tier: keep documents whose
    quantized mean KN surprisal is at or below the threshold. Docs
    with no trigrams are dropped — same no-evidence policy as
    lm_filter / lm_filter3."""
    scores = score_docs_kn(df, model, id_col, text_col).select(
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


class KNFullLM(NamedTuple):
    """Fully recursive interpolated Kneser-Ney state (Chen & Goodman
    1999 eq. 18 shape, at order 3): discounts and interpolation at
    EVERY tier, continuation (type) counts below the top —
    :class:`KNTrigramLM` discounts only the top tier and add-one
    smooths the lower one; this is the textbook-complete ladder. Six
    corpus-sized count frames, all reached by merge-hinted
    never-broadcast joins."""

    trigrams: DataFrame  # (w1, w2, w3, c123)
    contexts: DataFrame  # (w1, w2, c12, n1pp)
    cont_bigrams: DataFrame  # (w2, w3, cont23)
    cont_contexts: DataFrame  # (w2, cont2, n1pp2) — totals + distinct w3
    cont_unigrams: DataFrame  # (w3, cu3) = |{(w1,w2) : c123 > 0}|
    n_tri_types: int  # |distinct trigrams| — the unigram-tier total
    vocab_size: int


def train_kn_full_lm(
    train_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> KNFullLM:
    """Fit the fully recursive KN ladder: every frame is a hash-agg of
    the trigram count frame (training stays one corpus pass); two
    actions (the 1-row vocabulary and distinct-trigram counts — the
    k-means-centroid bounded class)."""
    tg = _trigram_rows(train_df, id_col, text_col)
    trigrams = _pin_model_frame(
        tg.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    )
    contexts = trigrams.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12"), F.count(F.lit(1)).alias("n1pp")
    )
    cont_bigrams = _pin_model_frame(
        trigrams.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("cont23"))
    )
    cont_contexts = cont_bigrams.groupBy("w2").agg(
        F.sum("cont23").alias("cont2"),
        F.count(F.lit(1)).alias("n1pp2"),
    )
    cont_unigrams = trigrams.groupBy("w3").agg(
        F.count(F.lit(1)).alias("cu3")
    )
    n_tri_types = int(
        trigrams.agg(F.count(F.lit(1)).alias("t")).collect()[0]["t"]
    )
    vocab = (
        train_df.select(F.explode(tokens(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
        .collect()[0]["v"]
    )
    return KNFullLM(
        trigrams=trigrams,
        contexts=contexts,
        cont_bigrams=cont_bigrams,
        cont_contexts=cont_contexts,
        cont_unigrams=cont_unigrams,
        n_tri_types=n_tri_types,
        vocab_size=int(vocab),
    )


def score_docs_kn_full(
    df: DataFrame,
    model: KNFullLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document likelihood under FULLY recursive interpolated KN
    (discount D = 3/4 at the trigram AND continuation-bigram tiers,
    quantized-ppm domain — the model definition, engine-exact):

    - unigram tier (smoothed continuation unigram — normalizes to 1):
        p1 = floor(1e6 * (cu3 + 1) / (T + V)),  T = distinct trigrams
    - continuation-bigram tier, discounted + interpolated with p1:
        p2 = floor(1e6 * max(4*cont23 - 3, 0) / (4*cont2))
           + floor(3 * n1pp2 * p1 / (4*cont2))     [cont2 = 0 -> p1]
    - trigram tier, discounted + interpolated with p2:
        ppm = floor(1e6 * max(4*c123 - 3, 0) / (4*c12))
            + floor(3 * n1pp * p2 / (4*c12))       [c12 = 0 -> p2]

    Each tier's discount mass (3/4 per observed continuation type)
    exactly funds the tier below, so every tier sums to <= 1 and the
    floors only lose mass — the same normalization argument as
    score_docs_kn, applied recursively. bits and output shape are
    score_docs_kn's (n_backoff = unseen trigram context; n_oov = zero
    evidence at every tier)."""
    v = model.vocab_size
    t_types = model.n_tri_types
    tg = _trigram_rows(df, id_col, text_col)
    # Type-level scoring (see score_docs): model joins over distinct
    # trigram types, one merge join to attach per-type metrics back to
    # the token stream.
    types = tg.select("w1", "w2", "w3").distinct()
    scored = (
        types.join(model.trigrams.hint("merge"), ["w1", "w2", "w3"], "left")
        .join(model.contexts.hint("merge"), ["w1", "w2"], "left")
        .join(model.cont_bigrams.hint("merge"), ["w2", "w3"], "left")
        .join(model.cont_contexts.hint("merge"), ["w2"], "left")
        .join(model.cont_unigrams.hint("merge"), ["w3"], "left")
        .select(
            "w1",
            "w2",
            "w3",
            F.coalesce(F.col("c123"), F.lit(0)).alias("c123"),
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("n1pp"), F.lit(0)).alias("n1pp"),
            F.coalesce(F.col("cont23"), F.lit(0)).alias("cont23"),
            F.coalesce(F.col("cont2"), F.lit(0)).alias("cont2"),
            F.coalesce(F.col("n1pp2"), F.lit(0)).alias("n1pp2"),
            F.coalesce(F.col("cu3"), F.lit(0)).alias("cu3"),
        )
    )
    p1 = F.floor(
        F.lit(1000000.0) * (F.col("cu3") + F.lit(1))
        / (F.lit(float(t_types)) + F.lit(v))
    ).cast("bigint")
    p2_disc = F.floor(
        F.lit(1000000.0)
        * F.greatest(F.lit(4) * F.col("cont23") - F.lit(3), F.lit(0))
        / (F.lit(4.0) * F.col("cont2"))
    ).cast("bigint")
    p2_int = F.floor(
        (F.lit(3) * F.col("n1pp2") * p1).cast("double")
        / (F.lit(4.0) * F.col("cont2"))
    ).cast("bigint")
    p2 = F.when(F.col("cont2") > 0, p2_disc + p2_int).otherwise(p1)
    t1 = F.floor(
        F.lit(1000000.0)
        * F.greatest(F.lit(4) * F.col("c123") - F.lit(3), F.lit(0))
        / (F.lit(4.0) * F.col("c12"))
    ).cast("bigint")
    t2 = F.floor(
        (F.lit(3) * F.col("n1pp") * p2).cast("double")
        / (F.lit(4.0) * F.col("c12"))
    ).cast("bigint")
    seen = F.col("c12") > 0
    ppm = F.when(seen, t1 + t2).otherwise(p2)
    per_type = scored.select(
        "w1",
        "w2",
        "w3",
        (~seen).cast("int").alias("backoff"),
        (
            (F.col("c123") == 0)
            & (F.col("cont23") == 0)
            & (F.col("cu3") == 0)
        )
        .cast("int")
        .alias("oov"),
        ppm.alias("ppm"),
        F.when(
            ppm > 0,
            (
                F.length(
                    F.bin(F.floor(F.lit(1000000.0) / ppm).cast("bigint"))
                )
                - F.lit(1)
            ).cast("bigint"),
        )
        .otherwise(F.lit(20))
        .cast("bigint")
        .alias("bits"),
    )
    per_tg = tg.join(per_type.hint("merge"), ["w1", "w2", "w3"]).select(
        id_col, "backoff", "oov", "ppm", "bits"
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


def ppl_buckets(
    df: DataFrame,
    model: KNTrigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    width: float = 25.0,
) -> DataFrame:
    """CCNet's head/middle/tail selection (Wenzek et al. 2020 §4.4):
    per-``group_col`` perplexity TERCILES bucket every document —
    'head' at or below the 33rd percentile of quantized mean KN
    surprisal, 'middle' at or below the 67th, 'tail' above (CCNet
    keeps head+middle for LM training). This is the distribution-
    relative mechanism the fixed avg_bits threshold in the v4/v5
    pipelines approximates.

    Composition: :func:`score_docs_kn` -> ``hist_build`` /
    ``hist_quantiles`` (functions/sketches.py — deterministic
    fixed-grid sketch, so the tercile cuts are mergeable 100 TB state
    AND DuckDB-oracle-exact, within one bucket ``width`` of the exact
    order statistic) -> one equi-join of the per-group cut rows back
    onto the scored docs. Docs with no trigram evidence are excluded
    (the lm_filter no-evidence policy).

    Scale shape: scoring is score_docs_kn's plan; the histogram is one
    hash-agg whose state is range/width rows per group; the cuts frame
    is 1 row per group (language-universe-bounded) joined by key — no
    broadcast hint needed, AQE handles a frame that size."""
    from ..functions.sketches import hist_build, hist_quantiles

    scores = (
        score_docs_kn(df, model, id_col, text_col)
        .filter(F.col("avg_bits_x100").isNotNull())
        .select(id_col, "avg_bits_x100")
    )
    # the scored frame feeds BOTH the tercile histogram and the final
    # assignment join; pin it (2 narrow columns per doc) or the whole
    # KN scoring chain — five joins deep — computes twice (the
    # global_sort_index / balanced_shards multi-pass convention)
    scored = df.select(F.col(id_col), F.col(group_col)).join(
        scores, [id_col]
    ).localCheckpoint(eager=False)
    hist = hist_build(scored, [group_col], "avg_bits_x100", width)
    qs = hist_quantiles(
        hist, [group_col], width, [1.0 / 3.0, 2.0 / 3.0]
    )
    cuts = qs.groupBy(group_col).agg(
        F.min(
            F.when(F.col("q") < 0.5, F.col("est_quantile"))
        ).alias("t_head"),
        F.min(
            F.when(F.col("q") >= 0.5, F.col("est_quantile"))
        ).alias("t_middle"),
    )
    bucket = (
        F.when(F.col("avg_bits_x100") <= F.col("t_head"), F.lit("head"))
        .when(F.col("avg_bits_x100") <= F.col("t_middle"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(cuts, [group_col]).select(
        id_col, group_col, "avg_bits_x100", bucket.alias("ppl_bucket")
    )


def ppl_bucket_sample(
    df: DataFrame,
    model: KNTrigramLM,
    rates: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    width: float = 25.0,
) -> DataFrame:
    """CCNet selection with per-bucket SAMPLING: compose
    :func:`ppl_buckets`' tercile assignment with the deterministic
    hash-threshold sampler (operators/sampling.py) — keep the head
    fully, sample the middle, keep (or drop) a tail slice. Membership
    is a pure function of (id, bucket rate): reproducible across
    partitionings, engines, and reruns — the property a training-mix
    builder needs and an RNG sample cannot give.

    Returns the input rows that survive, with ``ppl_bucket`` attached.
    Default rates: head 1.0, middle 0.5, tail 0.0 (CCNet's keep
    head+middle with the middle thinned)."""
    from .sampling import stratified_sample

    rates = rates if rates is not None else {
        "head": 1.0, "middle": 0.5, "tail": 0.0,
    }
    buckets = ppl_buckets(
        df, model, id_col=id_col, text_col=text_col,
        group_col=group_col, width=width,
    )
    tagged = df.join(
        buckets.select(id_col, "ppl_bucket"), [id_col]
    )
    return stratified_sample(tagged, rates, "ppl_bucket", id_col)


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


def moore_lewis_scores(
    docs: DataFrame,
    in_domain_cond: Column,
    max_delta_bits_x100: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-entropy DIFFERENCE selection (Moore & Lewis 2010,
    "Intelligent Selection of Language Model Training Data" — the
    classic contrastive data-selection method CCNet's single-LM gate
    descends from): score every document under an IN-DOMAIN bigram LM
    (trained on the ``in_domain_cond`` slice) and a GENERAL bigram LM
    (trained on the whole corpus), and keep documents whose surprisal
    difference ``H_in - H_gen`` is small — text the domain model likes
    MORE than a generic model does, which strips both generic boilerplate
    (low under both) and out-of-domain text (high under the in-domain
    model) in one decision the single-threshold gate cannot express.

    Returns (id, n_bigrams, bits_in_x100, bits_gen_x100, delta_x100,
    kept); docs with < 2 tokens score NULL bits on both sides and NULL
    kept (no evidence — the caller's policy, not a silent drop).
    All-integer avg-bits (score_docs' quantization), so delta is exact
    and the DuckDB oracle replays both pyramids bit-for-bit.

    Scale shape: both trainings and both scorings are the bigram
    hash-agg + merge-join plans of train_bigram_lm/score_docs (model
    frames never broadcast); the delta is one id-keyed equi-join of two
    doc-keyed aggregates. ~2x the single-LM gate's cost, linear."""
    m_in = train_bigram_lm(
        docs.filter(in_domain_cond), id_col=id_col, text_col=text_col
    )
    m_gen = train_bigram_lm(docs, id_col=id_col, text_col=text_col)
    s_in = score_docs(docs, m_in, id_col=id_col, text_col=text_col).select(
        F.col(id_col),
        F.col("n_bigrams"),
        F.col("avg_bits_x100").alias("bits_in_x100"),
    )
    s_gen = score_docs(docs, m_gen, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.col("avg_bits_x100").alias("bits_gen_x100")
    )
    delta = F.col("bits_in_x100") - F.col("bits_gen_x100")
    return (
        s_in.join(s_gen, id_col)
        .select(
            F.col(id_col),
            "n_bigrams",
            "bits_in_x100",
            "bits_gen_x100",
            delta.alias("delta_x100"),
            (delta <= max_delta_bits_x100).alias("kept"),
        )
    )
