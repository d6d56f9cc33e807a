"""In-engine training of the hashed-linear quality classifier —
distributed logistic regression in fixed-point integer arithmetic.

Closes the one gap in the CCNet/RefinedWeb model-based-filter story:
``operators/text.py classifier_quality_score`` ships a DISCLOSED
placeholder weight table because no trained model ships in this
container. This module trains a weight table inside the engine, on the
corpus itself, using the fasttext-wikiref setup (labels come from the
rule-based quality score — the cheap labeler the model distills).

Why fixed-point (the ``operators/pagerank.py`` discipline): float
gradient sums are nondeterministic across partitionings (FP addition is
not associative) and can never be compared bit-for-bit against another
engine. Everything here is BIGINT at SCALE=10^9; every op is integer
multiply / truncating integer divide / integer sum — exact, associative,
reproducible on any engine and any partitioning, so the trained weights
are oracle-checkable the same way the Kneser-Ney ladder is. Both Spark
``div`` and DuckDB ``//`` truncate toward zero, so negative errors,
gradients, and weights divide identically (pinned by a unit test with
negative operands).

Why the rational sigmoid: true logistic needs exp(), which no two
engines evaluate bit-identically. The fast sigmoid

    sigma(z) = 1/2 + z / (2 * (1 + |z|))        (z pre-clamped to ±8)

is the standard rational squashing (same monotone S-shape, same [0,1]
range, same decision boundary) and is exactly computable in integers:

    zc = greatest(-8*SCALE, least(8*SCALE, z))
    p  = SCALE/2 + (zc*SCALE) div (2*(SCALE + |zc|))     # p in [0,SCALE]

The clamp is the overflow guard (|zc*SCALE| <= 8e18 < 2^63) AND an
optimization aid: the rational sigmoid's tails decay only as 1/|z|, so
unclamped saturation lets the majority class's residual error forever
balance the minority's (measured: unclamped training plateaus at the
majority vote; clamped reaches 100% on the same data in 16 steps).

Model: hashed token-PRESENCE features (x_b = 1 iff any token of the doc
hashes to bucket b — binary, not mean-pooled counts: presence of a rare
marker token is the signal a quality rule encodes, and mean-pooling
dilutes it by 1/doc_len, measured to stall GD at the majority vote),
plus one bias feature (bucket -1, always present). Class-balanced
full-batch gradient descent — the minority class's error is multiplied
by the integer ``cb_neg`` (~ N_pos/N_neg), standard practice for
imbalanced labels and exact in integer arithmetic:

    z_doc   = sum_{b present} w[b]
    p_doc   = rational-sigmoid(clamp(z_doc))
    err_doc = (p_doc - y_doc*SCALE) * (y == 0 ? cb_neg : 1)
    grad[b] = sum_{docs where b present} err_doc
    w'[b]   = w[b] - (grad[b] * lr_num) div (lr_den * n_docs)

Scale shape per step: one broadcast join (weights: <= n_buckets+1 rows,
always tiny) + one hash-agg keyed by doc (the dot product) + one
hash-agg keyed by bucket (the gradient) — no corpus-sized state on the
driver, no window, no UDF. The feature frame is built once and
persisted across steps; per-step weight frames are localCheckpoint-cut
so the round-k plan doesn't replay rounds 1..k-1 (the pagerank /
label-propagation treatment).

Overflow bounds (BIGINT): |w| grows by at most cb_neg*SCALE*lr_num per
step (~6.4e11 total at the defaults); |z| <= (n_buckets+1)*max|w| but is
clamped before the only wide product. The gradient sum is bounded by
n_docs*cb_neg*SCALE — safe to ~9e8 docs per training partition at the
defaults; larger corpora train on a stratified sample (the fasttext
convention) or drop SCALE a decade.

Reference parity: the reference is a row-level OHLCV ETL with no ML
surface (/root/reference/glue/jobs/build_stock_fact_table.py and
build_stock_aggregations.py are plain projections/rollups); this is
engine-extension surface (SURVEY.md section 8, VERDICT r9 item #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lsh import base_hash31
from .text import quality_features, tokens

SCALE = 1_000_000_000  # 10^9 fixed-point scale for weights/probabilities
ZCLAMP = 8 * SCALE  # logit clamp: overflow guard + anti-saturation
BIAS_BUCKET = -1  # bucket id of the constant bias feature (always present)
# Valued-feature scale (the reranker path): features are BIGINTs in
# units of 1/XSCALE, clamped to [-XSCALE, XSCALE] by the feature
# builder. 10^6 (not SCALE) keeps every product inside BIGINT:
# |x*w| <= 1e6 * ~1e12 = 1e18 and |err*x| <= cb*SCALE*1e6 <= ~1e16,
# where x = SCALE would overflow the weight product by round 3.
XSCALE = 1_000_000

# Bounded-cache registry (the plans/corpus.py discipline): entering
# train_logreg_fixed_point releases the feature frame its PREVIOUS
# invocation persisted, so bench/stress loops don't pin one cache per
# call for the session lifetime.
_CACHED: list = []


def _persist(frame: DataFrame) -> DataFrame:
    _CACHED.append(frame.persist())
    return frame


def _release() -> None:
    for f in _CACHED:
        try:
            f.unpersist()
        except Exception:
            pass  # session already stopped
    _CACHED.clear()


def hashed_token_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    seed: str = "clf-v1",
) -> DataFrame:
    """Binary hashed bag-of-tokens: one row per (doc, bucket) where at
    least one token of the doc hashes to the bucket (x = 1), plus the
    always-present bias row (bucket -1). Bucket hash is the portable
    md5 path (operators/lsh.py base_hash31 mod n_buckets), so the same
    features are computable in any engine."""
    present = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_tok"))
        .select(
            F.col(id_col),
            (base_hash31(F.concat(F.col("_tok"), F.lit(":" + seed))) % n_buckets)
            .cast("bigint")
            .alias("bucket"),
        )
        .distinct()
    )
    bias = df.select(
        F.col(id_col), F.lit(BIAS_BUCKET).cast("bigint").alias("bucket")
    )
    return present.unionByName(bias)


def hashed_subword_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: str = "clf-v1",
    minn: int = 3,
    maxn: int = 4,
) -> DataFrame:
    """fastText-faithful subword features (Bojanowski et al., TACL 2017):
    each token contributes its WHOLE-WORD presence feature (the same hash
    as :func:`hashed_token_features`) plus the presence of every char
    n-gram, ``minn <= n <= maxn``, of the boundary-marked form
    ``'<' + token + '>'`` — the source of fastText's robustness to
    misspellings/morphology (a corrupted marker token still shares most
    of its n-grams with the clean form, so the learned signal transfers
    where whole-token hashing sees an unrelated bucket). N-grams hash
    with a distinct salt (``:ng:``) into the SAME bucket space (the
    hashing-trick convention); the default space is 8x the token mode's
    because each doc carries ~2 x len(token) n-grams per token and 512
    buckets would saturate to all-present.

    Same output contract as hashed_token_features: one (doc, bucket) row
    per present bucket plus the bias row (bucket -1) — drop-in for
    :func:`train_logreg_fixed_point`. Scale shape: explode + narrow map
    + distinct (one hash-agg); no join, no window, no UDF."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    )
    word_rows = toks.select(
        F.col(id_col),
        (base_hash31(F.concat(F.col("_tok"), F.lit(":" + seed))) % n_buckets)
        .cast("bigint")
        .alias("bucket"),
    )
    marked = F.concat(F.lit("<"), F.col("_tok"), F.lit(">"))
    grams = F.expr(
        f"flatten(transform(sequence({minn}, {maxn}), n -> "
        f"CASE WHEN length(_m) >= n THEN "
        f"transform(sequence(1, length(_m) - n + 1), i -> substring(_m, i, n)) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END))"
    )
    gram_rows = (
        toks.select(F.col(id_col), marked.alias("_m"))
        .select(F.col(id_col), F.explode(grams).alias("_g"))
        .select(
            F.col(id_col),
            (base_hash31(F.concat(F.col("_g"), F.lit(":ng:" + seed))) % n_buckets)
            .cast("bigint")
            .alias("bucket"),
        )
    )
    present = word_rows.unionByName(gram_rows).distinct()
    bias = df.select(
        F.col(id_col), F.lit(BIAS_BUCKET).cast("bigint").alias("bucket")
    )
    return present.unionByName(bias)


def _bucket_of(tok, n_buckets: int, seed: str):
    """Portable bucket hash of a token COLUMN (md5 path, lsh.base_hash31
    mod n_buckets) — the one expression both the row and array feature
    builders share."""
    return (
        base_hash31(F.concat(tok, F.lit(":" + seed))) % n_buckets
    ).cast("bigint")


def hashed_token_feature_arrays(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    seed: str = "clf-v1",
) -> DataFrame:
    """:func:`hashed_token_features` in DOC-LOCAL ARRAY form: one row per
    document, ``_buckets`` = the distinct present buckets (bias -1
    included) as an array<bigint>. The bucket SET per doc is identical to
    the row builder's (``array_distinct`` over the same hashes ==
    ``distinct`` over the exploded rows), but nothing is exploded or
    shuffled — the explode+distinct exchange the row form pays becomes a
    narrow per-row projection (guide §2.4: remove shuffles outright).
    Drop-in for :func:`train_logreg_fixed_point` /
    :func:`trained_score`. The input is widened first (sources.tables
    widen_small_scan, optimization r13): the per-token md5 hashing is
    row-expensive, and on a small single-split scan the whole build ran
    as ONE task."""
    from ..sources.tables import widen_small_scan

    t = widen_small_scan(df, id_col).select(
        F.col(id_col), tokens(text_col).alias("_toks")
    )
    word = F.transform(
        F.col("_toks"), lambda x: _bucket_of(x, n_buckets, seed)
    )
    return t.select(
        F.col(id_col),
        F.array_distinct(
            F.concat(F.array(F.lit(BIAS_BUCKET).cast("bigint")), word)
        ).alias("_buckets"),
    )


def hashed_subword_feature_arrays(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: str = "clf-v1",
    minn: int = 3,
    maxn: int = 4,
) -> DataFrame:
    """:func:`hashed_subword_features` in DOC-LOCAL ARRAY form (same
    contract as :func:`hashed_token_feature_arrays`): whole-word buckets
    plus boundary-marked char n-gram buckets, distinct per doc, bias -1
    included — computed without the explode+distinct exchange. The
    input is widened first (sources.tables widen_small_scan,
    optimization r13): the ~2 x len(token) md5-hashed n-grams per token
    are the single most row-expensive projection in the repo (measured
    19 s serialized on ONE scan split of the sf0.1 documents table),
    and at production scale the widen gate is a no-op."""
    from ..sources.tables import widen_small_scan

    t = widen_small_scan(df, id_col).select(
        F.col(id_col), tokens(text_col).alias("_toks")
    )
    word = F.transform(
        F.col("_toks"), lambda x: _bucket_of(x, n_buckets, seed)
    )
    gram_hash = (
        f"(CAST(conv(substring(md5(concat(substring(concat('<', tok, '>'),"
        f" i, n), ':ng:{seed}')), 1, 15), 16, 10) AS BIGINT)"
        f" % 2147483647) % {n_buckets}"
    )
    grams = F.expr(
        f"flatten(transform(_toks, tok -> "
        f"flatten(transform(sequence({minn}, {maxn}), n -> "
        f"CASE WHEN length(concat('<', tok, '>')) >= n THEN "
        f"transform(sequence(1, length(concat('<', tok, '>')) - n + 1), "
        f"i -> {gram_hash}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END))))"
    )
    return t.select(
        F.col(id_col),
        F.array_distinct(
            F.concat(
                F.array(F.lit(BIAS_BUCKET).cast("bigint")), word, grams
            )
        ).alias("_buckets"),
    )


def rule_labels(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 1.0,
) -> DataFrame:
    """The cheap labeler: rule-based quality score >= ``threshold`` —
    the fasttext-wikiref setup where the model distills a rule/reference
    signal. Default 1.0 (all 5 checks pass): on the synthetic corpus the
    0.6 production keep-threshold labels every doc positive (checks are
    always 4 or 5), which would make training a trivial majority vote;
    the strict threshold yields a real two-class problem (~7-9%
    negative) the token features must separate."""
    return quality_features(df.select(id_col, text_col), text_col).select(
        F.col(id_col), (F.col("q_score") >= threshold).cast("bigint").alias("y")
    )


def train_logreg_fixed_point(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    steps: int = 16,
    lr_num: int = 4,
    lr_den: int = 1,
    cb_neg: int = 10,
    x_col: str | None = None,
) -> DataFrame:
    """Class-balanced full-batch gradient descent, ``steps`` rounds,
    learning rate lr_num/lr_den, negative-class error weighted by
    ``cb_neg``, weights initialized to 0. Returns (bucket, w) with w a
    BIGINT in units of 1/SCALE. Bit-reproducible on any engine and any
    partitioning (module docstring); the DuckDB oracle unrolls the same
    rounds as CTEs.

    ``x_col=None`` (default) is the binary-presence mode: each feature
    row contributes its weight verbatim. ``x_col`` names a VALUED
    feature column (BIGINT, units 1/XSCALE, pre-clamped to
    [-XSCALE, XSCALE] by the feature builder — the reranker path):
    the forward pass becomes z = sum((x*w) div XSCALE) and the
    gradient g = sum((err*x) div XSCALE) — the same truncating
    integer arithmetic, exact in both engines. The presence mode stays
    a literal weight sum (NOT x=XSCALE through the valued path): its
    weights grow to ~6e11 at the defaults and even XSCALE*w would
    stay representable, but the valued expressions change the plan and
    the committed oracles pin the literal-sum arithmetic.

    Execution shape (optimization round 12, guide §2.3/§2.4): the
    feature rows are compressed ONCE into a per-doc array frame
    ``(id, _f, y)`` — one hash-agg, the only feature-row shuffle of the
    whole training run — and each step is then a SINGLE scan of that
    cached frame: z/err are computed per row from the doc's own array
    against the current weights as a dense LITERAL array (the weights
    are a driver-materialized bounded artifact every round anyway), and
    the gradient is one explode + bucket-keyed hash-agg whose exchange
    carries <= n_buckets+1 partial rows per task. The previous shape
    paid, per step, two scans of the feature rows plus a doc-keyed
    hash-agg and a doc-keyed join; integer addition is associative, so
    the regrouped sums are bit-identical (pinned by
    test_train_matches_python_reference and the unrolled oracles). The
    weight update runs driver-side with truncating integer division
    (``_tdiv`` == Spark ``div`` == DuckDB ``//``) over the <=
    n_buckets+1 gradient rows.

    ``feats`` may be the (id, bucket[, x]) ROW form or the doc-array
    form from :func:`hashed_token_feature_arrays` /
    :func:`hashed_subword_feature_arrays` (column ``_buckets``); the
    array form skips the compress exchange entirely. ``labels`` must be
    one row per id (every builder's contract)."""
    _release()
    if "_buckets" in feats.columns:
        fd = feats.join(labels, id_col).select(
            F.col(id_col), F.col("_buckets").alias("_f"), F.col("y")
        )
    elif x_col is None:
        fd = (
            feats.join(labels, id_col)
            .groupBy(id_col)
            .agg(
                F.collect_list("bucket").alias("_f"),
                F.min("y").alias("y"),
            )
        )
    else:
        fd = (
            feats.join(labels, id_col)
            .groupBy(id_col)
            .agg(
                F.collect_list(
                    F.struct(F.col("bucket"), F.col(x_col).alias("x"))
                ).alias("_f"),
                F.min("y").alias("y"),
            )
        )
    fd = _persist(fd)
    n = fd.count()  # n distinct docs (fd is one row per id)
    if x_col is None:
        universe = [
            r["bucket"]
            for r in fd.select(
                F.explode("_f").alias("bucket")
            ).distinct().collect()
        ]
        fwd = "acc + {w_at}"
        gterm = "_err"
        bexpr = "b"
    else:
        universe = [
            r["bucket"]
            for r in fd.select(
                F.explode("_f").alias("e")
            ).select(F.col("e.bucket").alias("bucket")).distinct().collect()
        ]
        fwd = f"acc + ({{w_at}} * b.x) div {XSCALE}"
        gterm = f"(_err * e.x) div {XSCALE}"
        bexpr = "b.bucket"
    wd = {int(b): 0 for b in universe}
    spark = fd.sparkSession
    if not wd:  # empty corpus: no buckets, nothing to train
        _release()
        return spark.createDataFrame([], schema="bucket bigint, w bigint")
    size = max(wd) + 2  # element_at is 1-based; bucket b lives at b + 2
    err_sql = (
        f"(({SCALE // 2}) + (zc * {SCALE}) div (2 * ({SCALE} + abs(zc)))"
        f" - y * {SCALE}) * (CASE WHEN y = 0 THEN {cb_neg} ELSE 1 END)"
    )
    den = lr_den * n
    # The per-step weights stay a dense LITERAL array: a one-row
    # broadcast frame cross-joined below the fold was probed this round
    # and LOST (+0.4 s/step — the per-step BroadcastExchange job costs
    # more than re-analyzing the folded literal, which Catalyst
    # constant-folds to a single ArrayData). Measured min/step on the
    # 512-bucket trainer: literal 0.24 s vs cross-join 0.63 s; at 4096
    # buckets 0.33 vs 0.67.
    for _ in range(steps):
        dense = [0] * size
        for b, w in wd.items():
            dense[b + 1] = w
        warr = "array(" + ",".join(f"{v}L" for v in dense) + ")"
        w_at = (
            f"coalesce(try_element_at({warr}, "
            f"cast({bexpr} + 2 as int)), 0L)"
        )
        z_sql = (
            f"aggregate(_f, cast(0 as bigint), (acc, b) -> "
            f"{fwd.format(w_at=w_at)})"
        )
        errf = (
            fd.select(F.col("_f"), F.col("y"), F.expr(z_sql).alias("z"))
            .select(
                F.col("_f"),
                F.col("y"),
                F.expr(
                    f"greatest(-{ZCLAMP}L, least({ZCLAMP}L, z))"
                ).alias("zc"),
            )
            .select(F.col("_f"), F.expr(err_sql).alias("_err"))
        )
        if x_col is None:
            grad = (
                errf.select(F.col("_err"), F.explode("_f").alias("bucket"))
                .groupBy("bucket")
                .agg(F.sum("_err").alias("g"))
            )
        else:
            grad = (
                errf.select(F.col("_err"), F.explode("_f").alias("e"))
                .select(F.col("e.bucket").alias("bucket"), F.expr(gterm).alias("_g"))
                .groupBy("bucket")
                .agg(F.sum("_g").alias("g"))
            )
        gmap = {int(r["bucket"]): int(r["g"]) for r in grad.collect()}
        for b in wd:
            wd[b] = wd[b] - _tdiv(gmap.get(b, 0) * lr_num, den)
    _release()
    return spark.createDataFrame(
        sorted(wd.items()), schema="bucket bigint, w bigint"
    )


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — what Spark ``div``
    and DuckDB ``//`` compute on BIGINTs. Python's ``//`` floors, which
    differs on negative operands, so the driver-side weight update must
    spell it out (pinned by test_div_truncates_toward_zero)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def train_langid_ovr(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
    steps: int = 8,
    lr_num: int = 4,
    lr_den: int = 1,
) -> DataFrame:
    """K-class one-vs-rest language identifier in the same fixed-point
    discipline (VERDICT r11 #3) — the fastText lang-id setup: char
    n-gram presence features (:func:`hashed_subword_features` is the
    intended feature map) with one binary logistic head per language,
    trained JOINTLY in one DataFrame program (weights keyed
    (cls, bucket); per step ONE broadcast join + one (doc, cls)-keyed
    hash-agg + one (cls, bucket)-keyed hash-agg — K-vs-rest costs K x
    the binary trainer's rows, never K sequential jobs). No class
    balancing (cb = 1): one-vs-rest flips which side is the minority
    per head, so a single integer multiplier cannot be right for all
    heads; the softmax-free argmax readout only needs the heads'
    RELATIVE order, which unbalanced full-batch GD preserves.

    Returns (cls, bucket, w), w a BIGINT in units of 1/SCALE —
    bounded-artifact (K * (n_buckets + 1) rows), bit-reproducible on
    any engine and partitioning; the DuckDB oracle unrolls the same
    rounds over the (cls, bucket) grid.

    Execution shape (optimization round 12): the same doc-array
    compression as :func:`train_logreg_fixed_point` — per step ONE scan
    of the cached (id, _f, lang) frame computing the K per-class errors
    inline against K dense literal weight arrays, then one
    explode(classes) x explode(buckets) + (cls, bucket)-keyed hash-agg.
    The previous shape fanned the feature rows out K-fold through a
    broadcast join and paid a (doc, cls)-keyed hash-agg plus a
    doc-keyed join per step; the regrouped integer sums are
    bit-identical. ``feats`` accepts the row form or the ``_buckets``
    doc-array form."""
    _release()
    if "_buckets" in feats.columns:
        fd = feats.join(labels, id_col).select(
            F.col(id_col),
            F.col("_buckets").alias("_f"),
            F.col(label_col).alias("_lang"),
        )
    else:
        fd = (
            feats.join(labels, id_col)
            .groupBy(id_col)
            .agg(
                F.collect_list("bucket").alias("_f"),
                F.min(label_col).alias("_lang"),
            )
        )
    fd = _persist(fd)
    n = fd.count()
    # class inventory from the LABELS frame (the original's contract:
    # a language present only in labels still gets a trained head)
    classes = sorted(
        r["cls"]
        for r in labels.select(F.col(label_col).alias("cls"))
        .distinct()
        .collect()
    )
    universe = [
        int(r["bucket"])
        for r in fd.select(F.explode("_f").alias("bucket"))
        .distinct()
        .collect()
    ]
    spark = fd.sparkSession
    if not universe or not classes:
        _release()
        return spark.createDataFrame(
            [], schema="cls string, bucket bigint, w bigint"
        )
    wd = {(c, b): 0 for c in classes for b in universe}
    size = max(universe) + 2
    den = lr_den * n
    # Per step: the K dense weight arrays stay LITERAL (a one-row
    # broadcast frame cross-joined below the folds was probed this
    # round and lost — the per-step BroadcastExchange costs more than
    # re-analyzing the constant-folded literals: min/step 1.28 s
    # literal vs 1.64 s cross-join at K=5, 4096 buckets). The gradient
    # explodes the bucket array ONCE and sums K per-class error
    # COLUMNS (K x fewer exploded rows than the r12 struct-array
    # explode — guide §2.3); the regrouped integer sums are
    # bit-identical.
    for _ in range(steps):
        zcols = []
        for i, c in enumerate(classes):
            dense = [0] * size
            for b in universe:
                dense[b + 1] = wd[(c, b)]
            warr = "array(" + ",".join(f"{v}L" for v in dense) + ")"
            zcols.append(
                F.expr(
                    f"aggregate(_f, cast(0 as bigint), (acc, b) -> acc + "
                    f"coalesce(try_element_at({warr}, cast(b + 2 as int)),"
                    f" 0L))"
                ).alias(f"_z{i}")
            )
        staged = fd.select(F.col("_f"), F.col("_lang"), *zcols).select(
            F.col("_f"),
            F.col("_lang"),
            *[
                F.expr(
                    f"greatest(-{ZCLAMP}L, least({ZCLAMP}L, _z{i}))"
                ).alias(f"_zc{i}")
                for i in range(len(classes))
            ],
        )
        ecols = []
        for i, c in enumerate(classes):
            esc = c.replace("'", "''")
            y_sql = f"(CASE WHEN _lang = '{esc}' THEN 1L ELSE 0L END)"
            e_sql = (
                f"({SCALE // 2}) + (_zc{i} * {SCALE})"
                f" div (2 * ({SCALE} + abs(_zc{i}))) - {y_sql} * {SCALE}"
            )
            ecols.append(F.expr(f"cast(({e_sql}) as bigint)").alias(f"_e{i}"))
        grad = (
            staged.select(F.explode("_f").alias("bucket"), *ecols)
            .groupBy("bucket")
            .agg(
                *[
                    F.sum(f"_e{i}").alias(f"_g{i}")
                    for i in range(len(classes))
                ]
            )
        )
        gmap: dict = {}
        for r in grad.collect():
            b = int(r["bucket"])
            for i, c in enumerate(classes):
                gmap[(c, b)] = int(r[f"_g{i}"])
        for key in wd:
            wd[key] = wd[key] - _tdiv(gmap.get(key, 0) * lr_num, den)
    _release()
    return spark.createDataFrame(
        [(c, b, w) for (c, b), w in sorted(wd.items())],
        schema="cls string, bucket bigint, w bigint",
    )


def langid_predict(
    df: DataFrame,
    weights: DataFrame,
    feats: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: str = "clf-v1",
) -> DataFrame:
    """Apply a :func:`train_langid_ovr` weight table: per doc the
    argmax head — (id, pred_lang, score_scaled). One broadcast join +
    one (doc, cls) hash-agg + one doc-keyed struct-max; ties break to
    the lexicographically LARGER language code (struct max —
    deterministic in both engines, mirrored in the oracle)."""
    if feats is None:
        feats = hashed_subword_feature_arrays(
            df, id_col, text_col, n_buckets, seed
        )
    if "_buckets" in feats.columns:
        fd = feats.select(F.col(id_col), F.col("_buckets").alias("_f"))
    else:
        fd = feats.groupBy(id_col).agg(F.collect_list("bucket").alias("_f"))
    rows = weights.collect()  # bounded: K x (n_buckets + 1) by contract
    wd: dict = {}
    for r in rows:
        wd.setdefault(r["cls"], {})[int(r["bucket"])] = int(r["w"])
    classes = sorted(wd)
    if not classes:
        return fd.sparkSession.createDataFrame(
            [], schema=f"{id_col} bigint, pred_lang string, score_scaled bigint"
        )
    size = max(max(d) for d in wd.values()) + 2
    structs = []
    for c in classes:
        dense = [0] * size
        for b, w in wd[c].items():
            dense[b + 1] = w
        warr = "array(" + ",".join(f"{v}L" for v in dense) + ")"
        esc = c.replace("'", "''")
        # INNER-join parity with the previous shape: a bucket absent
        # from the weight grid contributes nothing (try_element_at ->
        # NULL -> 0); every doc carries the bias bucket, which is
        # always in the grid, so the doc row set is unchanged.
        structs.append(
            f"named_struct('z', aggregate(_f, cast(0 as bigint), "
            f"(acc, b) -> acc + coalesce(try_element_at({warr}, "
            f"cast(b + 2 as int)), 0L)), 'cls', '{esc}')"
        )
    best = F.expr("array_max(array(" + ",".join(structs) + "))")
    return fd.select(F.col(id_col), best.alias("_m")).select(
        F.col(id_col),
        F.col("_m.cls").alias("pred_lang"),
        F.col("_m.z").alias("score_scaled"),
    )


def trained_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    seed: str = "clf-v1",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Apply a trained weight table: per doc the scaled logit
    z = sum of present-bucket weights (BIGINT, units 1/SCALE) and the
    keep decision z >= 0. Same shape as training's forward pass: one
    broadcast join + one doc-keyed hash-agg. Pass ``feats`` to score
    with a different feature map than the token default (e.g.
    hashed_subword_feature_arrays — it must match the map the weights
    were trained on).

    Execution shape (optimization round 12): the weight table is a
    bounded artifact (<= n_buckets + 1 rows by contract), so it is
    collected into a dense literal array and the score becomes a
    doc-local array fold over the doc's bucket set — ZERO shuffle
    (the previous shape paid the feature explode+distinct exchange
    plus a doc-keyed hash-agg). Buckets outside the trained grid
    contribute 0, exactly like the previous left join's coalesce."""
    if feats is None:
        feats = hashed_token_feature_arrays(
            df, id_col, text_col, n_buckets, seed
        )
    if "_buckets" in feats.columns:
        fd = feats.select(F.col(id_col), F.col("_buckets").alias("_f"))
    else:
        fd = feats.groupBy(id_col).agg(F.collect_list("bucket").alias("_f"))
    rows = weights.collect()  # bounded artifact by contract
    wd = {int(r["bucket"]): int(r["w"]) for r in rows}
    if not wd:
        return fd.select(
            F.col(id_col),
            F.lit(0).cast("bigint").alias("score_scaled"),
            F.lit(True).alias("kept"),
        )
    size = max(wd) + 2
    dense = [0] * size
    for b, w in wd.items():
        dense[b + 1] = w
    warr = "array(" + ",".join(f"{v}L" for v in dense) + ")"
    z = F.expr(
        f"aggregate(_f, cast(0 as bigint), (acc, b) -> acc + "
        f"coalesce(try_element_at({warr}, cast(b + 2 as int)), 0L))"
    )
    return fd.select(F.col(id_col), z.alias("z")).select(
        F.col(id_col),
        F.col("z").alias("score_scaled"),
        (F.col("z") >= 0).alias("kept"),
    )
