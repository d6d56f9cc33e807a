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
    the committed oracles pin the literal-sum arithmetic."""
    _release()
    # Pin the feature frame ALREADY partitioned and sorted on the doc
    # key: every step's forward pass groups by id and every step's
    # gradient joins back on id, so a plainly-persisted fj re-shuffles
    # once per step as soon as the err side outgrows broadcast (x100
    # probe: 16 steps x ~260 MB = 4.2 GB, 20x shuffle for 10x data).
    # With the exchange+sort folded INTO the cached plan, the cached
    # frame advertises hash(id) partitioning and id order, so per-step
    # joins shuffle only the doc-keyed err frame — per-step shuffle is
    # then O(docs), not O(feature rows).
    fj = _persist(
        feats.join(labels, id_col)
        .repartition(F.col(id_col))
        .sortWithinPartitions(id_col)
    )
    n1 = fj.agg(F.count_distinct(F.col(id_col)).alias("n"))  # 1 row

    weights = fj.select("bucket").distinct().select(
        "bucket", F.lit(0).cast("bigint").alias("w")
    )
    wterm = (
        F.coalesce(F.col("w"), F.lit(0))
        if x_col is None
        else F.expr(f"(coalesce(w, 0) * {x_col}) div {XSCALE}")
    )
    for _ in range(steps):
        zf = (
            fj.join(F.broadcast(weights), "bucket", "left")
            .groupBy(id_col)
            .agg(
                F.sum(wterm).alias("z"),
                F.min("y").alias("y"),
            )
        )
        err = zf.select(
            F.col(id_col),
            F.expr(
                f"greatest(-{ZCLAMP}L, least({ZCLAMP}L, z))"
            ).alias("zc"),
            F.col("y"),
        ).select(
            F.col(id_col),
            (
                (
                    F.lit(SCALE // 2)
                    + F.expr(f"(zc * {SCALE}) div (2 * ({SCALE} + abs(zc)))")
                    - F.col("y") * SCALE
                )
                * F.when(F.col("y") == 0, cb_neg).otherwise(1)
            ).alias("_err"),
        )
        gterm = (
            F.col("_err")
            if x_col is None
            else F.expr(f"(_err * {x_col}) div {XSCALE}")
        )
        grad = (
            fj.join(err, id_col)
            .groupBy("bucket")
            .agg(F.sum(gterm).alias("g"))
        )
        weights = (
            weights.join(grad, "bucket", "left")
            .join(F.broadcast(n1))
            .select(
                "bucket",
                F.expr(
                    f"w - ((coalesce(g, 0) * {lr_num}) div ({lr_den} * n))"
                ).alias("w"),
            )
        )
        # EAGER lineage cut each round: the weight frame is referenced
        # TWICE per round (forward pass + update), so a lazy plan would
        # double every round — 2^steps plan nodes by round 16, an
        # analysis-time hang measured at minutes. The frame is
        # <= n_buckets+1 rows BY CONSTRUCTION (one row per distinct
        # feature bucket), so this is a bounded-artifact collect (the
        # k-centroid / codebook class), not a corpus collect. A collect
        # beats localCheckpoint here: checkpoint RDDs linger pinned in
        # the JVM until Python GC releases the frame — 16 steps of them
        # made executor-cache contents nondeterministic (the zorder leak
        # test caught the ContextCleaner racing a later test's count).
        weights = _materialize_weights(weights)
    _release()  # the returned literal frame no longer needs fj pinned
    return weights


def _materialize_weights(weights: DataFrame) -> DataFrame:
    rows = [(r["bucket"], r["w"]) for r in weights.collect()]
    return weights.sparkSession.createDataFrame(
        rows, schema="bucket bigint, w bigint"
    )


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
    rounds over the (cls, bucket) grid."""
    _release()
    fj = _persist(
        feats.join(labels, id_col)
        .repartition(F.col(id_col))
        .sortWithinPartitions(id_col)
    )
    n1 = fj.agg(F.count_distinct(F.col(id_col)).alias("n"))  # 1 row
    classes = labels.select(
        F.col(label_col).alias("cls")
    ).distinct()  # bounded: number of languages
    weights = (
        fj.select("bucket")
        .distinct()
        .join(F.broadcast(classes))
        .select("cls", "bucket", F.lit(0).cast("bigint").alias("w"))
    )
    for _ in range(steps):
        zf = (
            fj.join(F.broadcast(weights), "bucket")
            .groupBy(id_col, "cls")
            .agg(
                F.sum(F.coalesce(F.col("w"), F.lit(0))).alias("z"),
                F.min(
                    (F.col(label_col) == F.col("cls")).cast("bigint")
                ).alias("y"),
            )
        )
        err = zf.select(
            F.col(id_col),
            "cls",
            F.expr(f"greatest(-{ZCLAMP}L, least({ZCLAMP}L, z))").alias("zc"),
            F.col("y"),
        ).select(
            F.col(id_col),
            "cls",
            (
                F.lit(SCALE // 2)
                + F.expr(f"(zc * {SCALE}) div (2 * ({SCALE} + abs(zc)))")
                - F.col("y") * SCALE
            ).alias("_err"),
        )
        grad = (
            fj.join(err, id_col)
            .groupBy("cls", "bucket")
            .agg(F.sum("_err").alias("g"))
        )
        weights = (
            weights.join(grad, ["cls", "bucket"], "left")
            .join(F.broadcast(n1))
            .select(
                "cls",
                "bucket",
                F.expr(
                    f"w - ((coalesce(g, 0) * {lr_num}) div ({lr_den} * n))"
                ).alias("w"),
            )
        )
        # same bounded-artifact eager cut as the binary trainer
        rows = [(r["cls"], r["bucket"], r["w"]) for r in weights.collect()]
        weights = weights.sparkSession.createDataFrame(
            rows, schema="cls string, bucket bigint, w bigint"
        )
    _release()
    return weights


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
        feats = hashed_subword_features(df, id_col, text_col, n_buckets, seed)
    scores = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.coalesce(F.col("w"), F.lit(0))).alias("z"))
    )
    best = scores.groupBy(id_col).agg(
        F.max(F.struct(F.col("z"), F.col("cls"))).alias("_m")
    )
    return best.select(
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
    hashed_subword_features — it must match the map the weights were
    trained on)."""
    if feats is None:
        feats = hashed_token_features(df, id_col, text_col, n_buckets, seed)
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("w"), F.lit(0))).alias("z"))
        .select(
            F.col(id_col),
            F.col("z").alias("score_scaled"),
            (F.col("z") >= 0).alias("kept"),
        )
    )
