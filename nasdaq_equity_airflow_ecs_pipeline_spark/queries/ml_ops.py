"""Round-10 contract queries: in-engine model training and the other
VERDICT r9 capability items (DoReMi reweighting, byte-level BPE,
order-aware video near-dup, incremental composed curation).

Oracle discipline: every iterative algorithm is fixed-point/rational
integer arithmetic (the operators/pagerank.py argument) and its DuckDB
oracle UNROLLS the same N rounds as CTEs — bit-exact across engines and
partitionings. Heavy multiply-referenced CTEs are marked MATERIALIZED
(DuckDB inlines them otherwise — the r9 corpus-pipeline lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import classifier as clf
from ..operators import text as text_ops
from ..sources.tables import load_table
from .llm_ops import _SQL_QRULE_CHECKS, _sql_stopword_hits
from ..operators.text import STOPWORDS

QUERIES: dict = {}
ORACLES: dict = {}


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


# ================================================== classifier training
# Constants shared by the Spark operator and the generated oracle —
# one source of truth, zero drift (the MINHASH_PARAMS discipline).
CLF_BUCKETS = 512
CLF_SEED = "clf-v1"
CLF_STEPS = 16
CLF_LR_NUM = 4
CLF_LR_DEN = 1
CLF_CB_NEG = 10  # ~ N_pos/N_neg on the rule label (class balancing)
_S = clf.SCALE
_ZC = clf.ZCLAMP


def q_classifier_train(spark: SparkSession, sf: str) -> DataFrame:
    """Train the hashed-linear quality classifier in-engine: 16 rounds
    of class-balanced full-batch logistic-regression gradient descent in
    10^-9 fixed-point integer arithmetic with the clamped rational
    sigmoid (operators/classifier.py). Labels are the rule-based
    quality flag (all 5 checks pass) — the fasttext-wikiref setup. The
    oracle unrolls the same 16 rounds as CTEs with DuckDB integer
    division; weights match bit-for-bit."""
    d = _docs(spark, sf).select("doc_id", "text")
    feats = clf.hashed_token_feature_arrays(
        d, n_buckets=CLF_BUCKETS, seed=CLF_SEED
    )
    labels = clf.rule_labels(d)
    return clf.train_logreg_fixed_point(
        feats,
        labels,
        steps=CLF_STEPS,
        lr_num=CLF_LR_NUM,
        lr_den=CLF_LR_DEN,
        cb_neg=CLF_CB_NEG,
    )


_SQL_CLF_BUCKET = (
    f"(('0x' || substr(md5(tok || ':{CLF_SEED}'), 1, 15))::BIGINT"
    f" % 2147483647) % {CLF_BUCKETS}"
)

# fastText-faithful subword mode (VERDICT r10 #4): whole-word hash plus
# boundary-marked char n-grams with a distinct salt, 8x bucket space
# (each doc carries ~2x len(token) n-grams per token; 512 would saturate)
NG_BUCKETS = 4096
NG_MINN = 3
NG_MAXN = 4


def _sql_subword_feats(p: str) -> str:
    """feats0 body for the subword mode — mirrors
    operators/classifier.py hashed_subword_features term for term."""
    word_bucket = (
        f"(('0x' || substr(md5(tok || ':{CLF_SEED}'), 1, 15))::BIGINT"
        f" % 2147483647) % {NG_BUCKETS}"
    )
    gram_bucket = (
        f"(('0x' || substr(md5(g || ':ng:{CLF_SEED}'), 1, 15))::BIGINT"
        f" % 2147483647) % {NG_BUCKETS}"
    )
    return f"""
  SELECT DISTINCT doc_id, bucket FROM (
    SELECT doc_id, CAST({word_bucket} AS BIGINT) AS bucket FROM {p}toks
    UNION ALL
    SELECT doc_id, CAST({gram_bucket} AS BIGINT) AS bucket
    FROM (
      SELECT doc_id,
             unnest(flatten(list_transform(generate_series({NG_MINN}, {NG_MAXN}), n ->
               CASE WHEN length('<' || tok || '>') >= n
                    THEN list_transform(
                           generate_series(1, length('<' || tok || '>') - n + 1),
                           i -> substring('<' || tok || '>', i, n))
                    ELSE [] END))) AS g
      FROM {p}toks)
  )"""

# label = ALL 5 checks pass (rule_labels threshold=1.0): integer
# comparison, exact in both engines; the 0.6 production threshold is
# all-positive on this corpus (checks are always 4 or 5)
_SQL_CLF_LABEL = f"""({_SQL_QRULE_CHECKS}
    + (CASE WHEN {_sql_stopword_hits(STOPWORDS)} >= 1 THEN 1 ELSE 0 END)
  ) >= 5"""


def _sql_clf_prefix(
    p: str = "", subword: bool = False, src: str = "documents"
) -> str:
    """Shared CTE prefix: binary presence features + labels + the
    unrolled gradient rounds w0..w{CLF_STEPS}. Composable suffix picks
    weights or scores. Mirrors operators/classifier.py term for term:
    clamped rational sigmoid, class-balanced error, truncating integer
    division (DuckDB // == Spark div, both toward zero). ``p`` prefixes
    every generated CTE name so the block can splice into a larger
    statement (the v7 composed-chain oracle) without colliding with the
    host query's CTEs. ``subword=True`` swaps the feats0 body for the
    fastText char-n-gram mode (hashed_subword_features). ``src``
    overrides the labeler-corpus relation (v8 trains on the
    benchmark-excluded slice)."""
    rounds = []
    prev = f"{p}w0"
    for i in range(1, CLF_STEPS + 1):
        rounds.append(f"""
{p}z{i} AS (
  SELECT f.doc_id, min(f.y) AS y, COALESCE(sum(w.w), 0) AS z
  FROM {p}fj f LEFT JOIN {prev} w USING (bucket) GROUP BY 1
),
{p}e{i} AS (
  SELECT doc_id,
         (({_S} // 2)
          + (greatest(-{_ZC}, least({_ZC}, z)) * {_S})
            // (2 * ({_S} + abs(greatest(-{_ZC}, least({_ZC}, z)))))
          - y * {_S})
         * (CASE WHEN y = 0 THEN {CLF_CB_NEG} ELSE 1 END) AS err
  FROM {p}z{i}
),
{p}g{i} AS (
  SELECT f.bucket, sum(e.err) AS g
  FROM {p}fj f JOIN {p}e{i} e USING (doc_id) GROUP BY 1
),
{p}w{i} AS MATERIALIZED (
  SELECT w.bucket,
         CAST(w.w - (COALESCE(g.g, 0) * {CLF_LR_NUM})
                    // ({CLF_LR_DEN} * {p}nd.n) AS BIGINT) AS w
  FROM {prev} w LEFT JOIN {p}g{i} g USING (bucket), {p}nd
)""")
        prev = f"{p}w{i}"
    return f"""
WITH {p}toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM {src}
),
{p}labels AS MATERIALIZED (
  SELECT doc_id,
         CAST(CASE WHEN {_SQL_CLF_LABEL} THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM {src}
),
{p}feats0 AS ({_sql_subword_feats(p) if subword else f'''
  SELECT DISTINCT doc_id, CAST({_SQL_CLF_BUCKET} AS BIGINT) AS bucket
  FROM {p}toks'''}
),
{p}fj AS MATERIALIZED (
  SELECT f.doc_id, f.bucket, l.y
  FROM (
    SELECT doc_id, bucket FROM {p}feats0
    UNION ALL
    SELECT doc_id, CAST(-1 AS BIGINT) AS bucket FROM {src}
  ) f
  JOIN {p}labels l USING (doc_id)
),
{p}nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM {p}fj),
{p}w0 AS MATERIALIZED (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w FROM {p}fj),{",".join(rounds)}
"""


SQL_CLASSIFIER_TRAIN = (
    _sql_clf_prefix() + f"SELECT bucket, w FROM w{CLF_STEPS}"
)


def q_classifier_train_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """q_classifier_train with fastText-faithful SUBWORD features
    (VERDICT r10 #4): whole-word presence plus boundary-marked char
    {NG_MINN}..{NG_MAXN}-grams hashed into a {NG_BUCKETS}-bucket space.
    Same 16-round fixed-point trainer, same oracle discipline (the
    unrolled CTEs differ only in the feats0 body); the subword model's
    robustness to misspelled markers is pinned by
    test_classifier_ngram_beats_token_on_misspellings."""
    d = _docs(spark, sf).select("doc_id", "text")
    feats = clf.hashed_subword_feature_arrays(
        d, n_buckets=NG_BUCKETS, seed=CLF_SEED, minn=NG_MINN, maxn=NG_MAXN
    )
    labels = clf.rule_labels(d)
    return clf.train_logreg_fixed_point(
        feats,
        labels,
        steps=CLF_STEPS,
        lr_num=CLF_LR_NUM,
        lr_den=CLF_LR_DEN,
        cb_neg=CLF_CB_NEG,
    )


SQL_CLASSIFIER_TRAIN_NGRAM = (
    _sql_clf_prefix(subword=True) + f"SELECT bucket, w FROM w{CLF_STEPS}"
)


# ===================================== multiclass lang-id (VERDICT r11 #3)
# the fastText lang-id setup: char n-gram features + one logistic head
# per language, trained jointly; 8 rounds (the reranker-head budget —
# the oracle unrolls rounds over the (cls, bucket) grid, and the argmax
# readout stabilizes well before the binary trainer's 16)
LANGID_STEPS = 8
LANGID_LR_NUM = 4
LANGID_LR_DEN = 1


def q_langid_train(spark: SparkSession, sf: str) -> DataFrame:
    """Train the K-class one-vs-rest language identifier in-engine
    (operators/classifier.py train_langid_ovr): fastText-faithful
    subword features (whole-word + boundary-marked char 3-4-grams,
    the r11 feature path), one fixed-point logistic head per language
    trained jointly over the (cls, bucket) weight grid, labels = the
    documents.lang column. The oracle unrolls the same 8 rounds as
    CTEs; weights match bit-for-bit. (The synthetic corpus's lang
    column is uncorrelated with its text, so the learned weights are
    near-noise HERE — the accuracy claim is pinned by
    test_langid_beats_marker_heuristic on a real multi-language
    fixture; this query pins the cross-engine training arithmetic.)"""
    d = _docs(spark, sf).select("doc_id", "text", "lang")
    feats = clf.hashed_subword_feature_arrays(
        d.select("doc_id", "text"),
        n_buckets=NG_BUCKETS,
        seed=CLF_SEED,
        minn=NG_MINN,
        maxn=NG_MAXN,
    )
    return clf.train_langid_ovr(
        feats,
        d.select("doc_id", "lang"),
        steps=LANGID_STEPS,
        lr_num=LANGID_LR_NUM,
        lr_den=LANGID_LR_DEN,
    )


def q_langid_predict(spark: SparkSession, sf: str) -> DataFrame:
    """Train + apply: per doc the argmax head (pred_lang) and its
    scaled logit. One broadcast join + one (doc, cls) hash-agg + one
    doc-keyed struct-max over the training plan; ties break to the
    lexicographically larger code (struct max, both engines)."""
    d = _docs(spark, sf).select("doc_id", "text", "lang")
    feats = clf.hashed_subword_feature_arrays(
        d.select("doc_id", "text"),
        n_buckets=NG_BUCKETS,
        seed=CLF_SEED,
        minn=NG_MINN,
        maxn=NG_MAXN,
    )
    weights = clf.train_langid_ovr(
        feats,
        d.select("doc_id", "lang"),
        steps=LANGID_STEPS,
        lr_num=LANGID_LR_NUM,
        lr_den=LANGID_LR_DEN,
    )
    return clf.langid_predict(d, weights, feats=feats)


def _sql_langid_prefix(p: str = "li") -> str:
    """Unrolled one-vs-rest rounds over the (cls, bucket) grid —
    mirrors train_langid_ovr term for term (joint forward pass via the
    bucket join fanning out to K classes; y = (lang == cls); cb = 1)."""
    rounds = []
    prev = f"{p}w0"
    for i in range(1, LANGID_STEPS + 1):
        rounds.append(f"""
{p}z{i} AS (
  SELECT f.doc_id, w.cls,
         min(CASE WHEN f.lang = w.cls THEN 1 ELSE 0 END) AS y,
         COALESCE(sum(w.w), 0) AS z
  FROM {p}fj f JOIN {prev} w USING (bucket)
  GROUP BY 1, 2
),
{p}e{i} AS (
  SELECT doc_id, cls,
         (({_S} // 2)
          + (greatest(-{_ZC}, least({_ZC}, z)) * {_S})
            // (2 * ({_S} + abs(greatest(-{_ZC}, least({_ZC}, z)))))
          - y * {_S}) AS err
  FROM {p}z{i}
),
{p}g{i} AS (
  SELECT e.cls, f.bucket, sum(e.err) AS g
  FROM {p}fj f JOIN {p}e{i} e USING (doc_id) GROUP BY 1, 2
),
{p}w{i} AS MATERIALIZED (
  SELECT w.cls, w.bucket,
         CAST(w.w - (COALESCE(g.g, 0) * {LANGID_LR_NUM})
                    // ({LANGID_LR_DEN} * {p}nd.n) AS BIGINT) AS w
  FROM {prev} w LEFT JOIN {p}g{i} g USING (cls, bucket), {p}nd
)""")
        prev = f"{p}w{i}"
    return f"""
WITH {p}toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
{p}feats0 AS ({_sql_subword_feats(p)}
),
{p}cls AS (SELECT DISTINCT lang AS cls FROM documents),
{p}fj AS MATERIALIZED (
  SELECT f.doc_id, f.bucket, d.lang
  FROM (
    SELECT doc_id, bucket FROM {p}feats0
    UNION ALL
    SELECT doc_id, CAST(-1 AS BIGINT) AS bucket FROM documents
  ) f
  JOIN (SELECT doc_id, lang FROM documents) d USING (doc_id)
),
{p}nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM {p}fj),
{p}w0 AS MATERIALIZED (
  SELECT cls, bucket, CAST(0 AS BIGINT) AS w
  FROM (SELECT DISTINCT bucket FROM {p}fj), {p}cls
),{",".join(rounds)}
"""


SQL_LANGID_TRAIN = (
    _sql_langid_prefix()
    + f"SELECT cls, bucket, w FROM liw{LANGID_STEPS}"
)

SQL_LANGID_PREDICT = (
    _sql_langid_prefix()
    + f""",
lisc AS (
  SELECT f.doc_id, w.cls, COALESCE(sum(w.w), 0) AS z
  FROM (SELECT doc_id, bucket FROM lifj) f
  JOIN liw{LANGID_STEPS} w USING (bucket)
  GROUP BY 1, 2
)
SELECT doc_id,
       (max(struct_pack(z := z, c := cls))).c AS pred_lang,
       CAST((max(struct_pack(z := z, c := cls))).z AS BIGINT)
         AS score_scaled
FROM lisc
GROUP BY 1
"""
)


def q_filter_eval_trained(spark: SparkSession, sf: str) -> DataFrame:
    """Filter-vs-rule confusion counts for the TRAINED classifier (the
    q_filter_eval readout with learned weights instead of the disclosed
    placeholder) — pytest asserts its accuracy beats the placeholder's
    on the same corpus. One extra broadcast join + doc-keyed agg over
    the training plan."""
    d = _docs(spark, sf).select("doc_id", "text")
    feats = clf.hashed_token_feature_arrays(d, n_buckets=CLF_BUCKETS, seed=CLF_SEED)
    labels = clf.rule_labels(d)
    weights = clf.train_logreg_fixed_point(
        feats,
        labels,
        steps=CLF_STEPS,
        lr_num=CLF_LR_NUM,
        lr_den=CLF_LR_DEN,
        cb_neg=CLF_CB_NEG,
    )
    scored = clf.trained_score(
        d, weights, n_buckets=CLF_BUCKETS, seed=CLF_SEED, feats=feats
    )
    j = scored.join(labels, "doc_id")
    y1 = F.col("y") == 1
    k = F.col("kept")
    return j.agg(
        F.sum(F.when(y1 & k, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(~y1 & k, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(y1 & ~k, 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~y1 & ~k, 1).otherwise(0)).cast("bigint").alias("tn"),
    )


SQL_FILTER_EVAL_TRAINED = _sql_clf_prefix() + f""",
scored AS (
  SELECT f.doc_id, min(f.y) AS y, COALESCE(sum(w.w), 0) AS z
  FROM fj f LEFT JOIN w{CLF_STEPS} w USING (bucket) GROUP BY 1
)
SELECT
  CAST(SUM(CASE WHEN y = 1 AND z >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CAST(SUM(CASE WHEN y = 0 AND z >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
  CAST(SUM(CASE WHEN y = 1 AND z < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
  CAST(SUM(CASE WHEN y = 0 AND z < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM scored
"""


# ==================================================== byte-level BPE
# GPT-2 convention (VERDICT r9 #5): whitespace-preserving pre-tokenizer,
# 256-byte base alphabet (no OOV), hex-pair symbols (engine-portable,
# losslessly reversible). 5 merges — the oracle unrolls them.
BPE_BYTES_MERGES = 5

_SQL_BYTE_PIECES = r"regexp_extract_all(text, '\s*\S+|\s+$')"
_SQL_BYTE_SPLIT = (
    r"string_split(trim(regexp_replace(hex(encode(w)), '(..)', '\1 ', 'g')), ' ')"
)


def _byte_merges(spark: SparkSession, sf: str) -> list[tuple[str, str, str]]:
    trained = text_ops.bpe_train_local(
        _docs(spark, sf), n_merges=BPE_BYTES_MERGES, unit="byte"
    )
    return [
        (r["pair"].split(" ", 1)[0], r["pair"].split(" ", 1)[1], r["merged"])
        for r in trained.orderBy("step").collect()
    ]


def q_bpe_bytes_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-level BPE training (operators/text.py bpe_train_local
    unit='byte'): word table from the whitespace-preserving
    pre-tokenizer, initial symbols = 2-hex-digit UTF-8 bytes, then the
    same incremental merge rounds. Checked against the byte-flavored
    unrolled sequential oracle — same determinism-parity argument as
    q_bpe_merges_local."""
    return text_ops.bpe_train_local(
        _docs(spark, sf), n_merges=BPE_BYTES_MERGES, unit="byte"
    )


def _sql_bpe_bytes_ctes() -> str:
    """Byte-flavored twin of llm_ops._sql_bpe_ctes: pieces instead of
    tokens, hex-pair split instead of per-char split; merge rounds are
    identical (symbols are just strings to the fold)."""
    parts = [f"""
WITH wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest({_SQL_BYTE_PIECES}) AS w FROM documents
  ) WHERE w != '' GROUP BY w
),
s0 AS (
  SELECT {_SQL_BYTE_SPLIT} AS arr, freq FROM wf
)"""]
    for i in range(1, BPE_BYTES_MERGES + 1):
        parts.append(f""",
p{i} AS (
  SELECT arr[u.i] || ' ' || arr[u.i + 1] AS pair,
         CAST(SUM(freq) AS BIGINT) AS f
  FROM s{i - 1}, unnest(generate_series(1, len(arr) - 1)) AS u(i)
  GROUP BY 1
),
t{i} AS (
  SELECT pair, replace(pair, ' ', '') AS merged, f FROM (
    SELECT pair, f, row_number() OVER (ORDER BY f DESC, pair ASC) AS rn
    FROM p{i}
  ) WHERE rn = 1
),
s{i} AS (
  SELECT list_reduce(
           list_transform(arr, tk -> [tk]),
           (acc, tk) -> CASE
             WHEN len(acc) > 0
                  AND acc[-1] = split_part(t.pair, ' ', 1)
                  AND tk[1] = split_part(t.pair, ' ', 2)
             THEN acc[1:len(acc) - 1] || [t.merged]
             ELSE acc || tk END) AS arr,
         freq
  FROM s{i - 1} LEFT JOIN t{i} t ON TRUE
)""")
    return "".join(parts)


SQL_BPE_BYTES_MERGES = _sql_bpe_bytes_ctes() + "\n" + "\nUNION ALL\n".join(
    f"SELECT {i} AS step, pair, merged, f AS freq FROM t{i}"
    for i in range(1, BPE_BYTES_MERGES + 1)
)


def q_bpe_bytes_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Encode the corpus to byte-level token ids
    (operators/text.py bpe_encode_bytes): fixed 256-byte base alphabet
    (id == byte value — no alphabet window at all), merge outputs at
    256+step-1, whitespace preserved by the pre-tokenizer so the id
    stream is losslessly decodable. The oracle re-derives the byte
    training chain, re-applies the keyed folds, and assigns the same
    ids."""
    d = _docs(spark, sf)
    return text_ops.bpe_encode_bytes(d, _byte_merges(spark, sf))


def _sql_bpe_bytes_encode() -> str:
    parts = [_sql_bpe_bytes_ctes()]
    parts.append(f""",
v0 AS (
  SELECT w, {_SQL_BYTE_SPLIT} AS arr FROM wf
)""")
    for i in range(1, BPE_BYTES_MERGES + 1):
        parts.append(f""",
v{i} AS (
  SELECT w, list_reduce(
           list_transform(arr, tk -> [tk]),
           (acc, tk) -> CASE
             WHEN len(acc) > 0
                  AND acc[-1] = split_part(t.pair, ' ', 1)
                  AND tk[1] = split_part(t.pair, ' ', 2)
             THEN acc[1:len(acc) - 1] || [t.merged]
             ELSE acc || tk END) AS arr
  FROM v{i - 1} LEFT JOIN t{i} t ON TRUE
)""")
    merge_union = "\n  UNION ALL ".join(
        f"SELECT {i} AS step, merged FROM t{i}"
        for i in range(1, BPE_BYTES_MERGES + 1)
    )
    parts.append(f""",
mid AS (
  SELECT merged AS sym, CAST(256 + min(step) - 1 AS BIGINT) AS token_id
  FROM ({merge_union}) GROUP BY 1
),
dw AS (
  SELECT doc_id, u.i AS wpos, t[u.i] AS w
  FROM (SELECT doc_id, {_SQL_BYTE_PIECES} AS t FROM documents),
       unnest(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] != ''
),
sy AS (
  SELECT dw.doc_id, dw.wpos, s.i AS spos, v.arr[s.i] AS sym
  FROM dw JOIN v{BPE_BYTES_MERGES} v ON v.w = dw.w,
       unnest(generate_series(1, len(v.arr))) AS s(i)
)
SELECT sy.doc_id,
       CAST(row_number() OVER (PARTITION BY sy.doc_id
                               ORDER BY sy.wpos, sy.spos) - 1 AS BIGINT)
         AS seq_pos,
       COALESCE(mid.token_id, ('0x' || sy.sym)::BIGINT) AS token_id
FROM sy LEFT JOIN mid ON mid.sym = sy.sym""")
    return "".join(parts)


SQL_BPE_BYTES_ENCODE = _sql_bpe_bytes_encode()


def q_bpe_bytes_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Lossless round-trip proof, per doc: decode(encode(text)) == text
    through the full id-stream machinery (encode to ids, map ids back
    to hex symbols, concatenate in sequence order, unhex, UTF-8
    decode). The oracle reconstructs the ground truth independently
    from the pre-tokenizer's concat-preservation (pieces rejoin to the
    exact byte sequence)."""
    d = _docs(spark, sf)
    merges = _byte_merges(spark, sf)
    enc = text_ops.bpe_encode_bytes(d, merges)
    dec = text_ops.bpe_decode_bytes(enc, merges).withColumnRenamed(
        "text", "_decoded"
    )
    return (
        d.select("doc_id", "text")
        .join(dec, "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("_decoded"), F.lit("")) == F.col("text")).alias(
                "ok"
            ),
        )
    )


SQL_BPE_BYTES_ROUNDTRIP = f"""
WITH dw AS (
  SELECT doc_id, u.i AS wpos, t[u.i] AS w
  FROM (SELECT doc_id, {_SQL_BYTE_PIECES} AS t FROM documents),
       unnest(generate_series(1, len(t))) AS u(i)
),
rec AS (
  SELECT doc_id,
         decode(from_hex(string_agg(hex(encode(w)), '' ORDER BY wpos)))
           AS recon
  FROM dw GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(r.recon, '') = d.text AS ok
FROM documents d LEFT JOIN rec r USING (doc_id)
"""


# ============================================ order-aware video near-dup
# VERDICT r9 #3: the majority-vote signature is offset-blind; winnowing
# over the frame-hash sequence (MOSS applied to frames) catches
# shifted/trimmed clips. Synthetic shifted clips: per group gid =
# doc_id//3, a global frame stream fh(gid, t); member m samples frames
# t = 4m..4m+11 (12 frames, shift 4) — members share 8- and 4-frame
# runs, >= w+k-1 = 4, so the winnowing guarantee forces shared
# fingerprints while the majority votes diverge (contrast pytest).
VSH_K = 2
VSH_W = 3
VSH_FRAMES = 12
VSH_SHIFT = 4
VSH_MIN_SHARED = 1
VSH_MAX_DF = 20


def q_video_shingle_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Shifted-clip video near-dup pairs
    (operators/multimodal.py:video_shingle_pairs): frame-hash sequence
    -> winnowed k=2-gram fingerprints (w=3, leftmost-min) ->
    fp-keyed overlap pairs with the stop-fingerprint df cap. Stand-in
    frame hashes per the q_video_neardup discipline (real frame decode
    is binary and pytest-pinned)."""
    from ..operators.multimodal import video_shingle_pairs

    d = _docs(spark, sf)
    frames = (
        d.select(
            F.col("doc_id").alias("content_id"),
            F.floor(F.col("doc_id") / 3).cast("bigint").alias("_g"),
            (F.col("doc_id") % 3).cast("bigint").alias("_m"),
        )
        .select(
            "content_id",
            "_g",
            "_m",
            F.explode(F.sequence(F.lit(0), F.lit(VSH_FRAMES - 1))).alias(
                "frame_idx"
            ),
        )
        .select(
            "content_id",
            "frame_idx",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("_g").cast("string"),
                                (F.col("_m") * VSH_SHIFT + F.col("frame_idx"))
                                .cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2147483647
            ).alias("fhash"),
        )
    )
    return video_shingle_pairs(
        frames,
        k=VSH_K,
        w=VSH_W,
        min_shared=VSH_MIN_SHARED,
        max_df=VSH_MAX_DF,
    )


SQL_VIDEO_SHINGLE_NEARDUP = f"""
WITH fh AS (
  SELECT doc_id AS content_id, u.i AS fi,
         ('0x' || substr(md5(CAST(doc_id // 3 AS VARCHAR) || ':' ||
                             CAST((doc_id % 3) * {VSH_SHIFT} + u.i AS VARCHAR)),
                         1, 15))::BIGINT % 2147483647 AS fhash
  FROM documents, unnest(generate_series(0, {VSH_FRAMES - 1})) AS u(i)
),
seqs AS (
  SELECT content_id,
         string_agg(CAST(fhash AS VARCHAR), ' ' ORDER BY fi) AS fseq
  FROM fh GROUP BY 1
),
t AS (SELECT content_id, string_split(fseq, ' ') AS toks FROM seqs),
g AS (
  SELECT content_id,
         list_transform(
           generate_series(1, len(toks) - {VSH_K - 1}),
           i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 15))::BIGINT
                  % 2147483647
         ) AS gh
  FROM t
  WHERE len(toks) >= {VSH_K + VSH_W - 1}
),
sel AS (
  SELECT content_id,
         list_distinct(list_transform(
           generate_series(1, len(gh) - {VSH_W - 1}),
           i -> CAST(i + list_position(gh[i:i+{VSH_W - 1}],
                                       list_min(gh[i:i+{VSH_W - 1}])) - 1
                     AS BIGINT) * 2147483648
                + list_min(gh[i:i+{VSH_W - 1}])
         )) AS fps
  FROM g
),
fpd AS (
  SELECT DISTINCT content_id, CAST(code % 2147483648 AS BIGINT) AS fp_hash
  FROM (SELECT content_id, unnest(fps) AS code FROM sel)
),
keep AS (
  SELECT fp_hash FROM fpd GROUP BY 1 HAVING count(*) <= {VSH_MAX_DF}
),
ff AS (SELECT fpd.content_id, fpd.fp_hash FROM fpd JOIN keep USING (fp_hash))
SELECT a.content_id AS id_a, b.content_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM ff a JOIN ff b ON a.fp_hash = b.fp_hash AND a.content_id < b.content_id
GROUP BY 1, 2
HAVING count(*) >= {VSH_MIN_SHARED}
"""


# ============================================== DoReMi mixture reweighting
DOREMI_ROUNDS = 3
DOREMI_ETA = (1, 8)
DOREMI_SMOOTH = (1, 5)
_DS = 1_000_000  # operators/doremi.py SCALE
# The synthetic corpus's 20 sources are statistically identical, so
# honest DoReMi returns uniform weights (measured: excess bits floor to
# 0 everywhere). To exercise the mechanism the query PLANTS domain
# heterogeneity in-engine (the WINNOW_BOILER / q_video_neardup fixture
# convention): "specialist" domains get 8 copies of a domain-unique
# marker token — cheap under their own model, expensive under the
# mixture — so their excess loss is positive and the iteration visibly
# upweights them (asserted in tests/test_doremi.py).
DOREMI_SPECIALISTS = ("src0", "src1", "src2", "src3", "src4")
_DOREMI_MARKS = 8


def q_doremi_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DoReMi-style iterative domain reweighting
    (operators/doremi.py): 3 multiplicative-weights rounds where each
    round recomputes per-domain excess code length (integer floor-log2
    bits under the CURRENT alpha-weighted mixture unigram model vs the
    domain's own model), updates weights by the linearized MWU factor,
    renormalizes, and smooths toward uniform — all in 10^-6 fixed-point
    integer arithmetic. The oracle unrolls the same 3 rounds."""
    from ..operators.doremi import doremi_weights

    d = _docs(spark, sf).select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("source").isin(*DOREMI_SPECIALISTS),
                F.repeat(
                    F.concat(F.lit(" m_"), F.col("source")), _DOREMI_MARKS
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return doremi_weights(
        d,
        rounds=DOREMI_ROUNDS,
        eta_num=DOREMI_ETA[0],
        eta_den=DOREMI_ETA[1],
        smooth_num=DOREMI_SMOOTH[0],
        smooth_den=DOREMI_SMOOTH[1],
    )


def _sql_doremi() -> str:
    en, ed = DOREMI_ETA
    sn, sd = DOREMI_SMOOTH
    rounds = []
    prev = "w0"
    for i in range(1, DOREMI_ROUNDS + 1):
        rounds.append(f"""
mc{i} AS (
  SELECT d.tok, SUM(w.w * d.cnt) AS mc
  FROM dtc d JOIN {prev} w USING (domain) GROUP BY 1
),
mt{i} AS (
  SELECT SUM(w.w * n.n_tok) AS mt FROM ntd n JOIN {prev} w USING (domain)
),
lm{i} AS (
  SELECT d.domain,
         SUM(d.cnt * (length(bin(mt.mt // m.mc)) - 1)) AS l_mix
  FROM dtc d JOIN mc{i} m USING (tok), mt{i} mt GROUP BY 1
),
up{i} AS (
  SELECT w.domain,
         CAST((w.w * ({_DS}
                + (greatest(0, ((l.l_mix - b.l_own) * {_DS}) // n.n_tok)
                   * {en}) // {ed})) // {_DS} AS BIGINT) AS w
  FROM {prev} w
  JOIN lm{i} l USING (domain)
  JOIN base b USING (domain)
  JOIN ntd n USING (domain)
),
tw{i} AS (SELECT SUM(w) AS tw FROM up{i}),
w{i} AS MATERIALIZED (
  SELECT u.domain,
         CAST((((u.w * {_DS}) // t.tw) * {sd - sn}) // {sd}
              + ({_DS} * {sn}) // ({sd} * kk.k) AS BIGINT) AS w
  FROM up{i} u, tw{i} t, kk
)""")
        prev = f"w{i}"
    specialists = ", ".join(f"'{s}'" for s in DOREMI_SPECIALISTS)
    return f"""
WITH aug AS (
  SELECT source,
         text || CASE WHEN source IN ({specialists})
                      THEN repeat(' m_' || source, {_DOREMI_MARKS})
                      ELSE '' END AS text
  FROM documents
),
toks AS MATERIALIZED (
  SELECT source AS domain,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM aug
),
dtc AS MATERIALIZED (
  SELECT domain, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM toks WHERE tok != '' GROUP BY 1, 2
),
ntd AS MATERIALIZED (
  SELECT domain, CAST(count(*) AS BIGINT) AS n_tok
  FROM toks WHERE tok != '' GROUP BY 1
),
base AS MATERIALIZED (
  SELECT d.domain,
         SUM(d.cnt * (length(bin(n.n_tok // d.cnt)) - 1)) AS l_own
  FROM dtc d JOIN ntd n USING (domain) GROUP BY 1
),
kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ntd),
w0 AS MATERIALIZED (
  SELECT domain, CAST({_DS} // k AS BIGINT) AS w FROM ntd, kk
),{",".join(rounds)}
SELECT domain, w FROM w{DOREMI_ROUNDS}
"""


SQL_DOREMI_WEIGHTS = _sql_doremi()


# ================================= exact any-offset substring dedup
# VERDICT r9 #6 (Lee '22 suffix-array semantics): planted >=min_len
# token runs shared at DIFFERENT offsets (appended to the tail of one
# doc, PREPENDED to its partner) — exactly what the aligned tiling /
# CDC approximations miss and the sliding-gram reduction catches.
SSO_L = 8
SSO_RUN = "dupa dupb dupc dupd dupe dupf dupg duph dupi dupj dupk"  # 11 toks


def _sso_docs(spark: SparkSession, sf: str) -> DataFrame:
    d = _docs(spark, sf)
    grp = F.floor(F.col("doc_id") / 50).cast("string")
    return d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(F.col("text"), F.lit(" " + SSO_RUN + " g"), grp),
        )
        .when(
            F.col("doc_id") % 50 == 1,
            F.concat(F.lit(SSO_RUN + " g"), grp, F.lit(" "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


_SQL_SSO_SRC = f"""(
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0
              THEN text || ' {SSO_RUN} g' || CAST(doc_id // 50 AS VARCHAR)
              WHEN doc_id % 50 = 1
              THEN '{SSO_RUN} g' || CAST(doc_id // 50 AS VARCHAR) || ' ' || text
              ELSE text END AS text
  FROM documents
)"""

_SQL_SSO_CTES = f"""
t AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM {_SQL_SSO_SRC}
),
occ AS MATERIALIZED (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         md5(array_to_string(t[u.i:u.i+{SSO_L - 1}], ' ')) AS gkey
  FROM t, unnest(generate_series(1, len(t) - {SSO_L - 1})) AS u(i)
  WHERE len(t) >= {SSO_L}
),
stats AS (
  SELECT gkey, count(*) AS n,
         min(struct_pack(d := doc_id, p := pos)) AS fst
  FROM occ GROUP BY 1
),
nc AS (
  SELECT DISTINCT o.doc_id, o.pos
  FROM occ o JOIN stats s USING (gkey)
  WHERE s.n > 1 AND NOT (o.doc_id = s.fst.d AND o.pos = s.fst.p)
),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM nc
),
spans AS (
  SELECT doc_id, min(pos) AS span_start,
         CAST(max(pos) + {SSO_L - 1} AS BIGINT) AS span_end,
         CAST(count(*) AS BIGINT) AS n_windows
  FROM isl GROUP BY doc_id, grp
)"""


def q_substring_anyoffset_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact any-offset duplicate spans
    (operators/text.py:substring_dup_spans): sliding min_len-gram
    equi-join + canonical-first + gaps-and-islands merge — the
    suffix-array semantics as one corpus-keyed shuffle."""
    return text_ops.substring_dup_spans(
        _sso_docs(spark, sf), min_len=SSO_L
    )


SQL_SUBSTRING_ANYOFFSET_SPANS = f"""
WITH {_SQL_SSO_CTES}
SELECT doc_id, span_start, span_end, n_windows FROM spans
"""


def q_substring_anyoffset_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-first removal under the any-offset semantics
    (operators/text.py:substring_dedup_any_offset_apply): tokens
    covered by non-canonical duplicated spans are cut, remainder
    rejoined — Lee '22's keep-first-occurrence policy."""
    return text_ops.substring_dedup_any_offset_apply(
        _sso_docs(spark, sf), min_len=SSO_L
    )


SQL_SUBSTRING_ANYOFFSET_APPLY = f"""
WITH {_SQL_SSO_CTES},
rem AS (
  SELECT DISTINCT doc_id, u.i AS tpos
  FROM spans, unnest(generate_series(span_start, span_end)) AS u(i)
),
tok AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS tpos, t[u.i] AS tok
  FROM t, unnest(generate_series(1, len(t))) AS u(i)
),
kept AS (
  SELECT tok.doc_id, tok.tpos, tok.tok
  FROM tok LEFT JOIN rem ON tok.doc_id = rem.doc_id AND tok.tpos = rem.tpos
  WHERE rem.tpos IS NULL
),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS kept_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY 1
)
SELECT t.doc_id, COALESCE(reb.kept_text, '') AS kept_text,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN reb USING (doc_id)
"""


QUERIES.update(
    {
        "q_substring_anyoffset_spans": q_substring_anyoffset_spans,
        "q_substring_anyoffset_apply": q_substring_anyoffset_apply,
        "q_doremi_weights": q_doremi_weights,
        "q_classifier_train": q_classifier_train,
        "q_classifier_train_ngram": q_classifier_train_ngram,
        "q_langid_train": q_langid_train,
        "q_langid_predict": q_langid_predict,
        "q_filter_eval_trained": q_filter_eval_trained,
        "q_bpe_bytes_merges": q_bpe_bytes_merges,
        "q_bpe_bytes_encode": q_bpe_bytes_encode,
        "q_bpe_bytes_roundtrip": q_bpe_bytes_roundtrip,
        "q_video_shingle_neardup": q_video_shingle_neardup,
    }
)
ORACLES.update(
    {
        "q_substring_anyoffset_spans": SQL_SUBSTRING_ANYOFFSET_SPANS,
        "q_substring_anyoffset_apply": SQL_SUBSTRING_ANYOFFSET_APPLY,
        "q_doremi_weights": SQL_DOREMI_WEIGHTS,
        "q_video_shingle_neardup": SQL_VIDEO_SHINGLE_NEARDUP,
        "q_classifier_train": SQL_CLASSIFIER_TRAIN,
        "q_classifier_train_ngram": SQL_CLASSIFIER_TRAIN_NGRAM,
        "q_langid_train": SQL_LANGID_TRAIN,
        "q_langid_predict": SQL_LANGID_PREDICT,
        "q_filter_eval_trained": SQL_FILTER_EVAL_TRAINED,
        "q_bpe_bytes_merges": SQL_BPE_BYTES_MERGES,
        "q_bpe_bytes_encode": SQL_BPE_BYTES_ENCODE,
        "q_bpe_bytes_roundtrip": SQL_BPE_BYTES_ROUNDTRIP,
    }
)


# ============================================== tokenizer evaluation metrics
def q_tokenizer_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer quality metrics over the byte-level BPE encoder — the
    numbers a tokenizer ablation reports (fertility = tokens per word,
    compression = bytes per token, both x100 integer-exact), computed
    entirely in-engine on the encoder's own id stream: encode
    (operators/text.py bpe_encode_bytes) -> one doc-keyed count agg ->
    one narrow join onto per-doc byte/word counts. Docs the
    pre-tokenizer yields nothing for (empty text) report zero tokens
    and zero ratios, not NULLs."""
    d = _docs(spark, sf)
    enc = text_ops.bpe_encode_bytes(d, _byte_merges(spark, sf))
    per = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_nt"),
        F.count_distinct("token_id").alias("_nd"),
    )
    base = d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
        ).cast("bigint").alias("n_words"),
    )
    return base.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_nt"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("_nd"), F.lit(0)).cast("bigint").alias(
            "n_distinct_tokens"
        ),
        "n_bytes",
        "n_words",
        F.expr(
            "CASE WHEN n_words > 0 THEN (100 * coalesce(_nt, 0)) div n_words"
            " ELSE 0 END"
        ).cast("bigint").alias("fertility_x100"),
        F.expr(
            "CASE WHEN coalesce(_nt, 0) > 0 THEN (100 * n_bytes) div _nt"
            " ELSE 0 END"
        ).cast("bigint").alias("bytes_per_token_x100"),
    )


SQL_TOKENIZER_EVAL = f"""
WITH enc AS ({SQL_BPE_BYTES_ENCODE}),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS nt,
         CAST(count(DISTINCT token_id) AS BIGINT) AS nd
  FROM enc GROUP BY 1
),
base AS (
  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
         CAST(len(list_filter(string_split_regex(text, '\\s+'),
                              x -> x != '')) AS BIGINT) AS n_words
  FROM documents
)
SELECT b.doc_id,
       COALESCE(p.nt, 0) AS n_tokens,
       COALESCE(p.nd, 0) AS n_distinct_tokens,
       b.n_bytes, b.n_words,
       CAST(CASE WHEN b.n_words > 0
                 THEN (100 * COALESCE(p.nt, 0)) // b.n_words
                 ELSE 0 END AS BIGINT) AS fertility_x100,
       CAST(CASE WHEN COALESCE(p.nt, 0) > 0
                 THEN (100 * b.n_bytes) // p.nt
                 ELSE 0 END AS BIGINT) AS bytes_per_token_x100
FROM base b LEFT JOIN per p USING (doc_id)
"""

QUERIES["q_tokenizer_eval"] = q_tokenizer_eval
ORACLES["q_tokenizer_eval"] = SQL_TOKENIZER_EVAL
