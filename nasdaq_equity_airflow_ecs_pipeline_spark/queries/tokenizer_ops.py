"""Round-11 contract queries: the SentencePiece-style unigram-LM
tokenizer (VERDICT r10 #3) and the tokenizer-family comparison row.

Oracle discipline (the q_classifier_train pattern): the trainer's
hard-EM rounds are UNROLLED as generated CTEs — seed counts, the
shift-and-square fixed-point log2 cost chain (COST_FRAC_BITS steps,
each an integer square + truncating divide), the Viterbi forward DP
as a recursive CTE over positions carrying the BIGINT key list, the
backtrace as a second recursive CTE, usage re-count, prune. Every
step is integer arithmetic both engines evaluate bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import unigram as U
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_L = U.MAX_PIECE_LEN
_S = 1 << U.COST_SCALE_BITS
_B = U.COST_FRAC_BITS
_LK = U.LKEY
_UNK = U.UNK_COST
_SEED = U.SEED_MULTI
_MINC = U.SEED_MIN_COUNT
_R = U.EM_ROUNDS


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


def q_unigram_lm_train(spark: SparkSession, sf: str) -> DataFrame:
    """Train the unigram-LM piece table in-engine
    (operators/unigram.py): seed substring counts -> 2 hard-EM rounds
    (fixed-point log2 costs, Viterbi segmentation of the distinct-word
    vocabulary, usage re-count, prune) -> final (piece, cnt, cost).
    The oracle unrolls the identical rounds; the artifact matches
    bit-for-bit."""
    return U.unigram_train(_docs(spark, sf))


def q_unigram_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Encode the corpus with the trained unigram piece table
    (operators/unigram.py:unigram_encode): Viterbi on the
    distinct-word vocab, ids by lexicographic piece rank, one
    (doc_id, seq_pos, token_id) row per piece in document order."""
    trained = U.unigram_train(_docs(spark, sf))
    pt = [(r["piece"], r["cost"]) for r in trained.collect()]
    return U.unigram_encode(_docs(spark, sf), pt)


def _sql_cost_chain(p: str, src: str) -> str:
    """CTEs computing the fixed-point cost for every (piece, cnt) row
    of ``src``: {p}tv (Laplace total), {p}c0..{p}c{B} (shift-and-square
    steps), {p}cost. Mirrors operators/unigram.py ilog2_cost term for
    term: k = floor(log2(tot // (cnt+1))) via bin-length, y normalized
    to [S, 2S), then B squaring steps emitting one result bit each."""
    steps = []
    for i in range(1, _B + 1):
        steps.append(f"""
{p}c{i} AS (
  SELECT piece, cnt,
         CASE WHEN (y * y) // {_S} >= 2 * {_S}::BIGINT
              THEN ((y * y) // {_S}) // 2 ELSE (y * y) // {_S} END AS y,
         2 * r + CASE WHEN (y * y) // {_S} >= 2 * {_S}::BIGINT THEN 1 ELSE 0 END AS r
  FROM {p}c{i - 1}
)""")
    return f"""
{p}tv AS (SELECT CAST(sum(cnt) + count(*) AS BIGINT) AS tot FROM {src}),
{p}c0 AS (
  SELECT piece, cnt,
         (tot * {_S}) // ((cnt + 1)
            << (length(bin(tot // (cnt + 1))) - 1)) AS y,
         CAST(length(bin(tot // (cnt + 1))) - 1 AS BIGINT) AS r
  FROM {src}, {p}tv
),{",".join(steps)},
{p}cost AS (SELECT piece, cnt, CAST(r AS BIGINT) AS cost FROM {p}c{_B})"""


def _sql_viterbi(p: str, cost_cte: str, with_piece: bool = False) -> str:
    """CTEs Viterbi-segmenting the distinct-word frame ``wf`` under
    ``cost_cte`` (piece, cost): {p}edges, {p}wedges, the forward-DP
    recursive CTE {p}dp carrying the BIGINT key list (key = cost *
    LKEY + len — array min == (cost, shortest-last-piece) tie-break),
    the backtrace {p}bt, and {p}pieces / {p}usage. ``with_piece``
    carries the piece string in the edge struct (needed by the
    loss-prune variant's banned-edge re-runs; numerically inert)."""
    pc = ", piece := e.piece" if with_piece else ""
    return f"""
{p}edges AS (
  SELECT e.w, e.j, e.l, e.piece, COALESCE(c.cost, {_UNK}) AS cost
  FROM (
    SELECT w, j, l, substring(w, j - l + 1, l) AS piece
    FROM wf, unnest(generate_series(1, length(w))) AS uj(j),
         unnest(generate_series(1, least({_L}, j))) AS ul(l)
  ) e LEFT JOIN {cost_cte} c USING (piece)
  WHERE e.l = 1 OR c.cost IS NOT NULL
),
{p}wedges AS (
  SELECT e.w, wf.freq, length(e.w) AS n,
         list(struct_pack(j := e.j, l := e.l, cost := e.cost{pc})) AS edges
  FROM {p}edges e JOIN wf ON wf.w = e.w
  GROUP BY e.w, wf.freq
),
{p}dp AS (
  SELECT w, freq, n, edges, 1 AS j, [CAST(0 AS BIGINT)] AS acc
  FROM {p}wedges
  UNION ALL
  SELECT w, freq, n, edges, j + 1,
         list_append(acc, list_aggregate(
           list_transform(list_filter(edges, e -> e.j = j),
             e -> (acc[j - e.l + 1] // {_LK} + e.cost) * {_LK} + e.l),
           'min'))
  FROM {p}dp WHERE j <= n
),
{p}dpf AS (SELECT w, freq, n, acc FROM {p}dp WHERE j = n + 1),
{p}bt AS (
  SELECT w, freq, acc, n AS pos, CAST([] AS INT[]) AS ls FROM {p}dpf
  UNION ALL
  SELECT w, freq, acc, pos - CAST(acc[pos + 1] % {_LK} AS INT),
         list_append(ls, CAST(acc[pos + 1] % {_LK} AS INT))
  FROM {p}bt WHERE pos > 0
),
{p}seg AS (
  SELECT w, freq, list_reverse(ls) AS ls FROM {p}bt WHERE pos = 0
),
{p}pieces AS (
  SELECT w, freq, u.i AS i,
         substring(w, 1 + CAST(COALESCE(list_sum(ls[1:i - 1]), 0) AS INT),
                   ls[i]) AS piece
  FROM {p}seg, unnest(generate_series(1, len(ls))) AS u(i)
),
{p}usage AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM {p}pieces GROUP BY piece
)"""


def _sql_unigram_train_ctes() -> str:
    """The full unrolled trainer: wf -> seed p0 -> R x (cost chain +
    Viterbi + usage + prune p{r}) -> final cost chain over p{R}.
    Requires the statement to open with WITH RECURSIVE."""
    parts = [f"""
wf AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
  ) WHERE w != '' GROUP BY w
),
cand AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT wf.freq, substring(w, j - l + 1, l) AS piece
    FROM wf, unnest(generate_series(1, length(w))) AS uj(j),
         unnest(generate_series(1, least({_L}, j))) AS ul(l)
  ) GROUP BY piece
),
p0 AS MATERIALIZED (
  SELECT piece, cnt FROM cand WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           row_number() OVER (ORDER BY cnt DESC, piece ASC) AS _r
    FROM cand WHERE length(piece) >= 2 AND cnt >= {_MINC}
  ) WHERE _r <= {_SEED}
)"""]
    for r in range(_R):
        src, nxt = f"p{r}", f"p{r + 1}"
        vp = f"r{r}"
        parts.append(_sql_cost_chain(f"{vp}k", src))
        parts.append(_sql_viterbi(vp, f"{vp}kcost"))
        parts.append(f"""
{nxt} AS MATERIALIZED (
  SELECT piece, cnt FROM {vp}usage
  UNION ALL
  SELECT s.piece, CAST(0 AS BIGINT) AS cnt
  FROM (SELECT piece FROM p0 WHERE length(piece) = 1) s
  WHERE s.piece NOT IN (SELECT piece FROM {vp}usage)
)""")
    parts.append(_sql_cost_chain("fin", f"p{_R}"))
    return ",".join(parts)


SQL_UNIGRAM_LM_TRAIN = (
    "WITH RECURSIVE " + _sql_unigram_train_ctes()
    + "\nSELECT piece, cnt, cost FROM fincost"
)

SQL_UNIGRAM_ENCODE = (
    "WITH RECURSIVE " + _sql_unigram_train_ctes() + ","
    + _sql_viterbi("enc", "fincost")
    + f""",
ids AS (
  SELECT piece, CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT)
           AS token_id
  FROM fincost
),
tokd AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
wp AS (
  SELECT doc_id, CAST(u.i - 1 AS INT) AS wpos, t[u.i] AS w
  FROM tokd, unnest(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] != ''
),
sym AS (
  SELECT wp.doc_id, wp.wpos, sp.i AS spos,
         COALESCE(ids.token_id, {U.UNK_ID}) AS token_id
  FROM wp
  JOIN encpieces sp ON sp.w = wp.w
  LEFT JOIN ids ON ids.piece = sp.piece
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, spos)
            - 1 AS BIGINT) AS seq_pos,
       CAST(token_id AS BIGINT) AS token_id
FROM sym
"""
)


def q_unigram_doc_score(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc unigram-LM cost under the trained piece table
    (operators/unigram.py:unigram_doc_scores) — the tokenizer doubling
    as a CCNet-style quality signal: summed Viterbi path cost and the
    length-normalized bits-per-piece a perplexity threshold cuts on."""
    trained = U.unigram_train(_docs(spark, sf))
    pt = [(r["piece"], r["cost"]) for r in trained.collect()]
    return U.unigram_doc_scores(_docs(spark, sf), pt)


SQL_UNIGRAM_DOC_SCORE = (
    "WITH RECURSIVE " + _sql_unigram_train_ctes() + ","
    + _sql_viterbi("enc", "fincost")
    + f""",
wstat AS (
  SELECT d.w, CAST(len(s.ls) AS BIGINT) AS np,
         CAST(d.acc[d.n + 1] // {_LK} AS BIGINT) AS tc
  FROM encdpf d JOIN encseg s USING (w)
),
tokd AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
wp AS (
  SELECT doc_id, t[u.i] AS w
  FROM tokd, unnest(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] != ''
),
agg AS (
  SELECT wp.doc_id, CAST(sum(ws.np) AS BIGINT) AS n_pieces,
         CAST(sum(ws.tc) AS BIGINT) AS total_cost_x256
  FROM wp JOIN wstat ws ON ws.w = wp.w GROUP BY 1
)
SELECT d.doc_id, COALESCE(a.n_pieces, 0) AS n_pieces,
       COALESCE(a.total_cost_x256, 0) AS total_cost_x256,
       CAST(CASE WHEN COALESCE(a.n_pieces, 0) > 0
                 THEN a.total_cost_x256 // a.n_pieces
                 ELSE 0 END AS BIGINT) AS bits_per_piece_x256
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
)


def q_tokenizer_compare(spark: SparkSession, sf: str) -> DataFrame:
    """The tokenizer-family comparison row (VERDICT r10 #3 done-
    criterion): corpus-level fertility and compression for the trained
    byte-BPE encoder vs the trained unigram-LM encoder vs the trained
    WordPiece encoder (r12 — the full triad), one row per tokenizer —
    the ablation table a tokenizer change ships with."""
    from .ml_ops import _byte_merges
    from ..operators import text as text_ops
    from ..operators import wordpiece as WP

    d = _docs(spark, sf)
    totals = d.agg(
        F.sum(F.octet_length("text")).cast("bigint").alias("n_bytes"),
        F.sum(
            F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != ""))
        ).cast("bigint").alias("n_words"),
    )

    def _row(name: str, enc: DataFrame) -> DataFrame:
        return (
            enc.agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
            .crossJoin(F.broadcast(totals))
            .select(
                F.lit(name).alias("tokenizer"),
                "n_tokens",
                "n_bytes",
                "n_words",
                F.expr("(100 * n_tokens) div n_words").cast("bigint").alias(
                    "fertility_x100"
                ),
                F.expr("(100 * n_bytes) div n_tokens").cast("bigint").alias(
                    "bytes_per_token_x100"
                ),
            )
        )

    bpe = text_ops.bpe_encode_bytes(d, _byte_merges(spark, sf))
    trained = U.unigram_train(d)
    pt = [(r["piece"], r["cost"]) for r in trained.collect()]
    uni = U.unigram_encode(d, pt)
    # train + alphabet from ONE collected word-frequency pass (the
    # q_wordpiece_encode spelling, optimization r13) — bit-identical
    # merges via the driver-side finisher
    wp_words = WP._collect_word_freqs(d)
    wp_vocab = sorted(
        {s for w, _ in wp_words for s in WP._wp_split(w)}
    ) + [m[2] for m in WP._wp_train_rows(wp_words, n_merges=WP.WP_MERGES)]
    wpc = WP.wordpiece_encode(d, wp_vocab)
    return (
        _row("bpe_bytes", bpe)
        .unionByName(_row("unigram", uni))
        .unionByName(_row("wordpiece", wpc))
    )


def _sql_bpe_count_ctes() -> str:
    """ml_ops._sql_bpe_bytes_ctes with every CTE renamed (bb-prefixed)
    so the chain can share a statement with the unigram CTEs (its
    ``wf`` is byte-PIECE keyed, not whitespace-word keyed). The final
    fold state bbs{N} carries (arr, freq) per distinct piece, so the
    encoder's total token count is sum(freq * len(arr)) — no need to
    materialize the id stream."""
    import re

    from .ml_ops import _sql_bpe_bytes_ctes

    raw = _sql_bpe_bytes_ctes().replace("WITH ", "", 1)
    raw = re.sub(r"\bwf\b", "bbwf", raw)
    raw = re.sub(r"\bs(\d+)\b", r"bbs\1", raw)
    raw = re.sub(r"\bp(\d+)\b", r"bbp\1", raw)
    raw = re.sub(r"\bt(\d+)\b", r"bbt\1", raw)
    return raw


def _sql_tokenizer_compare() -> str:
    from .ml_ops import BPE_BYTES_MERGES
    from .wordpiece_ops import _sql_wp_encode_ctes

    return f"""
WITH RECURSIVE {_sql_bpe_count_ctes()},
{_sql_unigram_train_ctes()},
{_sql_viterbi("enc", "fincost")},
{_sql_wp_encode_ctes()},
tokd AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
wp AS (
  SELECT doc_id, t[u.i] AS w
  FROM tokd, unnest(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] != ''
),
uni_n AS (
  SELECT CAST(sum(len(sp.ls)) AS BIGINT) AS n_tokens
  FROM wp JOIN encseg sp ON sp.w = wp.w
),
bpe_n AS (
  SELECT CAST(sum(freq * len(arr)) AS BIGINT) AS n_tokens
  FROM bbs{BPE_BYTES_MERGES}
),
wp_n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM wpsym
),
tot AS (
  SELECT CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
         CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x != ''))) AS BIGINT) AS n_words
  FROM documents
)
SELECT 'bpe_bytes' AS tokenizer, bpe_n.n_tokens, tot.n_bytes, tot.n_words,
       CAST((100 * bpe_n.n_tokens) // tot.n_words AS BIGINT) AS fertility_x100,
       CAST((100 * tot.n_bytes) // bpe_n.n_tokens AS BIGINT)
         AS bytes_per_token_x100
FROM bpe_n, tot
UNION ALL
SELECT 'unigram', uni_n.n_tokens, tot.n_bytes, tot.n_words,
       CAST((100 * uni_n.n_tokens) // tot.n_words AS BIGINT),
       CAST((100 * tot.n_bytes) // uni_n.n_tokens AS BIGINT)
FROM uni_n, tot
UNION ALL
SELECT 'wordpiece', wp_n.n_tokens, tot.n_bytes, tot.n_words,
       CAST((100 * wp_n.n_tokens) // tot.n_words AS BIGINT),
       CAST((100 * tot.n_bytes) // wp_n.n_tokens AS BIGINT)
FROM wp_n, tot
"""


SQL_TOKENIZER_COMPARE = _sql_tokenizer_compare()


# ===================== loss-based pruning (Kudo '18 §3.2, VERDICT r11 #4)
_KEEPX = U.PRUNE_KEEP_X100


def q_unigram_lm_prune(spark: SparkSession, sf: str) -> DataFrame:
    """unigram_train with the paper's LOSS-BASED prune
    (operators/unigram.py unigram_train_pruned): each round the used
    multi-char pieces are ranked by likelihood-loss delta (banned-edge
    Viterbi re-runs on the vocab frame) and only the top 80% survive —
    hard EM alone keeps every touched piece. The oracle unrolls the
    rounds INCLUDING the per-piece banned DP recursion and the prune
    rank; the artifact matches bit-for-bit."""
    return U.unigram_train_pruned(_docs(spark, sf))


def _sql_unigram_loss(p: str) -> str:
    """Loss CTEs over a with_piece Viterbi block ``{p}``: banned
    (word, used-multi-piece) pairs, the banned-edge DP recursion, and
    {p}loss (piece, loss) — mirrors viterbi_piece_losses term for
    term. Requires {p}wedges to carry piece in the edge struct."""
    return f"""
{p}base AS (
  SELECT w, freq, CAST(acc[n + 1] // {_LK} AS BIGINT) AS cost1
  FROM {p}dpf
),
{p}banw AS (
  SELECT we.w, we.freq, we.n, we.edges, b.piece AS banned
  FROM {p}wedges we
  JOIN (SELECT DISTINCT w, piece FROM {p}pieces
        WHERE length(piece) >= 2) b ON b.w = we.w
),
{p}dp2 AS (
  SELECT w, banned, freq, n,
         list_filter(edges, e -> e.l = 1 OR e.piece != banned) AS edges,
         1 AS j, [CAST(0 AS BIGINT)] AS acc
  FROM {p}banw
  UNION ALL
  SELECT w, banned, freq, n, edges, j + 1,
         list_append(acc, list_aggregate(
           list_transform(list_filter(edges, e -> e.j = j),
             e -> (acc[j - e.l + 1] // {_LK} + e.cost) * {_LK} + e.l),
           'min'))
  FROM {p}dp2 WHERE j <= n
),
{p}dpf2 AS (
  SELECT w, banned, freq, CAST(acc[n + 1] // {_LK} AS BIGINT) AS cost2
  FROM {p}dp2 WHERE j = n + 1
),
{p}loss AS (
  SELECT d.banned AS piece,
         CAST(sum(d.freq * (d.cost2 - b.cost1)) AS BIGINT) AS loss
  FROM {p}dpf2 d JOIN {p}base b USING (w)
  GROUP BY 1
)"""


def _sql_unigram_train_pruned_ctes() -> str:
    """The pruned trainer, fully unrolled: wf -> seed p0 -> R x (cost
    chain + with-piece Viterbi + usage + banned-DP losses + rank prune
    q{r}) -> final cost chain over q{R}."""
    parts = [f"""
wf AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
  ) WHERE w != '' GROUP BY w
),
cand AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT wf.freq, substring(w, j - l + 1, l) AS piece
    FROM wf, unnest(generate_series(1, length(w))) AS uj(j),
         unnest(generate_series(1, least({_L}, j))) AS ul(l)
  ) GROUP BY piece
),
q0 AS MATERIALIZED (
  SELECT piece, cnt FROM cand WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           row_number() OVER (ORDER BY cnt DESC, piece ASC) AS _r
    FROM cand WHERE length(piece) >= 2 AND cnt >= {_MINC}
  ) WHERE _r <= {_SEED}
)"""]
    for r in range(_R):
        src, nxt = f"q{r}", f"q{r + 1}"
        vp = f"pr{r}"
        parts.append(_sql_cost_chain(f"{vp}k", src))
        parts.append(_sql_viterbi(vp, f"{vp}kcost", with_piece=True))
        parts.append(_sql_unigram_loss(vp))
        parts.append(f"""
{nxt}m AS (
  SELECT CAST(count(*) AS BIGINT) AS m
  FROM {vp}usage WHERE length(piece) >= 2
),
{nxt} AS MATERIALIZED (
  SELECT piece, cnt FROM (
    SELECT u.piece, u.cnt,
           row_number() OVER (ORDER BY COALESCE(l.loss, 0) DESC,
                              u.piece ASC) AS _r
    FROM {vp}usage u LEFT JOIN {vp}loss l ON l.piece = u.piece
    WHERE length(u.piece) >= 2
  ), {nxt}m
  WHERE _r <= (m * {_KEEPX} + 99) // 100
  UNION ALL
  SELECT u.piece, u.cnt FROM {vp}usage u WHERE length(u.piece) = 1
  UNION ALL
  SELECT s.piece, CAST(0 AS BIGINT) AS cnt
  FROM (SELECT piece FROM q0 WHERE length(piece) = 1) s
  WHERE s.piece NOT IN (SELECT piece FROM {vp}usage)
)""")
    parts.append(_sql_cost_chain("pfin", f"q{_R}"))
    return ",".join(parts)


SQL_UNIGRAM_LM_PRUNE = (
    "WITH RECURSIVE " + _sql_unigram_train_pruned_ctes()
    + "\nSELECT piece, cnt, cost FROM pfincost"
)


QUERIES.update(
    {
        "q_unigram_lm_train": q_unigram_lm_train,
        "q_unigram_encode": q_unigram_encode,
        "q_unigram_doc_score": q_unigram_doc_score,
        "q_tokenizer_compare": q_tokenizer_compare,
        "q_unigram_lm_prune": q_unigram_lm_prune,
    }
)
ORACLES.update(
    {
        "q_unigram_lm_train": SQL_UNIGRAM_LM_TRAIN,
        "q_unigram_encode": SQL_UNIGRAM_ENCODE,
        "q_unigram_doc_score": SQL_UNIGRAM_DOC_SCORE,
        "q_tokenizer_compare": SQL_TOKENIZER_COMPARE,
        "q_unigram_lm_prune": SQL_UNIGRAM_LM_PRUNE,
    }
)
