"""Round-12 contract queries: the WordPiece tokenizer
(operators/wordpiece.py) — trainer and max-munch encoder, completing
the tokenizer triad next to BPE (q_bpe_merges / q_bpe_tokenize) and
the unigram LM (q_unigram_lm_train / q_unigram_encode).

Oracle discipline (the q_bpe_merges pattern): the trainer's rounds are
UNROLLED as generated CTEs — the WordPiece per-character split, per-
round symbol frequencies, pair counts, the quantized-likelihood argmax
(``(c * 10^9) // (f_a * f_b)`` DESC, pair ASC — exact BIGINT both
engines), and the greedy merge fold via list_reduce. The encoder's
greedy longest-match walk is a recursive CTE over the per-word jump
table (the Viterbi-backtrace convention); whole-word [UNK] fallback
mirrors the operator's fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import wordpiece as W
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_N = W.WP_MERGES
_SC = W.WP_SCALE


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


def q_wordpiece_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Train 5 WordPiece merges on the documents corpus (Schuster &
    Nakajima 2012; HF WordpieceTrainer scoring): word-frequency table
    once, then vocabulary-sized rounds picking argmax of the quantized
    likelihood score count(ab)*1e9 div (count(a)*count(b)). Runs via
    the driver-side finisher (wordpiece_train_local — the
    bpe_train_local convention; optimization r13): one corpus pass to
    the bounded word-frequency artifact, merge rounds in Python,
    bit-identical merge table (test_wordpiece_local_equals_engine;
    the oracle is unchanged). Output = (step, pair, merged, freq,
    score_x1e9)."""
    return W.wordpiece_train_local(_docs(spark, sf), n_merges=_N)


def q_wordpiece_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Encode the corpus with the trained WordPiece vocabulary
    (operators/wordpiece.py:wordpiece_encode): greedy longest-match-
    first against alphabet + merge outputs, whole-word [UNK] fallback,
    ids by lexicographic piece rank — (doc_id, seq_pos, token_id).
    Training and the alphabet both derive from ONE collected
    word-frequency pass (optimization r13) instead of three corpus
    scans (train + alphabet + encode's own)."""
    d = _docs(spark, sf)
    words = W._collect_word_freqs(d)
    merges = W._wp_train_rows(words, n_merges=_N)
    alphabet = sorted({s for w, _ in words for s in W._wp_split(w)})
    vocab = alphabet + [m[2] for m in merges]
    return W.wordpiece_encode(d, vocab)


def _sql_wp_ctes() -> str:
    """The WordPiece training chain as CTEs (wpwf, wps0..wpsN,
    wpf/wpp/wpt per round) — shared by the merges oracle and the
    encode oracle. Rounds that run out of pairs degrade to no-ops
    (LEFT JOIN ON TRUE + CASE fall-through), matching the early
    break."""
    parts = [r"""
wpwf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents
  ) WHERE w != '' GROUP BY w
),
wps0 AS MATERIALIZED (
  SELECT [substring(w, 1, 1)] ||
         list_transform(generate_series(2, length(w)),
                        i -> '##' || substring(w, i, 1)) AS arr,
         freq
  FROM wpwf
)"""]
    for i in range(1, _N + 1):
        parts.append(f""",
wpf{i} AS MATERIALIZED (
  SELECT sym, CAST(sum(freq) AS BIGINT) AS f
  FROM wps{i - 1}, unnest(arr) AS u(sym) GROUP BY 1
),
wpp{i} AS MATERIALIZED (
  SELECT arr[u.i] || ' ' || arr[u.i + 1] AS pair,
         CAST(SUM(freq) AS BIGINT) AS c
  FROM wps{i - 1}, unnest(generate_series(1, len(arr) - 1)) AS u(i)
  GROUP BY 1
),
wpt{i} AS MATERIALIZED (
  SELECT pair,
         split_part(pair, ' ', 1) ||
           substring(split_part(pair, ' ', 2), 3) AS merged,
         c, score
  FROM (
    SELECT p.pair, p.c,
           (p.c * {_SC}) // (fa.f * fb.f) AS score,
           row_number() OVER (
             ORDER BY (p.c * {_SC}) // (fa.f * fb.f) DESC,
                      p.pair ASC) AS rn
    FROM wpp{i} p
    JOIN wpf{i} fa ON fa.sym = split_part(p.pair, ' ', 1)
    JOIN wpf{i} fb ON fb.sym = split_part(p.pair, ' ', 2)
  ) WHERE rn = 1
),
wps{i} AS MATERIALIZED (
  SELECT list_reduce(
           list_transform(arr, tk -> [tk]),
           (acc, tk) -> CASE
             WHEN len(acc) > 0
                  AND acc[-1] = split_part(t.pair, ' ', 1)
                  AND tk[1] = split_part(t.pair, ' ', 2)
             THEN acc[1:len(acc) - 1] || [t.merged]
             ELSE acc || tk END) AS arr,
         freq
  FROM wps{i - 1} LEFT JOIN wpt{i} t ON TRUE
)""")
    return "".join(parts)


SQL_WORDPIECE_MERGES = "WITH " + _sql_wp_ctes().lstrip() + "\n" + "\nUNION ALL\n".join(
    f"SELECT {i} AS step, pair, merged, c AS freq, score AS score_x1e9"
    f" FROM wpt{i}"
    for i in range(1, _N + 1)
)


def _sql_wp_encode_ctes() -> str:
    """Trainer chain + vocab + jump table + greedy-walk CTEs, ending at
    ``wpsym`` (doc_id, wpos, spos, token_id) — shared by the encode
    oracle and the tokenizer-comparison oracle. Needs WITH RECURSIVE."""
    vocab_union = "\n  UNION\n".join(
        f"  SELECT merged AS piece FROM wpt{i}" for i in range(1, _N + 1)
    )
    return f"""{_sql_wp_ctes().lstrip()},
wpalpha AS (
  SELECT DISTINCT sym AS piece FROM wps0, unnest(arr) AS u(sym)
),
wpvocab AS MATERIALIZED (
  SELECT piece FROM wpalpha
  UNION
{vocab_union}
),
wpids AS (
  SELECT piece, CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT)
           AS token_id
  FROM wpvocab
),
wpmx AS (
  SELECT max(CASE WHEN piece NOT LIKE '##%' THEN length(piece) END) AS mh,
         max(CASE WHEN piece LIKE '##%' THEN length(piece) - 2 END) AS mc
  FROM wpvocab
),
wptokd AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
wpwp AS MATERIALIZED (
  SELECT doc_id, CAST(u.i - 1 AS INT) AS wpos, t[u.i] AS w
  FROM wptokd, unnest(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] != ''
),
wpdw AS MATERIALIZED (SELECT DISTINCT w FROM wpwp),
wpcand AS (
  SELECT d.w, uj.j, ul.l,
         CASE WHEN uj.j = 1 THEN substring(d.w, 1, ul.l)
              ELSE '##' || substring(d.w, uj.j, ul.l) END AS piece
  FROM wpdw d, wpmx,
       unnest(generate_series(1, length(d.w))) AS uj(j),
       unnest(generate_series(1,
         least(CASE WHEN uj.j = 1 THEN wpmx.mh ELSE wpmx.mc END,
               length(d.w) - uj.j + 1))) AS ul(l)
),
wpbest AS MATERIALIZED (
  SELECT c.w, c.j, max(c.l) AS l
  FROM wpcand c JOIN wpvocab v ON v.piece = c.piece
  GROUP BY 1, 2
),
wpwl AS (SELECT w, length(w) AS n FROM wpdw),
wpwalk AS (
  SELECT w, n, 1 AS pos, 0 AS spos FROM wpwl
  UNION ALL
  SELECT wa.w, wa.n, wa.pos + b.l, wa.spos + 1
  FROM wpwalk wa JOIN wpbest b ON b.w = wa.w AND b.j = wa.pos
  WHERE wa.pos <= wa.n
),
wpdone AS (SELECT w, n, max(pos) AS endpos FROM wpwalk GROUP BY 1, 2),
wpsteps AS (
  SELECT wa.w, wa.spos,
         CASE WHEN wa.pos = 1 THEN substring(wa.w, 1, b.l)
              ELSE '##' || substring(wa.w, wa.pos, b.l) END AS piece
  FROM wpwalk wa JOIN wpbest b ON b.w = wa.w AND b.j = wa.pos
  WHERE wa.pos <= wa.n
),
wptok AS (
  SELECT s.w, s.spos, s.piece
  FROM wpsteps s JOIN wpdone dn ON dn.w = s.w AND dn.endpos = dn.n + 1
  UNION ALL
  SELECT dn.w, 0 AS spos, '{W.UNK_TOKEN}' AS piece
  FROM wpdone dn WHERE dn.endpos <= dn.n
),
wpsym AS (
  SELECT wp.doc_id, wp.wpos, tk.spos,
         COALESCE(ids.token_id, {W.UNK_ID}) AS token_id
  FROM wpwp wp
  JOIN wptok tk ON tk.w = wp.w
  LEFT JOIN wpids ids ON ids.piece = tk.piece
)"""


SQL_WORDPIECE_ENCODE = f"""
WITH RECURSIVE {_sql_wp_encode_ctes()}
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, spos)
            - 1 AS BIGINT) AS seq_pos,
       CAST(token_id AS BIGINT) AS token_id
FROM wpsym
"""


QUERIES.update(
    {
        "q_wordpiece_merges": q_wordpiece_merges,
        "q_wordpiece_encode": q_wordpiece_encode,
    }
)
ORACLES.update(
    {
        "q_wordpiece_merges": SQL_WORDPIECE_MERGES,
        "q_wordpiece_encode": SQL_WORDPIECE_ENCODE,
    }
)
