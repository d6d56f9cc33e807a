"""Round-12 contract queries: SFT / instruction-data preparation
(operators/sft.py) — quality flags, prompt-keyed dedup, and the
loss-mask manifest.

Fixture: (prompt, response) pairs derived from the documents table —
prompt = the first min(8, n div 2) tokens, response = the rest, with
doc_id-residue degeneracies planted so every rule bites:
%11==3 echoes the prompt into the response (ok_no_echo), %13==4
truncates the response to 2 tokens (ok_response_len), %17==6
truncates the prompt to 2 tokens (ok_prompt_len), and %7==2 replaces
the prompt with a shared constant (the dedup collapse family). Pure
column arithmetic implemented identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sft import (
    HDR_INSTR,
    HDR_RESP,
    PROMPT_MIN,
    RATIO_NUM,
    RESP_MAX,
    RESP_MIN,
    _N_HDR,
    sft_dedup,
    sft_loss_mask,
    sft_quality_flags,
)
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

SHARED_PROMPT = "please summarize this report for me now"
ECHO_TAIL = "and more words follow here"


def _pairs(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    t = d.withColumn(
        "_t", F.expr(r"filter(split(trim(text), '\\s+'), x -> x != '')")
    ).withColumn(
        "_k",
        F.expr("greatest(least(8, size(_t) div 2), 1)"),
    )
    prompt0 = F.expr("array_join(slice(_t, 1, _k), ' ')")
    resp0 = F.expr(
        "array_join(slice(_t, _k + 1, greatest(size(_t) - _k, 0)), ' ')"
    )
    # %19==8: long prompt + 5-token answer — the ratio family (every
    # other rule passes there, isolating ok_ratio)
    k2 = "least(30, greatest(size(_t) - 5, 1))"
    prompt = (
        F.when(
            F.col("doc_id") % 19 == 8,
            F.expr(f"array_join(slice(_t, 1, {k2}), ' ')"),
        )
        .when(F.col("doc_id") % 17 == 6, F.expr("array_join(slice(_t, 1, 2), ' ')"))
        .when(F.col("doc_id") % 7 == 2, F.lit(SHARED_PROMPT))
        .otherwise(prompt0)
    )
    t = t.withColumn("_p", prompt)
    response = (
        F.when(
            F.col("doc_id") % 19 == 8,
            F.expr(
                f"array_join(slice(_t, {k2} + 1, "
                f"least(greatest(size(_t) - {k2}, 0), 5)), ' ')"
            ),
        )
        .when(
            F.col("doc_id") % 11 == 3,
            F.concat(F.col("_p"), F.lit(" " + ECHO_TAIL)),
        )
        .when(
            F.col("doc_id") % 13 == 4,
            F.expr("array_join(slice(_t, _k + 1, least(greatest(size(_t) - _k, 0), 2)), ' ')"),
        )
        .otherwise(resp0)
    )
    return t.select(
        F.col("doc_id").alias("pair_id"),
        F.col("_p").alias("prompt"),
        response.alias("response"),
    )


def q_sft_quality(spark: SparkSession, sf: str) -> DataFrame:
    """SFT rule flags (operators/sft.py:sft_quality_flags): prompt /
    response length, length ratio, echo detection — one narrow
    projection per pair, every rule biting on a planted residue
    family."""
    return sft_quality_flags(_pairs(spark, sf))


def q_sft_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Rule survivors deduped exact on the normalized prompt
    (keep-first by pair_id) — the shared-prompt family collapses to
    one representative."""
    return sft_dedup(_pairs(spark, sf))


def q_sft_loss_mask(spark: SparkSession, sf: str) -> DataFrame:
    """The chat render's loss-mask manifest (sft_loss_mask): one row
    per segment with its whitespace-token span — headers + prompt
    masked, response trained."""
    return sft_loss_mask(_pairs(spark, sf))


_SFT_SEQ_LEN = 64
_SFT_SHARDS = 4


def q_sft_pack_masks(spark: SparkSession, sf: str) -> DataFrame:
    """The loss-mask manifest AFTER packing (operators/sft.py
    sft_pack_loss_spans composing the chat render with
    pack_sequences): per (training sequence, pair, trainability)
    intersection in sequence-local coordinates — seq_len 64 so pairs
    genuinely straddle sequences."""
    from ..operators.sft import sft_pack_loss_spans

    return sft_pack_loss_spans(
        _pairs(spark, sf), seq_len=_SFT_SEQ_LEN, num_shards=_SFT_SHARDS
    )


_SQL_PAIRS = f"""
pt AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x != '') AS tt,
         greatest(least(8, len(list_filter(string_split_regex(trim(text),
                     '\\s+'), x -> x != '')) // 2), 1) AS k
  FROM documents
),
pp AS (
  SELECT doc_id,
         CASE WHEN doc_id % 19 = 8
                THEN array_to_string(
                       tt[1:least(30, greatest(len(tt) - 5, 1))], ' ')
              WHEN doc_id % 17 = 6 THEN array_to_string(tt[1:2], ' ')
              WHEN doc_id % 7 = 2 THEN '{SHARED_PROMPT}'
              ELSE array_to_string(tt[1:k], ' ') END AS prompt,
         tt, k, least(30, greatest(len(tt) - 5, 1)) AS k2
  FROM pt
),
pairs AS (
  SELECT doc_id AS pair_id, prompt,
         CASE WHEN doc_id % 19 = 8
                THEN array_to_string(tt[k2 + 1:least(k2 + 5, len(tt))], ' ')
              WHEN doc_id % 11 = 3 THEN prompt || ' {ECHO_TAIL}'
              WHEN doc_id % 13 = 4
                THEN array_to_string(tt[k + 1:least(k + 2, len(tt))], ' ')
              ELSE array_to_string(tt[k + 1:len(tt)], ' ') END AS response
  FROM pp
)"""


def _sql_ntok(col: str) -> str:
    return (
        f"CAST(len(list_filter(string_split_regex(trim({col}), '\\s+'), "
        f"x -> x != '')) AS BIGINT)"
    )


_FLAGS = f"""
flags AS (
  SELECT pair_id,
         {_sql_ntok("prompt")} AS n_prompt,
         {_sql_ntok("response")} AS n_response,
         {_sql_ntok("prompt")} >= {PROMPT_MIN} AS ok_prompt_len,
         {_sql_ntok("response")} >= {RESP_MIN}
           AND {_sql_ntok("response")} <= {RESP_MAX} AS ok_response_len,
         {RATIO_NUM} * {_sql_ntok("response")} >= {_sql_ntok("prompt")}
           AS ok_ratio,
         NOT starts_with(trim(response), trim(prompt)) AS ok_no_echo,
         prompt, response
  FROM pairs
)"""

SQL_SFT_QUALITY = f"""
WITH {_SQL_PAIRS.lstrip()},
{_FLAGS.lstrip()}
SELECT pair_id, n_prompt, n_response, ok_prompt_len, ok_response_len,
       ok_ratio, ok_no_echo,
       ok_prompt_len AND ok_response_len AND ok_ratio AND ok_no_echo
         AS keep
FROM flags
"""

SQL_SFT_DEDUP = f"""
WITH {_SQL_PAIRS.lstrip()},
{_FLAGS.lstrip()},
kept AS (
  SELECT pair_id, prompt, response FROM flags
  WHERE ok_prompt_len AND ok_response_len AND ok_ratio AND ok_no_echo
),
keyed AS (
  SELECT pair_id, prompt, response,
         md5(regexp_replace(lower(trim(prompt)), '\\s+', ' ', 'g')) AS _k
  FROM kept
),
first AS (SELECT _k, min(pair_id) AS pair_id FROM keyed GROUP BY 1)
SELECT k.pair_id, k.prompt, k.response
FROM keyed k JOIN first f ON f._k = k._k AND f.pair_id = k.pair_id
"""

def _sql_sft_pack_masks() -> str:
    from ..operators.packing import sql_pack_sequences

    packed = sql_pack_sequences(
        "SELECT pair_id, n_tokens FROM r",
        seq_len=_SFT_SEQ_LEN,
        num_shards=_SFT_SHARDS,
        id_col="pair_id",
    )
    L = _SFT_SEQ_LEN
    return f"""
WITH {_SQL_PAIRS.lstrip()},
r AS (
  SELECT pair_id,
         CAST({2 * _N_HDR} + {_sql_ntok("prompt")} AS BIGINT) AS mask_end,
         CAST({2 * _N_HDR} + {_sql_ntok("prompt")}
              + {_sql_ntok("response")} AS BIGINT) AS n_tokens
  FROM pairs
),
packed AS ({packed}),
j AS (SELECT p.*, r.mask_end FROM packed p JOIN r USING (pair_id)),
seg AS (
  SELECT shard, pair_id, start_offset, n_tokens, mask_end,
         unnest([
           struct_pack(off := CAST(0 AS BIGINT), len := mask_end,
                       tr := false),
           struct_pack(off := mask_end, len := n_tokens - mask_end,
                       tr := true)
         ]) AS sg
  FROM j
),
segf AS (
  SELECT shard, pair_id, start_offset + sg.off AS g0,
         start_offset + sg.off + sg.len AS g1, sg.tr AS trainable
  FROM seg WHERE sg.len > 0
),
exq AS (
  SELECT shard, pair_id, trainable, g0, g1, u.s AS seq_id
  FROM segf, unnest(generate_series(g0 // {L}, (g1 - 1) // {L})) AS u(s)
)
SELECT shard, CAST(seq_id AS BIGINT) AS seq_id, pair_id,
       CAST(greatest(g0, seq_id * {L}) - seq_id * {L} AS BIGINT)
         AS begin_tok,
       CAST(least(g1, (seq_id + 1) * {L}) - seq_id * {L} AS BIGINT)
         AS end_tok,
       trainable
FROM exq
"""


SQL_SFT_LOSS_MASK = f"""
WITH {_SQL_PAIRS.lstrip()},
r AS (
  SELECT pair_id,
         CAST({2 * _N_HDR} + {_sql_ntok("prompt")} AS BIGINT) AS mask_end,
         CAST({2 * _N_HDR} + {_sql_ntok("prompt")}
              + {_sql_ntok("response")} AS BIGINT) AS train_end
  FROM pairs
)
SELECT pair_id, 0 AS seg, CAST(0 AS BIGINT) AS start_tok,
       mask_end AS end_tok, FALSE AS trainable
FROM r
UNION ALL
SELECT pair_id, 1, mask_end, train_end, TRUE FROM r
"""


QUERIES.update(
    {
        "q_sft_quality": q_sft_quality,
        "q_sft_dedup": q_sft_dedup,
        "q_sft_loss_mask": q_sft_loss_mask,
        "q_sft_pack_masks": q_sft_pack_masks,
    }
)
ORACLES.update(
    {
        "q_sft_quality": SQL_SFT_QUALITY,
        "q_sft_dedup": SQL_SFT_DEDUP,
        "q_sft_loss_mask": SQL_SFT_LOSS_MASK,
        "q_sft_pack_masks": _sql_sft_pack_masks(),
    }
)
