"""SFT / instruction-tuning data preparation — the post-training half
of a training-data pipeline (the Alpaca/Dolly/OpenAssistant cleaning
lore distilled into the repo's integer-exact rule discipline):
pair construction, quality flags, prompt-keyed dedup, and the chat
render with its LOSS-MASK manifest (which token spans train and which
are context — the piece every SFT trainer actually consumes).

Rules (one narrow projection, the gopher_quality_flags class):
- ok_prompt_len:    prompt has >= PROMPT_MIN tokens
- ok_response_len:  response has >= RESP_MIN and <= RESP_MAX tokens
- ok_ratio:         response is not absurdly short relative to the
                    prompt (RATIO_NUM * n_resp >= n_prompt)
- ok_no_echo:       the response does not BEGIN with the prompt
                    (echo answers — the classic instruction-data bug)
- keep = all of the above

Dedup: exact prompt-keyed keep-first (min pair_id per normalized
prompt key) among rule survivors — near-dup variants compose from the
repo's MinHash/Jaccard family when needed.

Loss-mask manifest: the pair renders to the canonical two-section
template; the manifest emits one row per SEGMENT with its whitespace-
token span [start_tok, end_tok) and ``trainable`` — header + prompt
masked, response trained. Spans are pure arithmetic over token
counts, so packing (operators/packing.py) composes downstream.

Scale shape: flags and the render are narrow maps (zero shuffle);
dedup is one hash-agg keyed on the prompt hash + one semi-join. No
UDFs anywhere.

Reference parity: the reference is a row-level OHLCV ETL with no SFT
surface; engine-extension surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROMPT_MIN = 3
RESP_MIN = 5
RESP_MAX = 100_000
RATIO_NUM = 4  # response may be at most 4x shorter than the prompt

HDR_INSTR = "### Instruction:"
HDR_RESP = "### Response:"
# whitespace-token counts of the headers (the span arithmetic's
# constants; both are 2 tokens)
_N_HDR = 2


def _ntok(col):
    return F.size(
        F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != "")
    ).cast("bigint")


def sft_quality_flags(
    pairs: DataFrame,
    id_col: str = "pair_id",
    prompt_col: str = "prompt",
    response_col: str = "response",
    prompt_min: int = PROMPT_MIN,
    resp_min: int = RESP_MIN,
    resp_max: int = RESP_MAX,
    ratio_num: int = RATIO_NUM,
) -> DataFrame:
    """One boolean per rule plus the conjunction — a single narrow
    projection."""
    np_, nr = _ntok(F.col(prompt_col)), _ntok(F.col(response_col))
    ok = {
        "ok_prompt_len": np_ >= prompt_min,
        "ok_response_len": (nr >= resp_min) & (nr <= resp_max),
        "ok_ratio": F.lit(ratio_num) * nr >= np_,
        "ok_no_echo": ~F.trim(F.col(response_col)).startswith(
            F.trim(F.col(prompt_col))
        ),
    }
    keep = None
    for c in ok.values():
        keep = c if keep is None else (keep & c)
    return pairs.select(
        F.col(id_col),
        np_.alias("n_prompt"),
        nr.alias("n_response"),
        *[v.alias(k) for k, v in ok.items()],
        keep.alias("keep"),
    )


def sft_dedup(
    pairs: DataFrame,
    id_col: str = "pair_id",
    prompt_col: str = "prompt",
    response_col: str = "response",
    **flag_kwargs,
) -> DataFrame:
    """Rule survivors, deduped exact on the normalized prompt
    (lowercase, collapsed whitespace), keep-first by id. Returns
    (pair_id, prompt, response)."""
    flags = sft_quality_flags(
        pairs, id_col, prompt_col, response_col, **flag_kwargs
    )
    kept = pairs.join(
        flags.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )
    key = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(prompt_col))), r"\s+", " ")
    )
    keyed = kept.withColumn("_k", key)
    first = keyed.groupBy("_k").agg(F.min(id_col).alias(id_col))
    return keyed.join(first, [ "_k", id_col]).select(
        id_col, prompt_col, response_col
    )


def sft_chat_render(
    pairs: DataFrame,
    id_col: str = "pair_id",
    prompt_col: str = "prompt",
    response_col: str = "response",
) -> DataFrame:
    """The canonical two-section chat render plus its loss-mask
    manifest columns: (id, chat_text, n_tokens, mask_end, train_end) —
    whitespace tokens [0, mask_end) are context (headers + prompt +
    the response header), [mask_end, train_end) train."""
    np_, nr = _ntok(F.col(prompt_col)), _ntok(F.col(response_col))
    chat = F.concat(
        F.lit(HDR_INSTR + "\n"),
        F.trim(F.col(prompt_col)),
        F.lit("\n" + HDR_RESP + "\n"),
        F.trim(F.col(response_col)),
    )
    mask_end = (F.lit(2 * _N_HDR) + np_).cast("bigint")
    return pairs.select(
        F.col(id_col),
        chat.alias("chat_text"),
        (F.lit(2 * _N_HDR) + np_ + nr).cast("bigint").alias("n_tokens"),
        mask_end.alias("mask_end"),
        (F.lit(2 * _N_HDR) + np_ + nr).cast("bigint").alias("train_end"),
    )


def sft_pack_loss_spans(
    pairs: DataFrame,
    seq_len: int = 2048,
    num_shards: int = 64,
    id_col: str = "pair_id",
    prompt_col: str = "prompt",
    response_col: str = "response",
) -> DataFrame:
    """The loss-mask manifest AFTER packing (composes
    :func:`sft_chat_render` with operators/packing.py:pack_sequences):
    one row per (training sequence, pair, trainability) intersection —
    (shard, seq_id, id, begin_tok, end_tok, trainable) in SEQUENCE-
    LOCAL token coordinates. A pair straddling sequences contributes
    one row per (sequence, segment); empty response segments emit no
    row. This is exactly what a packed-SFT trainer consumes: which
    token ranges of each fixed-length sequence contribute loss.

    Scale shape: rides pack_sequences' shard-keyed prefix-sum window
    plus one bounded 2-way segment explode and one
    ceil(len/seq_len)-bounded sequence explode — output-proportional,
    no extra shuffle."""
    from .packing import pack_sequences

    r = sft_chat_render(pairs, id_col, prompt_col, response_col)
    packed = pack_sequences(
        r, seq_len, num_shards, id_col, "n_tokens"
    )
    j = packed.join(r.select(id_col, "mask_end"), id_col)
    segs = F.expr(
        "filter(array("
        "named_struct('off', CAST(0 AS BIGINT), 'len', mask_end, "
        "'tr', false), "
        "named_struct('off', mask_end, 'len', n_tokens - mask_end, "
        "'tr', true)), s -> s.len > 0)"
    )
    ex = j.select(
        "shard", id_col, "start_offset", F.explode(segs).alias("sg")
    ).select(
        "shard",
        id_col,
        F.col("sg.tr").alias("trainable"),
        (F.col("start_offset") + F.col("sg.off")).alias("g0"),
        (
            F.col("start_offset") + F.col("sg.off") + F.col("sg.len")
        ).alias("g1"),
    )
    exq = ex.select(
        "shard",
        id_col,
        "trainable",
        "g0",
        "g1",
        F.explode(
            F.expr(f"sequence(g0 div {seq_len}, (g1 - 1) div {seq_len})")
        ).alias("seq_id"),
    )
    return exq.select(
        "shard",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        id_col,
        F.expr(f"greatest(g0, seq_id * {seq_len}) - seq_id * {seq_len}")
        .cast("bigint")
        .alias("begin_tok"),
        F.expr(
            f"least(g1, (seq_id + 1) * {seq_len}) - seq_id * {seq_len}"
        )
        .cast("bigint")
        .alias("end_tok"),
        "trainable",
    )


def sft_loss_mask(
    pairs: DataFrame,
    id_col: str = "pair_id",
    prompt_col: str = "prompt",
    response_col: str = "response",
) -> DataFrame:
    """The manifest in long form: one row per segment —
    (id, seg, start_tok, end_tok, trainable) with seg 0 = the masked
    context span, seg 1 = the trained response span."""
    r = sft_chat_render(pairs, id_col, prompt_col, response_col)
    ctx = r.select(
        id_col,
        F.lit(0).alias("seg"),
        F.lit(0).cast("bigint").alias("start_tok"),
        F.col("mask_end").alias("end_tok"),
        F.lit(False).alias("trainable"),
    )
    resp = r.select(
        id_col,
        F.lit(1).alias("seg"),
        F.col("mask_end").alias("start_tok"),
        F.col("train_end").alias("end_tok"),
        F.lit(True).alias("trainable"),
    )
    return ctx.unionByName(resp)
