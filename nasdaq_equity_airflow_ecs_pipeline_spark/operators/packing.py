"""Token-budget sequence packing (concat-and-chunk) — how pretraining
corpora become fixed-length training sequences.

The standard GPT-style recipe: concatenate documents in a deterministic
order, then cut the token stream every ``seq_len`` tokens; a document may
straddle a cut. That rule is a pure prefix sum, which makes it the
scalable formulation (the alternative — greedy bin packing that never
splits a document — is an inherently sequential fold; when that semantics
is required, run THIS operator first and re-pack only the straddling
tail docs, a tiny fraction).

Scale shape: a global token order would serialize into one partition, so
the stream is sharded by a hash of the doc key — each shard packs an
independent sequence space (exactly how a multi-worker tokenizer writes
shards). Within a shard: one window prefix-sum, partitioned on the shard
key — Spark runs every shard's window in parallel after a single hash
shuffle. No UDF, no collect; the whole plan is window + projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    num_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign every doc its span in the packed token stream of its shard.

    Returns (shard, doc_id, n_tokens, start_offset, first_seq, last_seq):
    the doc's tokens occupy [start_offset, start_offset + n_tokens) in
    shard-local coordinates; first_seq/last_seq are the training-sequence
    ids it lands in (straddlers differ). Deterministic: shard = uniform
    md5 bucket of the id, order within shard = id order."""
    sharded = docs.select(
        hash_bucket(F.col(id_col), num_shards).alias("shard"),
        F.col(id_col),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    out = sharded.select("shard", id_col, "n_tokens", start)
    return out.select(
        "shard",
        id_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / seq_len).alias("first_seq"),
        F.floor(
            (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
            / seq_len
        ).alias("last_seq"),
    )


def pack_greedy_no_split(
    docs: DataFrame,
    seq_len: int = 2048,
    num_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy next-fit packing that NEVER splits a document.

    The instruction-tuning / eval-set variant of :func:`pack_sequences`
    (a straddled example is a corrupted example there): walk docs in id
    order, close the current bin when the next doc would overflow it.
    A doc longer than ``seq_len`` gets a bin of its own (flagged
    ``oversize`` — caller chunks or drops those).

    The walk is a sequential fold, so it runs as an Arrow-batched
    ``applyInPandas`` per shard — same md5 sharding as pack_sequences,
    one shuffle, shards pack in parallel, bins are shard-local. Returns
    (shard, doc_id, n_tokens, bin_id, bin_fill, oversize)."""
    import pandas as pd

    sharded = docs.select(
        hash_bucket(F.col(id_col), num_shards).alias("shard"),
        F.col(id_col),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill = 0, 0
        bins, fills, oversize = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > seq_len:
                bin_id, fill = bin_id + 1, 0
            bins.append(bin_id)
            fill += n
            fills.append(fill)
            oversize.append(n > seq_len)
            if fill >= seq_len:
                bin_id, fill = bin_id + 1, 0
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    return sharded.groupBy("shard").applyInPandas(
        _pack,
        schema=(
            f"shard bigint, {id_col} bigint, n_tokens bigint, "
            "bin_id bigint, bin_fill bigint, oversize boolean"
        ),
    )


def sql_pack_sequences(
    table_expr: str,
    seq_len: int = 2048,
    num_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    mersenne_p: int = 2_147_483_647,
) -> str:
    """DuckDB twin: same md5 shard bucket, same window prefix sum.
    ``table_expr`` must yield (id_col, tokens_col)."""
    return f"""
WITH sharded AS (
  SELECT ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT
           % {mersenne_p} % {num_shards} AS shard,
         {id_col},
         CAST({tokens_col} AS BIGINT) AS n_tokens
  FROM ({table_expr})
),
spans AS (
  SELECT shard, {id_col}, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM sharded
)
SELECT shard, {id_col}, n_tokens, start_offset,
       floor(start_offset / {seq_len})::BIGINT AS first_seq,
       floor((start_offset + greatest(n_tokens, 1) - 1) / {seq_len})::BIGINT
         AS last_seq
FROM spans
"""


def pack_attention_spans(
    docs: DataFrame,
    seq_len: int = 2048,
    num_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-TRAINING-SEQUENCE document spans — the block-diagonal
    attention-mask manifest a packed-sequence trainer consumes (tokens
    of different documents packed into one sequence must not attend to
    each other; the mask needs, per sequence, where each document's
    block begins and ends).

    One row per (sequence, document) intersection:
    (shard, seq_id, id, begin_tok, end_tok) with [begin_tok, end_tok)
    in SEQUENCE-LOCAL token coordinates — a doc straddling sequences
    contributes one row per sequence it touches. Zero-token docs
    occupy no tokens and emit no span. Spans tile each sequence
    exactly (disjoint, ordered, summing to the sequence's filled
    length — pinned by the tiling pytest).

    Scale shape: rides :func:`pack_sequences`' plan (one shard-keyed
    prefix-sum window) plus one explode bounded by
    ceil(n_tokens/seq_len) rows per doc — output-proportional, no
    extra shuffle."""
    packed = pack_sequences(docs, seq_len, num_shards, id_col, tokens_col)
    ex = packed.filter(F.col("n_tokens") > 0).select(
        "shard",
        id_col,
        "start_offset",
        "n_tokens",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    base = F.col("seq_id") * seq_len
    return ex.select(
        "shard",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        id_col,
        (F.greatest(F.col("start_offset"), base) - base)
        .cast("bigint")
        .alias("begin_tok"),
        (F.least(F.col("start_offset") + F.col("n_tokens"), base + seq_len)
         - base)
        .cast("bigint")
        .alias("end_tok"),
    )


def sql_pack_attention_spans(
    table_expr: str,
    seq_len: int = 2048,
    num_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    mersenne_p: int = 2_147_483_647,
) -> str:
    """DuckDB twin of :func:`pack_attention_spans`."""
    inner = sql_pack_sequences(
        table_expr, seq_len, num_shards, id_col, tokens_col, mersenne_p
    )
    return f"""
WITH packed AS ({inner}),
ex AS (
  SELECT shard, {id_col}, start_offset, n_tokens, u.s AS seq_id
  FROM packed, unnest(generate_series(first_seq, last_seq)) AS u(s)
  WHERE n_tokens > 0
)
SELECT shard, CAST(seq_id AS BIGINT) AS seq_id, {id_col},
       CAST(greatest(start_offset, seq_id * {seq_len})
            - seq_id * {seq_len} AS BIGINT) AS begin_tok,
       CAST(least(start_offset + n_tokens, (seq_id + 1) * {seq_len})
            - seq_id * {seq_len} AS BIGINT) AS end_tok
FROM ex
"""
