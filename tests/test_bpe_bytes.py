"""Byte-level BPE (operators/text.py byte_pieces/byte_syms/
bpe_train_local unit='byte'/bpe_encode_bytes/bpe_decode_bytes):
lossless round-trip on adversarial texts, no-OOV on unseen symbols,
and id-convention invariants. The oracle parity (trainer + encoder vs
the unrolled DuckDB chain) is covered by q_bpe_bytes_* in
queries/ml_ops.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators import text as t

EDGE_TEXTS = [
    (0, "héllo wörld "),
    (1, "a\nb\tc"),
    (2, "  leading and   multiple   spaces"),
    (3, "trailing  "),
    (4, "🎉🎉 emoji 🎉 and ünïcödé"),
    (5, "日本語 テキスト mixed with ascii"),
    (6, "single"),
    (7, " "),
    (8, "tab\t\tnewline\n\nmix \t\n"),
]


def _merges(df, n=8):
    trained = t.bpe_train_local(df, n_merges=n, unit="byte")
    return [
        (r["pair"].split(" ", 1)[0], r["pair"].split(" ", 1)[1], r["merged"])
        for r in trained.orderBy("step").collect()
    ]


def test_bpe_bytes_roundtrip(spark):
    """decode(encode(x)) == x, byte for byte, on whitespace-heavy,
    multi-byte, and emoji texts — the whole point of the byte level +
    whitespace-preserving pre-tokenizer."""
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id bigint, text string")
    merges = _merges(df)
    enc = t.bpe_encode_bytes(df, merges)
    dec = t.bpe_decode_bytes(enc, merges)
    got = {r["doc_id"]: r["text"] for r in dec.collect()}
    want = dict(EDGE_TEXTS)
    assert got == want


def test_bpe_bytes_no_oov(spark):
    """Encoding text whose characters were NEVER seen in training still
    produces an id for every byte (the fixed 256-byte base alphabet) —
    the no-OOV property char-level BPE cannot give."""
    train = spark.createDataFrame(
        [(0, "plain ascii corpus only")], "doc_id bigint, text string"
    )
    merges = _merges(train, n=3)
    unseen = spark.createDataFrame(
        [(0, "Ω≈ç√∫ 完全に新しい 🚀")], "doc_id bigint, text string"
    )
    enc = t.bpe_encode_bytes(unseen, merges)
    rows = enc.collect()
    assert rows and all(r["token_id"] is not None for r in rows)
    n_bytes = len("Ω≈ç√∫ 完全に新しい 🚀".encode("utf-8"))
    # without applicable merges each byte is one token
    assert len(rows) <= n_bytes
    dec = t.bpe_decode_bytes(enc, merges).collect()[0]["text"]
    assert dec == "Ω≈ç√∫ 完全に新しい 🚀"


def test_bpe_bytes_id_convention(spark):
    """Base ids are the byte values themselves (0-255), merge outputs
    take 256+step-1, and merge symbols are even-length hex — the GPT-2
    layout with the hex spelling."""
    df = spark.createDataFrame(
        [(0, "aa aa aa bb")], "doc_id bigint, text string"
    )
    merges = _merges(df, n=2)
    assert all(
        len(m) % 2 == 0 and len(m) >= 4
        and set(m) <= set("0123456789ABCDEF")
        for _a, _b, m in merges
    )
    enc = t.bpe_encode_bytes(df, merges)
    ids = [r["token_id"] for r in enc.orderBy("seq_pos").collect()]
    assert all(i < 256 + len(merges) for i in ids)
    # 'aa' is the most frequent pair -> its merge output appears as id >= 256
    assert any(i >= 256 for i in ids)


def test_byte_pieces_concat_preserves_text(spark):
    """The pre-tokenizer invariant the round-trip rests on:
    concat(pieces) == text for every text, including trailing
    whitespace and newlines."""
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id bigint, text string")
    out = df.select(
        "text",
        F.array_join(t.byte_pieces("text"), "").alias("rejoined"),
    )
    for r in out.collect():
        assert r["rejoined"] == r["text"], repr(r["text"])
