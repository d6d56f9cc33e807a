"""WordPiece tokenizer (operators/wordpiece.py): trainer parity with a
pure-Python twin, the likelihood-score-vs-frequency selection contrast
with BPE, greedy longest-match encoding, and the [UNK] fallback."""

from __future__ import annotations

from collections import Counter

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.wordpiece import (
    CONT,
    UNK_ID,
    WP_SCALE,
    wordpiece_alphabet,
    wordpiece_encode,
    wordpiece_train,
    wordpiece_train_local,
)


def _py_train(texts: list[str], n_merges: int):
    """Pure-Python twin of wordpiece_train: quantized score argmax
    (score_x1e9 DESC, pair ASC), greedy left-to-right merge fold."""
    words = Counter(w for t in texts for w in t.split() if w)
    seqs = {w: [w[0]] + [CONT + c for c in w[1:]] for w in words}
    out = []
    for step in range(1, n_merges + 1):
        sym: Counter = Counter()
        pc: Counter = Counter()
        for w, f in words.items():
            s = seqs[w]
            for x in s:
                sym[x] += f
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        scored = {
            p: c * WP_SCALE // (sym[p[0]] * sym[p[1]]) for p, c in pc.items()
        }
        a, b = min(scored, key=lambda p: (-scored[p], p[0] + " " + p[1]))
        merged = a + b[len(CONT):]
        for w in seqs:
            folded: list[str] = []
            for tk in seqs[w]:
                if folded and folded[-1] == a and tk == b:
                    folded[-1] = merged
                else:
                    folded.append(tk)
            seqs[w] = folded
        out.append((step, f"{a} {b}", merged, pc[(a, b)], scored[(a, b)]))
    return out


def _py_encode(w: str, vocab: set[str], vid: dict[str, int]) -> list[int]:
    pos, toks = 0, []
    while pos < len(w):
        for ln in range(len(w) - pos, 0, -1):
            p = w[pos:pos + ln] if pos == 0 else CONT + w[pos:pos + ln]
            if p in vocab:
                toks.append(vid[p])
                pos += ln
                break
        else:
            return [UNK_ID]
    return toks


TEXTS = ["hugging hugging face hug", "hugs hugger face the the"]


def test_trainer_matches_python_twin(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id bigint, text string"
    )
    got = [tuple(r) for r in wordpiece_train(docs, n_merges=4).collect()]
    assert got == _py_train(TEXTS, 4)


def test_score_selection_differs_from_bpe_frequency(spark):
    """Non-vacuity: the corpus is built so the most FREQUENT pair
    ('a','##b' — 6 occurrences, but both symbols are everywhere) loses
    to the rarer-but-predictive ('x','##y' — 3 occurrences, symbols
    occurring nowhere else). BPE picks the former; WordPiece must pick
    the latter."""
    texts = ["ab ab ab ab ab ab xy xy xy a b ba ba ba ba ba ba"]
    docs = spark.createDataFrame([(1, texts[0])], "doc_id bigint, text string")
    first = wordpiece_train(docs, n_merges=1).collect()[0]
    assert first["pair"] == "x ##y"
    # and the frequency argmax really was a different pair
    words = Counter(w for w in texts[0].split())
    pc: Counter = Counter()
    for w, f in words.items():
        s = [w[0]] + [CONT + c for c in w[1:]]
        for a, b in zip(s, s[1:]):
            pc[(a, b)] += f
    freq_pick = min(pc, key=lambda p: (-pc[p], p[0] + " " + p[1]))
    assert freq_pick != ("x", "##y")


def test_merge_fold_is_greedy_left_to_right(spark):
    """'aaaa' under merge (a, ##a): greedy non-overlapping fold gives
    [aa, ##aa]? No — the fold pairs (a,##a) then scans on: positions
    1-2 merge, positions 3-4 are (##a,##a) which is a DIFFERENT pair,
    so the result is [a##a?, ...] — pin the exact artifact instead."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aa")], "doc_id bigint, text string"
    )
    got = [tuple(r) for r in wordpiece_train(docs, n_merges=2).collect()]
    assert got == _py_train(["aaaa aaaa aa"], 2)


def test_encode_matches_python_greedy_and_roundtrips(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id bigint, text string"
    )
    merges = wordpiece_train(docs, n_merges=4).collect()
    vocab = sorted(
        set(wordpiece_alphabet(docs)) | {r["merged"] for r in merges}
    )
    vid = {p: i for i, p in enumerate(vocab)}
    enc = wordpiece_encode(docs, vocab)
    got = [
        (r["doc_id"], r["seq_pos"], r["token_id"])
        for r in enc.orderBy("doc_id", "seq_pos").collect()
    ]
    expect = []
    for did, t in enumerate(TEXTS):
        seqp = 0
        for w in t.split():
            for tid in _py_encode(w, set(vocab), vid):
                expect.append((did, seqp, tid))
                seqp += 1
    assert got == expect
    # round-trip: per word, pieces reassemble the word (no UNK here)
    rev = {i: p for p, i in vid.items()}
    for did, t in enumerate(TEXTS):
        toks = [rev[g[2]] for g in got if g[0] == did]
        rebuilt = "".join(
            p[len(CONT):] if p.startswith(CONT) else " " + p for p in toks
        ).strip()
        assert rebuilt.split() == t.split()


def test_wordpiece_local_equals_engine(spark):
    """The driver-side merge finisher (wordpiece_train_local, the
    bpe_train_local convention) trains the SAME merge table as the
    engine rounds — selection score, tie-breaks, and the greedy fold
    replay identically (optimization r13; q_wordpiece_merges runs the
    local path against the unchanged unrolled oracle)."""
    for texts in (
        TEXTS,
        ["ab ab ab ab ab ab xy xy xy a b ba ba ba ba ba ba"],
        ["aaaa aaaa aa"],
    ):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        engine = [tuple(r) for r in wordpiece_train(docs, n_merges=4).collect()]
        local = [
            tuple(r) for r in wordpiece_train_local(docs, n_merges=4).collect()
        ]
        assert local == engine


def test_encode_unknown_char_is_whole_word_unk(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id bigint, text string"
    )
    vocab = sorted(
        set(wordpiece_alphabet(docs))
        | {r["merged"] for r in wordpiece_train(docs, n_merges=2).collect()}
    )
    probe = spark.createDataFrame(
        [(9, "hug zzq hug")], "doc_id bigint, text string"
    )
    # 'z'/'q' are not in the training alphabet -> the middle word is a
    # single UNK row, NOT per-character UNKs; neighbors encode normally
    rows = [
        r["token_id"]
        for r in wordpiece_encode(probe, vocab).orderBy("seq_pos").collect()
    ]
    n_hug = len(_py_encode("hug", set(vocab), {p: i for i, p in enumerate(vocab)}))
    assert len(rows) == 2 * n_hug + 1
    assert rows.count(UNK_ID) == 1
