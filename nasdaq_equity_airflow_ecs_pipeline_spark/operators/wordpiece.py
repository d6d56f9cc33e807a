"""WordPiece tokenizer training and encoding (Schuster & Nakajima,
ICASSP 2012; Devlin et al. 2019 BERT §A; the HuggingFace `tokenizers`
WordpieceTrainer semantics) — the third member of the repo's tokenizer
triad next to BPE (operators/text.py:bpe_train) and the unigram LM
(operators/unigram.py:unigram_train).

Training differs from BPE in exactly one place: the pair SELECTION
score. BPE picks the most FREQUENT adjacent pair; WordPiece picks the
pair maximizing ``count(ab) / (count(a) * count(b))`` — the
likelihood gain of merging under a unigram model, so rare-but-
predictive pairs win over merely common ones. Everything else is the
BPE loop: one corpus pass to the word-frequency table, then
vocabulary-sized merge rounds, each collecting exactly ONE winning
row (the bounded-artifact discipline).

Fixed-point discipline: the score is quantized to
``score_x1e9 = (count(ab) * 10^9) div (count(a) * count(b))`` —
exact BIGINT arithmetic both engines evaluate identically (the
rrf_x1e9 convention); ties inside one quantum break to the
lexicographically smaller pair, same as BPE. Symbols follow the BERT
spelling: a word splits into its first character plus ``##``-prefixed
continuation characters, and a merge output strips the ``##`` off its
right constituent (continuation-ness is inherited from the left).

Encoding is NOT merge-replay (the BPE encoder's shape): WordPiece
inference is greedy longest-match-first (max-munch) against the final
vocabulary, with whole-word ``[UNK]`` fallback when any position has
no matching piece. Per distinct word: one bounded candidate explode
(positions x max-piece-length), one broadcast join against the
vocabulary artifact, one per-word jump map, and one whole-stage-
codegen ``aggregate`` fold that walks the jumps — no UDF, no shuffle
beyond the word-keyed agg (the viterbi_segment shape,
operators/unigram.py:143). Corpus-proportional work is one explode +
one equi-join + one per-doc row_number window (the unigram_encode
shape).

Scale shape at 100 TB: training cost is vocabulary-sized after the
single corpus word-count pass (hash-agg with map-side combine); each
round runs two vocab-sized hash-aggs (symbol freqs, pair counts), one
vocab-sized equi-join, and collects one row. Encoding's per-word
candidate fan-out is bounded by the longest vocabulary piece, and the
vocabulary rides along as a broadcast artifact.

Reference parity: the reference is a row-level OHLCV ETL
(/root/reference/glue/jobs/build_stock_fact_table.py) with no text
surface; this is engine-extension surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _bpe_apply_merge, tokens

WP_SCALE = 1_000_000_000  # score fixed-point: x1e9, the rrf convention
CONT = "##"
UNK_TOKEN = "[UNK]"
UNK_ID = -1
WP_MERGES = 5

# first char bare, every later char ##-prefixed (the BERT spelling);
# guarded because Spark's sequence(2, 1) DESCENDS instead of emptying
_WP_SPLIT = (
    "concat(array(substring(w, 1, 1)), "
    "CASE WHEN length(w) >= 2 THEN transform(sequence(2, length(w)), "
    "i -> concat('##', substring(w, i, 1))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END)"
)

_PAIR_EXPR = (
    "CASE WHEN size(arr) > 1 THEN transform(sequence(1, size(arr) - 1), "
    "i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def wordpiece_train(
    docs: DataFrame, n_merges: int = WP_MERGES, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` WordPiece merges. Returns the artifact
    (step, pair, merged, freq, score_x1e9) — one row per merge.

    Per round: current symbol frequencies (one vocab-sized hash-agg),
    adjacent-pair counts (one more), the quantized-likelihood argmax
    (score_x1e9 DESC, pair ASC — one collected row), then the greedy
    left-to-right merge fold shared with BPE. Sequences re-pin via
    localCheckpoint per round (the pagerank lineage-cut convention)."""
    spark = docs.sparkSession
    words = _word_freqs(docs, text_col)
    cur = words.select(
        F.expr(_WP_SPLIT).alias("arr"), "freq"
    ).localCheckpoint(eager=True)

    out_rows = []
    for step in range(1, n_merges + 1):
        syms = (
            cur.select("freq", F.explode("arr").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("freq").cast("bigint").alias("f"))
        )
        pairs = (
            cur.select("freq", F.explode(F.expr(_PAIR_EXPR)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("c"))
        )
        top = (
            pairs.withColumn("a", F.expr("split_part(pair, ' ', 1)"))
            .withColumn("b", F.expr("split_part(pair, ' ', 2)"))
            .join(syms.select(F.col("sym").alias("a"), F.col("f").alias("fa")), "a")
            .join(syms.select(F.col("sym").alias("b"), F.col("f").alias("fb")), "b")
            .select(
                "pair",
                "c",
                F.expr(f"(c * {WP_SCALE}) div (fa * fb)").alias("score_x1e9"),
            )
            .orderBy(F.desc("score_x1e9"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, c, score = top[0]["pair"], top[0]["c"], top[0]["score_x1e9"]
        a, b = pair.split(" ", 1)
        merged = a + b[len(CONT):]
        out_rows.append((step, pair, merged, int(c), int(score)))
        cur = cur.select(
            _bpe_apply_merge(F.col("arr"), a, b, merged).alias("arr"), "freq"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out_rows,
        "step int, pair string, merged string, freq bigint, score_x1e9 bigint",
    )


def _collect_word_freqs(
    docs: DataFrame, text_col: str = "text", max_vocab: int = 2_000_000
) -> list[tuple[str, int]]:
    """ONE corpus pass to the word-frequency table, collected under an
    explicit cap (the bpe_train_local discipline: WordPiece training
    state after the corpus pass is VOCABULARY-sized — the bounded-
    artifact class — and a silent truncation would train different
    merges, so the cap raises instead)."""
    rows = _word_freqs(docs, text_col).limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; a truncated "
            f"vocabulary would train different merges — raise the cap "
            f"or use wordpiece_train"
        )
    return [(r["w"], int(r["freq"])) for r in rows]


def _wp_split(w: str) -> list[str]:
    """The BERT spelling of the initial split: bare first character,
    ``##``-prefixed continuation characters — the Python twin of
    ``_WP_SPLIT`` (unit-tested equal via the trainer-parity test)."""
    return [w[0]] + [CONT + c for c in w[1:]]


def _wp_train_rows(
    words: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int, int]]:
    """The WordPiece merge rounds replayed driver-side over the
    collected word table — bit-identical to :func:`wordpiece_train`'s
    engine rounds, piece by piece:

    - symbol/pair counts are integer sums of word freqs — exact both
      ways;
    - the score is ``(c * 10^9) // (fa * fb)`` on positive BIGINTs, so
      Python ``//`` == Spark ``div``;
    - selection orders by (score desc, pair-string asc); Python's
      code-point string order == Spark UTF8_BINARY's UTF-8 byte order
      (UTF-8 preserves code-point order), so ties break identically;
    - the merge application is the same greedy left-to-right
      non-overlapping fold as ``_bpe_apply_merge``.

    Pinned by test_wordpiece_local_equals_engine and the unchanged
    q_wordpiece_merges oracle."""
    from collections import Counter

    seqs = [_wp_split(w) for w, _ in words]
    freqs = [f for _, f in words]
    out: list[tuple[int, str, str, int, int]] = []
    for step in range(1, n_merges + 1):
        sym_f: Counter = Counter()
        pair_c: Counter = Counter()
        for seq, f in zip(seqs, freqs):
            for s in seq:
                sym_f[s] += f
            for p in zip(seq, seq[1:]):
                pair_c[p] += f
        if not pair_c:
            break
        best_key = None
        best_pair = None
        for (a, b), c in pair_c.items():
            score = (c * WP_SCALE) // (sym_f[a] * sym_f[b])
            key = (-score, f"{a} {b}")
            if best_key is None or key < best_key:
                best_key = key
                best_pair = (a, b, c, score)
        a, b, c, score = best_pair
        merged = a + b[len(CONT):]
        out.append((step, f"{a} {b}", merged, c, score))
        for idx, seq in enumerate(seqs):
            new_seq: list[str] = []
            for t in seq:
                if new_seq and new_seq[-1] == a and t == b:
                    new_seq[-1] = merged
                else:
                    new_seq.append(t)
            seqs[idx] = new_seq
    return out


def wordpiece_train_local(
    docs: DataFrame,
    n_merges: int = WP_MERGES,
    text_col: str = "text",
    max_vocab: int = 2_000_000,
) -> DataFrame:
    """:func:`wordpiece_train`'s driver-side merge FINISHER (the
    bpe_train_local convention): one corpus pass collects the bounded
    word-frequency artifact, then the merge rounds run in pure Python —
    bit-identical merge table (see :func:`_wp_train_rows`), none of the
    per-round Spark jobs (2 hash-aggs + vocab join + argmax collect +
    an eager re-checkpoint of the sequence table) whose driver latency,
    not data volume, is the wall at realistic merge depths."""
    spark = docs.sparkSession
    rows = _wp_train_rows(_collect_word_freqs(docs, text_col, max_vocab), n_merges)
    return spark.createDataFrame(
        rows,
        "step int, pair string, merged string, freq bigint, score_x1e9 bigint",
    )


def wordpiece_alphabet(docs: DataFrame, text_col: str = "text") -> list[str]:
    """The corpus WordPiece alphabet: every initial symbol of the
    pre-merge split (bare first characters and ``##``-prefixed
    continuation characters actually occurring). Bounded by twice the
    character alphabet — the artifact class, so collected."""
    rows = (
        _word_freqs(docs, text_col)
        .select(F.explode(F.expr(_WP_SPLIT)).alias("sym"))
        .distinct()
        .collect()
    )
    return sorted(r["sym"] for r in rows)


def wordpiece_encode(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy longest-match-first (max-munch) WordPiece encoding under
    a final vocabulary: (id, seq_pos, token_id), one row per piece in
    document order. Token ids are the lexicographic rank of the piece
    (0-based, the artifact-file convention); a word where any reached
    position has no matching piece becomes a single ``[UNK]`` row with
    UNK_ID — BERT's whole-word fallback, not per-character.

    Per distinct word: candidate (position, length) pieces exploded up
    to the longest head/continuation piece in the vocabulary, matched
    against the broadcast vocab artifact, reduced to a per-position
    longest-match jump map, then walked by one ``aggregate`` fold
    (each step advances >= 1 position, so ``sequence(1, n)`` bounds
    the walk). All whole-stage-codegen expressions — no UDF."""
    spark = docs.sparkSession
    vocab = sorted(set(vocab))
    max_h = max(
        (len(p) for p in vocab if not p.startswith(CONT)), default=1
    )
    max_c = max(
        (len(p) - len(CONT) for p in vocab if p.startswith(CONT)), default=1
    )
    vocab_df = spark.createDataFrame([(p,) for p in vocab], "piece string")
    ids = spark.createDataFrame(
        [(p, i) for i, p in enumerate(vocab)], "piece string, token_id bigint"
    )

    wordpos = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("wpos", "w")
    ).filter(F.col("w") != "")
    dwords = wordpos.select("w").distinct()

    cand = F.expr(
        f"flatten(transform(sequence(1, length(w)), j -> "
        f"transform(sequence(1, least(IF(j = 1, {max_h}, {max_c}), "
        f"length(w) - j + 1)), l -> named_struct('j', j, 'l', l, "
        f"'piece', IF(j = 1, substring(w, 1, l), "
        f"concat('{CONT}', substring(w, j, l)))))))"
    )
    best = (
        dwords.select("w", F.explode(cand).alias("e"))
        .select("w", F.col("e.j").alias("j"), F.col("e.l").alias("l"),
                F.col("e.piece").alias("piece"))
        .join(F.broadcast(vocab_df), "piece")
        .groupBy("w", "j")
        .agg(F.max("l").alias("l"))
        .groupBy("w")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("j", "l"))
            ).alias("bl")
        )
    )
    walk = F.expr(
        "aggregate(sequence(1, n), named_struct("
        "'pos', 1, "
        "'parts', CAST(array() AS ARRAY<STRUCT<s: INT, l: INT>>), "
        "'ok', true), "
        "(st, x) -> IF(NOT st.ok OR st.pos > n, st, "
        "IF(coalesce(element_at(bl, st.pos), 0) = 0, "
        "named_struct('pos', st.pos, 'parts', st.parts, 'ok', false), "
        "named_struct('pos', st.pos + element_at(bl, st.pos), "
        "'parts', concat(st.parts, array(named_struct('s', st.pos, "
        "'l', element_at(bl, st.pos)))), 'ok', true))))"
    )
    pieces = F.expr(
        f"IF(wk.ok AND wk.pos = n + 1, "
        f"transform(wk.parts, p -> IF(p.s = 1, substring(w, 1, p.l), "
        f"concat('{CONT}', substring(w, p.s, p.l)))), "
        f"array('{UNK_TOKEN}'))"
    )
    seg = (
        dwords.join(best, "w", "left")
        .select("w", F.length("w").alias("n"), "bl")
        .withColumn("wk", walk)
        .select("w", pieces.alias("pieces"))
    )
    symrows = wordpos.join(seg, "w").select(
        F.col(id_col), "wpos", F.posexplode("pieces").alias("spos", "piece")
    )
    w_seq = Window.partitionBy(id_col).orderBy("wpos", "spos")
    return (
        symrows.join(F.broadcast(ids), "piece", "left")
        .select(
            F.col(id_col),
            "wpos",
            "spos",
            F.coalesce("token_id", F.lit(UNK_ID)).cast("bigint").alias(
                "token_id"
            ),
        )
        .select(
            F.col(id_col),
            (F.row_number().over(w_seq) - F.lit(1)).cast("bigint").alias(
                "seq_pos"
            ),
            "token_id",
        )
    )
