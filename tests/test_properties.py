"""Property-based tests (hypothesis): algebraic laws the engine's
operators must satisfy on arbitrary inputs, not just fixtures."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.dedup import latest_wins
from nasdaq_equity_airflow_ecs_pipeline_spark.operators.upsert import merge_upsert

from pyspark.sql import functions as F

_spark = None


def _get_spark():
    # hypothesis drives many examples through one function call; reuse the
    # session fixture's singleton rather than re-entering pytest fixtures
    global _spark
    if _spark is None:
        from nasdaq_equity_airflow_ecs_pipeline_spark.session import get_spark

        _spark = get_spark("props", cpus=8)
    return _spark


batches = st.lists(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),  # (key, value)
        min_size=1, max_size=6,
    ),
    min_size=1, max_size=4,
)


@settings(max_examples=15, deadline=None)
@given(batches)
def test_merge_upsert_is_last_writer_wins(seq):
    """Folding merge_upsert over batches == a dict folded the same way
    (each batch internally deduped latest-wins by value then key order —
    the engine's W1 discipline)."""
    spark = _get_spark()
    expected: dict[int, int] = {}
    table = None
    for batch in seq:
        df = spark.createDataFrame(batch, ["k", "v"])
        df = latest_wins(df, ["k"], [F.desc("v"), F.desc("k")])
        best: dict[int, int] = {}
        for k, v in batch:
            if k not in best or v > best[k]:
                best[k] = v
        expected.update(best)
        table = merge_upsert(table, df, ["k"])
    got = {r.k: r.v for r in table.collect()}
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=30),
    st.integers(1, 100),
)
def test_sessionize_counts_gaps(offsets, gap_s):
    """Number of sessions == 1 + number of inter-event gaps > gap."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.sessionize import sessionize

    spark = _get_spark()
    ts = sorted(set(offsets))
    rows = [(i, 1, float(t)) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "off"]).select(
        "event_id", "user_id",
        F.timestamp_seconds(F.col("off")).alias("ts"),
    )
    out = sessionize(df, gap_seconds=gap_s)
    n_sessions = out.agg(F.max("session_seq")).first()[0]
    expected = 1 + sum(1 for a, b in zip(ts, ts[1:]) if b - a > gap_s)
    assert n_sessions == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 500)),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
    st.integers(16, 512),
    st.integers(1, 8),
)
def test_pack_sequences_tiles_every_shard(docs, seq_len, shards):
    """For arbitrary corpora: spans tile [0, shard_total) exactly, and
    every token of every doc lands in exactly one training sequence."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    spark = _get_spark()
    df = spark.createDataFrame(docs, ["doc_id", "n_tokens"])
    rows = pack_sequences(df, seq_len=seq_len, num_shards=shards).collect()
    assert len(rows) == len(docs)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rs:
            assert r["start_offset"] == offset
            assert r["first_seq"] == offset // seq_len
            assert r["last_seq"] == (offset + r["n_tokens"] - 1) // seq_len
            offset += r["n_tokens"]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-1e3, 1e3, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=20,
    )
)
def test_quantize_int8_error_bound(vecs):
    """|dequantized - original| <= scale/2 for every element of every
    vector, including all-zero and near-zero vectors."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.quantize import (
        quantize_int8,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    rows = quantize_int8(df).collect()
    assert len(rows) == 4 * len(vecs)
    import struct as _struct

    for r in rows:
        # replicate the float32 storage round-trip the engine reads
        orig = _struct.unpack("f", _struct.pack("f", vecs[r["vec_id"]][r["dim"]]))[0]
        assert -127 <= r["qval"] <= 127
        if r["scale"] == 0.0:
            assert r["qval"] == 0 and orig == 0.0
        else:
            assert abs(r["qval"] * r["scale"] - orig) <= r["scale"] / 2 + 1e-9


# ---------------------------------------------------------- SCD2 laws
scd_logs = st.lists(
    st.tuples(
        st.integers(1, 3),          # key
        st.sampled_from("ABC"),     # attribute value
        st.integers(0, 50),         # minute offset (duplicates allowed)
    ),
    min_size=1, max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(scd_logs)
def test_scd2_partitions_the_event_log(log):
    """On any change log: (1) per-key version numbers are 1..V dense,
    (2) n_events sums to the input row count, (3) intervals chain —
    each version's valid_to equals the next version's valid_from, with
    exactly one open (current) interval per key, (4) rebuilding the
    per-event attribute assignment from the intervals reproduces the
    input's attribute at every event timestamp."""
    from datetime import datetime

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.scd2 import scd2_build

    spark = _get_spark()
    rows = [
        (k, a, datetime(2024, 1, 1, 0, m, 0), i)
        for i, (k, a, m) in enumerate(log)
    ]
    df = spark.createDataFrame(rows, ["k", "attr", "ts", "eid"])
    out = scd2_build(df, key="k", attrs=["attr"], ts_col="ts",
                     order_tiebreak="eid").collect()

    assert sum(r.n_events for r in out) == len(rows)
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, vers in by_key.items():
        vers.sort(key=lambda r: r.version)
        assert [r.version for r in vers] == list(range(1, len(vers) + 1))
        assert sum(1 for r in vers if r.is_current) == 1
        assert vers[-1].is_current and vers[-1].valid_to is None
        for a, b in zip(vers, vers[1:]):
            assert a.valid_to == b.valid_from
        # no two consecutive versions share the attribute (maximal runs)
        for a, b in zip(vers, vers[1:]):
            assert a.attr != b.attr


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(st.integers(0, 8), st.integers(0, 3), max_size=8),
    st.dictionaries(st.integers(0, 8), st.integers(0, 3), max_size=8),
)
def test_cdc_diff_apply_round_trip(old_map, new_map):
    """apply_changes(old, snapshot_diff(old, new)) == new, for arbitrary
    keyed snapshots (the diff is lossless), and the diff's change labels
    partition the key space correctly."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.cdc import (
        apply_changes,
        snapshot_diff,
    )

    spark = _get_spark()
    schema = "k int, v int"
    old = spark.createDataFrame(list(old_map.items()) or [(None, None)], schema).filter("k is not null")
    new = spark.createDataFrame(list(new_map.items()) or [(None, None)], schema).filter("k is not null")
    diff = snapshot_diff(old, new, key="k", payload=["v"]).collect()

    labels = {r.k: r.change for r in diff}
    for k in set(old_map) | set(new_map):
        if k not in old_map:
            assert labels[k] == "insert"
        elif k not in new_map:
            assert labels[k] == "delete"
        elif old_map[k] != new_map[k]:
            assert labels[k] == "update"
        else:
            assert k not in labels

    diff_df = snapshot_diff(old, new, key="k", payload=["v"])
    rebuilt = {r.k: r.v for r in apply_changes(old, diff_df, key="k", payload=["v"]).collect()}
    assert rebuilt == new_map


# --------------------------------------------------- round-4 operators
_url_chars = st.text(
    alphabet="abXY09._-/?&=#:", min_size=0, max_size=24
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_url_chars, min_size=1, max_size=8))
def test_canonicalize_url_is_idempotent(paths):
    """canon(canon(u)) == canon(u): the canonical form must be a fixed
    point, else dedup keys depend on how many times a pipeline stage
    normalized the column."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
        canonicalize_url,
    )

    spark = _get_spark()
    urls = [(f"https://Ex.com{('/' + p) if p else ''}",) for p in paths]
    df = spark.createDataFrame(urls, ["url"])
    once = df.select(canonicalize_url("url").alias("url"))
    twice = once.select(canonicalize_url("url").alias("url"))
    assert [r["url"] for r in once.collect()] == [
        r["url"] for r in twice.collect()
    ]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=5),
        min_size=1, max_size=6,
    ),
    st.integers(1, 3),
)
def test_line_dedup_conservation_and_order(doc_lines, max_docs):
    """Kept lines are a subsequence of the original lines, and
    n_kept + n_removed == n_lines for every document."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
        line_dedup,
    )

    spark = _get_spark()
    rows = [(i, "\n".join(ls)) for i, ls in enumerate(doc_lines)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in line_dedup(df, max_docs=max_docs).collect()}
    for i, ls in enumerate(doc_lines):
        r = out[i]
        assert r["n_lines"] == len(ls)
        kept = r["kept_text"].split("\n") if r["kept_text"] else []
        assert len(kept) == r["n_lines"] - r["n_removed"]
        it = iter(ls)  # subsequence check preserves order
        assert all(any(k == x for x in it) for k in kept)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(0, 1000, allow_nan=False), min_size=2, max_size=60))
def test_hist_quantile_estimates_are_monotone_and_bounded(xs):
    """Estimates are non-decreasing in q and within one bucket width of
    the exact NEAREST-RANK order statistic — the sketch's provable
    bound (an interpolated quantile can differ further by the gap
    between adjacent order statistics; hypothesis found the [0, 112]
    falsifier for the stronger interpolated claim)."""
    import math as _math

    from nasdaq_equity_airflow_ecs_pipeline_spark.functions.sketches import (
        hist_build,
        hist_quantiles,
    )

    spark = _get_spark()
    width = 50.0
    qs = [0.25, 0.5, 0.9]
    df = spark.createDataFrame([("g", float(x)) for x in xs], "g string, x double")
    h = hist_build(df, ["g"], "x", width)
    est = {
        r["q"]: r["est_quantile"]
        for r in hist_quantiles(h, ["g"], width, qs).collect()
    }
    assert est[0.25] <= est[0.5] <= est[0.9]
    s_xs = sorted(xs)
    for q in qs:
        r = max(1, _math.ceil(q * len(s_xs)))
        assert abs(est[q] - s_xs[r - 1]) <= width


_vocab = ["the", "spark", "join", "merge", "scan"]
_corpus = st.lists(
    st.lists(st.sampled_from(_vocab), min_size=0, max_size=5),
    min_size=1, max_size=6,
)
_query = st.lists(st.sampled_from(_vocab + ["absent"]), min_size=1, max_size=3)


@settings(max_examples=8, deadline=None)
@given(_corpus, _query)
def test_bm25_matches_python_reference(doc_words, query_words):
    """bm25_topk == an independent pure-Python BM25 with the same IEEE
    op order and integer quantization, on arbitrary tiny corpora —
    including empty docs (tokens('') == ['']) and query terms absent
    from the corpus (no posting -> no contribution)."""
    import math

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import bm25_topk

    spark = _get_spark()
    texts = [" ".join(ws) for ws in doc_words]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    qs = spark.createDataFrame(
        [(1, " ".join(query_words))], "query_id int, query_text string"
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["score_x1e6"], r["rank"])
        for r in bm25_topk(docs, qs, k=100).collect()
    }

    # independent reference (k1=1.2, b=0.75, same op order as the SQL)
    toks = [t.strip().split() if t.strip() else [""] for t in texts]
    n = len(toks)
    sum_dl = sum(len(ts) for ts in toks)
    avgdl = float(sum_dl) / float(n)
    dfreq: dict[str, int] = {}
    for ts in toks:
        for term in set(ts):
            dfreq[term] = dfreq.get(term, 0) + 1
    scores: dict[int, int] = {}
    for d, ts in enumerate(toks):
        s = 0
        for term in set(query_words):
            tf = ts.count(term)
            if tf == 0 or term not in dfreq:
                continue
            idf = (float(n) - float(dfreq[term]) + 0.5) / (float(dfreq[term]) + 0.5)
            sat = (float(tf) * 2.2) / (
                float(tf) + 1.2 * ((1.0 - 0.75) + 0.75 * (float(len(ts)) / avgdl))
            )
            s += math.floor(idf * sat * 1000000.0)
        if s or any(term in ts for term in query_words):
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = {
        (1, d): (s, i + 1) for i, (d, s) in enumerate(ranked)
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(_corpus, _query)
def test_bm25_prf_matches_python_reference(doc_words, query_words):
    """bm25_prf_topk == an independent pure-Python RM3-lite (same IEEE
    op order, same integer quantization and tie-breaks) on arbitrary
    tiny corpora — feedback selection, expansion-term ranking with
    string tie-break, weighted rescore, all replicated independently."""
    import math

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.retrieval import (
        bm25_prf_topk,
    )

    FB_K, N_EXP, W_ORIG, W_EXP = 2, 2, 2, 1
    spark = _get_spark()
    texts = [" ".join(ws) for ws in doc_words]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    qs = spark.createDataFrame(
        [(1, " ".join(query_words))], "query_id int, query_text string"
    )
    got = {
        r["doc_id"]: (r["score_x1e6"], r["rank"])
        for r in bm25_prf_topk(
            docs, qs, k=100, fb_k=FB_K, n_exp=N_EXP, w_orig=W_ORIG, w_exp=W_EXP
        ).collect()
    }

    # ---- independent reference ----
    toks = [t.strip().split() if t.strip() else [""] for t in texts]
    n = len(toks)
    sum_dl = sum(len(ts) for ts in toks)
    avgdl = float(sum_dl) / float(n)
    dfreq: dict[str, int] = {}
    for ts in toks:
        for term in set(ts):
            dfreq[term] = dfreq.get(term, 0) + 1

    def contrib(term, ts):
        tf = ts.count(term)
        if tf == 0 or term not in dfreq:
            return 0
        idf = (float(n) - float(dfreq[term]) + 0.5) / (float(dfreq[term]) + 0.5)
        sat = (float(tf) * 2.2) / (
            float(tf) + 1.2 * ((1.0 - 0.75) + 0.75 * (float(len(ts)) / avgdl))
        )
        return math.floor(idf * sat * 1000000.0)

    qterms = set(query_words)
    pass1 = {}
    for d, ts in enumerate(toks):
        if any(t in ts for t in qterms):
            pass1[d] = sum(contrib(t, ts) for t in qterms)
    fb = [d for d, _ in sorted(pass1.items(), key=lambda kv: (-kv[1], kv[0]))][:FB_K]

    cand: dict[str, int] = {}
    for d in fb:
        for term in set(toks[d]):
            if term in qterms:
                continue
            cand[term] = cand.get(term, 0) + toks[d].count(term)
    expansion = [
        t for t, _ in sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:N_EXP]

    weighted = {t: W_ORIG for t in qterms}
    weighted.update({t: W_EXP for t in expansion})
    pass2 = {}
    for d, ts in enumerate(toks):
        if any(t in ts for t in weighted):
            pass2[d] = sum(contrib(t, ts) * w for t, w in weighted.items())
    ranked = sorted(pass2.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = {d: (s, i + 1) for i, (d, s) in enumerate(ranked)}
    assert got == expected


# ---------------------------------------------------------------- r9 ops
_words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=5), min_size=1, max_size=10
)


@settings(max_examples=10, deadline=None)
@given(_words)
def test_bpe_local_matches_naive_reference(words):
    """bpe_train_local == a naive pure-Python BPE (recount every round,
    greedy leftmost fold, ties on the pair string) on arbitrary tiny
    corpora — the incremental pair-count/lazy-heap bookkeeping cannot
    drift from the textbook dynamics."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
        bpe_train_local,
    )

    spark = _get_spark()
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    got = [
        tuple(r)
        for r in bpe_train_local(docs, n_merges=8).orderBy("step").collect()
    ]

    freq: dict[str, int] = {}
    for w in words:
        freq[w] = freq.get(w, 0) + 1
    seqs = {w: list(w) for w in freq}
    expected = []
    for step in range(1, 9):
        counts: dict[str, int] = {}
        for w, f in freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                p = f"{s[i]} {s[i + 1]}"
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        a, b = best.split(" ", 1)
        expected.append((step, best, a + b, counts[best]))
        for w in seqs:
            s, out = seqs[w], []
            for t in s:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            seqs[w] = out
    assert got == expected


_docs_txt = st.lists(
    st.text(alphabet="xy", min_size=0, max_size=20), min_size=1, max_size=6
)


@settings(max_examples=10, deadline=None)
@given(_docs_txt)
def test_substring_apply_matches_naive_reference(texts):
    """substring_dedup_apply == a naive pure-Python implementation of
    its spec (non-overlapping window-4 tiling, canonical smallest
    (id, idx) copy kept, order-preserving rebuild, tail untouched) on
    arbitrary docs — including empty docs, all-identical docs, and
    within-doc repeats."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
        substring_dedup_apply,
    )

    w = 4
    spark = _get_spark()
    rows = [(i + 1, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["kept_text"], r["n_chunks"], r["n_removed"])
        for r in substring_dedup_apply(docs, window=w).collect()
    }

    owner: dict[str, tuple[int, int]] = {}
    chunks: dict[int, list[tuple[int, str]]] = {}
    for i, t in rows:
        n = len(t) // w
        chunks[i] = [(j, t[(j - 1) * w : j * w]) for j in range(1, n + 1)]
        for j, c in chunks[i]:
            if c not in owner or (i, j) < owner[c]:
                owner[c] = (i, j)
    expected = {}
    for i, t in rows:
        kept = [c for j, c in chunks[i] if owner[c] == (i, j)]
        n = len(chunks[i])
        expected[i] = ("".join(kept) + t[n * w :], n, n - len(kept))
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 2**20), min_size=2, max_size=10),
    st.data(),
)
def test_hamming_index_delta_matches_brute_force(seeds, data):
    """hamming_index_delta == brute-force pairs restricted to
    delta-touching ids, on hash families seeded with planted near-dups
    (each hash = a seed base or a <=2-bit perturbation of one) and an
    arbitrary standing/delta split — the banding+probe path can never
    miss below the band count (pigeonhole)."""
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.multimodal import (
        hamming_index_delta,
    )

    spark = _get_spark()
    hashes = []
    for i, s in enumerate(seeds):
        base = (s * 0x9E3779B97F4A7C15) & (2**63 - 1)
        flip = data.draw(st.integers(0, 3), label=f"flip{i}")
        h = base ^ ((1 << (s % 60)) if flip & 1 else 0) ^ (
            (1 << ((s // 7) % 60)) if flip & 2 else 0
        )
        hashes.append((i, h))
    n_delta = data.draw(
        st.integers(1, len(hashes) - 1), label="n_delta"
    )
    standing_rows = hashes[:-n_delta]
    delta_rows = hashes[-n_delta:]
    delta_ids = {i for i, _ in delta_rows}
    mk = lambda rows: _get_spark().createDataFrame(  # noqa: E731
        rows, "content_id long, ahash long"
    )
    if not standing_rows:
        return
    _folded, pairs = hamming_index_delta(
        mk(standing_rows), mk(delta_rows), max_hamming=3, n_bands=4
    )
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()}
    ham = lambda x, y: bin((x ^ y) & (2**64 - 1)).count("1")  # noqa: E731
    expected = {
        (a, b, ham(ha, hb))
        for (a, ha) in hashes
        for (b, hb) in hashes
        if a < b
        and ham(ha, hb) <= 3
        and (a in delta_ids or b in delta_ids)
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=2),
             min_size=3, max_size=15),
    st.lists(
        st.lists(st.text(alphabet="abcq", min_size=1, max_size=2),
                 min_size=1, max_size=8),
        min_size=1, max_size=4,
    ),
)
def test_kn_scores_match_python_reference(train_words, score_docs):
    """score_docs_kn == a pure-Python implementation of its quantized
    interpolated-KN spec (floor-quantized ppm tiers, D=3/4, smoothed
    continuation lower tier, bit-length surprisal, 20-bit cap) on
    arbitrary corpora — Python floats ARE IEEE doubles, so the
    reference floors the same values the JVM does."""
    import math

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators import lm_score

    spark = _get_spark()
    train = spark.createDataFrame(
        [(1, " ".join(train_words))], "doc_id long, text string"
    )
    corpus_rows = [(i + 10, " ".join(ws)) for i, ws in enumerate(score_docs)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    model = lm_score.train_kn_trigram_lm(train)
    got = {
        r["doc_id"]: (
            r["n_trigrams"], r["n_backoff"], r["n_oov"],
            r["sum_prob_ppm"], r["sum_bits"],
        )
        for r in lm_score.score_docs_kn(corpus, model).collect()
    }

    tg = list(zip(train_words, train_words[1:], train_words[2:]))
    c123: dict = {}
    for t in tg:
        c123[t] = c123.get(t, 0) + 1
    c12: dict = {}
    n1pp: dict = {}
    cont23: dict = {}
    cont2: dict = {}
    for (w1, w2, w3), c in c123.items():
        c12[(w1, w2)] = c12.get((w1, w2), 0) + c
        n1pp[(w1, w2)] = n1pp.get((w1, w2), 0) + 1
        cont23[(w2, w3)] = cont23.get((w2, w3), 0) + 1
    for (w2, _w3), c in cont23.items():
        cont2[w2] = cont2.get(w2, 0) + c
    v = len(set(train_words))

    expected = {}
    for i, ws in enumerate(score_docs):
        doc_id = i + 10
        trigs = list(zip(ws, ws[1:], ws[2:]))
        n = len(trigs)
        bo = oov = sppm = sbits = 0
        for t in trigs:
            w1, w2, w3 = t
            tc = c123.get(t, 0)
            ctx = c12.get((w1, w2), 0)
            npp = n1pp.get((w1, w2), 0)
            cb = cont23.get((w2, w3), 0)
            cc = cont2.get(w2, 0)
            pc = math.floor(1000000.0 * (cb + 1) / (cc + v))
            if ctx > 0:
                t1 = math.floor(
                    1000000.0 * max(4 * tc - 3, 0) / (4.0 * ctx)
                )
                t2 = math.floor((3 * npp * pc) * 1.0 / (4.0 * ctx))
                ppm = t1 + t2
            else:
                bo += 1
                ppm = pc
            if tc == 0 and cb == 0:
                oov += 1
            sppm += ppm
            sbits += (
                len(bin(math.floor(1000000.0 / ppm))) - 3 if ppm > 0 else 20
            )
        expected[doc_id] = (n, bo, oov, sppm, sbits)
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.text(alphabet="pqr", min_size=1, max_size=2),
                 min_size=0, max_size=25),
        min_size=1, max_size=5,
    )
)
def test_cdc_dedup_matches_naive_reference(doc_tokens):
    """cdc_dedup_apply == a pure-Python implementation of its spec
    (boundary after every token with hash31 % m == 0, boundary token
    ends its chunk, canonical smallest (id, chunk_id) survives,
    space-joined order-preserving rebuild) on arbitrary token lists —
    including empty docs and heavy duplication."""
    import hashlib

    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.lsh import (
        MERSENNE_P,
    )
    from nasdaq_equity_airflow_ecs_pipeline_spark.operators.text import (
        cdc_dedup_apply,
    )

    m = 4
    spark = _get_spark()
    rows = [(i + 1, " ".join(ts)) for i, ts in enumerate(doc_tokens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["kept_text"], r["n_chunks"], r["n_removed"])
        for r in cdc_dedup_apply(docs, m=m).collect()
    }

    def h31(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % MERSENNE_P

    chunks: dict[int, list[str]] = {}
    for i, ts in [(i + 1, ts) for i, ts in enumerate(doc_tokens)]:
        out, cur = [], []
        for t in ts:
            if not t:
                continue
            cur.append(t)
            if h31(t) % m == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        chunks[i] = out
    owner: dict[str, tuple[int, int]] = {}
    for i, cs in chunks.items():
        for j, c in enumerate(cs):
            if c not in owner or (i, j) < owner[c]:
                owner[c] = (i, j)
    expected = {}
    for i, cs in chunks.items():
        kept = [c for j, c in enumerate(cs) if owner[c] == (i, j)]
        expected[i] = (" ".join(kept), len(cs), len(cs) - len(kept))
    assert got == expected
