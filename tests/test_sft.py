"""SFT data prep (operators/sft.py): per-rule violations, keep-first
dedup semantics, and the loss-mask span arithmetic."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.sft import (
    sft_chat_render,
    sft_dedup,
    sft_loss_mask,
    sft_pack_loss_spans,
    sft_quality_flags,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id bigint, prompt string, response string"
    )


GOOD = (1, "explain the quarterly revenue numbers", "revenue rose by ten "
        "percent on strong demand and lower costs overall")


def test_each_rule_violated_in_isolation(spark):
    rows = [
        GOOD,
        (2, "hi there", GOOD[2]),                      # prompt too short
        (3, GOOD[1], "too short"),                     # response too short
        (4, " ".join(["w"] * 30), " ".join(["x"] * 5)),  # ratio: 4*5 < 30
        (5, GOOD[1], GOOD[1] + " plus an extra tail here okay"),  # echo
    ]
    got = {
        r["pair_id"]: (
            r["ok_prompt_len"], r["ok_response_len"], r["ok_ratio"],
            r["ok_no_echo"], r["keep"],
        )
        for r in sft_quality_flags(_pairs(spark, rows)).collect()
    }
    assert got[1] == (True, True, True, True, True)
    assert got[2] == (False, True, True, True, False)
    assert got[3] == (True, False, True, True, False)
    assert got[4] == (True, True, False, True, False)
    assert got[5] == (True, True, True, False, False)


def test_dedup_is_keep_first_on_normalized_prompt(spark):
    rows = [
        GOOD,
        (7, "Explain   THE quarterly revenue numbers".lower(), GOOD[2]),
        (9, GOOD[1].upper(), GOOD[2]),
        (8, "a different question entirely about costs", GOOD[2]),
    ]
    # normalization: lowercase + collapsed whitespace -> 1, 7, 9 share a key
    out = sorted(r["pair_id"] for r in sft_dedup(_pairs(spark, rows)).collect())
    assert out == [1, 8]


def test_loss_mask_spans_partition_the_render(spark):
    rows = [GOOD]
    render = sft_chat_render(_pairs(spark, rows)).collect()[0]
    n_prompt = len(GOOD[1].split())
    n_resp = len(GOOD[2].split())
    # the render's whitespace-token count equals the manifest total
    assert render["n_tokens"] == len(render["chat_text"].split())
    assert render["n_tokens"] == 4 + n_prompt + n_resp  # 2 headers x 2 tokens
    spans = sorted(
        (r["seg"], r["start_tok"], r["end_tok"], r["trainable"])
        for r in sft_loss_mask(_pairs(spark, rows)).collect()
    )
    assert spans == [
        (0, 0, 4 + n_prompt, False),
        (1, 4 + n_prompt, 4 + n_prompt + n_resp, True),
    ]
    # contiguity: the trained span starts where the mask ends and the
    # union covers [0, n_tokens)
    assert spans[0][2] == spans[1][1] and spans[1][2] == render["n_tokens"]


def test_packed_loss_spans_tile_and_straddle(spark):
    # pairs long enough that rendered chats straddle seq_len=16
    rows = [
        (i, " ".join(f"p{i}w{j}" for j in range(5)),
         " ".join(f"r{i}w{j}" for j in range(11)))
        for i in range(6)
    ]
    pairs = _pairs(spark, rows)
    L = 16
    out = sft_pack_loss_spans(pairs, seq_len=L, num_shards=2).collect()
    renders = {
        r["pair_id"]: (r["n_tokens"], r["mask_end"])
        for r in sft_chat_render(pairs).collect()
    }
    # per pair: spans reconstruct [0, n_tokens) with the right
    # trainability split at mask_end (global coords = seq_id*L + local)
    from collections import defaultdict

    per_pair = defaultdict(list)
    seqs = defaultdict(list)
    for r in out:
        assert 0 <= r["begin_tok"] < r["end_tok"] <= L
        per_pair[r["pair_id"]].append(
            (r["seq_id"] * L + r["begin_tok"],
             r["seq_id"] * L + r["end_tok"], r["trainable"])
        )
        seqs[(r["shard"], r["seq_id"])].append(
            (r["begin_tok"], r["end_tok"])
        )
    for pid, spans in per_pair.items():
        spans.sort()
        n_tok, mask_end = renders[pid]
        total = sum(e - b for b, e, _t in spans)
        assert total == n_tok
        base = spans[0][0]
        masked = sum(e - b for b, e, t in spans if not t)
        assert masked == mask_end
        # trainability flips exactly once, at base + mask_end
        flip = [b for b, _e, t in spans if t]
        assert min(flip) == base + mask_end
    # sequences tile: spans within one training sequence never overlap
    for _k, ss in seqs.items():
        ss.sort()
        for (b1, e1), (b2, _e2) in zip(ss, ss[1:]):
            assert e1 <= b2
    # straddling really occurs
    assert any(len(v) > 2 for v in per_pair.values())
