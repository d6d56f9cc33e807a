"""Prefix-filtered exact Jaccard join (operators/prefix_join.py).

The load-bearing claim is LOSSLESSNESS: prefix + size filtering prunes
candidate generation only, so the final pair set must be row-identical
to the unfiltered exact join at every threshold. The second claim is
that the pruning is real — far fewer candidates than the all-shared-
shingles join on a boilerplate-heavy corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nasdaq_equity_airflow_ecs_pipeline_spark.operators import lsh, prefix_join


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _pairs(df_result):
    return {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 12)
        for r in df_result.collect()
    }


@pytest.mark.parametrize("threshold", [0.1, 0.2, 0.5, 0.8])
def test_prefix_join_matches_exact_join(spark, threshold):
    """Row-identical to ngram_jaccard_pairs (no cap) at several
    thresholds — the losslessness theorem, checked end to end."""
    rows = [
        ("d1", "alpha beta gamma delta epsilon zeta"),
        ("d2", "alpha beta gamma delta epsilon eta"),
        ("d3", "alpha beta gamma theta iota kappa"),
        ("d4", "completely different text with no overlap at all here"),
        ("d5", "alpha beta gamma delta epsilon zeta"),  # exact dup of d1
        ("d6", "one two"),  # fewer than n tokens -> no shingles
    ]
    df = _corpus(spark, rows)
    exact = _pairs(lsh.ngram_jaccard_pairs(df, threshold=threshold))
    pref = _pairs(prefix_join.jaccard_prefix_pairs(df, threshold=threshold))
    assert pref == exact
    if threshold <= 0.2:
        assert ("d1", "d5") in pref and pref[("d1", "d5")] == 1.0


def test_prefix_candidates_prune_boilerplate(spark):
    """On a corpus where every doc shares a boilerplate header, the raw
    shingle join makes all O(N^2) pairs; prefix filtering must generate
    strictly fewer candidates (the header lands outside every prefix)
    while still finding the one true near-dup pair."""
    n_docs = 30
    header = "terms of service apply to all users of this site"
    body = " ".join(f"w{{i}}x{j}" for j in range(15))
    rows = [
        (f"b{i:02d}", f"{header} " + body.replace("{i}", str(i)))
        for i in range(n_docs)
    ]
    rows.append(("dupA", "the quick brown fox jumps over the lazy dog tonight"))
    rows.append(("dupB", "the quick brown fox jumps over the lazy dog today"))
    df = _corpus(spark, rows)

    cand = prefix_join.prefix_candidates(df, threshold=0.5).count()
    sh = lsh._exploded_shingles(df, "doc_id", "text", 3, None)
    all_pairs = (
        sh.alias("l")
        .join(
            sh.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select("l.doc_id", "r.doc_id")
        .distinct()
        .count()
    )
    # every boilerplate doc pairs with every other via the header
    assert all_pairs >= (n_docs * (n_docs - 1)) // 2
    assert cand < all_pairs / 4
    got = _pairs(prefix_join.jaccard_prefix_pairs(df, threshold=0.5))
    assert set(got) == {("dupA", "dupB")}


def test_positional_filter_strictly_reduces_candidates(spark):
    """PPJoin's positional filter on the real documents table must
    (a) keep candidates a subset of the prefix+size-only set, (b) prune
    substantially (measured r6: 867 -> 28 at t=0.5 on sf0.001 — a 30x
    cut of the verify-stage fan-out), and (c) leave the verified pair
    output unchanged vs the unfiltered exact join (losslessness)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = 0.5
    loose = prefix_join.prefix_candidates(docs, threshold=t, positional=False)
    tight = prefix_join.prefix_candidates(docs, threshold=t, positional=True)
    loose_set = {(r["id_a"], r["id_b"]) for r in loose.collect()}
    tight_set = {(r["id_a"], r["id_b"]) for r in tight.collect()}
    assert tight_set <= loose_set
    assert len(tight_set) < len(loose_set) / 4
    exact = _pairs(lsh.ngram_jaccard_pairs(docs, threshold=t))
    got = _pairs(prefix_join.jaccard_prefix_pairs(docs, threshold=t))
    assert got == exact
    # every qualifying pair is still a candidate (no false negatives)
    assert set(exact) <= tight_set


def test_prefix_join_empty_and_tiny_docs(spark):
    """Docs below the shingle width and an empty-result corpus do not
    crash and produce no pairs."""
    df = _corpus(spark, [("a", "x y"), ("b", ""), ("c", "p q r")])
    assert prefix_join.jaccard_prefix_pairs(df, threshold=0.2).count() == 0


def test_prefix_shingles_sizes_and_bound(spark):
    """Prefix length is exactly s - ceil(t*s) + 1 per doc and carries the
    doc's full distinct-shingle count (the verify stage's denominators)."""
    df = _corpus(spark, [("a", "w1 w2 w3 w4 w5 w6 w7")])  # 5 shingles
    pre = prefix_join.prefix_shingles(df, threshold=0.5).collect()
    # s=5, ceil(0.5*5)=3 -> prefix 5-3+1=3
    assert len(pre) == 3
    assert all(r["n_sh"] == 5 for r in pre)
