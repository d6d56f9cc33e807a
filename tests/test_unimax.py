"""UniMax allocation (operators/curation.py:unimax_allocation, Chung
et al. 2023): waterfill invariants, both branches (capped and
uniform), and the deliberate budget under-fill when every group caps."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.curation import (
    unimax_allocation,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_waterfill_exact_hand_arithmetic(spark):
    # token counts: a=2, b=6, c=12; budget = 20*9//10 = 18; cap = 1 epoch
    d = _docs(
        spark,
        [
            (1, "a", "x x"),
            (2, "b", "x x x x x x"),
            (3, "c", "x x x x x x x x x x x x"),
        ],
    )
    got = {
        r["grp"]: (r["n_tokens"], r["cap"], r["alloc"], r["epochs_x100"])
        for r in unimax_allocation(d, "lang").collect()
    }
    # asc by cap: a first (share 18//3=6, cap 2 -> 2), b (share 16//2=8,
    # cap 6 -> 6), c (share 10//1=10, cap 12 -> 10, uncapped)
    assert got == {
        "a": (2, 2, 2, 100),
        "b": (6, 6, 6, 100),
        "c": (12, 12, 10, 83),
    }


def test_all_capped_underfills_budget(spark):
    d = _docs(spark, [(1, "a", "x x"), (2, "b", "x x x")])
    rows = unimax_allocation(
        d, "lang", budget_num=9, budget_den=10, epoch_cap_x100=50
    ).collect()
    # caps: 1 and 1 (floor of half an epoch); budget 4 -> total alloc 2
    assert all(r["alloc"] == r["cap"] for r in rows)
    assert sum(r["alloc"] for r in rows) == 2  # < budget 4: under-filled
    # floor arithmetic: 1 of 2 tokens = 0.50 epochs, 1 of 3 = 0.33
    assert {r["grp"]: r["epochs_x100"] for r in rows} == {"a": 50, "b": 33}


def test_invariants_on_corpus(spark, sf_dir):
    from nasdaq_equity_airflow_ecs_pipeline_spark.sources.tables import load_table

    rows = unimax_allocation(load_table(spark, sf_dir, "documents"), "lang").collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = total * 9 // 10
    assert all(r["alloc"] <= r["cap"] for r in rows)
    assert sum(r["alloc"] for r in rows) <= budget
    # fairness: every group is either at its cap or got at least as much
    # as any other group's allocation minus rounding slack (L)
    mx = max(r["alloc"] for r in rows)
    for r in rows:
        assert r["alloc"] == r["cap"] or r["alloc"] >= mx - len(rows)
    # shares sum to ~1e9 (floor rounding loses < L quanta)
    s = sum(r["share_x1e9"] for r in rows)
    assert 1_000_000_000 - len(rows) <= s <= 1_000_000_000
