"""Bradley-Terry fitting (operators/preference.py): pure-Python twin
parity, the two-player closed form, dominance ordering, and the
deterministic zero-win floor."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.preference import (
    BT_SCALE,
    bradley_terry,
)


def _fit_py(matches: list[tuple[str, str]], rounds: int = 8):
    """Pure-Python twin of the fixed-point MM iteration."""
    from collections import Counter, defaultdict

    n: Counter = Counter()
    wins: Counter = Counter()
    players = set()
    for w, l in matches:
        players.update((w, l))
        n[(min(w, l), max(w, l))] += 1
        wins[w] += 1
    players = sorted(players)
    p = {x: BT_SCALE // len(players) for x in players}
    opp = defaultdict(list)
    for (i, j), c in n.items():
        opp[i].append((j, c))
        opp[j].append((i, c))
    for _ in range(rounds):
        t = {
            x: sum(c * BT_SCALE // max(p[x] + p[o], 1) for o, c in opp[x])
            for x in players
        }
        raw = {x: wins[x] * BT_SCALE // max(t[x], 1) for x in players}
        s = max(sum(raw.values()), 1)
        p = {x: raw[x] * BT_SCALE // s for x in players}
    return p, dict(wins)


def _df(spark, matches):
    return spark.createDataFrame(matches, "winner string, loser string")


def test_matches_python_twin(spark):
    matches = (
        [("a", "b")] * 3 + [("b", "a")] * 1 + [("b", "c")] * 2
        + [("c", "a")] * 1 + [("a", "c")] * 2
    )
    got = {
        r["player"]: (r["wins"], r["games"], r["p_x1e6"])
        for r in bradley_terry(_df(spark, matches)).collect()
    }
    p, wins = _fit_py(matches)
    games = {"a": 7, "b": 6, "c": 5}
    assert got == {
        x: (wins.get(x, 0), games[x], p[x]) for x in ("a", "b", "c")
    }


def test_two_player_closed_form(spark):
    # A beats B 3 of 4: BT closed form p_a/(p_a+p_b) = 3/4
    rows = bradley_terry(
        _df(spark, [("a", "b")] * 3 + [("b", "a")])
    ).collect()
    p = {r["player"]: r["p_x1e6"] for r in rows}
    # normalized: p_a ~ 750000, p_b ~ 250000 (within fixed-point quanta)
    assert abs(p["a"] - 750_000) < 100
    assert abs(p["b"] - 250_000) < 100


def test_dominance_ordering_and_rank(spark):
    # a beats everyone, b beats c/d, c beats d
    matches = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]
    rows = bradley_terry(_df(spark, matches)).collect()
    byrank = [r["player"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert byrank == ["a", "b", "c", "d"]
    p = {r["player"]: r["p_x1e6"] for r in rows}
    assert p["a"] > p["b"] > p["c"] >= p["d"]


def test_zero_win_player_floors_to_zero(spark):
    rows = bradley_terry(_df(spark, [("a", "b"), ("a", "b")])).collect()
    p = {r["player"]: r["p_x1e6"] for r in rows}
    assert p["b"] == 0 and p["a"] == BT_SCALE
