"""Bradley-Terry preference-strength fitting (Bradley & Terry 1952)
via Zermelo's fixed-point / MM iteration (Hunter 2004, "MM algorithms
for generalized Bradley-Terry models") — the estimator behind pairwise
preference data everywhere in LLM work: reward-model data audits,
Chatbot-Arena-style model rankings, annotator calibration.

Model: P(i beats j) = p_i / (p_i + p_j). The MM update
``p_i' = w_i / sum_j n_ij / (p_i + p_j)`` (w_i = total wins for i,
n_ij = games between i and j) monotonically increases the likelihood;
normalizing each round pins the scale.

Fixed-point discipline (the train_logreg_fixed_point convention,
operators/classifier.py): strengths are BIGINTs in units of
1/BT_SCALE, every division is a truncating integer div, and rounds are
fully unrolled in the DuckDB oracle — bit-identical cross-engine.
Zero-division guards (``greatest(.., 1)``) are part of the defined
arithmetic and mirrored in the oracle; a player whose win rate
quantizes below 1/BT_SCALE honestly floors to strength 0 (Zermelo's
assumptions require every player to win sometimes — the operator
degrades deterministically instead).

Scale shape: matches collapse ONCE to the pair match matrix (one
hash-agg, localCheckpoint-pinned — at 100 TB the matrix is bounded by
the PLAYER universe squared, and the player universe — models,
policies, annotators — is an artifact, not a corpus). Each round is
two broadcast joins of the player-bounded strength table onto the
matrix, one player-keyed hash-agg, and one empty-frame window over
player-bounded rows (the mixture_weights convention). Nothing per-
round touches the raw match log.

Reference parity: the reference is a row-level OHLCV ETL with no
preference surface; engine-extension surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BT_SCALE = 1_000_000
BT_ROUNDS = 8


def match_matrix(matches: DataFrame) -> DataFrame:
    """(winner, loser) rows -> the unordered pair matrix
    (i, j, n, wi) with i < j, n games, wi wins for i. One hash-agg."""
    return (
        matches.select(
            F.least("winner", "loser").alias("i"),
            F.greatest("winner", "loser").alias("j"),
            "winner",
        )
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("winner") == F.col("i"), 1).otherwise(0)
            ).cast("bigint").alias("wi"),
        )
    )


def match_matrix_delta(
    standing: DataFrame, delta_matches: DataFrame
) -> DataFrame:
    """Fold a delta match batch into a standing pair matrix — the
    incremental-index twin (the domain_stats_delta discipline): the
    matrix is a MONOID (n and wi add per unordered pair), so the fold
    is one delta-sized aggregation full-outer-merged onto the standing
    artifact, and refitting the folded matrix EQUALS the full rebuild
    over the union exactly (not approximately — pinned by the
    q_bradley_terry_delta oracle, which IS the full-rebuild SQL)."""
    d = match_matrix(delta_matches).select(
        "i", "j", F.col("n").alias("_dn"), F.col("wi").alias("_dw")
    )
    return standing.join(d, ["i", "j"], "full_outer").select(
        "i",
        "j",
        (
            F.coalesce(F.col("n"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).cast("bigint").alias("n"),
        (
            F.coalesce(F.col("wi"), F.lit(0))
            + F.coalesce(F.col("_dw"), F.lit(0))
        ).cast("bigint").alias("wi"),
    )


def bradley_terry_fit(mat: DataFrame, rounds: int = BT_ROUNDS) -> DataFrame:
    """Fit strengths from a pair matrix (i, j, n, wi) — the standing-
    artifact entry point the incremental twin refits. Wins and games
    derive from the matrix (wins_i = sum wi as i + sum (n - wi) as j),
    so a folded matrix carries everything the fit needs."""
    mat = mat.localCheckpoint(eager=True)
    persp = mat.select(
        F.col("i").alias("player"), F.col("j").alias("opp"), "n"
    ).unionByName(
        mat.select(F.col("j").alias("player"), F.col("i").alias("opp"), "n")
    )
    wins = (
        mat.select(F.col("i").alias("player"), F.col("wi").alias("_w"))
        .unionByName(
            mat.select(
                F.col("j").alias("player"),
                (F.col("n") - F.col("wi")).alias("_w"),
            )
        )
        .groupBy("player")
        .agg(F.sum("_w").cast("bigint").alias("w"))
        .filter(F.col("w") > 0)
    )
    players = persp.select("player").distinct()
    n_players = players.count()  # bounded artifact: the player universe
    games = persp.groupBy("player").agg(
        F.sum("n").cast("bigint").alias("games")
    )
    p = players.select(
        "player", F.lit(BT_SCALE // max(n_players, 1)).cast("bigint").alias("p")
    ).localCheckpoint(eager=True)
    w_all = Window.partitionBy()
    for _ in range(rounds):
        t = (
            persp.join(F.broadcast(p), "player")
            .join(
                F.broadcast(
                    p.select(F.col("player").alias("opp"), F.col("p").alias("po"))
                ),
                "opp",
            )
            .groupBy("player")
            .agg(
                F.sum(
                    F.expr(f"(n * {BT_SCALE}) div greatest(p + po, 1)")
                ).cast("bigint").alias("t")
            )
        )
        raw = t.join(wins, "player", "left").select(
            "player",
            F.expr(
                f"(coalesce(w, 0) * {BT_SCALE}) div greatest(t, 1)"
            ).cast("bigint").alias("praw"),
        )
        p = (
            raw.withColumn(
                "s", F.greatest(F.sum("praw").over(w_all), F.lit(1).cast("bigint"))
            )
            .select(
                "player",
                F.expr(f"(praw * {BT_SCALE}) div s").cast("bigint").alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    w_rank = Window.orderBy(F.desc("p_x1e6"), F.asc("player"))
    return (
        players.join(wins, "player", "left")
        .join(games, "player")
        .join(p, "player")
        .select(
            "player",
            F.coalesce("w", F.lit(0)).cast("bigint").alias("wins"),
            "games",
            F.col("p").alias("p_x1e6"),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
    )


def bradley_terry(matches: DataFrame, rounds: int = BT_ROUNDS) -> DataFrame:
    """Fit Bradley-Terry strengths from (winner, loser) match rows.
    Returns (player, wins, games, p_x1e6, rank) — strengths normalized
    to sum (up to floor loss) to BT_SCALE, rank by strength descending
    (ties to the lexicographically smaller player)."""
    return bradley_terry_fit(match_matrix(matches), rounds=rounds)
