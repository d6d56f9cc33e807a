"""Flesch readability signals (operators/readability.py): hand-
computed arithmetic, the vowel-group syllable heuristic, and the
empty/guard paths."""

from __future__ import annotations

from nasdaq_equity_airflow_ecs_pipeline_spark.operators.readability import (
    readability_stats,
)


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return readability_stats(df).collect()[0]


def test_hand_computed_example(spark):
    # "the cat sat." -> 3 words, 1 sentence, 3 syllables
    r = _one(spark, "the cat sat.")
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
    # fre_x1000 = 206835 - 1015*3//1 - 84600*3//3 = 206835 - 3045 - 84600
    assert r["fre_x1000"] == 206835 - 3045 - 84600
    assert r["fkgl_x1000"] == 390 * 3 // 1 + 11800 * 3 // 3 - 15590


def test_syllable_vowel_groups(spark):
    # beautiful -> eau|i|u = 3 groups; rhythm -> y = 1; strengths -> e = 1
    r = _one(spark, "beautiful rhythm strengths.")
    assert r["n_syllables"] == 3 + 1 + 1
    # no-vowel word floors at 1
    r = _one(spark, "tsk tsk.")
    assert r["n_syllables"] == 2


def test_sentences_and_guards(spark):
    r = _one(spark, "one two? three four! five six. seven")
    assert r["n_sentences"] == 4  # trailing fragment counts as a segment
    # no terminal punctuation at all: guard keeps the division defined
    r = _one(spark, "just words no dots")
    assert r["n_sentences"] == 1
    # longer sentences -> lower ease, higher grade (monotonicity spot)
    short = _one(spark, "a b. c d. e f.")
    long = _one(spark, "a b c d e f g h i j k l.")
    assert short["fre_x1000"] > long["fre_x1000"]
    assert short["fkgl_x1000"] < long["fkgl_x1000"]
