"""Tokenization + wordcount parity with the reference semantics.

Mirrors map_reduce/wordcount_test.go: the mapper example ("the quick brown
fox") and reducer counting cases, plus corpus-level invariants.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from map_reduce_in_go_spark.engine import WordCountMapper, WordCountReducer
from map_reduce_in_go_spark.functions.text import normalize_token, shingles, tokens
from map_reduce_in_go_spark.operators.wordcount import wordcount, wordcount_topk


def _tok(spark, text: str) -> list[str]:
    df = spark.createDataFrame([Row(t=text)])
    return df.select(tokens(F.col("t")).alias("x")).first()["x"]


def test_tokenize_reference_example(spark):
    # wordcount_test.go:11-21
    assert _tok(spark, "the quick brown fox") == ["the", "quick", "brown", "fox"]


def test_tokenize_trim_and_lower(spark):
    # wordcount.go:15 — Trim(".,!?\"':;()") then ToLower
    assert _tok(spark, 'Hello, "World!" (really); DON\'T.') == [
        "hello",
        "world",
        "really",
        "don't",
    ]


def test_tokenize_empty_after_trim_dropped(spark):
    assert _tok(spark, "... !! (()) word") == ["word"]


def test_normalize_token_matches_python_mapper(spark):
    samples = ["Word.", "(nested)", "it's", "A;", "''", "!?", "ok"]
    df = spark.createDataFrame([Row(t=s) for s in samples])
    got = [r["n"] for r in df.select(normalize_token(F.col("t")).alias("n")).collect()]
    expected = [s.strip(WordCountMapper.TRIM).lower() for s in samples]
    assert got == expected


def test_python_mapper_reducer_reference_cases():
    m, r = WordCountMapper(), WordCountReducer()
    assert list(m.map("test.txt", "the quick brown fox")) == [
        ("the", "1"),
        ("quick", "1"),
        ("brown", "1"),
        ("fox", "1"),
    ]
    assert r.reduce("fox", ["1"]) == "1"
    assert r.reduce("the", ["1", "1", "1"]) == "3"


def test_shingles(spark):
    df = spark.createDataFrame([Row(t="a b c d"), Row(t="a b"), Row(t="")])
    got = [r["s"] for r in df.select(shingles(F.col("t")).alias("s")).collect()]
    assert got == [["a b c", "b c d"], [], []]


def test_wordcount_totals(spark, sf_dir):
    wc = wordcount(spark, sf_dir)
    total_from_counts = wc.agg(F.sum("cnt")).first()[0]
    from map_reduce_in_go_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    total_tokens = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("n")
    ).first()["n"]
    assert total_from_counts == total_tokens > 0


def test_topk_is_prefix_of_full_ordering(spark, sf_dir):
    full = wordcount(spark, sf_dir).orderBy(F.desc("cnt"), F.asc("word")).collect()
    top = wordcount_topk(spark, sf_dir).collect()
    assert top == full[: len(top)]
