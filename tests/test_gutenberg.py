"""True reference-parity integration: wordcount over the reference's own
input corpus (the Project Gutenberg texts shipped with map-reduce-in-go),
checked against an independent pure-Python implementation of the
reference's Map/Reduce semantics (wordcount.go:10-32).

The reference files are read as INPUT DATA only.
"""

from __future__ import annotations

import collections
import os

import pytest
from pyspark.sql import functions as F

from map_reduce_in_go_spark.functions.text import tokens
from map_reduce_in_go_spark.sources.text import read_lines, read_text_files

PG = "/root/reference/pg-being_ernest.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PG), reason="reference corpus not present"
)

TRIM = ".,!?\"':;()"


def _py_wordcount(path: str) -> dict[str, int]:
    counts: collections.Counter[str] = collections.Counter()
    with open(path, encoding="utf-8") as fh:
        for word in fh.read().split():
            word = word.strip(TRIM).lower()
            if word:
                counts[word] += 1
    return dict(counts)


def test_wordcount_matches_reference_semantics_on_gutenberg(spark):
    expected = _py_wordcount(PG)
    got_rows = (
        read_lines(spark, PG)
        .select(F.explode(tokens(F.col("line"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    got = {r["w"]: r["count"] for r in got_rows}
    assert got == expected
    assert got["the"] > 500  # sanity: it's real prose


def test_whole_file_reader_roundtrip(spark):
    df = read_text_files(spark, PG)
    row = df.first()
    assert row["filename"].endswith("pg-being_ernest.txt")
    with open(PG, encoding="utf-8") as fh:
        assert row["contents"] == fh.read()
