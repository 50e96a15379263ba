"""Property-style parity: Spark tokenizer == reference Map semantics on
adversarial random strings (one batched DataFrame, not per-example runs)."""

from __future__ import annotations

import random
import string

from pyspark.sql import Row
from pyspark.sql import functions as F

from map_reduce_in_go_spark.engine import WordCountMapper
from map_reduce_in_go_spark.functions.text import tokens

ALPHABET = (
    string.ascii_letters + string.digits + ".,!?\"':;()" + "  \t\n" + "—-_@#&*"
)


def _random_text(rng: random.Random) -> str:
    return "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 80)))


def test_tokenizer_parity_on_random_strings(spark):
    rng = random.Random(42)
    cases = [_random_text(rng) for _ in range(500)]
    cases += [
        "",
        " ",
        "...",
        "(()).,!?",
        "a",
        "don't",
        "A.B.C",
        "x\ty\nz",
        "''''",
        "))((",
        "word.",
        ".word",
        ".word.",
    ]
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(cases)])
    got_rows = df.select("i", tokens(F.col("t")).alias("toks")).collect()
    got = {r["i"]: list(r["toks"]) for r in got_rows}
    mapper = WordCountMapper()
    for i, t in enumerate(cases):
        expected = [k for k, _ in mapper.map(f"{i}.txt", t)]
        assert got[i] == expected, (i, t, got[i], expected)
