"""Punctuated-corpus oracle check for the quality-score family.

The driver's testdata documents contain ZERO `[.,!?;:]` characters, so the
punctuation-ratio term of the quality score was never exercised by the
sf0.01 gate — an oracle that silently dropped the term would still pass
(r8 ADVICE found exactly that bug in corpus_report's oracle). This fixture
synthesizes a corpus where every quality component (length cap, distinct
ratio, punct ratio) takes a non-trivial value and replays the Spark query
against its DuckDB oracle on it.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tools.check_correctness import compare

PUNCT_KEYS = ["corpus_report", "text_quality", "quality_normalized"]


@pytest.fixture(scope="module")
def punct_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("punctsf")
    rows = []
    texts = [
        "hello, world! this is a short doc.",
        "no punctuation at all in this one just plain words",
        "lots!!! of??? punctuation;;; here::: truly, many, commas,",
        "repeat repeat repeat repeat repeat repeat.",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z.",
        "the quick brown fox jumps over the lazy dog; twice: once, again!",
        "hello, world! this is a short doc.",  # exact duplicate of doc 0
        "mixed: some punct. and some plain words in between, ok?",
    ]
    for i, t in enumerate(texts):
        rows.append(
            {
                "doc_id": i,
                "text": t,
                "lang": "en" if i % 2 == 0 else "de",
                "source": "web" if i < 4 else "books",
                "n_chars": len(t),
            }
        )
    pd.DataFrame(rows).to_parquet(str(root / "documents.parquet"))
    return str(root)


@pytest.mark.parametrize("key", PUNCT_KEYS)
def test_punctuated_corpus_oracle(spark, punct_dir, key):
    sdf = entry_mod.queries()[key](spark, punct_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{punct_dir}/documents.parquet'"
    )
    odf = con.execute(entry_mod.oracle_sql()[key]).df()
    con.close()
    assert len(sdf) > 0
    problems = compare(key, sdf, odf)
    assert not problems, problems


def test_punct_term_is_live(spark, punct_dir):
    """The punctuation component must actually move the score: the all-punct
    doc scores strictly below the same-length plain doc."""
    q = entry_mod.queries()["text_quality"](spark, punct_dir).toPandas()
    by_id = q.set_index("doc_id")["quality"]
    assert by_id[2] < by_id[1]
