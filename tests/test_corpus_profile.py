"""corpus_profile: the one-pass per-column table profiler."""

from __future__ import annotations

import os

from map_reduce_in_go_spark.operators.pipeline import PROFILE_COLS, corpus_profile
from map_reduce_in_go_spark.sources.tables import load_table


def test_profile_matches_direct_compute(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = {r["col_name"]: r for r in corpus_profile(spark, sf_dir).collect()}
    assert set(rows) == set(PROFILE_COLS)
    n = docs.count()
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    langs = [r["lang"] for r in docs.select("lang").collect()]
    assert rows["doc_id"]["n_rows"] == n
    assert rows["doc_id"]["n_distinct"] == len(set(ids))
    # min/max are aggregated on the NATIVE type, rendered to string after:
    # numeric columns order numerically (min of [0..499] is "0", not "0"
    # vs lexicographic trap "1" < "0"? — pin via direct compute)
    assert rows["doc_id"]["min_val"] == str(min(ids))
    assert rows["doc_id"]["max_val"] == str(max(ids))
    assert rows["lang"]["n_distinct"] == len(set(langs))
    assert rows["lang"]["sum_len"] == sum(len(v) for v in langs if v is not None)


def test_profile_null_accounting(spark, tmp_path):
    """NULLs count into n_null, stay out of n_distinct/min/max/sum_len —
    and an all-NULL column yields NULL min/max with sum_len 0, not a crash."""
    d = os.path.join(str(tmp_path), "sf")
    os.makedirs(d)
    df = spark.createDataFrame(
        [
            (1, "aa", None, "s1", 2),
            (2, None, None, "s2", None),
            (3, "b", None, "s1", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    rows = {r["col_name"]: r for r in corpus_profile(spark, d).collect()}
    assert rows["text"]["n_null"] == 1
    assert rows["text"]["n_distinct"] == 2
    assert rows["text"]["min_val"] == "aa"
    assert rows["text"]["max_val"] == "b"
    assert rows["text"]["sum_len"] == 3
    assert rows["n_chars"]["n_null"] == 1
    assert rows["n_chars"]["min_val"] == "2"  # numeric min, not lexicographic
    assert rows["lang"]["n_null"] == 3
    assert rows["lang"]["n_distinct"] == 0
    assert rows["lang"]["min_val"] is None
    assert rows["lang"]["sum_len"] == 0


def test_profile_is_one_scan(spark, sf_dir):
    """The plan reads documents ONCE: a single aggregate over one scan
    (Expand amplifies rows inside it for the exact multi-distinct), not a
    per-column or per-stat fan-out of jobs like df.summary()."""
    plan = corpus_profile(spark, sf_dir)._jdf.queryExecution().optimizedPlan()
    assert plan.collectLeaves().size() == 1


def test_profile_table_generalizes(spark, sf_dir):
    """profile_table points the same one-pass shape at any table —
    lineitem here — and an array column profiles via its rendering."""
    from map_reduce_in_go_spark.operators.pipeline import profile_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    rows = {r["col_name"]: r for r in profile_table(li).collect()}
    n = li.count()
    assert rows["l_returnflag"]["n_rows"] == n
    flags = [r["l_returnflag"] for r in li.select("l_returnflag").collect()]
    assert rows["l_returnflag"]["n_distinct"] == len(set(flags))
    assert rows["l_returnflag"]["min_val"] == min(flags)

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    erows = {r["col_name"]: r for r in profile_table(emb).collect()}
    assert erows["embedding"]["n_distinct"] > 0
    assert erows["embedding"]["sum_len"] > 0
