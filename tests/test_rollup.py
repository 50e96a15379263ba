"""Incremental additive rollup: exactly-once ledger, fold == batch plan,
CAS compaction keeps the answer and bounds the table."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_in_go_spark.operators.wordcount import wordcount
from map_reduce_in_go_spark.sources.manifest_table import ManifestTable
from map_reduce_in_go_spark.sources.tables import load_table
from map_reduce_in_go_spark.streaming import rollup
from map_reduce_in_go_spark.functions.text import tokens


def _words(docs):
    return docs.select(F.explode(tokens(F.col("text"))).alias("word"))


def test_incremental_wordcount_equals_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tbl = ManifestTable(str(tmp_path / "wc_view"))

    for i in range(3):
        batch = docs.filter(F.pmod("doc_id", F.lit(3)) == i)
        assert rollup.rollup_batch(
            _words(batch), tbl, i, ["word"], {"cnt": "1"}, app_id="wc"
        )
    # replay: ledger blocks the duplicate contribution
    assert (
        rollup.rollup_batch(_words(docs.limit(7)), tbl, 1, ["word"], {"cnt": "1"},
                            app_id="wc")
        is False
    )

    want = {(r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()}
    got = {
        (r["word"], r["cnt"])
        for r in rollup.rollup_query(spark, tbl, ["word"], ["cnt"]).collect()
    }
    assert got == want and got

    # compaction: one row per key, same answer, later batches still fold
    n_keys = len(want)
    rollup.compact_rollup(spark, tbl, ["word"], ["cnt"])
    assert tbl.read(spark).count() == n_keys
    again = {
        (r["word"], r["cnt"])
        for r in rollup.rollup_query(spark, tbl, ["word"], ["cnt"]).collect()
    }
    assert again == want

    # every doc lands once more -> all counts exactly double
    for i in range(3):
        batch = docs.filter(F.pmod("doc_id", F.lit(3)) == i)
        assert rollup.rollup_batch(
            _words(batch), tbl, 10 + i, ["word"], {"cnt": "1"}, app_id="wc"
        )
    doubled = {
        (r["word"], r["cnt"])
        for r in rollup.rollup_query(spark, tbl, ["word"], ["cnt"]).collect()
    }
    assert doubled == {(w, 2 * c) for w, c in want}


def test_compact_rollup_cas_survives_concurrent_append(spark, sf_dir, tmp_path):
    """A batch landing mid-compaction must survive (CAS + refold)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tbl = ManifestTable(str(tmp_path / "wc_view"))
    rollup.rollup_batch(
        _words(docs.filter(F.pmod("doc_id", F.lit(2)) == 0)),
        tbl, 0, ["word"], {"cnt": "1"}, app_id="wc",
    )
    late = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)

    real_read = tbl.read
    fired = {"n": 0}

    def racing_read(spark_, version=None, merge_schema=False):
        df = real_read(spark_, version, merge_schema)
        if fired["n"] == 0:
            fired["n"] += 1
            rollup.rollup_batch(
                _words(late), tbl, 1, ["word"], {"cnt": "1"}, app_id="wc"
            )
        return df

    tbl.read = racing_read
    try:
        rollup.compact_rollup(spark, tbl, ["word"], ["cnt"])
    finally:
        tbl.read = real_read

    assert fired["n"] == 1
    want = {(r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()}
    got = {
        (r["word"], r["cnt"])
        for r in rollup.rollup_query(spark, tbl, ["word"], ["cnt"]).collect()
    }
    assert got == want


def test_streaming_wordcount_view_matches_batch(spark, sf_dir, tmp_path):
    """A real Structured Streaming query (file source, availableNow)
    maintains the view; after the stream drains — and after a RESTART
    replaying from the checkpoint — the fold equals batch wordcount."""
    import json

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    drops = tmp_path / "drops"
    drops.mkdir()
    rows = docs.collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        with open(drops / f"part-{i}.json", "w") as fh:
            for r in rows[i * third : (i + 1) * third]:
                fh.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(drops))
    )
    view_root = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    q = rollup.start_wordcount_rollup(stream, view_root, ckpt, compact_every=2)
    q.awaitTermination(180)
    q.stop()

    want = {(r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()}
    tbl = ManifestTable(view_root)
    got = {
        (r["word"], r["cnt"])
        for r in rollup.rollup_query(spark, tbl, ["word"], ["cnt"]).collect()
    }
    assert got == want and got

    # restart over the same source + checkpoint: no new contributions
    v = tbl.version()
    q2 = rollup.start_wordcount_rollup(stream, view_root, ckpt, compact_every=2)
    q2.awaitTermination(180)
    q2.stop()
    again = {
        (r["word"], r["cnt"])
        for r in rollup.rollup_query(spark, tbl, ["word"], ["cnt"]).collect()
    }
    assert again == want
    assert tbl.version() == v  # nothing replayed into the ledger
