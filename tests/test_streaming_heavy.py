"""Streaming CMS rollup: ledgered batches, mergeability, sketch-aware
compaction, exact parity with the batch heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_in_go_spark.operators.approx import heavy_hitters
from map_reduce_in_go_spark.sources.manifest_table import ManifestTable
from map_reduce_in_go_spark.sources.tables import load_table
from map_reduce_in_go_spark.streaming.heavy import (
    compact_sketches,
    heavy_batch,
    trending_exact,
)


def test_stream_sketch_rollup_equals_batch_exact(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tbl = ManifestTable(str(tmp_path / "sketches"))

    # three micro-batches, one replay
    for i in range(3):
        assert heavy_batch(spark, docs.filter(F.pmod("doc_id", F.lit(3)) == i), tbl, i)
    assert heavy_batch(spark, docs.limit(5), tbl, 1) is False  # ledgered replay
    assert tbl.read(spark).count() == 3

    want = {(r["word"], r["cnt"]) for r in heavy_hitters(spark, sf_dir).collect()}
    got = {(r["word"], r["cnt"]) for r in trending_exact(spark, tbl, docs).collect()}
    assert got == want and got

    # sketch-aware compaction: one row, identical answer
    compact_sketches(spark, tbl)
    assert tbl.read(spark).count() == 1
    again = {(r["word"], r["cnt"]) for r in trending_exact(spark, tbl, docs).collect()}
    assert again == want

    # a fourth batch lands on the compacted store and still folds in:
    # duplicate every doc once more → all counts double, same hitters set
    for i in range(3):
        assert heavy_batch(spark, docs.filter(F.pmod("doc_id", F.lit(3)) == i), tbl, 10 + i)
    doubled_docs = docs.unionAll(docs)
    got2 = {(r["word"], r["cnt"]) for r in trending_exact(spark, tbl, doubled_docs).collect()}
    assert got2 == {(w, 2 * c) for w, c in want}


def test_compact_cas_retries_on_concurrent_append(spark, sf_dir, tmp_path):
    """The r7-advice race, pinned: a heavy_batch landing between
    compaction's fold and its overwrite must NOT be silently discarded
    (its op is already ledgered, so the loss would be permanent).
    compact_sketches CASes on its base version and refolds; the late
    batch's tokens survive into trending_exact."""
    from map_reduce_in_go_spark.streaming import heavy

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tbl = ManifestTable(str(tmp_path / "sketches"))
    heavy_batch(spark, docs.filter(F.pmod("doc_id", F.lit(2)) == 0), tbl, 0)

    late = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)
    real_merged = heavy._merged_state
    fired = {"n": 0}

    def race_merged(sp, t, version=None):
        state = real_merged(sp, t, version)
        if fired["n"] == 0:  # inject the concurrent append AFTER the fold
            fired["n"] += 1
            heavy_batch(sp, late, t, 1)
        return state

    heavy._merged_state = race_merged
    try:
        compact_sketches(spark, tbl)
    finally:
        heavy._merged_state = real_merged

    assert fired["n"] == 1  # the race actually happened
    # compaction retried on the new base: nothing lost, answer == batch-exact
    want = {(r["word"], r["cnt"]) for r in heavy_hitters(spark, sf_dir).collect()}
    got = {(r["word"], r["cnt"]) for r in trending_exact(spark, tbl, docs).collect()}
    assert got == want and got
