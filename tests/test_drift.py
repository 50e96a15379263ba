"""Streaming embedding-drift view: fold == batch operator, exactly-once
ledger, compaction keeps the answer, and the real Structured Streaming
wiring survives a restart without double-counting."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from map_reduce_in_go_spark.operators.similarity import embedding_centroids
from map_reduce_in_go_spark.sources.manifest_table import ManifestTable
from map_reduce_in_go_spark.sources.tables import load_table
from map_reduce_in_go_spark.streaming import drift


def _rows(df):
    return {
        (r["label"], r["dim"]): (r["n_vecs"], r["centroid"], r["second_moment"])
        for r in df.collect()
    }


def test_incremental_drift_equals_batch(spark, sf_dir, tmp_path):
    vecs = load_table(spark, sf_dir, "embeddings")
    tbl = ManifestTable(str(tmp_path / "drift_view"))

    for i in range(3):
        batch = vecs.filter(F.pmod("vec_id", F.lit(3)) == i)
        assert drift.drift_batch(batch, tbl, i)
    # ledger blocks a replayed batch id before any recompute
    assert drift.drift_batch(vecs.limit(7), tbl, 1) is False

    want = _rows(embedding_centroids(spark, sf_dir))
    got = _rows(drift.drift_view(spark, tbl))
    assert got == want and got

    # compaction: O(labels × dims) rows, identical answer
    drift.compact_rollup(spark, tbl, drift.DRIFT_KEYS, drift.DRIFT_SUMS)
    assert tbl.read(spark).count() == len(want)
    assert _rows(drift.drift_view(spark, tbl)) == want


def test_drift_stream_restart_replay(spark, sf_dir, tmp_path):
    """The real writeStream wiring: run, wipe the CHECKPOINT (forcing a
    full source replay), run again — the op ledger keeps every batch's
    contribution exactly-once, so the view still equals the batch plan."""
    drops = tmp_path / "drops"
    drops.mkdir()
    vecs = load_table(spark, sf_dir, "embeddings")
    vecs.write.parquet(str(drops / "b0.parquet"))
    view_root = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = drift.start_embedding_drift_rollup(
            spark.readStream.schema(vecs.schema).parquet(str(drops / "*.parquet")),
            view_root,
            ckpt,
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    shutil.rmtree(ckpt)  # lose streaming progress: source replays batch 0
    run_once()

    want = _rows(embedding_centroids(spark, sf_dir))
    got = _rows(drift.drift_view(spark, ManifestTable(view_root)))
    assert got == want and got
