"""ManifestTable: the ACID commit protocol under the band index.

Pins the four guarantees the module promises — atomic visibility, optimistic
concurrency (exactly one winner per version), snapshot isolation for readers,
and content-preserving compaction — plus the dedup wiring on top.
"""

from __future__ import annotations

import os

from pyspark.sql import Row

from map_reduce_in_go_spark.sources.manifest_table import ManifestTable


def _df(spark, ids):
    return spark.createDataFrame([Row(doc_id=i, band_idx=0, band_hash=f"h{i}") for i in ids])


def test_append_is_atomic_and_cumulative(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    assert tbl.version() == -1
    assert tbl.overwrite(_df(spark, [1, 2])) == 0
    assert tbl.append(_df(spark, [3])) == 1
    got = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert got == [1, 2, 3]


def test_uncommitted_files_invisible(spark, tmp_path):
    """A data file without a manifest entry must not be read."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1]))
    # simulate a writer that crashed after landing data, before committing
    stray = os.path.join(tbl._data_dir, "deadbeef-00000.parquet")
    _df(spark, [99]).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s"))
    part = next(
        p for p in os.listdir(str(tmp_path / "s")) if p.endswith(".parquet")
    )
    os.rename(str(tmp_path / "s" / part), stray)
    assert sorted(r["doc_id"] for r in tbl.read(spark).collect()) == [1]


def test_commit_race_single_winner(spark, tmp_path):
    """Two writers targeting the same version: exactly one v1 exists and the
    retry path folds both appends into the final state."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1]))
    # writer A commits v1 out from under writer B's read-modify-write
    a_files = tbl._write_data_files(_df(spark, [2]))
    b_files = tbl._write_data_files(_df(spark, [3]))
    live = tbl._manifest(0)["files"]
    assert tbl._try_commit(1, live + a_files, op="append")  # A wins v1
    assert not tbl._try_commit(1, live + b_files, op="append")  # B loses v1
    # B's retry (as ManifestTable.append does) recomputes on the new state
    assert tbl._try_commit(2, tbl._manifest(1)["files"] + b_files, op="append")
    got = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert got == [1, 2, 3]


def test_snapshot_isolation(spark, tmp_path):
    """A reader constructed before an append keeps its version's view."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1, 2]))
    snap = tbl.read(spark)  # resolves v0's file list now
    tbl.append(_df(spark, [3]))
    assert sorted(r["doc_id"] for r in snap.collect()) == [1, 2]
    assert sorted(r["doc_id"] for r in tbl.read(spark).collect()) == [1, 2, 3]


def test_compact_dedups_and_preserves_content(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1, 2]))
    tbl.append(_df(spark, [2, 3]))  # doc 2's band re-appended
    assert tbl.read(spark).count() == 4
    v = tbl.compact(spark, dedup_cols=["doc_id", "band_idx", "band_hash"])
    assert v == 2
    assert len(tbl.files()) == 1  # coalesced
    got = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert got == [1, 2, 3]  # duplicate row collapsed, content intact


def test_vacuum_removes_only_dead_files(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1, 2]))
    tbl.append(_df(spark, [3]))
    tbl.compact(spark)
    n_data = len(
        [f for f in os.listdir(tbl._data_dir) if f.endswith(".parquet")]
    )
    # default retention horizon protects fresh files (a concurrent writer
    # may have landed them ahead of its commit) ...
    assert tbl.vacuum() == 0
    # ... while an explicit zero horizon reclaims everything dead
    removed = tbl.vacuum(retain_seconds=0)
    assert removed == n_data - len(tbl.files())
    assert sorted(r["doc_id"] for r in tbl.read(spark).collect()) == [1, 2, 3]


def test_acid_dedup_matches_plain_two_batch(spark, sf_dir):
    """Storage protocols must not change semantics: the manifest-log twin
    returns row-identical survivors to the plain-parquet sequence."""
    from map_reduce_in_go_spark.functions.caching import release_persisted
    from map_reduce_in_go_spark.operators import dedup as d

    plain = sorted(
        (r["batch"], r["doc_id"])
        for r in d.dedup_incremental_two_batch(spark, sf_dir).collect()
    )
    release_persisted()
    acid = sorted(
        (r["batch"], r["doc_id"])
        for r in d.dedup_incremental_acid(spark, sf_dir).collect()
    )
    release_persisted()
    assert acid == plain


def test_threaded_concurrent_appends_all_land(spark, tmp_path):
    """N threads append concurrently through the optimistic-retry path:
    every append must win some version and every row must be readable."""
    import threading

    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [0]))
    errors = []

    def worker(i):
        try:
            ManifestTable(tbl.root).append(_df(spark, [100 + i]))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert tbl.version() == 4  # v0 overwrite + 4 appends, no lost commits
    got = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert got == [0, 100, 101, 102, 103]


def test_compact_retries_over_concurrent_append(spark, tmp_path):
    """An append landing while compaction rewrites must not be lost: compact
    detects the moved base version and redoes the rewrite on the new state."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1, 2]))
    orig = tbl._write_data_files
    state = {"injected": False}

    def sneaky(df):
        names = orig(df)
        if not state["injected"]:
            state["injected"] = True
            # a concurrent appender lands AFTER compact read its base
            ManifestTable(tbl.root).append(_df(spark, [9]))
        return names

    tbl._write_data_files = sneaky
    tbl.compact(spark)
    got = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert got == [1, 2, 9], "append landed mid-compaction was lost"


def test_schema_evolution_merge_read(spark, tmp_path):
    """A later append may add columns; merge_schema reads surface them with
    nulls on pre-evolution rows, and the default read still works."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1, 2]))
    evolved = spark.createDataFrame(
        [Row(doc_id=3, band_idx=0, band_hash="h3", source="crawl-2")]
    )
    tbl.append(evolved)
    merged = tbl.read(spark, merge_schema=True)
    assert "source" in merged.columns
    by_id = {r["doc_id"]: r["source"] for r in merged.collect()}
    assert by_id[3] == "crawl-2" and by_id[1] is None
    # default read stays usable on the original columns
    assert tbl.read(spark).select("doc_id").count() == 3
