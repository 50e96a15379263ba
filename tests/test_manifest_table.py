"""ManifestTable: the ACID commit protocol under the band index.

Pins the four guarantees the module promises — atomic visibility, optimistic
concurrency (exactly one winner per version), snapshot isolation for readers,
and content-preserving compaction — plus the dedup wiring on top.
"""

from __future__ import annotations

import pytest

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


def test_crashed_commit_leaves_log_usable(spark, tmp_path):
    """A writer that dies mid-manifest-write must not wedge the table.

    Manifests are published via temp-write + fsync + os.link, so the only
    artifact of a crash between open and link is an inert temp file that no
    reader pattern matches — never an empty v<N>.json that would make
    version() report a state json.load can't read.
    """
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1]))
    # simulate the crash window: payload partially on disk, never linked
    with open(os.path.join(tbl._log_dir, "_tmp_deadbeef"), "w") as f:
        f.write('{"version": 99, "op":')
    assert tbl.version() == 0
    assert sorted(r["doc_id"] for r in tbl.read(spark).collect()) == [1]
    assert tbl.append(_df(spark, [2])) == 1  # table not wedged


def test_publish_loser_leaves_no_debris(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1]))
    assert not tbl._publish_log_file("v0.json", "{}")  # loses to the commit
    leftovers = [n for n in os.listdir(tbl._log_dir) if n.startswith("_tmp_")]
    assert leftovers == []
    assert tbl._manifest(0)["files"]  # winner's content untouched


def test_checkpoint_truncates_log_preserving_ops_and_state(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"), checkpoint_interval=None)
    tbl.overwrite(_df(spark, [1]), op="batch-0")
    for i in range(2, 5):
        tbl.append(_df(spark, [i]), op=f"batch-{i - 1}")
    assert tbl.checkpoint() == 3
    manifests = [n for n in os.listdir(tbl._log_dir) if n.startswith("v")]
    assert manifests == ["v3.json"], "older per-version manifests truncated"
    # state, history, and subsequent commits all survive truncation
    assert sorted(r["doc_id"] for r in tbl.read(spark).collect()) == [1, 2, 3, 4]
    assert tbl.committed_ops() == {"batch-0", "batch-1", "batch-2", "batch-3"}
    tbl.append(_df(spark, [5]), op="batch-4")
    assert tbl.version() == 4
    assert "batch-4" in tbl.committed_ops() and "batch-0" in tbl.committed_ops()


def test_auto_checkpoint_bounds_log_listing(spark, tmp_path):
    """With an interval set, the log never accumulates unbounded manifests —
    the O(1)-listing property the Delta paper's checkpoints exist for."""
    tbl = ManifestTable(str(tmp_path / "t"), checkpoint_interval=3)
    tbl.overwrite(_df(spark, [0]))
    for i in range(1, 8):
        tbl.append(_df(spark, [i]))
    log = os.listdir(tbl._log_dir)
    manifests = [n for n in log if n.startswith("v")]
    assert len(manifests) <= 3  # newest checkpointed version .. head, not 8
    assert len([n for n in log if n.startswith("checkpoint-")]) == 1
    got = sorted(r["doc_id"] for r in tbl.read(spark).collect())
    assert got == list(range(8))


def test_vacuum_retention_protects_active_snapshot(spark, tmp_path):
    """A reader inside the retention window keeps a readable snapshot even
    after compaction rewrites the live file set."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1, 2]))
    snap = tbl.read(spark)  # resolves v0's files
    tbl.compact(spark)  # v1 swaps in fresh files; v0's are now dead
    assert tbl.vacuum() == 0  # default horizon: dead-but-fresh files retained
    assert sorted(r["doc_id"] for r in snap.collect()) == [1, 2]
    # outside the window (simulated with horizon 0) the dead files go away —
    # the documented point at which old snapshots stop being readable
    assert tbl.vacuum(retain_seconds=0) > 0
    assert sorted(r["doc_id"] for r in tbl.read(spark).collect()) == [1, 2]


def test_default_read_schema_is_pinned_to_manifest(spark, tmp_path):
    """After additive evolution, the default read's column set comes from
    the commit-time schema in the manifest — deterministic, not whichever
    data file Spark happens to sample."""
    tbl = ManifestTable(str(tmp_path / "t"))
    tbl.overwrite(_df(spark, [1, 2]))
    evolved = spark.createDataFrame(
        [Row(doc_id=3, band_idx=0, band_hash="h3", source="crawl-2")]
    )
    tbl.append(evolved)
    got = tbl.read(spark)
    assert got.columns == evolved.columns  # newest commit's schema, exactly
    by_id = {r["doc_id"]: r["source"] for r in got.collect()}
    assert by_id[3] == "crawl-2" and by_id[1] is None


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


@pytest.mark.slow
def test_replace_files_random_op_sequences(spark, tmp_path):
    """Model-based check of the copy-on-write primitive: 30 seeded-random
    commits mixing appends, subset replaces (filtered rewrites), and pure
    deletes; after every commit the table equals an in-memory row model,
    and point-set pruning stays SOUND (kept files ⊇ files whose content
    holds a probe) while stats survive commits that kept files by
    reference."""
    import random

    from map_reduce_in_go_spark.sources.manifest_table import ManifestTable

    rng = random.Random(20260815)
    tbl = ManifestTable(str(tmp_path / "t"), stats_cols=["k"])
    model: dict[int, int] = {}  # k -> v (keys unique by construction)
    next_k = 0

    def _df(rows):
        return spark.createDataFrame(rows or [(-1, -1)], "k long, v long").filter(
            "k >= 0"
        ).coalesce(1)

    for step in range(30):
        op = rng.choice(["append", "append", "replace", "delete"])
        if op == "append" or tbl.version() < 0 or not tbl.files():
            rows = [(next_k + i, rng.randrange(1000)) for i in range(rng.randrange(1, 6))]
            next_k += len(rows)
            tbl.append(_df(rows))
            model.update(dict(rows))
        else:
            files = tbl.files()
            pick = rng.sample(files, k=rng.randrange(1, len(files) + 1))
            picked_rows = {
                r["k"]: r["v"]
                for r in spark.read.parquet(*pick).collect()
            }
            if op == "delete":
                tbl.replace_files(pick, None)
                for k in picked_rows:
                    model.pop(k)
            else:
                # rewrite the subset: drop a random half, bump the rest
                survivors = {
                    k: v + 1 for k, v in picked_rows.items() if rng.random() < 0.5
                }
                tbl.replace_files(pick, _df(sorted(survivors.items())))
                for k in picked_rows:
                    model.pop(k)
                model.update(survivors)
        got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
        assert got == model, f"content diverged at step {step} ({op})"
        # pruning soundness on a random probe set
        if model:
            probes = rng.sample(sorted(model), k=min(3, len(model)))
            kept, total = tbl.files_pruned_in("k", probes)
            holding = set()
            for f in tbl.files():
                ks = {r["k"] for r in spark.read.parquet(f).select("k").collect()}
                if ks & set(probes):
                    holding.add(f)
            assert holding <= set(kept), f"pruning dropped a holding file at {step}"
