"""Streaming ingestion dedup against the durable manifest-log band index.

The streaming form of the daily-crawl shape (operators/dedup.py
``dedup_incremental_two_batch``): documents arrive as a stream, each
micro-batch is near-dup-checked against the *standing* band index, survivors
land in an idempotent parquet zone, and their bands are appended to the
index — so the next micro-batch dedups against everything that ever
survived. State that outlives the stream lives in the index table, not the
state store: a restarted (or re-deployed, or scaled-out) query picks up
exactly where the table is, and a backfill batch job can share the same
index concurrently — not just without lost commits (the manifest
protocol) but with *serializable dedup*: each batch's append is a CAS on
the version its probe read, and a conflict re-probes the racer's delta
files before retrying, so racing writers can never both keep a shared
near-duplicate (see :func:`ingest_batch`).

Exactly-once discipline (Spark's foreachBatch is at-least-once): the output
zone is per-batch-id overwrite (streaming/sinks.py), and the index append is
tagged ``ingest-batch-<id>`` in the manifest log — a replayed batch whose
append already committed is detected via ``committed_ops()`` and skipped
*before* recomputing survivors. Ordering matters: recomputing after the
append would find the batch's own bands in the index and drop every doc as
a self-collision. This is the same appId/version transaction-ledger pattern
Delta sinks use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.caching import (
    free_local_checkpoint,
    persisted_count,
    release_persisted_since,
)
from ..operators.dedup import bands_of_docs, dedup_batch_against_bands
from ..sources.manifest_table import CommitConflict, ManifestTable
from .sinks import write_batch_idempotent


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    tbl: ManifestTable,
    out_dir: str,
    batch_id: int,
    app_id: str = "ingest",
    max_files: int | None = None,
) -> bool:
    """Process one micro-batch; returns False if skipped as a replay.

    Write order is load-bearing: survivors land in the (idempotent) output
    zone BEFORE the index append commits, so every crash point replays
    safely — before the append: recompute sees an unchanged index and
    rewrites identical output; after it: the ledger check skips the batch.

    The ledger op carries ``app_id`` alongside the batch id (Delta's
    (appId, version) transaction key): two writers sharing one index — the
    advertised stream + backfill shape — must use distinct app_ids, or a
    later writer's batch 0 would be mistaken for a replay of the first
    writer's batch 0 and silently skipped.

    Bootstrap is an ``append`` too: on an empty table append commits v0
    with just this batch's files, and if a concurrent writer bootstraps
    first the optimistic retry folds both — an ``overwrite`` here would
    discard the racer's committed bands.

    Cross-writer dedup is serializable, not best-effort: the batch's index
    append is a compare-and-swap on the version the probe read
    (``expected_version``), so if a concurrent writer (the advertised
    backfill shape) commits between our probe and our append, the CAS
    fails and we re-probe the *delta files only* — the racer's bands —
    before retrying. Without this, two racing writers each probing a
    snapshot that lacks the other's bands would both keep their copies of
    a shared near-duplicate. Cost stays batch-shaped: the common case is
    one CAS that lands, and a conflict re-probes survivors against only
    the files added since the last probe (a compaction swap degrades to a
    full re-probe, which is rare and still batch × index, never corpus²).

    Caches created for this batch (the probe's persisted signature/band
    frames and the survivors checkpoint) are released before returning —
    a long-running stream must not accumulate per-batch storage.
    """
    op = f"{app_id}-batch-{batch_id}"
    if op in tbl.committed_ops():
        return False
    mark = persisted_count()
    from ..functions.caching import scoped_persist
    from ..operators.dedup import MAX_PROBE_KEYS

    batch_bands = scoped_persist(bands_of_docs(batch_df))
    probed_v = tbl.version()
    if probed_v < 0:
        old_bands = spark.createDataFrame([], "band_idx int, band_hash string")
    elif tbl.stats_cols:
        # stats-probed read: with band_hash skipping stats and the in-loop
        # compaction keeping a hash-sorted layout, each micro-batch scans
        # only the index files its probe keys can hit — the shape that
        # keeps per-batch cost flat as the standing index grows for years
        probes = [
            r["band_hash"]
            for r in batch_bands.select("band_hash").distinct().limit(
                MAX_PROBE_KEYS + 1
            ).collect()
        ]
        if len(probes) > MAX_PROBE_KEYS:
            old_bands = tbl.read(spark, probed_v)  # huge batch: prune is moot
        else:
            old_bands = tbl.read_pruned_in(spark, "band_hash", probes, probed_v)
    else:
        old_bands = tbl.read(spark, probed_v)
    survivors = dedup_batch_against_bands(
        batch_df, old_bands, batch_bands=batch_bands
    ).localCheckpoint(eager=True)
    committed = False
    for _ in range(10):
        cur_v = tbl.version()
        if cur_v != probed_v:
            # a racer committed since our probe: dedup the remaining
            # survivors against just the bands it added, then CAS again
            try:
                prev = set(tbl.files(probed_v)) if probed_v >= 0 else set()
            except FileNotFoundError:
                prev = set()  # log truncated by a checkpoint; full re-probe
            delta = [f for f in tbl.files(cur_v) if f not in prev]
            if delta:
                remaining = batch_df.join(survivors, "doc_id", "left_semi")
                superseded = survivors
                survivors = dedup_batch_against_bands(
                    remaining, spark.read.parquet(*delta)
                ).localCheckpoint(eager=True)
                free_local_checkpoint(superseded)
            probed_v = cur_v
            continue
        surviving_docs = batch_df.join(survivors, "doc_id", "left_semi")
        write_batch_idempotent(
            surviving_docs.select("doc_id", "text"), batch_id, out_dir
        )
        try:
            tbl.append(bands_of_docs(surviving_docs), op=op, expected_version=probed_v)
            committed = True
            break
        except CommitConflict:
            continue  # loop re-reads the version and probes the delta
    if not committed:
        release_persisted_since(mark)
        free_local_checkpoint(survivors)
        raise CommitConflict(
            f"batch {batch_id} re-probed 10 times without landing its append "
            f"at {tbl.root}; Spark will retry the batch"
        )
    if max_files is not None and len(tbl.files()) > max_files:
        # maintenance rides the ingest loop: every append adds a file set,
        # so a long-running stream would otherwise accumulate thousands of
        # small files and slow every probe's scan. Compaction is just
        # another commit (replay-safe: rewriting the same live rows twice
        # is content-idempotent), so no ledger entry is needed.
        tbl.compact(
            spark,
            dedup_cols=["doc_id", "band_idx", "band_hash"],
            # a stats-enabled index recovers its hash-sorted (pruning-
            # tight) layout with the same rewrite it was paying anyway
            num_files=8 if tbl.stats_cols else 1,
            zorder_cols=["band_hash"] if tbl.stats_cols else None,
        )
    release_persisted_since(mark)
    free_local_checkpoint(survivors)
    return True


def ingest_batch_txn(
    spark: SparkSession,
    batch_df: DataFrame,
    cat,
    batch_id: int,
    app_id: str = "ingest",
) -> bool:
    """:func:`ingest_batch` as ONE multi-table catalog transaction.

    The single-table form needs a separate idempotent landing zone for
    survivors plus the index append, stitched together by write order and
    a ledger. With :class:`~..sources.catalog.TableCatalog` the accepted
    corpus IS a member table: each micro-batch appends surviving docs to
    ``corpus`` and their bands to ``band_index`` and publishes both in one
    atomic catalog CAS — a reader can never observe a doc whose bands
    aren't probeable (or vice versa), at any crash point.

    Exactly-once falls out of the catalog ledger alone: the commit is
    tagged ``<app_id>-batch-<id>`` and replays are detected from
    *published catalog commits* — a crash after the member appends but
    before the catalog CAS leaves only orphan member versions, so the
    replay recomputes and stages fresh ones (content-identical; the
    orphans age out of member vacuums). On a CAS conflict (a racing
    backfill writer) the batch re-plans against the new snapshot with a
    full re-probe — survivors were derived from the old snapshot, so this
    is the serializable behavior; the delta-only re-probe optimization of
    :func:`ingest_batch` applies the same way if the conflict rate ever
    warrants it.
    """
    from ..sources.catalog import CommitConflict as _Conflict

    op = f"{app_id}-batch-{batch_id}"
    if op in cat.committed_ops():
        return False
    for _ in range(10):
        mark = persisted_count()
        txn = cat.transaction(spark)
        try:
            old_bands = txn.read("band_index")
        except KeyError:
            old_bands = spark.createDataFrame([], "band_idx int, band_hash string")
        survivors = dedup_batch_against_bands(batch_df, old_bands).localCheckpoint(
            eager=True
        )
        kept = batch_df.join(survivors, "doc_id", "left_semi")
        txn.append("corpus", kept.select("doc_id", "text"), op=op)
        txn.append("band_index", bands_of_docs(kept), op=op)
        try:
            txn.commit(op=op)
            return True
        except _Conflict:
            continue  # re-plan on the new catalog snapshot
        finally:
            release_persisted_since(mark)
            free_local_checkpoint(survivors)
    raise CommitConflict(
        f"batch {batch_id} lost the catalog race 10 times at {cat.root}; "
        "Spark will retry the batch"
    )


def start_dedup_ingest_txn(
    stream_docs: DataFrame,
    catalog_root: str,
    checkpoint_dir: str,
    app_id: str = "ingest",
):
    """documents stream → per-batch multi-table transactions on a catalog."""
    from ..sources.catalog import TableCatalog

    spark = stream_docs.sparkSession
    cat = TableCatalog(catalog_root)
    return (
        stream_docs.writeStream.foreachBatch(
            lambda df, bid: ingest_batch_txn(spark, df, cat, bid, app_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_dedup_ingest(
    stream_docs: DataFrame,
    index_root: str,
    out_dir: str,
    checkpoint_dir: str,
    app_id: str = "ingest",
    max_files: int | None = 64,
):
    """documents stream → dedup-vs-index → idempotent survivors + index growth.

    ``max_files`` bounds the index's file count via in-loop compaction
    (None disables); the default keeps probe scans flat over an unbounded
    stream of small batches.
    """
    spark = stream_docs.sparkSession
    tbl = ManifestTable(index_root)
    return (
        stream_docs.writeStream.foreachBatch(
            lambda df, bid: ingest_batch(
                spark, df, tbl, out_dir, bid, app_id, max_files
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
