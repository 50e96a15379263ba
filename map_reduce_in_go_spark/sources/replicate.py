"""Cross-catalog replication: ship committed transactions to a replica,
exactly-once, from the catalog ledger alone (r11 (b)).

The disaster-recovery / multi-region posture for the incremental-corpus
pipeline (streaming/corpus_pipeline.py) — and for any
:class:`~.catalog.TableCatalog`: the primary's catalog log already IS a
totally-ordered ledger of multi-table transactions (one op-labelled
catalog version per commit, each pinning every member's exact version),
so replication needs no side channel, no CDC stream, and no coordination
with writers. :func:`replicate_catalog` walks that ledger and re-applies
each not-yet-shipped commit to the replica as ONE transaction carrying
the SAME op label:

- **Exactly-once from the ledger alone.** A commit ships only if its op
  label is absent from the replica's own ledger; re-running replication
  (or racing two replicators — the loser's CAS conflicts and re-walks)
  never double-applies. This is the same replay discipline the
  pipeline's batches use, pointed across catalogs.
- **Deltas, not snapshots.** For each member the primary's manifest diff
  between the commit and its predecessor decides the replay verb: only
  added files → read just those files and APPEND; any removed file (an
  overwrite/rewrite) → read the member at its pinned version and
  OVERWRITE; member gone from the snapshot → DROP. Steady-state batch
  replication therefore moves O(batch) bytes, not O(corpus).
- **Transactionality preserved.** All member changes of one primary
  commit land in one replica catalog CAS — a replica reader sees the
  same consistent multi-member snapshots the primary's readers saw,
  never a corpus row whose bands haven't arrived.
- **Data-skipping stats preserved.** Each member's ``stats_cols`` are
  recovered from the primary's manifest stats, so pruned point probes
  (band/gram/word lookups) keep working on the replica.

Truncation horizon: catalog checkpoints (ManifestTable.checkpoint)
truncate per-version manifests below the newest checkpoint — op labels
survive, per-commit pins do not. A commit whose PREDECESSOR manifest is
gone can't be diffed; it is replayed as a BASE SYNC (every member
overwritten from that snapshot — correct from any replica state, just
not incremental). Replicate at least every ``checkpoint_interval``
commits (default 16), or build the catalog with
``checkpoint_interval=None``, to stay on the delta path.

Out of scope, honestly: the replica is a FOLLOWER (replication is its
only writer). Active-active catalogs need op-label namespacing across
writers, which the pipeline's ``<app_id>-batch-<id>`` labels provide but
this verb does not enforce.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .catalog import CommitConflict, TableCatalog
from .manifest_table import ManifestTable

__all__ = ["replicate_catalog"]


def _member_stats_cols(manifest: dict) -> list[str] | None:
    """Stats columns the primary recorded for this member version —
    the union of per-file stats keys in its manifest."""
    cols = sorted({c for st in manifest.get("stats", {}).values() for c in st})
    return cols or None


def _read_member(
    spark: SparkSession, tbl: ManifestTable, pin: int
) -> DataFrame:
    """Full member content at ``pin`` (empty-but-typed when no files)."""
    if tbl.files(pin):
        return tbl.read(spark, pin)
    schema_json = tbl._manifest(pin).get("schema")
    if schema_json is None:
        raise FileNotFoundError(
            f"member at {tbl.root} v{pin} has neither files nor a pinned schema"
        )
    return spark.createDataFrame(
        [], StructType.fromJson(json.loads(schema_json))
    )


def _stage_commit(
    spark: SparkSession,
    src: TableCatalog,
    dst: TableCatalog,
    prev: dict[str, tuple[str, int]] | None,
    cur: dict[str, tuple[str, int]],
    op: str,
    max_retries: int,
) -> None:
    """Re-apply one primary commit (prev→cur pin diff; prev=None means
    base sync: overwrite everything) as one replica transaction."""
    for _ in range(max_retries):
        txn = dst.transaction(spark)
        dst_names = set(dst.snapshot(spark, txn.base_version))
        for name, (path, pin) in sorted(cur.items()):
            old = None if prev is None else prev.get(name)
            if old == (path, pin):
                continue  # member untouched by this commit
            tbl = src.table(path)
            man = tbl._manifest(pin)
            stats_cols = _member_stats_cols(man)
            new_files = tbl.files(pin)
            old_files = (
                set(tbl.files(old[1]))
                if old is not None and old[0] == path
                else set()
            )
            removed = old_files.difference(new_files)
            delta = [f for f in new_files if f not in old_files]
            if old is None or removed or old[0] != path:
                # creation, rewrite, or relocation: full content replace
                txn.overwrite(
                    name,
                    _read_member(spark, tbl, pin),
                    op=op,
                    stats_cols=stats_cols,
                )
            elif delta:
                # pure append: ship only the commit's own files.
                # mergeSchema: a txn may stack appends with evolved schemas
                txn.append(
                    name,
                    spark.read.option("mergeSchema", "true").parquet(*delta),
                    op=op,
                    stats_cols=stats_cols,
                )
        for name in dst_names.difference(cur):
            txn.drop(name)
        try:
            # force: a content-no-op commit still records `op` in the
            # replica ledger, keeping exactly-once exact
            txn.commit(op=op, force=True)
            return
        except CommitConflict:
            continue  # racing replicator/writer on the replica; re-walk
    raise CommitConflict(
        f"replication of {op!r} lost the replica catalog race "
        f"{max_retries} times at {dst.root}"
    )


def replicate_catalog(
    spark: SparkSession,
    src: TableCatalog,
    dst: TableCatalog,
    max_retries: int = 10,
) -> int:
    """Ship every not-yet-replicated primary commit to ``dst``, in order.

    Returns the number of commits applied (0 when the replica is already
    current). Raises :class:`ValueError` if the primary ledger carries
    duplicate op labels — replication's exactly-once contract needs one
    label per transaction (the pipeline verbs all tag uniquely; pass
    distinct ``op=`` to ad-hoc transactions you want replicated).
    """
    hist = src.history()
    labels = [op for _, op in hist]
    dups = sorted({o for o in labels if labels.count(o) > 1})
    if dups:
        raise ValueError(
            f"primary catalog at {src.root} has duplicate op labels "
            f"{dups[:5]}; replication needs one unique label per commit"
        )
    done = dst.committed_ops()
    avail = {v for v, _ in hist}
    applied = 0
    for v, op in hist:
        if op in done:
            continue
        if v > 0 and (v - 1) in avail:
            prev = src.snapshot(spark, v - 1)
        elif v == 0:
            prev = {}
        else:
            # predecessor truncated by a catalog checkpoint: diff is
            # impossible — base-sync this snapshot (correct from any
            # replica state), then continue diffing from here
            prev = None
        _stage_commit(
            spark, src, dst, prev, src.snapshot(spark, v), op, max_retries
        )
        applied += 1
        done.add(op)
    return applied
