"""A minimal manifest-log parquet table: ACID appends without Delta/Iceberg.

The durable band index (operators/dedup.py ``build_band_index``) ships as
plain ``mode("append")`` parquet, which is the right layout but the wrong
commit protocol at 100 TB: directory-listing readers see half-written
files, two writers clobber each other's part files, and nothing ever
compacts or dedups re-appended rows. Real deployments reach for
Delta/Iceberg; this module implements the *public* core of that protocol —
the transaction-log design described in the Delta Lake paper (Armbrust et
al., VLDB 2020) — with no dependencies, so the repo's incremental-dedup
story is commit-safe end-to-end even where those libs aren't installed:

- **Data files are immutable.** Every write lands under ``data/`` with a
  unique name; nothing is ever modified in place.
- **The table state IS the newest manifest.** ``_manifests/v<N>.json``
  lists the exact data files that make up version N. Readers list
  manifests, pick max N, and read precisely those files — a half-written
  data file is invisible because no committed manifest references it.
- **Commits are atomic + optimistic.** A writer computes its new file
  list, then creates ``v<N+1>.json`` with ``O_CREAT | O_EXCL``. POSIX
  guarantees exactly one winner per version; the loser re-reads the new
  state and retries on top of it (bounded attempts), exactly the
  mutual-exclusion-per-version rule Delta's log uses.
- **Snapshots are free.** A ``read()`` DataFrame holds its manifest's file
  list, so a long-running job keeps a consistent view while appends land;
  superseded files are kept until an explicit ``vacuum()``.
- **Compaction is just another commit.** ``compact()`` rewrites the live
  rows (deduped) into fresh files and commits a manifest that swaps the
  whole file list — readers flip atomically from the old layout to the new.

Scale posture: the manifest holds file *names*, not row data — at 100 TB
it is KB-to-MB of JSON, and every data operation (append, compact, read)
is a distributed Spark job; only the commit itself is a driver-side rename.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")


class CommitConflict(RuntimeError):
    """Another writer committed this version first (after all retries)."""


class ManifestTable:
    """Parquet table with a JSON manifest log (see module docstring)."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._data_dir = os.path.join(root, "data")
        self._log_dir = os.path.join(root, "_manifests")

    # ------------------------------------------------------------- log I/O

    def _versions(self) -> list[int]:
        try:
            names = os.listdir(self._log_dir)
        except FileNotFoundError:
            return []
        return sorted(
            int(m.group(1)) for n in names if (m := _MANIFEST_RE.match(n))
        )

    def version(self) -> int:
        """Newest committed version; -1 for an empty/uninitialized table."""
        vs = self._versions()
        return vs[-1] if vs else -1

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._log_dir, f"v{version}.json")) as f:
            return json.load(f)

    def files(self, version: int | None = None) -> list[str]:
        """Absolute data-file paths making up ``version`` (default newest)."""
        v = self.version() if version is None else version
        if v < 0:
            return []
        return [
            os.path.join(self._data_dir, name)
            for name in self._manifest(v)["files"]
        ]

    def _try_commit(self, version: int, files: list[str], op: str) -> bool:
        """Atomically create v<version>.json; False if that version exists."""
        os.makedirs(self._log_dir, exist_ok=True)
        payload = json.dumps(
            {"version": version, "op": op, "files": sorted(files)}, indent=1
        )
        try:
            fd = os.open(
                os.path.join(self._log_dir, f"v{version}.json"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        return True

    # --------------------------------------------------------- data writes

    def _write_data_files(self, df: DataFrame) -> list[str]:
        """Land ``df`` as immutable uniquely-named parquet under data/.

        Spark writes to a scratch dir (its own job-commit protocol keeps
        that internally consistent), then the part files are renamed to
        uuid-prefixed names in data/ — invisible to readers until a
        manifest references them.
        """
        os.makedirs(self._data_dir, exist_ok=True)
        scratch = os.path.join(self.root, f"_tmp_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(scratch)
        prefix = uuid.uuid4().hex
        names: list[str] = []
        for i, part in enumerate(sorted(os.listdir(scratch))):
            if not part.endswith(".parquet"):
                continue
            name = f"{prefix}-{i:05d}.parquet"
            os.rename(
                os.path.join(scratch, part), os.path.join(self._data_dir, name)
            )
            names.append(name)
        for leftover in os.listdir(scratch):
            os.remove(os.path.join(scratch, leftover))
        os.rmdir(scratch)
        return names

    def append(self, df: DataFrame, max_retries: int = 20, op: str = "append") -> int:
        """ACID append: land files, then commit log-state ∪ new files.

        Safe under concurrent appenders: each retry re-reads the newest
        manifest, so the loser's commit includes the winner's files.
        ``op`` labels the commit in the log (see :meth:`committed_ops`) —
        idempotent writers tag commits with their unit of work (e.g. a
        streaming batch id) and skip re-application on replay.
        Returns the committed version.
        """
        new_names = self._write_data_files(df)
        for _ in range(max_retries):
            v = self.version()
            live = self._manifest(v)["files"] if v >= 0 else []
            if self._try_commit(v + 1, live + new_names, op=op):
                return v + 1
        raise CommitConflict(
            f"append lost the commit race {max_retries} times at {self.root}"
        )

    def overwrite(
        self, df: DataFrame, max_retries: int = 20, op: str = "overwrite"
    ) -> int:
        """Replace the table contents in one atomic commit."""
        new_names = self._write_data_files(df)
        for _ in range(max_retries):
            v = self.version()
            if self._try_commit(v + 1, new_names, op=op):
                return v + 1
        raise CommitConflict(
            f"overwrite lost the commit race {max_retries} times at {self.root}"
        )

    def committed_ops(self) -> set[str]:
        """Op labels of every commit ≤ the newest version.

        The replay-detection hook: a writer that tags its commit with its
        unit of work checks membership here before re-applying — the same
        role Delta's txn appId/version pair plays.
        """
        return {self._manifest(v)["op"] for v in self._versions()}

    # ---------------------------------------------------------------- read

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Snapshot read: the DataFrame scans exactly one manifest's files.

        ``merge_schema=True`` unions the schemas across the snapshot's files
        (columns added by later appends surface as nulls on older rows) —
        additive schema evolution without rewriting history, the same
        contract Delta/Iceberg readers give. The default keeps the
        first-file schema, which is the cheap path when the schema is
        known-stable.
        """
        files = self.files(version)
        if not files:
            raise FileNotFoundError(f"no committed version at {self.root}")
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    # --------------------------------------------------------- maintenance

    def compact(
        self,
        spark: SparkSession,
        dedup_cols: list[str] | None = None,
        num_files: int = 1,
        max_retries: int = 20,
    ) -> int:
        """Rewrite the live rows into ``num_files`` fresh files and swap.

        ``dedup_cols`` drops exact duplicate rows on those columns — for
        the band index this collapses bands re-appended across batches, so
        probe-side ``distinct()`` work shrinks back down after many
        appends. The commit races like any other: if an append lands while
        compaction is rewriting, the swap would lose it, so compaction
        verifies its base version is still newest and retries otherwise.
        """
        for _ in range(max_retries):
            base = self.version()
            df = self.read(spark, base)
            if dedup_cols:
                df = df.dropDuplicates(dedup_cols)
            new_names = self._write_data_files(df.coalesce(num_files))
            if self.version() != base:
                continue  # an append landed mid-rewrite; redo on new base
            if self._try_commit(base + 1, new_names, op="compact"):
                return base + 1
        raise CommitConflict(
            f"compact lost the commit race {max_retries} times at {self.root}"
        )

    def vacuum(self, retain_seconds: float = 3600.0) -> int:
        """Delete unreferenced data files older than ``retain_seconds``.

        Returns the number of files removed. The retention horizon guards
        the append gap: a concurrent writer lands its data files BEFORE its
        manifest commit, so a zero-horizon vacuum could delete files whose
        commit is seconds away and leave the new manifest pointing at
        nothing — the same reason Delta's VACUUM defaults to a retention
        window. Pass 0 only when no writer can be in flight (tests,
        single-writer maintenance). Snapshots older than the newest version
        stop being readable once their files age out; the manifest log
        itself is retained — it is the table's history (and
        :meth:`committed_ops`' replay ledger), and it costs KBs.
        """
        import time

        live = {os.path.basename(p) for p in self.files()}
        cutoff = time.time() - retain_seconds
        removed = 0
        try:
            names = os.listdir(self._data_dir)
        except FileNotFoundError:
            return 0
        for name in names:
            full = os.path.join(self._data_dir, name)
            if (
                name.endswith(".parquet")
                and name not in live
                and os.path.getmtime(full) <= cutoff
            ):
                os.remove(full)
                removed += 1
        return removed
