"""Evolvable IVF index: per-cell tables under generic catalog transactions.

``build_ivf_index`` (operators/similarity.py) materializes the inverted
file as static parquet — the serving layout, but with no evolution story:
``cluster_silhouette`` measures cell quality and nothing acts on it. This
module is the maintenance layer a vector database runs around that layout,
built ON the repo's generic multi-table transaction machinery
(:class:`~..sources.catalog.TableCatalog`) rather than a bespoke pinning
scheme:

- **Catalog-as-commit-point.** The index is a set of per-cell
  :class:`ManifestTable`\\ s plus one ``centroids`` member table whose rows
  are ``(cid, centroid, cell)`` — ``cell`` naming the member table holding
  that cell's vectors. A :class:`Transaction` stages every cell write and
  the centroids replacement, then ONE catalog CAS publishes them together:
  any maintenance operation (split, merge, re-center) becomes visible
  atomically, and a reader holding an older catalog version keeps a fully
  consistent older index — the snapshot is the catalog's, so the pinned
  member versions and the centroid table always agree. This is the
  two-level metadata layering lakehouse metastores use, now literally the
  shared implementation instead of a parallel one.
- **Silhouette-driven splitting.** ``split_worst_cell`` picks the cell
  with the worst mean assignment margin (the :func:`cluster_silhouette`
  statistic, recomputed from catalog centroids), splits it on the median
  projection along its most marginal member's direction (deterministic —
  no iterative k-means, ties on vec_id), stages the two children plus the
  centroid swap, drops the parent member, and commits — a racing
  maintenance job loses the catalog CAS, not the index, and replans.

Crash story: a maintenance job that dies mid-transaction leaves staged
member commits the catalog never references — orphans, invisible to every
reader, reclaimed by ``TableCatalog.vacuum`` — and the catalog still
serves the last published index.

Scale posture: a split reads and rewrites ONLY the split cell's rows
(cost ∝ cell size, never index size); probes read only the NPROBE
referenced cell tables; the catalog is O(#cells) metadata rows. Old
cell tables stay on disk for snapshot readers until vacuum.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import CommitConflict, TableCatalog
from ..sources.tables import spread_partitions
from ..sources.manifest_table import ManifestTable
from .similarity import (
    NPROBE,
    QUERY_MOD,
    TOP_K,
    _assign_cells,
    _centroids,
    _exact_pair_scores,
    _vectors,
)

CENTROIDS = "centroids"  # the metadata member table's name
_CENTROID_SCHEMA = "cid long, centroid array<double>, cell string"


def _dot_lit(vec):
    """Catalyst dot product of column ``e`` with a literal vector."""
    return F.aggregate(
        F.zip_with(
            "e", F.array(*[F.lit(float(x)) for x in vec]), lambda a, b: a * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


class EvolvableIvfIndex:
    """IVF inverted file with atomic, snapshot-safe cell evolution."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.catalog = TableCatalog(root)

    # ------------------------------------------------------------- building

    @staticmethod
    def _new_cell_name() -> str:
        return os.path.join("cells", uuid.uuid4().hex[:12])

    def build(self, spark: SparkSession, sf_dir: str) -> None:
        """Assign every vector to its argmax-cosine centroid and commit.

        Same deterministic coarse quantizer and assignment kernel as
        ``ann_ivf`` (similarity.py), so the initial index is the one the
        oracle-checked queries serve from. All cells plus the centroids
        table land in ONE transaction: there is no observable state in
        which some cells exist and others don't.
        """
        bc = spark.sparkContext.broadcast(_centroids(spark, sf_dir))
        c_ids, c_mat, _, _ = bc.value
        vecs = _vectors(spark, sf_dir).select("vec_id", "e")
        assign = (
            vecs.repartition(spread_partitions(spark, sf_dir, "embeddings"))
            .mapInPandas(
                lambda it: _assign_cells(it, bc, 1),
                schema="vec_id long, rank int, cid long",
            )
            .filter(F.col("rank") == 1)
            .select("vec_id", "cid")
        )
        rows = vecs.join(assign, "vec_id")
        txn = self.catalog.transaction(spark)
        entries = []
        for i, cid in enumerate(c_ids):
            rel = self._new_cell_name()
            txn.overwrite(
                rel, rows.filter(F.col("cid") == int(cid)).select("vec_id", "e")
            )
            entries.append((int(cid), [float(x) for x in c_mat[i]], rel))
        txn.overwrite(
            CENTROIDS, spark.createDataFrame(entries, _CENTROID_SCHEMA)
        )
        txn.commit(op="build")

    # -------------------------------------------------------------- reading

    def snapshot(self, spark: SparkSession, catalog_version: int | None = None):
        """One consistent view: [(cid, centroid, cell name, pinned version)].

        Both halves — the centroid table's content and every cell's pinned
        version — come from the SAME catalog snapshot, so they can never
        disagree even while a transaction publishes concurrently.
        """
        pins = self.catalog.snapshot(spark, catalog_version)
        if CENTROIDS not in pins:
            return []
        cpath, cver = pins[CENTROIDS]
        rows = (
            ManifestTable(os.path.join(self.root, cpath))
            .read(spark, cver)
            .collect()
        )
        return sorted(
            (
                (r["cid"], np.array(r["centroid"]), r["cell"], pins[r["cell"]][1])
                for r in rows
            ),
            key=lambda t: t[0],
        )

    def _centroid_pack(self, snap):
        c_ids = np.array([c for c, _, _, _ in snap], dtype=np.int64)
        c_mat = np.stack([e for _, e, _, _ in snap])
        c_unit = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
        c_norms = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])
        return c_ids, c_mat, c_unit, c_norms

    def _read_cells(self, spark: SparkSession, snap, cids) -> DataFrame:
        """Union of the referenced cell tables, each at its pinned version."""
        want = set(int(c) for c in cids)
        parts = [
            ManifestTable(os.path.join(self.root, path))
            .read(spark, version)
            .withColumn("cid", F.lit(cid))
            for cid, _, path, version in snap
            if cid in want
        ]
        if not parts:
            raise ValueError(f"no cells among {sorted(want)} in catalog")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def probe(
        self,
        spark: SparkSession,
        sf_dir: str,
        nprobe: int = NPROBE,
        catalog_version: int | None = None,
    ) -> DataFrame:
        """Top-k ANN for the standard query subset, served from the index.

        Identical probe shape to ``ann_ivf_indexed``: query → nprobe cells
        via one tiny GEMM against the catalog's centroids, then exact
        rescoring of only those cells' members.
        """
        snap = self.snapshot(spark, catalog_version)
        bc = spark.sparkContext.broadcast(self._centroid_pack(snap))
        vecs = _vectors(spark, sf_dir)
        queries = (
            vecs.filter(F.col("vec_id") % QUERY_MOD == 0)
            .select("vec_id", "e")
            .repartition(spread_partitions(spark, sf_dir, "embeddings"))
        )
        probes = queries.mapInPandas(
            lambda it: _assign_cells(it, bc, nprobe),
            schema="vec_id long, rank int, cid long",
        ).select(F.col("vec_id").alias("query_id"), "cid")
        from ..functions.caching import scoped_persist

        probes = scoped_persist(probes)
        probe_cids = [r["cid"] for r in probes.select("cid").distinct().collect()]
        members = self._read_cells(spark, snap, probe_cids)
        cand = (
            members.join(F.broadcast(probes), "cid")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id")
            .distinct()
        )
        qv = vecs.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
        scored = _exact_pair_scores(
            cand.join(F.broadcast(qv), "query_id").join(
                vecs.select("vec_id", "e"), "vec_id"
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
        )

    # ---------------------------------------------------------- maintenance

    def cell_margins(
        self, spark: SparkSession, catalog_version: int | None = None
    ) -> DataFrame:
        """Per-cell (n_members, mean a-cos, mean margin) from the catalog.

        The silhouette statistic over the *index's own* members and
        centroid set — the signal :meth:`split_worst_cell` acts on.
        """
        snap = self.snapshot(spark, catalog_version)
        bc = spark.sparkContext.broadcast(self._centroid_pack(snap))
        members = self._read_cells(spark, snap, [c for c, _, _, _ in snap])
        ranked = (
            members.select("vec_id", "e")
            .repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(
                lambda it: _assign_cells(it, bc, 2, with_cos=True),
                schema="vec_id long, rank int, cid long, cos double",
            )
        )
        a = ranked.filter(F.col("rank") == 1).select(
            "vec_id", F.col("cid").alias("assigned_cid"), F.col("cos").alias("a")
        )
        b = ranked.filter(F.col("rank") == 2).select(
            "vec_id", F.col("cos").alias("b")
        )
        return (
            a.join(b, "vec_id")
            .groupBy("assigned_cid")
            .agg(
                F.count("*").alias("n_members"),
                F.round(F.avg("a"), 6).alias("mean_a"),
                F.round(F.avg(F.col("a") - F.col("b")), 6).alias("mean_margin"),
            )
        )

    def stored_cell_stats(
        self, spark: SparkSession, catalog_version: int | None = None
    ) -> DataFrame:
        """Per-cell (n_members, mean cos to OWN centroid) from *storage*.

        :meth:`cell_margins` re-derives argmax assignment (the quality a
        probe experiences); this reads the membership as committed — the
        pair of views diverges exactly when cells are stale enough that
        members would migrate, which is itself a rebalance signal.
        """
        snap = self.snapshot(spark, catalog_version)
        parts = []
        for cid, cvec, path, version in snap:
            members = ManifestTable(os.path.join(self.root, path)).read(
                spark, version
            )
            parts.append(
                members.select(
                    F.lit(int(cid)).alias("cid"),
                    (
                        _dot_lit(cvec)
                        / (
                            F.sqrt(
                                F.aggregate(
                                    F.zip_with("e", "e", lambda a, b: a * b),
                                    F.lit(0.0),
                                    lambda acc, x: acc + x,
                                )
                            )
                            * float(np.linalg.norm(cvec))
                        )
                    ).alias("cos_c"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.groupBy("cid").agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("cos_c"), 6).alias("mean_cos"),
        )

    @staticmethod
    def _centroid_rows(entries):
        return [(int(c), [float(x) for x in e], p) for c, e, p in entries]

    def recenter_cells(self, spark: SparkSession, max_retries: int = 5) -> int:
        """Move every centroid to its stored members' mean (k-means half-step).

        Pure metadata transaction: no cell table is touched — the staged
        write replaces only the centroids member, so the cost is one
        aggregation pass over the index regardless of how stale the
        sampled centroids were. Improves assignment margins after drift
        (appends, splits) without any rewrite. CAS-committed like a split.
        """
        for _ in range(max_retries):
            txn = self.catalog.transaction(spark)
            snap = self.snapshot(spark, txn.base_version)
            members = self._read_cells(spark, snap, [c for c, _, _, _ in snap])
            means = {
                (r["cid"], r["pos"]): r["m"]
                for r in members.select("cid", F.posexplode("e").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.avg("x").alias("m"))
                .collect()
            }
            dim = max(p for _, p in means) + 1
            txn.overwrite(
                CENTROIDS,
                spark.createDataFrame(
                    self._centroid_rows(
                        (cid, [means[(cid, p)] for p in range(dim)], path)
                        for cid, _, path, _ in snap
                    ),
                    _CENTROID_SCHEMA,
                ),
            )
            try:
                return txn.commit(op="recenter")
            except CommitConflict:
                continue
        raise CommitConflict(
            f"recenter lost the catalog race {max_retries} times at {self.root}"
        )

    def merge_closest_cells(self, spark: SparkSession, max_retries: int = 5) -> int:
        """Merge the two cells with the most similar centroids.

        The inverse maintenance op to a split — undoes over-partitioning
        (tiny cells cost a probe each without shrinking scan volume).
        Centroid pair selection is driver-side over the O(#cells) catalog;
        the rewrite unions ONLY the two merged cells' rows (cost ∝ their
        size); the merged centroid is the member-count-weighted mean. One
        transaction stages the merged cell, drops the two parents, and
        swaps the centroid table.
        """
        for _ in range(max_retries):
            txn = self.catalog.transaction(spark)
            snap = self.snapshot(spark, txn.base_version)
            if len(snap) < 2:
                raise ValueError("need at least two cells to merge")
            _, c_mat, c_unit, _ = self._centroid_pack(snap)
            sims = c_unit @ c_unit.T
            np.fill_diagonal(sims, -np.inf)
            i, j = np.unravel_index(np.argmax(sims), sims.shape)
            i, j = sorted((int(i), int(j)))
            a, b = snap[i], snap[j]
            counts = {
                r["cid"]: r["n_members"]
                for r in self.stored_cell_stats(spark, txn.base_version).collect()
            }
            na, nb = counts[a[0]], counts[b[0]]
            merged_centroid = (na * c_mat[i] + nb * c_mat[j]) / (na + nb)
            union = self._read_cells(spark, [a, b], [a[0], b[0]]).select(
                "vec_id", "e"
            )
            rel = self._new_cell_name()
            txn.overwrite(rel, union)
            txn.drop(a[2])
            txn.drop(b[2])
            max_cid = max(c for c, _, _, _ in snap)
            kept = [
                (c, e, p) for c, e, p, _ in snap if c not in (a[0], b[0])
            ]
            txn.overwrite(
                CENTROIDS,
                spark.createDataFrame(
                    self._centroid_rows(
                        kept + [(max_cid + 1, merged_centroid, rel)]
                    ),
                    _CENTROID_SCHEMA,
                ),
            )
            try:
                return txn.commit(op=f"merge-{a[0]}-{b[0]}")
            except CommitConflict:
                continue
        raise CommitConflict(
            f"merge lost the catalog race {max_retries} times at {self.root}"
        )

    def split_worst_cell(self, spark: SparkSession, max_retries: int = 5) -> int:
        """Split the worst-margin cell in two; atomic catalog swap.

        Deterministic median-plane split: direction = the member with the
        lowest cosine to its centroid (ties → lower vec_id); members are
        ranked by (projection onto that direction, vec_id) and the lower
        half becomes one child, the rest the other; each child's centroid
        is its arithmetic mean. Readers never see a half-built index: the
        children's tables are staged member commits — invisible until the
        one catalog publication, which CASes on the version the plan was
        made against (a racing maintenance job retries against the new
        state). Returns the new catalog version.
        """
        for _ in range(max_retries):
            txn = self.catalog.transaction(spark)
            snap = self.snapshot(spark, txn.base_version)
            worst = (
                self.cell_margins(spark, txn.base_version)
                .orderBy(F.asc("mean_margin"), F.asc("assigned_cid"))
                .first()["assigned_cid"]
            )
            entry = next(s for s in snap if s[0] == worst)
            members = self._read_cells(spark, [entry], [worst]).select("vec_id", "e")

            cvec = entry[1]
            dots_to_c = members.select(
                "vec_id",
                F.aggregate(
                    F.zip_with(
                        "e",
                        F.array(*[F.lit(float(x)) for x in cvec]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dot_c"),
                F.sqrt(
                    F.aggregate(
                        F.zip_with("e", "e", lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ).alias("nrm"),
            ).withColumn("cos_c", F.col("dot_c") / F.col("nrm"))
            far = (
                members.join(dots_to_c.select("vec_id", "cos_c"), "vec_id")
                .orderBy(F.asc("cos_c"), F.asc("vec_id"))
                .select("e")
                .first()["e"]
            )
            proj = members.select(
                "vec_id",
                "e",
                F.aggregate(
                    F.zip_with(
                        "e",
                        F.array(*[F.lit(float(x)) for x in far]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("p"),
            )
            w = Window.orderBy("p", "vec_id")
            n = members.count()
            halves = proj.withColumn(
                "side", (F.row_number().over(w) > n // 2).cast("int")
            )
            new_entries = []
            max_cid = max(c for c, _, _, _ in snap)
            for side in (0, 1):
                part = halves.filter(F.col("side") == side).select("vec_id", "e")
                cent = (
                    part.select(F.posexplode("e").alias("pos", "x"))
                    .groupBy("pos")
                    .agg(F.avg("x").alias("m"))
                    .orderBy("pos")
                    .collect()
                )
                rel = self._new_cell_name()
                txn.overwrite(rel, part)
                new_entries.append(
                    (max_cid + 1 + side, [r["m"] for r in cent], rel)
                )
            txn.drop(entry[2])
            kept = [(c, e, p) for c, e, p, _ in snap if c != worst]
            txn.overwrite(
                CENTROIDS,
                spark.createDataFrame(
                    self._centroid_rows(kept + new_entries), _CENTROID_SCHEMA
                ),
            )
            try:
                return txn.commit(op=f"split-{worst}")
            except CommitConflict:
                continue  # replan against the racer's committed state
        raise CommitConflict(
            f"split lost the catalog race {max_retries} times at {self.root}"
        )
