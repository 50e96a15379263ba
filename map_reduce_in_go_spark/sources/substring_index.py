"""Served exact-substring index — anchor grams in a durable ManifestTable.

`dedup_containment_exact` (operators/dedup.py) answers "which docs occur
inside other docs" with an IN-FLIGHT anchor-gram scan. This module makes
the same structure a SERVED artifact: build once, persist under a
ManifestTable with a hash-clustered layout, then answer arbitrary
multi-pattern exact-substring lookups by point-set file pruning — the
text-index sibling of the durable MinHash band index and the
parquet-partitioned IVF inverted file.

Index row: ``(h, doc_id, pos)`` — xxhash64 of the ``ANCHOR_W``-char gram
starting at ``pos`` (1-based) of ``doc_id``. O(corpus chars) rows of
three longs; the ``compact(zorder_cols=["h"])`` rewrite hash-sorts the
layout so each file's [min,max] stats admit only its own hash range and
a point probe touches O(1) files (`files_pruned_in`).

Query: a pattern's first ``ANCHOR_W`` chars hash to its anchor; every
true occurrence shares that anchor at the same offset (completeness —
the dedup_containment_exact argument), so probe → pruned scan →
offset-exact ``substr`` verify against the document text yields every
occurrence with zero false positives. Patterns shorter than the anchor
raise loudly: they would need a smaller-gram index, not a silent partial
answer.

At 100 TB: the build is one corpus scan + one clustered rewrite; a
k-pattern lookup reads O(k) index files plus the candidate docs' texts —
never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.manifest_table import ManifestTable
from ..sources.tables import load_documents_parallel

ANCHOR_W = 32  # anchor width (chars) = minimum searchable pattern length
INDEX_FILES = 16  # clustered data files per index (the prune granularity)


def _gram_rows(docs: DataFrame) -> DataFrame:
    """(h, doc_id, pos) anchor-gram rows for a (doc_id, text) frame."""
    return (
        docs.filter(F.length("text") >= ANCHOR_W)
        .select(
            F.col("doc_id"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length(text) - {ANCHOR_W} + 1),"
                    f" i -> xxhash64(substr(text, i, {ANCHOR_W})))"
                )
            ).alias("pos0", "h"),
        )
        .select("h", "doc_id", (F.col("pos0") + 1).alias("pos"))
    )


def build_substring_index(
    spark: SparkSession, sf_dir: str, root: str, num_files: int = INDEX_FILES
) -> ManifestTable:
    """Scan the corpus once, persist the anchor-gram index hash-clustered."""
    docs = load_documents_parallel(spark, sf_dir).select("doc_id", "text")
    tbl = ManifestTable(root, stats_cols=["h"])
    tbl.append(_gram_rows(docs), op="substring-index-build")
    # hash-clustered rewrite: per-file [min,max] on h become disjoint-ish
    # ranges, so a point probe prunes to O(1) files
    tbl.compact(spark, num_files=num_files, zorder_cols=["h"])
    return tbl


def index_append(root: str, docs: DataFrame, op: str) -> bool:
    """Incremental maintenance: a new document batch appends its grams in
    ONE ledgered commit — exactly-once per ``op`` id across retries and
    stream replays (the band-index/rollup discipline applied to the text
    index). The index answers queries immediately; appended files span
    wider hash ranges than the clustered base, so pruning degrades
    gracefully until :func:`optimize_index` restores the tight layout.
    Returns False (no recompute) on a replayed op."""
    tbl = ManifestTable(root, stats_cols=["h"])
    if op in tbl.committed_ops():
        return False
    tbl.append(_gram_rows(docs.select("doc_id", "text")), op=op)
    return True


def optimize_index(
    spark: SparkSession, root: str, num_files: int = INDEX_FILES
) -> int:
    """Re-cluster the whole index on the hash (the OPTIMIZE-ZORDER verb):
    one atomic CAS rewrite restores point-probe pruning for every file
    after a run of incremental appends."""
    return ManifestTable(root, stats_cols=["h"]).compact(
        spark, num_files=num_files, zorder_cols=["h"]
    )


def substring_search(
    spark: SparkSession, sf_dir: str, root: str, patterns: list[str]
) -> DataFrame:
    """(pattern, doc_id, pos) for EVERY exact occurrence of each pattern.

    Probe hashes are computed by the same JVM ``xxhash64`` expression the
    build used (a k-row driver job — the recipe must match bit-for-bit),
    the index is read through ``read_pruned_in`` (files that cannot hold
    a probe are never opened), and candidates are verified offset-exactly
    against the document text, so hash collisions cannot leak through.
    """
    # dedupe (order-preserving): duplicate patterns would duplicate probe
    # rows and therefore duplicate every output row (r9 advice)
    patterns = list(dict.fromkeys(patterns))
    short = [p for p in patterns if len(p) < ANCHOR_W]
    if short:
        raise ValueError(
            f"substring_search: patterns shorter than ANCHOR_W={ANCHOR_W} "
            f"chars need a finer-grained index: {short[:3]!r}"
        )
    pats = spark.createDataFrame(
        [(p,) for p in patterns], "pattern string"
    ).select(
        "pattern",
        F.xxhash64(F.substring("pattern", 1, ANCHOR_W)).alias("h"),
        F.length("pattern").alias("plen"),
    )
    probe_rows = pats.collect()  # k rows — the pattern set is caller-bounded
    probes = [r["h"] for r in probe_rows]

    tbl = ManifestTable(root, stats_cols=["h"])
    cand = tbl.read_pruned_in(spark, "h", probes)
    docs = load_documents_parallel(spark, sf_dir).select(
        F.col("doc_id"), F.col("text")
    )
    return (
        cand.join(F.broadcast(pats), "h")
        .join(docs, "doc_id")
        .filter(F.expr("substr(text, pos, plen) = pattern"))
        .select("pattern", "doc_id", F.col("pos").cast("long").alias("pos"))
    )
