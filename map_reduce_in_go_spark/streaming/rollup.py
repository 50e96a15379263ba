"""Incrementally-maintained additive rollups — exact materialized views.

The generic form of the pattern ``streaming/heavy.py`` uses for sketches:
any GROUP BY aggregate whose state MERGES BY ADDITION (count, sum — and
through them mean, and any dimension-sliced rollup) can be maintained as
a ledgered log of per-batch PARTIAL aggregates in a
:class:`ManifestTable`:

- **append** (``rollup_batch``): one micro-batch lands its partial
  aggregate (keys × additive columns) in one ledgered commit — replays
  are detected by op id before any recompute, giving exactly-once
  contribution per batch regardless of stream restarts;
- **query** (``rollup_query``): fold the stored partials with the same
  GROUP BY — additivity makes the result EXACT over everything ingested,
  in any arrival order, without ever re-touching the raw stream;
- **compact** (``compact_rollup``): replace all rows by their fold in one
  CAS overwrite (retry on a racing append, the ManifestTable.compact
  discipline) — the table stays O(distinct keys) over unbounded streams.

This is incremental view maintenance for the insert-only case — the one
a training-data pipeline actually has (documents land, never retract).
The demo view is the reference's own flagship: WORDCOUNT, maintained
incrementally and pinned equal to the batch plan's answer in
tests/test_rollup.py.

At 100 TB: per-batch cost is the batch's own partial aggregate plus one
commit; query cost is a scan of O(batches × keys-per-batch) partial rows
(kept flat by compaction), never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.manifest_table import CommitConflict, ManifestTable


def rollup_batch(
    batch_df: DataFrame,
    tbl: ManifestTable,
    batch_id: int,
    key_cols: list[str],
    sum_cols: dict[str, str],
    app_id: str = "rollup",
) -> bool:
    """Land one batch's partial aggregate; False if replayed (ledger hit).

    ``sum_cols`` maps output column → input expression (SQL string) to be
    summed; ``count(*)`` is expressed as the expression ``1``.
    """
    op = f"{app_id}-batch-{batch_id}"
    if op in tbl.committed_ops():
        return False
    partial = batch_df.groupBy(*key_cols).agg(
        *[F.sum(F.expr(expr)).alias(name) for name, expr in sum_cols.items()]
    )
    tbl.append(partial, op=op)
    return True


def rollup_query(
    spark: SparkSession,
    tbl: ManifestTable,
    key_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """EXACT current view: fold the stored partials (additivity)."""
    df = tbl.read(spark)
    return df.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def compact_rollup(
    spark: SparkSession,
    tbl: ManifestTable,
    key_cols: list[str],
    sum_cols: list[str],
    max_retries: int = 20,
) -> int:
    """Fold all partial rows into one row per key — atomic CAS overwrite.

    Same race discipline as ``compact_sketches``: a concurrent
    ``rollup_batch`` landing between the fold and the swap would be
    silently discarded (and ledger-blocked from replaying), so the
    overwrite CASes on the base version and refolds on conflict.
    """
    for _ in range(max_retries):
        base = tbl.version()
        folded = (
            tbl.read(spark, base)
            .groupBy(*key_cols)
            .agg(*[F.sum(c).alias(c) for c in sum_cols])
        )
        try:
            return tbl.overwrite(folded, op="rollup-compact", expected_version=base)
        except CommitConflict:
            continue
    raise CommitConflict(
        f"rollup-compact lost the commit race {max_retries} times at {tbl.root}"
    )


def start_wordcount_rollup(
    stream_docs: DataFrame,
    view_root: str,
    checkpoint_dir: str,
    app_id: str = "wc-view",
    compact_every: int | None = 8,
):
    """documents stream → incrementally-maintained exact wordcount view.

    ``foreachBatch`` is at-least-once; exactly-once comes from the
    table's op ledger (a replayed batch id is detected and skipped before
    any recompute), so restarts and checkpoint replays never double-count
    — the same discipline as ``streaming/ingest.py``. ``compact_every``
    folds the partial log back to O(keys) rows every N committed batches,
    keeping query cost flat over an unbounded stream.
    """
    from ..functions.text import tokens

    spark = stream_docs.sparkSession
    tbl = ManifestTable(view_root)

    def on_batch(df: DataFrame, bid: int) -> None:
        words = df.select(F.explode(tokens(F.col("text"))).alias("word"))
        landed = rollup_batch(words, tbl, bid, ["word"], {"cnt": "1"}, app_id)
        if landed and compact_every and (bid + 1) % compact_every == 0:
            compact_rollup(spark, tbl, ["word"], ["cnt"])

    return (
        stream_docs.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
