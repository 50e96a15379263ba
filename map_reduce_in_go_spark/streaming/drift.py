"""Incrementally-maintained embedding drift/balance view.

The streaming twin of ``operators/similarity.embedding_centroids`` (the
per-(label, dim) centroid + second-moment report a dataset monitor diffs
between corpus versions), maintained EXACTLY over an unbounded embedding
stream through the additive-rollup machinery (``streaming/rollup.py``):

- the per-(label, dim) state is three additive integers — count, Σ micro,
  Σ micro² (components rounded once at 6dp and lifted to integer micros,
  the batch operator's own exactness recipe) — so per-batch partials
  merge by addition and the fold equals the batch plan bit-for-bit;
- exactly-once per micro-batch comes from the ManifestTable op ledger
  (replayed batch ids are detected before any recompute), and CAS
  compaction keeps the view at O(labels × dims) rows forever.

An encoder regression or sampling drift shows up as centroid movement
between two reads of :func:`drift_view` — no raw-vector rescan, ever.
Parity with the batch operator is pinned in tests/test_drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import to_double_array
from ..sources.manifest_table import ManifestTable
from .rollup import compact_rollup, rollup_batch

DRIFT_KEYS = ["label", "dim"]
DRIFT_SUMS = ["n", "s_micro", "s_sq"]


def _micro_components(vecs: DataFrame) -> DataFrame:
    """(label, dim, micro): each embedding component at exact 6dp micros —
    identical projection to the batch operator's."""
    return vecs.select(
        "label", F.posexplode(to_double_array(F.col("embedding"))).alias("dim", "x")
    ).select(
        "label",
        "dim",
        (F.round(F.col("x"), 6).cast("decimal(16,6)") * 1000000)
        .cast("long")
        .alias("micro"),
    )


def drift_batch(
    batch_vecs: DataFrame, tbl: ManifestTable, batch_id: int, app_id: str = "drift"
) -> bool:
    """Land one micro-batch's additive partial; False on ledger replay."""
    return rollup_batch(
        _micro_components(batch_vecs),
        tbl,
        batch_id,
        DRIFT_KEYS,
        {
            "n": "1",
            "s_micro": "micro",
            "s_sq": "CAST(micro AS DECIMAL(22,0)) * micro",
        },
        app_id=app_id,
    )


def drift_view(spark: SparkSession, tbl: ManifestTable) -> DataFrame:
    """Current exact view — same output schema and integer-micro mean
    formulas as ``embedding_centroids``, folded from the partial log."""
    folded = tbl.read(spark).groupBy(*DRIFT_KEYS).agg(
        F.sum("n").alias("n_vecs"),
        F.sum("s_micro").alias("sm"),
        F.sum("s_sq").alias("sq"),
    )
    return folded.select(
        "label",
        "dim",
        "n_vecs",
        (
            F.expr("(2 * sm + n_vecs) div (2 * n_vecs)").cast("double") / 1000000
        ).alias("centroid"),
        (
            F.expr(
                "(2 * sq + n_vecs * 1000000) div (2 * n_vecs * 1000000)"
            ).cast("double")
            / 1000000
        ).alias("second_moment"),
    )


def start_embedding_drift_rollup(
    stream_vecs: DataFrame,
    view_root: str,
    checkpoint_dir: str,
    app_id: str = "drift-view",
    compact_every: int | None = 8,
):
    """embedding stream → incrementally-maintained exact drift view.

    Same exactly-once discipline as ``start_wordcount_rollup``:
    foreachBatch is at-least-once, the op ledger makes contributions
    exactly-once across restarts and checkpoint replays; ``compact_every``
    folds the partial log back to O(labels × dims) rows.
    """
    spark = stream_vecs.sparkSession
    tbl = ManifestTable(view_root)

    def on_batch(df: DataFrame, bid: int) -> None:
        landed = drift_batch(df, tbl, bid, app_id)
        if landed and compact_every and (bid + 1) % compact_every == 0:
            compact_rollup(spark, tbl, DRIFT_KEYS, DRIFT_SUMS)

    return (
        stream_vecs.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
