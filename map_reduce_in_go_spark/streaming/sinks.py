"""Streaming sinks built on ``foreachBatch``.

``foreachBatch`` is the escape hatch for sinks Spark has no native connector
for — and the place to make an at-least-once channel *idempotent*: Spark
may replay a micro-batch after a failure (restart between sink write and
checkpoint commit), so the batch writer must land the same batch twice
without duplicating rows.

The pattern here writes each micro-batch to its own ``batch_id=<n>``
partition directory with ``overwrite`` mode: a replayed batch overwrites
its own output byte-for-byte instead of appending duplicates. Readers see
``batch_id`` as a normal partition column. At 100 TB this is the standard
exactly-once parquet landing zone (the same shape Delta's txn log
formalizes); the per-batch directory also gives cheap retention (drop old
batch dirs) and incremental downstream consumption (read only new ids).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_batch_idempotent(df: DataFrame, batch_id: int, out_dir: str) -> None:
    """Land one micro-batch under ``batch_id=<n>`` — replay-safe.

    ``overwrite`` scopes to the batch's own directory, so a Spark-side
    replay of the same epoch rewrites identical files (dynamic partition
    semantics without needing the session-level conf).
    """
    df.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch_id={batch_id}")
    )


def start_parquet_sink(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Stream → idempotent per-batch parquet sink, drain-all trigger."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: write_batch_idempotent(df, bid, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
