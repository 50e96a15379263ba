"""Streaming sketch state: mergeable HLL distinct counts over a stream.

The streaming twin of the batch sketch family (operators/approx.py):
``hll_sketch_agg`` is a TypedImperativeAggregate whose partial state is the
sketch itself, so a streaming groupBy aggregation keeps ONE fixed-size
sketch per key in the state store and merges each micro-batch's partial
into it — distinct counting over an unbounded stream in O(keys × sketch)
memory, no explosion of seen-id state. Because HLL register state is
insert-order- and merge-order-invariant, the estimate after the source
drains is *identical* to a single-pass batch sketch over the same rows —
pinned by tests/test_streaming_anomaly.py's sibling suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_users_sketch_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Per-event-type approximate distinct users, refreshed per micro-batch.

    Update output mode emits each touched key's new estimate; state is one
    HLL sketch per event_type (bounded regardless of stream length — the
    watermark exists for the windowed variant below, not for state size
    here).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
                "approx_users"
            ),
            F.count("*").alias("n_events"),
        )
    )


def windowed_distinct_users_sketch(
    events: DataFrame, window: str = "1 day", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window sketch rollup — the streaming producer of the same
    per-(day, type) sketch partitions ``sketch_rollup_users`` unions in
    batch. Watermark closes windows, so state is (open windows × types)
    sketches."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            F.hll_sketch_estimate("sk").alias("approx_users"),
            "n_events",
        )
    )
