"""Structured Streaming twins of the batch event analytics.

The reference is batch-only; this is the "streams" half of the north star.
Patterns shown (all file-source driven so tests run hermetically):

- :func:`windowed_counts` — tumbling event-time window + watermark for late
  data. At scale: state store is keyed by (window, event_type); watermark
  bounds state size.
- :func:`sessionize_stateful` — custom per-user session state via
  ``applyInPandasWithState`` (the Spark-native form of a custom stateful
  MapReduce reducer with timeout semantics).

Streaming sources use the same schema as the batch ``events`` table; any
parquet/json drop directory works as input. Outputs go to the ``memory``
sink in tests; in production they'd be a Delta/Kafka/parquet sink with
checkpointing.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("closed", BooleanType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("sum_value", DoubleType())]
)


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream with the canonical event schema (json drops)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .json(input_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling window counts with a late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stateful(
    events: DataFrame, idle_timeout_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """Running per-user totals via explicit group state + idle-TTL eviction.

    The stateful analog of a custom Reducer: state lives per key, updates
    per micro-batch, emits the running aggregate (``closed=false``). When a
    key stays idle past ``idle_timeout_ms`` of processing time, the timeout
    invocation emits the FINAL session row (``closed=true``) and
    ``state.remove()``s the key — the state-store TTL contract that keeps
    total state proportional to *active* users, not the all-time key
    universe. (Re-arming the timer without removing, the tempting default,
    grows state forever.) A later event for the same user starts a fresh
    session — observable as the count resetting, which the TTL test pins.
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get if state.exists else (0, 0.0)
            state.remove()  # evict: the session is closed, state freed
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [total],
                    "closed": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [total],
                "closed": [False],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state.

    ``dropDuplicates`` + watermark = the streaming form of the batch
    ``dedup_exact`` operator: state holds only ids newer than the watermark,
    so memory is bounded no matter how long the stream runs.
    """
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def dedup_stream_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming dedup with *time-bounded* state semantics.

    ``dropDuplicatesWithinWatermark`` only promises dedup for duplicates
    arriving within the watermark delay of each other, which lets the state
    store evict ids aggressively by event time — the right contract for
    at-least-once upstreams (Kafka producer retries land seconds apart,
    never days). Plain ``dropDuplicates`` keys state on the exact event-time
    column forever-ish; this form is what you run on an unbounded 100 TB/day
    firehose.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: enrich the event stream with a dimension table.

    The static side is planned as a broadcast per micro-batch — the
    canonical "decorate the stream with reference data" pattern; no state
    store involved.
    """
    return events.join(F.broadcast(dim), on, "left")


def topk_stateful(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-user running top-k event values via ``transformWithStateInPandas``.

    Spark 4's arbitrary-stateful API: typed state variables on a
    ``StatefulProcessor`` (here one ``ListState`` holding the running top-k
    as (value, event_id) rows) instead of a single opaque state tuple —
    the successor to ``applyInPandasWithState`` for operators that need
    several independently-evolving state vars, TTL, or timers. Requires the
    RocksDB state store provider (changelog-checkpointed at scale, so state
    far larger than executor memory still works).

    Emits the updated top-k for each user touched by a micro-batch;
    deterministic tiebreak (higher value first, then lower event_id).
    """
    import importlib.util

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        has_protobuf = False
    if not has_protobuf:
        # transformWithStateInPandas ships state schemas to its Python
        # driver worker over protobuf; without it the worker CRASHES with
        # an opaque "driver worker exited unexpectedly" — fail up front
        # with the actionable story instead (executing twin:
        # topk_stateful_compat, identical semantics on
        # applyInPandasWithState, no protobuf dependency)
        raise ImportError(
            "topk_stateful requires google.protobuf (transformWithState's "
            "driver-worker wire format); install protobuf or use "
            "topk_stateful_compat — the applyInPandasWithState twin with "
            "identical semantics"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("topk", "value double, event_id bigint")

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            cur = [(float(v), int(e)) for v, e in self._top.get()]
            for pdf in rows:
                cur.extend(
                    zip(pdf["value"].astype(float), pdf["event_id"].astype(int))
                )
            cur.sort(key=lambda t: (-t[0], t[1]))
            cur = cur[:k]
            self._top.put(cur)
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(cur),
                    "rank": list(range(1, len(cur) + 1)),
                    "value": [t[0] for t in cur],
                    "event_id": [t[1] for t in cur],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TopK(),
        outputStructType="user_id bigint, rank int, value double, event_id bigint",
        outputMode="Update",
        timeMode="None",
    )


def topk_stateful_compat(
    events: DataFrame, k: int = 3, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Executing twin of :func:`topk_stateful` on ``applyInPandasWithState``.

    Identical semantics — per-user running top-k (value desc, event_id asc)
    emitted on every micro-batch that touches the user — but on the
    Spark-3-era stateful API, whose Python worker protocol is Arrow-only.
    ``transformWithStateInPandas`` ships state schemas to the worker over
    protobuf, which not every runtime has (this sandbox doesn't); keeping
    the compat form executable means the top-k semantics are *run*, not
    just plan-checked, everywhere. State is the top-k itself, as two
    parallel arrays (bounded by k per key); ``idle_timeout_ms`` adds the
    TTL across KEYS — a user idle past it is evicted (top-k forgotten), so
    total state tracks active users rather than the all-time universe.
    Default None keeps the run-forever semantics of the batch twin.
    """
    from pyspark.sql.types import ArrayType, IntegerType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("rank", IntegerType()),
            StructField("value", DoubleType()),
            StructField("event_id", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("vals", ArrayType(DoubleType())),
            StructField("eids", ArrayType(LongType())),
        ]
    )

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()  # idle TTL: forget this key's top-k entirely
            return
        if state.exists:
            vals, eids = state.get
            cur = [(float(v), int(e)) for v, e in zip(vals, eids)]
        else:
            cur = []
        for pdf in pdfs:
            cur.extend(zip(pdf["value"].astype(float), pdf["event_id"].astype(int)))
        cur.sort(key=lambda t: (-t[0], t[1]))
        cur = cur[:k]
        state.update(([v for v, _ in cur], [e for _, e in cur]))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)] * len(cur),
                "rank": list(range(1, len(cur) + 1)),
                "value": [t[0] for t in cur],
                "event_id": [t[1] for t in cur],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_to_memory(stream_df: DataFrame, name: str, timeout_sec: float = 60.0):
    """Start a memory-sink query and block until the source is drained."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def interval_join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: purchases matched to clicks within a
    bounded event-time interval.

    Both sides carry watermarks and the join predicate carries a time range
    (click within ``max_gap`` before the purchase), so Spark can bound the
    state store on both sides — the streaming analog of the batch
    ``events_asof_join``'s candidate step. Without the interval bound the
    state would grow forever; this is the canonical correct shape.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    return p.join(
        c,
        (p.user_id == c.c_user)
        & (c.click_ts < p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


def session_window_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Native session windows: Spark's built-in gap-based sessionization.

    The declarative twin of :func:`sessionize_stateful` — state management,
    gap merging and eviction are the engine's problem, which is exactly
    what you want at scale (the custom applyInPandasWithState form is for
    semantics session_window can't express)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
