"""Streaming twins of the batch anomaly/quality detectors.

Two complementary shapes, matching how live ingest pipelines actually run
these detectors:

- :func:`start_anomaly_monitor` — **micro-batch recompute over a durable
  snapshot**. Each micro-batch lands in a :class:`ManifestTable` (ACID,
  replay-ledgered like streaming/ingest.py), then the *batch* detector —
  the very same plan the oracle-checked batch query runs
  (``mad_fences`` / ``zscore_flags``) — recomputes over the table snapshot
  and writes its current verdict to an idempotent per-batch output zone.
  Median/MAD is not incrementally maintainable (a median is a rank
  statistic), so honest streaming MAD IS periodic recompute over durable
  state; the optional ``horizon`` bounds the recompute to a trailing
  event-time window (at 100 TB the snapshot is time-partitioned and the
  horizon becomes partition pruning — the recompute cost is then flat in
  stream lifetime, proportional to the window).

- :func:`zscore_running_stateful` — **true incremental state** for the
  moment-based detector. Count/Σx/Σx² are associative, so per-user running
  moments live in ``applyInPandasWithState`` state and each micro-batch
  emits the exact global-so-far mean/variance — after the source drains,
  the emitted stats equal the batch query's moments bit-for-bit in exact
  arithmetic (values quantized to cents, matching the batch DECIMAL(18,2)
  discipline, accumulated as integer cents so Python float summation order
  cannot drift).

Parity is pinned by tests/test_streaming_anomaly.py against the batch
operators' output over the same events — the same twin-discipline as the
session-window/batch-sessionize parity test.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..sources.manifest_table import ManifestTable
from .sinks import write_batch_idempotent

_DETECTORS = ("mad", "zscore")


def _detect(snapshot: DataFrame, detector: str) -> DataFrame:
    if detector == "mad":
        from ..plans.olap import mad_fences

        return mad_fences(snapshot)
    if detector == "zscore":
        from ..plans.events import zscore_flags

        return zscore_flags(snapshot)
    raise ValueError(f"unknown detector {detector!r}; pick from {_DETECTORS}")


def monitor_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    tbl: ManifestTable,
    out_dir: str,
    batch_id: int,
    detector: str = "mad",
    horizon: str | None = None,
    app_id: str = "anomaly",
) -> bool:
    """Land one micro-batch, rerun the detector over the snapshot, publish.

    The append is ledgered (``<app_id>-batch-<id>``) so a replayed batch
    never double-appends its events; the detector output is rewritten
    idempotently either way (recompute over an unchanged snapshot yields
    identical rows). ``horizon`` (e.g. ``"7 days"``) bounds the detector's
    input to events within that event-time distance of the snapshot's max
    ``ts`` — the trailing-window form a monitor runs forever on.
    """
    op = f"{app_id}-batch-{batch_id}"
    if op not in tbl.committed_ops():
        tbl.append(batch_df, op=op)
    snap = tbl.read(spark)
    if horizon is not None:
        hi = snap.agg(F.max("ts").alias("m")).first()["m"]  # 1-row scalar
        if hi is not None:
            snap = snap.filter(
                F.col("ts") >= F.lit(hi) - F.expr(f"INTERVAL {horizon}")
            )
    write_batch_idempotent(_detect(snap, detector), batch_id, out_dir)
    return True


def start_anomaly_monitor(
    stream_events: DataFrame,
    table_root: str,
    out_dir: str,
    checkpoint_dir: str,
    detector: str = "mad",
    horizon: str | None = None,
    app_id: str = "anomaly",
):
    """events stream → durable snapshot → batch-identical detector verdicts.

    Output zone layout: ``batch_id=<n>/`` holds the detector's full result
    as of that micro-batch; the largest batch id is the current verdict and
    earlier ones are the monitor's history (cheap retention: drop old dirs).
    """
    spark = stream_events.sparkSession
    tbl = ManifestTable(table_root)
    return (
        stream_events.writeStream.foreachBatch(
            lambda df, bid: monitor_batch(
                spark, df, tbl, out_dir, bid, detector, horizon, app_id
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


ZSCORE_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("var", DoubleType()),
    ]
)

# state: exact integer cents so accumulation across micro-batches is
# order-independent (Σ cents and Σ cents² fit int64 far past any real user)
_ZSCORE_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s1_cents", LongType()),
        StructField("s2_cents2", LongType()),
    ]
)


def zscore_running_stateful(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running moments (n, mean, var) with exact-cents state.

    Incremental twin of the batch ``events_zscore`` statistics: values are
    quantized to cents (the batch plan's DECIMAL(18,2) cast) and summed as
    integers in group state, so after any number of micro-batches in any
    arrival order the emitted mean/var for a user equal the batch plan's
    ``s1/n`` and ``s2/n − mean²`` exactly. Emits the updated stats for every
    user a micro-batch touches (outputMode update); the anomaly *flags*
    over history are the snapshot detector's job
    (:func:`start_anomaly_monitor`) — state here is O(1) per user, which is
    what lets this run forever on an unbounded stream. ``idle_timeout_ms``
    bounds it across KEYS too: an idle user's moments are evicted after the
    TTL (the snapshot detector still covers their history), keeping total
    state proportional to active users. Default None preserves the exact
    batch-parity semantics the parity tests pin.
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()  # idle TTL: drop this key's running moments
            return
        n, s1, s2 = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            # HALF_UP (away from zero) at the cent, matching the
            # DECIMAL(18,2) cast; pandas' .round is half-even and disagrees
            import numpy as np

            v = pdf["value"].to_numpy(dtype="float64")
            cents = np.trunc(v * 100 + np.copysign(0.5, v)).astype("int64")
            n += len(pdf)
            s1 += int(cents.sum())
            s2 += int((cents * cents).sum())
        state.update((n, s1, s2))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        mean = (s1 / 100.0) / n
        var = (s2 / 10000.0) / n - mean * mean
        yield pd.DataFrame(
            {"user_id": [user_id], "n": [n], "mean": [mean], "var": [var]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ZSCORE_STATS_SCHEMA,
        stateStructType=_ZSCORE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
