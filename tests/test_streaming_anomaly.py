"""Streaming anomaly twins: micro-batch snapshot recompute + running moments.

Parity discipline: the streaming forms must reproduce the oracle-checked
batch detectors' output over the same events — same twin pattern as the
session-window/batch-sessionize parity test.
"""

from __future__ import annotations

import json

import pytest

from map_reduce_in_go_spark.sources.manifest_table import ManifestTable
from map_reduce_in_go_spark.sources.tables import load_table
from map_reduce_in_go_spark.streaming.anomaly import (
    monitor_batch,
    start_anomaly_monitor,
    zscore_running_stateful,
)
from map_reduce_in_go_spark.streaming.events import EVENT_SCHEMA


def _dump_events_json(spark, sf_dir, out_dir, n_files=3):
    """Write the real events table as n_files json drops (n micro-batches)."""
    pdf = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .toPandas()
    )
    out_dir.mkdir()
    chunks = [pdf.iloc[i::n_files] for i in range(n_files)]
    for i, chunk in enumerate(chunks):
        lines = [
            json.dumps(
                {
                    "event_id": int(r.event_id),
                    "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z",
                    "user_id": int(r.user_id),
                    "event_type": r.event_type,
                    "value": float(r.value),
                    "props": r.props,
                }
            )
            for r in chunk.itertuples(index=False)
        ]
        (out_dir / f"part-{i}.json").write_text("\n".join(lines) + "\n")
    return len(pdf)


def _stream(spark, drop_dir):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(drop_dir))
    )


@pytest.mark.parametrize("detector", ["mad", "zscore"])
def test_monitor_final_verdict_matches_batch(spark, sf_dir, tmp_path, detector):
    """After the stream drains, the newest batch_id's output equals the
    batch detector over the full events table — row-for-row."""
    from map_reduce_in_go_spark.plans.events import events_zscore
    from map_reduce_in_go_spark.plans.olap import events_anomaly_mad

    drops = tmp_path / "drops"
    _dump_events_json(spark, sf_dir, drops, n_files=3)
    out = tmp_path / "verdicts"
    q = start_anomaly_monitor(
        _stream(spark, drops),
        str(tmp_path / "tbl"),
        str(out),
        str(tmp_path / "ckpt"),
        detector=detector,
    )
    q.awaitTermination(180)

    batch_dirs = sorted(out.glob("batch_id=*"), key=lambda p: int(p.name.split("=")[1]))
    assert len(batch_dirs) == 3, "one verdict per micro-batch"
    final = spark.read.parquet(str(batch_dirs[-1]))
    batch_fn = events_anomaly_mad if detector == "mad" else events_zscore
    want = sorted(map(tuple, batch_fn(spark, sf_dir).collect()))
    got = sorted(map(tuple, final.collect()))
    assert got == want


def test_monitor_replay_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch (foreachBatch is at-least-once) must not
    double-append its events or change the published verdict."""
    rows = [
        (1, "2024-01-01T00:00:00.000Z", 1, "view", 10.0, "{}"),
        (2, "2024-01-01T00:01:00.000Z", 1, "view", 11.0, "{}"),
        (3, "2024-01-01T00:02:00.000Z", 2, "click", 500.0, "{}"),
        (4, "2024-01-01T00:03:00.000Z", 2, "click", 1.0, "{}"),
    ]
    batch = spark.createDataFrame(
        [
            {
                "event_id": e,
                "ts": ts.replace("T", " ").replace(".000Z", ""),
                "user_id": u,
                "event_type": t,
                "value": v,
                "props": p,
            }
            for e, ts, u, t, v, p in rows
        ],
        schema="event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props",
    )
    tbl = ManifestTable(str(tmp_path / "tbl"))
    out = str(tmp_path / "verdicts")
    assert monitor_batch(spark, batch, tbl, out, 0, detector="mad")
    v = tbl.version()
    first = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert monitor_batch(spark, batch, tbl, out, 0, detector="mad")  # replay
    assert tbl.version() == v, "replayed batch re-appended its events"
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == first


def test_monitor_horizon_bounds_detector_input(spark, tmp_path):
    """With a horizon, events older than max(ts) − horizon are excluded from
    the recompute — the trailing-window monitor a live pipeline runs."""
    old = [(i, f"2024-01-01 00:0{i}:00", 1, "view", 1000.0, "{}") for i in range(3)]
    new = [
        (10 + i, f"2024-03-01 00:0{i}:00", 1, "view", float(i + 1), "{}")
        for i in range(4)
    ]
    batch = spark.createDataFrame(
        old + new,
        schema="event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props",
    )
    tbl = ManifestTable(str(tmp_path / "tbl"))
    out = str(tmp_path / "verdicts")
    monitor_batch(spark, batch, tbl, out, 0, detector="mad", horizon="7 days")
    got = spark.read.parquet(out).collect()
    # only the 4 March events are in scope: total count proves the bound
    assert sum(r["n_total"] for r in got) == 4


def test_zscore_running_stateful_matches_batch_moments(spark, sf_dir, tmp_path):
    """After the source drains, each user's last emitted (n, mean, var)
    equals the batch plan's exact-decimal moments — bit-for-bit."""
    from pyspark.sql import functions as F

    from map_reduce_in_go_spark.functions.money import money

    drops = tmp_path / "drops"
    _dump_events_json(spark, sf_dir, drops, n_files=2)
    q = (
        zscore_running_stateful(_stream(spark, drops))
        .writeStream.format("memory")
        .queryName("zs_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        emitted = spark.sql("SELECT * FROM zs_running").collect()
    finally:
        q.stop()
    # keep each user's final emission (largest n)
    final: dict[int, tuple] = {}
    for r in emitted:
        if r["user_id"] not in final or r["n"] > final[r["user_id"]][0]:
            final[r["user_id"]] = (r["n"], r["mean"], r["var"])

    ev = load_table(spark, sf_dir, "events")
    vd = money("value")
    want = {
        r["user_id"]: (r["n"], r["mean"], r["var"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(vd).cast("double").alias("s1"),
            F.sum(vd * vd).cast("double").alias("s2"),
        )
        .selectExpr("user_id", "n", "s1 / n AS mean", "s2 / n - (s1/n)*(s1/n) AS var")
        .collect()
    }
    assert set(final) == set(want)
    for uid in want:
        assert final[uid][0] == want[uid][0], uid
        assert final[uid][1] == pytest.approx(want[uid][1], abs=0, rel=0), uid
        assert final[uid][2] == pytest.approx(want[uid][2], abs=1e-12), uid
