"""Mergeable HLL sketch family: rollup-union invariance + streaming twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_in_go_spark.operators.approx import (
    sketch_rollup_raw,
    sketch_rollup_users,
)
from map_reduce_in_go_spark.sources.tables import load_table


def test_rollup_union_equals_single_pass_sketch(spark, sf_dir):
    """Union of per-day sketches must give the exact same estimate as one
    sketch over the whole table — the partitioned-rollup contract."""
    got = {
        r["event_type"]: (r["approx_users"], r["n_events"])
        for r in sketch_rollup_raw(spark, sf_dir).collect()
    }
    # the registered (hash-checkable) wrapper must agree: verdict TRUE
    # everywhere with the same exact counts
    wrapped = sketch_rollup_users(spark, sf_dir).collect()
    assert all(r["approx_ok"] for r in wrapped)
    whole = {
        r["event_type"]: r["u"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("u"))
        .collect()
    }
    exact = {
        r["event_type"]: (r["u"], r["n"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"), F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t in got:
        assert got[t][0] == whole[t], "union-of-parts != single-pass sketch"
        assert got[t][1] == exact[t][1]
        # HLL_4 lgK=12 default: relative error well under 5% at this scale
        assert abs(got[t][0] - exact[t][0]) <= max(2, 0.05 * exact[t][0])


def test_streaming_sketch_matches_batch_estimate(spark, sf_dir, tmp_path):
    """After the stream drains, each type's final streaming estimate equals
    the batch single-pass sketch over the same events (merge invariance
    across micro-batch state updates)."""
    from map_reduce_in_go_spark.streaming.sketches import (
        distinct_users_sketch_stream,
    )
    from tests.test_streaming_anomaly import _dump_events_json, _stream

    drops = tmp_path / "drops"
    _dump_events_json(spark, sf_dir, drops, n_files=3)
    q = (
        distinct_users_sketch_stream(_stream(spark, drops))
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        emitted = spark.sql("SELECT * FROM hll_stream").collect()
    finally:
        q.stop()
    final: dict[str, tuple] = {}
    for r in emitted:  # keep the last (largest n_events) emission per type
        cur = final.get(r["event_type"])
        if cur is None or r["n_events"] > cur[1]:
            final[r["event_type"]] = (r["approx_users"], r["n_events"])
    want = {
        r["event_type"]: (r["u"], r["n"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("u"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert final == want


def test_windowed_sketch_stream_produces_day_rollup(spark, sf_dir, tmp_path):
    """The tumbling-window streaming form emits the same per-(day, type)
    estimates a batch day-rollup computes."""
    from map_reduce_in_go_spark.streaming.sketches import (
        windowed_distinct_users_sketch,
    )
    from tests.test_streaming_anomaly import _dump_events_json, _stream

    drops = tmp_path / "drops"
    _dump_events_json(spark, sf_dir, drops, n_files=2)
    q = (
        windowed_distinct_users_sketch(_stream(spark, drops))
        .writeStream.format("memory")
        .queryName("hll_win")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        emitted = spark.sql("SELECT * FROM hll_win").collect()
    finally:
        q.stop()
    final: dict[tuple, tuple] = {}
    for r in emitted:
        key = (str(r["window_start"]), r["event_type"])
        cur = final.get(key)
        if cur is None or r["n_events"] > cur[1]:
            final[key] = (r["approx_users"], r["n_events"])
    want = {
        (str(r["day"]), r["event_type"]): (r["u"], r["n"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("u"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert final == want
