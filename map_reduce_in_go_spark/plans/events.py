"""Event-stream analytics (batch form; streaming twins live in
``streaming/events.py``).

Determinism notes:
- orderings always break ties on ``event_id`` (unique);
- durations are integer microseconds (``unix_micros``) — no float time math;
- running sums are rounded after accumulation in a fixed frame order.

Scale: all four plans shuffle once on ``user_id`` (or the window key); at
100 TB the events table would be date-partitioned so window queries prune,
and the sessionize/funnel shuffles are the classic "fits because it's
per-user state" shape (max per-user event counts are bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import money, sql_sum_exact, sum_exact
from ..sources.tables import load_table

_VAL = "CAST(value AS DECIMAL(12,2))"


def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregates per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            # formatted string, not timestamp: keeps the compared dtype
            # identical across Spark(us) and DuckDB(ns→us) readers
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            sum_exact(money("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization via window functions, session stats."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    with_flag = ev.withColumn("us", F.col("ts_us")).withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    with_session = with_flag.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("us") - F.min("us")).alias("duration_us"),
            sum_exact(money("value")).alias("sum_value"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel (strictly ordered per user)."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        views.agg(F.count("*").alias("n_view"))
        .crossJoin(clicks.agg(F.count("*").alias("n_click")))
        .crossJoin(purchases.agg(F.count("*").alias("n_purchase")))
    )


def events_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running value sum + sequence number (cumulative window)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.sum(money("value")).over(w), 2).cast("double").alias("running_value"),
        F.row_number().over(seq_w).alias("seq"),
    )


def events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flags via exact decimal moments.

    mean and variance come from exact DECIMAL Σx and Σx² (order-independent),
    so every engine computes identical doubles; sqrt/division are IEEE
    correctly-rounded, making the z-scores deterministic too. Emits events
    with |z| ≥ 2.
    """
    ev = load_table(spark, sf_dir, "events")
    vd = money("value")
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(vd).cast("double").alias("s1"),
        F.sum(vd * vd).cast("double").alias("s2"),
    )
    joined = ev.join(F.broadcast(stats), "user_id").filter(F.col("n") >= 2)
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        joined.filter(var > 0)
        .withColumn("z", F.round(z, 4))
        .filter(F.abs(F.col("z")) >= 2.0)
        .select("event_id", "user_id", F.round(mean, 6).alias("user_mean"), "z")
    )


ORACLES: dict[str, str] = {
    "events_zscore": """
    WITH stats AS (
      SELECT user_id, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
      FROM events GROUP BY user_id
    )
    SELECT event_id, e.user_id,
           round(s1 / n, 6) AS user_mean,
           round((value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 4) AS z
    FROM events e JOIN stats USING (user_id)
    WHERE n >= 2 AND s2 / n - (s1 / n) * (s1 / n) > 0
      AND abs(round((value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 4)) >= 2.0
    """,
    "events_windowed": """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
           count(*) AS n_events,
           {sum_value} AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """.replace("{sum_value}", sql_sum_exact(_VAL)),
    "events_sessionize": """
    WITH flagged AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           max(us) - min(us) AS duration_us,
           {sum_value} AS sum_value
    FROM sess GROUP BY user_id, session_id
    """.replace("{sum_value}", sql_sum_exact(_VAL)),
    "events_funnel": """
    WITH v AS (
      SELECT user_id, min(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS ct
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vt
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ct
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase
    """,
    "events_running": """
    SELECT event_id, user_id, event_type,
           CAST(round(sum({val}) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS INTEGER) AS seq
    FROM events
    """.replace("{val}", _VAL),
}
