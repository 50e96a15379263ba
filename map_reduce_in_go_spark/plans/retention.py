"""Retention / slowly-changing-dimension / histogram analytics over events.

Four shapes a production events warehouse runs daily:

- :func:`events_scd2`        — SCD type-2 interval build (state-change log →
  validity intervals) via change-detection + lead()
- :func:`events_weekly_active` — DAU / rolling 7-day WAU / stickiness
- :func:`events_value_histogram` — fixed-width value histogram per type
- :func:`events_hopping`     — hopping (sliding) 1h/30min window aggregates,
  the batch twin of a sliding streaming window

Scale notes: scd2 shuffles once on user_id (bounded per-user state); WAU
joins the *distinct* (day, user) projection against a tiny broadcast day
spine (fan-out ≤ window_days per row, no events self-join); the histogram
and hopping aggs are single partial-agg shuffles — hopping materializes
exactly window/slide rows per event (2 here), the standard
explode-then-aggregate trade.

Determinism: timestamps stay integer micros until formatted; interval ends
use a MAX_US sentinel instead of NULL (NULL ordering/NaN casts differ
across engines); counts are exact ints and every ratio is rounded at 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import money, sql_sum_exact, sum_exact
from ..sources.tables import load_table

MAX_US = 9_223_372_036_854_775_807  # open-interval sentinel (int64 max)
WAU_DAYS = 7
HIST_WIDTH = 50.0
HIST_BUCKETS = 10
HOP_SLIDE_US = 30 * 60 * 1_000_000  # 30 min slide, 1 h window


def events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 intervals: collapse the per-user event log into validity
    ranges of ``event_type`` (from each state change until the next)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(F.lead("ts_us").over(w2), F.lit(MAX_US)).alias(
            "valid_to_us"
        ),
    )


def events_weekly_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives, rolling 7-day weekly actives, and DAU/WAU stickiness.

    Rolling *distinct* counts can't use a window frame; the classic scale
    shape is: distinct (day, user) pairs ⋈ broadcast day-spine within the
    lookback, then countDistinct per spine day.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    day_user = ev.distinct()
    spine = day_user.select(F.col("d").alias("sd")).distinct()
    dau = day_user.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        day_user.join(
            F.broadcast(spine),
            F.datediff(F.col("sd"), F.col("d")).between(0, WAU_DAYS - 1),
        )
        .groupBy("sd")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.sd)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``value`` per event type (capped top bucket)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / HIST_WIDTH), F.lit(HIST_BUCKETS - 1)
    ).cast("int")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bucket",
            (F.col("bucket").cast("double") * HIST_WIDTH).alias("lo"),
            ((F.col("bucket") + 1).cast("double") * HIST_WIDTH).alias("hi"),
            "n",
        )
    )


def events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregates: 1-hour windows sliding every 30 minutes.

    Each event lands in exactly window/slide = 2 windows; Spark's
    ``F.window(slideDuration=...)`` expands then aggregates — the same plan
    the streaming twin runs incrementally."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_exact(money("value")).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLES: dict[str, str] = {
    "events_scd2": f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
    ), chg AS (
      SELECT *, lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      FROM ev
    ), changes AS (
      SELECT user_id, event_type, ts_us, event_id FROM chg
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, ts_us AS valid_from_us,
           coalesce(lead(ts_us) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id),
             {MAX_US}) AS valid_to_us
    FROM changes
    """,
    "events_weekly_active": f"""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), spine AS (
      SELECT DISTINCT d AS sd FROM du
    ), dau AS (
      SELECT d, count(DISTINCT user_id) AS dau FROM du GROUP BY d
    ), wau AS (
      SELECT sd, count(DISTINCT user_id) AS wau
      FROM du JOIN spine
        ON du.d <= spine.sd
       AND du.d >= spine.sd - INTERVAL {WAU_DAYS - 1} DAY
      GROUP BY sd
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, dau, wau,
           round(dau / wau, 6) AS stickiness
    FROM dau JOIN wau ON d = sd
    """,
    "events_value_histogram": f"""
    WITH b AS (
      SELECT event_type,
             CAST(least(floor(value / {HIST_WIDTH}), {HIST_BUCKETS - 1})
                  AS INTEGER) AS bucket
      FROM events
    )
    SELECT event_type, bucket,
           bucket * {HIST_WIDTH} AS lo,
           (bucket + 1) * {HIST_WIDTH} AS hi,
           count(*) AS n
    FROM b GROUP BY event_type, bucket
    """,
    "events_hopping": f"""
    WITH e AS (
      SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
             epoch_us(ts) AS ts_us FROM events
    ), x AS (
      SELECT event_type, v,
             (ts_us // {HOP_SLIDE_US} - k.k) * {HOP_SLIDE_US} AS start_us
      FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    )
    SELECT strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n_events,
           {sql_sum_exact('v')} AS sum_value
    FROM x GROUP BY 1, 2
    """,
}
