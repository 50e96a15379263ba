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


def events_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase gets the SCD2 state valid at its ts.

    The feature-store shape — decorate facts with dimension attributes *as
    of* the fact's timestamp, never leaking future state. The declarative
    form is an interval-containment join (fact ⋈ dim ON key AND ts ∈
    [valid_from, valid_to)), which is what the oracle runs; the Spark plan
    is the linear asof composition instead: state changes and probes
    interleave per user in (ts, kind, event_id) order and
    ``last(state, ignorenulls)`` carries the governing change forward — one
    shuffle on user_id, no per-user fact×interval blowup, the same
    scale-safe recipe as ``events_asof_join``. Changes sort before probes
    at equal ts (inclusive lower bound) and among equal-ts changes the
    highest event_id wins, exactly matching which interval is non-empty.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            "ts_us",
            "event_id",
            F.col("event_type").alias("state"),
            F.lit(0).alias("kind"),
        )
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        "event_id",
        F.lit(None).cast("string").alias("state"),
        F.lit(1).alias("kind"),
    )
    un = changes.unionByName(probes)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        un.withColumn("pit_state", F.last("state", ignorenulls=True).over(w2))
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("pit_state").alias("state"),
        )
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
    "events_temporal_join": """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events
    ), chg AS (
      SELECT user_id, ts_us, event_id, event_type AS state,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id) AS prev
      FROM e
    ), changes AS (
      SELECT user_id, ts_us, event_id, state FROM chg
      WHERE prev IS NULL OR prev <> state
    ), iv AS (
      SELECT user_id, state, ts_us AS vf,
             lead(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS vt
      FROM changes
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           p.ts_us AS purchase_ts_us, iv.state
    FROM e p JOIN iv ON iv.user_id = p.user_id
     AND p.ts_us >= iv.vf AND (iv.vt IS NULL OR p.ts_us < iv.vt)
    WHERE p.event_type = 'purchase'
    """,
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


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-active week,
    tracked across subsequent weeks.

    Distinct (user, week) pairs → per-user cohort week (min) → (cohort,
    week_n) distinct-user counts over cohort size. Two shuffles, both keyed
    on user_id then the (small) matrix key — the standard cohort plan.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    )
    uw = ev.distinct()
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cw"))
    sizes = cohort.groupBy("cw").agg(F.count(F.lit(1)).alias("cohort_size"))
    mat = (
        uw.join(cohort, "user_id")
        .groupBy(
            "cw",
            F.expr("CAST(datediff(wk, cw) DIV 7 AS INT)").alias("week_n"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    return (
        mat.join(F.broadcast(sizes), "cw")
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_n",
            "n_users",
            F.round(F.col("n_users") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


def _ntile_from_rank(rank_col: str, n: int, k: int):
    """SQL ntile(k) as a per-row expression over a precomputed dense
    1-based global rank and known total ``n`` — the distributed ntile.

    Standard semantics (Spark == DuckDB): with q, r = divmod(n, k), the
    first r tiles hold q+1 rows and the rest hold q. A row of rank rn is
    in tile ceil(rn/(q+1)) while rn ≤ r·(q+1), else r + ceil((rn −
    r·(q+1))/q). ``greatest(q, 1)`` guards the (never-taken when n < k)
    second branch against a 0 divisor — when n < k every row satisfies
    rn ≤ r·(q+1) = n.
    """
    q, r = divmod(n, k)
    thr = r * (q + 1)
    q_safe = max(q, 1)  # guards the (never-taken when n < k) branch
    # integer DIV end-to-end: exact at any rank magnitude (a double
    # division would round near tile boundaries once ranks pass 2^53)
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {thr} "
        f"THEN ({rank_col} - 1) DIV {q + 1} + 1 "
        f"ELSE {r} + ({rank_col} - 1 - {thr}) DIV {q_safe} + 1 END AS INT)"
    )


def orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quintiles per customer.

    The per-customer aggregate collapses orders to one row per customer
    (the big shuffle). The quintiles (r10 rewrite) come from THREE
    distributed global ranks (``with_global_rank`` — range partition +
    broadcast offsets + Arrow counter, functions/ranks.py) chained over
    the reduced frame, each converted to an EXACT ntile(5) with the
    closed-form tile formula (:func:`_ntile_from_rank`) — bit-identical
    to SQL ntile, including the first-(n mod 5)-tiles-get-the-extra-row
    rule and the o_custkey tiebreaks, so the oracle is unchanged. The
    former three unpartitioned ntile windows each sorted the whole
    customer dimension in ONE reducer (r9 verdict); now each rank's only
    full exchange is its range partition.
    """
    from ..functions.ranks import with_global_rank

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        sum_exact(money("o_totalprice")).alias("monetary"),
    )
    ranked, n = with_global_rank(
        per, [F.desc("last_order"), F.asc("o_custkey")], "_rn_r"
    )
    ranked, _ = with_global_rank(
        ranked, [F.desc("frequency"), F.asc("o_custkey")], "_rn_f"
    )
    ranked, _ = with_global_rank(
        ranked, [F.desc("monetary"), F.asc("o_custkey")], "_rn_m"
    )
    return ranked.select(
        "o_custkey",
        F.date_format("last_order", "yyyy-MM-dd").alias("last_order"),
        "frequency",
        "monetary",
        _ntile_from_rank("_rn_r", n, 5).alias("r_score"),
        _ntile_from_rank("_rn_f", n, 5).alias("f_score"),
        _ntile_from_rank("_rn_m", n, 5).alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    )


ORACLES.update(
    {
        "events_retention_cohorts": """
        WITH uw AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS wk
          FROM events
        ), cohort AS (
          SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id
        ), sizes AS (
          SELECT cw, count(*) AS cohort_size FROM cohort GROUP BY cw
        ), mat AS (
          SELECT cw,
                 CAST(date_diff('day', cw, wk) // 7 AS INTEGER) AS week_n,
                 count(DISTINCT uw.user_id) AS n_users
          FROM uw JOIN cohort USING (user_id)
          GROUP BY 1, 2
        )
        SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_n, n_users,
               round(n_users / cohort_size, 6) AS retention
        FROM mat JOIN sizes USING (cw)
        """,
        "orders_rfm": f"""
        WITH per AS (
          SELECT o_custkey,
                 max(CAST(o_orderdate AS DATE)) AS last_order,
                 count(*) AS frequency,
                 {sql_sum_exact('CAST(o_totalprice AS DECIMAL(12,2))')}
                   AS monetary
          FROM orders GROUP BY o_custkey
        ), scored AS (
          SELECT *,
                 CAST(ntile(5) OVER (ORDER BY last_order DESC, o_custkey)
                      AS INTEGER) AS r_score,
                 CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                      AS INTEGER) AS f_score,
                 CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                      AS INTEGER) AS m_score
          FROM per
        )
        SELECT o_custkey, strftime(last_order, '%Y-%m-%d') AS last_order,
               frequency, monetary, r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                 || CAST(m_score AS VARCHAR) AS segment
        FROM scored
        """,
    }
)
