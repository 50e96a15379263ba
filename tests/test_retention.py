"""Tests for retention/SCD-2/histogram/hopping plans (plans/retention.py)."""

from __future__ import annotations

from collections import defaultdict

from map_reduce_in_go_spark.plans import retention as ret
from map_reduce_in_go_spark.sources.tables import load_table


def test_scd2_intervals_tile_per_user(spark, sf_dir):
    rows = ret.events_scd2(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: r["valid_from_us"])
        for a, b in zip(user_rows, user_rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]  # gap-free chain
            assert a["event_type"] != b["event_type"]  # real state changes
        assert user_rows[-1]["valid_to_us"] == ret.MAX_US  # open current row


def test_weekly_active_invariants(spark, sf_dir):
    rows = ret.events_weekly_active(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["wau"] >= r["dau"] > 0
        assert 0.0 < r["stickiness"] <= 1.0


def test_histogram_counts_total(spark, sf_dir):
    total = load_table(spark, sf_dir, "events").count()
    rows = ret.events_value_histogram(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == total
    for r in rows:
        assert 0 <= r["bucket"] < ret.HIST_BUCKETS
        assert r["hi"] - r["lo"] == ret.HIST_WIDTH


def test_hopping_counts_each_event_twice(spark, sf_dir):
    total = load_table(spark, sf_dir, "events").count()
    rows = ret.events_hopping(spark, sf_dir).collect()
    # window/slide = 2 → every event contributes to exactly two windows
    assert sum(r["n_events"] for r in rows) == 2 * total


def test_retention_cohorts_shape(spark, sf_dir):
    rows = ret.events_retention_cohorts(spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(dict)
    for r in rows:
        by_cohort[r["cohort_week"]][r["week_n"]] = r["retention"]
    for weeks in by_cohort.values():
        assert weeks.get(0) == 1.0  # week 0 = whole cohort active
        assert all(0.0 < v <= 1.0 for v in weeks.values())


def test_orders_rfm_scores(spark, sf_dir):
    rows = ret.orders_rfm(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["segment"] == f'{r["r_score"]}{r["f_score"]}{r["m_score"]}'
    # quintiles are balanced: each m tile within 1 of n/5
    from collections import Counter

    c = Counter(r["m_score"] for r in rows)
    n = len(rows)
    assert all(abs(c[t] - n / 5) <= 1 for t in range(1, 6))
