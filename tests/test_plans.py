"""Physical-plan assertions: the optimizations we promise actually appear.

These guard the 100 TB design claims: filters reach the parquet scan,
dimension joins broadcast, wordcount partial-aggregates before its shuffle.
"""

from __future__ import annotations

import contextlib
import io

from map_reduce_in_go_spark.operators.wordcount import wordcount
from map_reduce_in_go_spark.plans.tpch import (
    q1_pricing_summary,
    q5_local_supplier,
    q6_forecast_revenue,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filter_pushdown(spark, sf_dir):
    plan = _plan(q6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters:" in plan
    # shipdate range + discount + quantity predicates reach the scan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]


def test_q6_column_pruning(spark, sf_dir):
    plan = _plan(q6_forecast_revenue(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 needed columns are read, not all 11
    assert "l_extendedprice" in read_schema and "l_returnflag" not in read_schema


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(q5_local_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(q1_pricing_summary(spark, sf_dir))
    assert "HashAggregate" in plan
    # partial agg before the exchange: two HashAggregate nodes
    assert plan.count("HashAggregate") >= 2


def test_wordcount_stays_jvm_side(spark, sf_dir):
    # no Python eval nodes: tokenization must be pure Catalyst expressions
    plan = _plan(wordcount(spark, sf_dir))
    assert "HashAggregate" in plan and "Exchange" in plan
    assert "BatchScan" in plan or "Scan parquet" in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


def test_wordcount_wholestage_codegen(spark, sf_dir):
    # WholeStageCodegen only shows on the executed plan under AQE; collect
    # this exact DataFrame so its own QueryExecution is the one finalized
    df = wordcount(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # "*(n)" prefixes mark WholeStageCodegen stages in the final AQE plan
    assert "== Final Plan ==" in executed
    assert "*(" in executed


def test_asof_join_strictly_prior(spark, sf_dir):
    from map_reduce_in_go_spark.plans.events import events_asof_join

    rows = events_asof_join(spark, sf_dir).collect()
    assert rows  # purchases exist in every sf
    for r in rows:
        if r["click_ts_us"] is not None:
            assert r["click_ts_us"] < r["purchase_ts_us"]
        assert r["purchase_id"] is not None


def test_anti_join_plans_have_no_cartesian(spark, sf_dir):
    """q16/q21/q22 anti/semi joins must plan as hash/broadcast joins, not
    nested-loop cartesians."""
    from map_reduce_in_go_spark.plans.tpch import (
        q16_parts_supplier_cnt,
        q21_late_supplier,
        q22_idle_customers,
    )

    for fn in (q16_parts_supplier_cnt, q21_late_supplier, q22_idle_customers):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__


def test_new_query_filters_reach_the_scan(spark, sf_dir):
    """Constant predicates must appear as PushedFilters on the parquet
    scans, not as post-scan Filter nodes only."""
    from map_reduce_in_go_spark.plans.tpch import (
        q16_parts_supplier_cnt,
        q17_small_qty_revenue,
        q22_idle_customers,
    )

    expectations = [
        (q22_idle_customers, "o_orderpriority"),  # urgent filter on orders scan
        (q16_parts_supplier_cnt, "s_acctbal"),  # deficit filter on supplier scan
        (q17_small_qty_revenue, "p_brand"),  # brand filter on part scan
    ]
    for fn, col in expectations:
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        pushed = [
            seg.split("]", 1)[0]
            for seg in plan.split("PushedFilters: [")[1:]
        ]
        assert any(col in seg for seg in pushed), (fn.__name__, col, pushed)


def test_events_outliers_broadcasts_fences(spark, sf_dir):
    from map_reduce_in_go_spark.plans.olap import events_outliers

    plan = _plan(events_outliers(spark, sf_dir))
    # the 5-row per-type fence table must broadcast, never shuffle the fact
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_pagerank_plan_stays_bounded(spark, sf_dir):
    """localCheckpoint per round: the final plan must be one LogicalRDD scan
    deep, not a 10-iteration join tower."""
    from map_reduce_in_go_spark.operators.graph import pagerank_docs

    df = pagerank_docs(spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan
    # a lineage blowup would show every iteration's join in the plan text
    assert plan.count("Join") <= 1
    assert len(plan.splitlines()) < 30


def test_global_topn_avoids_total_sort(spark, sf_dir):
    from map_reduce_in_go_spark.plans.tpch import orders_global_topn

    plan = _plan(orders_global_topn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # a global Sort + Exchange(rangepartitioning) would be the 100 TB accident
    assert "rangepartitioning" not in plan


def test_value_position_single_window(spark, sf_dir):
    """Five positional stats, one shared ordering → exactly one Window
    operator (each extra ordering would cost another shuffle+sort)."""
    from map_reduce_in_go_spark.plans.olap import events_value_position

    import re

    plan = _plan(events_value_position(spark, sf_dir))
    # formatted plans name each operator once in the detail section
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 1


def test_cooccurrence_single_window(spark, sf_dir):
    """Both lead distances (±1, ±2) share one doc-order sort → exactly one
    Window operator; the old two-pass union paid the partition sort twice
    (r7 verdict finding #2)."""
    from map_reduce_in_go_spark.operators.wordcount import cooccurrence_topk

    import re

    plan = _plan(cooccurrence_topk(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 1


def test_aqe_splits_skewed_join(spark):
    """Skew survival at scale is AQE's job: a Zipf-headed join partition
    must be split at runtime (SortMergeJoin(skew=true)), not processed as
    one straggler task. Thresholds are lowered so a test-sized input skews
    the same way a hot key does at 100 TB."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 270_500
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_range_join_bucketed_parity_and_plan(spark, sf_dir):
    """The interval-bucketed range join must agree row-for-row with the BNLJ
    twin, and its physical plan must actually be an equality hash join."""
    from map_reduce_in_go_spark.plans.events import (
        events_range_join,
        events_range_join_bucketed,
    )

    bnlj = {tuple(r) for r in events_range_join(spark, sf_dir).collect()}
    bucketed_df = events_range_join_bucketed(spark, sf_dir)
    bucketed = {tuple(r) for r in bucketed_df.collect()}
    assert bucketed == bnlj
    plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_events_anomaly_mad_invariants(spark, sf_dir):
    from map_reduce_in_go_spark.plans.olap import events_anomaly_mad

    rows = events_anomaly_mad(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0.0
        assert 0 <= r["n_anomalies"] <= r["n_total"]


def test_asof_nearest_single_sort(spark, sf_dir):
    """Both as-of directions (prior last / next first) share one window
    ordering: the plan pays exactly one Exchange and one Sort — a second
    sort (or an inequality self-join) would be the 100 TB accident."""
    import re

    from map_reduce_in_go_spark.plans.events import events_asof_nearest

    plan = _plan(events_asof_nearest(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Sort", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_global_rank_single_full_data_exchange(spark, sf_dir):
    """with_global_rank: the only full-data exchange is the range
    partition itself — the rank pass is an order-preserving Arrow counter,
    not a second Window shuffle. (corpus_shuffle = md5 + rank, so its plan
    shows exactly one Exchange, and it is rangepartitioning.)"""
    import re

    from map_reduce_in_go_spark.operators.curation import corpus_shuffle

    plan = _plan(corpus_shuffle(spark, sf_dir))
    # the persisted rank frame's cached plan appears twice in formatted
    # output (in-memory relation + its build); what matters: every
    # Exchange is the range partition, none is a hash re-shuffle, and no
    # Window operator exists anywhere
    assert "rangepartitioning" in plan
    assert "hashpartitioning" not in plan
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 0
