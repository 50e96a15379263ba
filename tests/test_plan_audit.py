"""The plan-hygiene gate as a living test: a representative slice of the
registry must stay free of scale anti-patterns (full sweep:
tools/plan_audit.py → PLAN_AUDIT.md)."""

from __future__ import annotations

import pytest

# One query per family, chosen cheap-to-build: relational, OLAP window,
# events, dedup, ANN, text, curation, graph, plus this round's additions.
SAMPLE = [
    "q3_shipping_priority",
    "events_value_position",
    "events_asof_nearest",
    "dedup_minhash",
    "dedup_containment_exact",
    "ann_lsh",
    "quality_normalized",
    "corpus_shuffle",
    "orders_pareto",
    "graph_triangles",
    # r10: rewritten off single-reducer global windows — keep them that way
    "corpus_budget_select",
    "orders_rfm",
    "basket_pairs",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_plan_audit_sample(spark, sf_dir, name):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.plan_audit import SCALAR_CROSS_OK, audit_one

    from map_reduce_in_go_spark import registry
    from map_reduce_in_go_spark.functions.caching import release_persisted

    try:
        feats = audit_one(spark, name, registry.queries()[name], sf_dir)
    finally:
        release_persisted()
    from tools.plan_audit import GLOBAL_WINDOW_OK

    assert not feats["cartesian"], name
    assert not feats["python_row_udf"], name
    if feats["bnlj"]:
        assert name in SCALAR_CROSS_OK, name
    if feats["global_window"]:
        assert name in GLOBAL_WINDOW_OK, (name, feats["global_window"])


def test_global_window_detector(spark):
    """The r9-verdict blind spot, pinned: a deliberately-unpartitioned
    sorted Window must be flagged; a partitioned one (and a sort-free
    partition-only one) must not."""
    import sys

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tools.plan_audit import find_global_windows

    df = spark.range(100).withColumn("g", F.pmod("id", F.lit(7)))

    def plan_of(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert find_global_windows(plan_of(bad)), "global sorted window missed"

    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert not find_global_windows(plan_of(good))

    part_only = df.withColumn(
        "s",
        F.sum("id").over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    assert not find_global_windows(plan_of(part_only))
