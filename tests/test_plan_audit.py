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
    assert not feats["cartesian"], name
    assert not feats["python_row_udf"], name
    if feats["bnlj"]:
        assert name in SCALAR_CROSS_OK, name
