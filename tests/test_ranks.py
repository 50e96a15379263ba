"""Property tests for the hierarchical global rank (functions/ranks.py)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from map_reduce_in_go_spark.functions.caching import release_persisted
from map_reduce_in_go_spark.functions.ranks import with_global_rank


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=300
    )
)
def test_global_rank_equals_sorted_order(spark, vals):
    """For ANY input (dupes, skew, empty), the distributed rank equals the
    single-node sorted order with the id tiebreak — dense 1..N."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long") if rows else (
        spark.range(0).select(F.col("id"), F.lit(0).alias("v"))
    )
    ranked, total = with_global_rank(df, [F.asc("v"), F.asc("id")])
    got = {r["id"]: r["r"] for r in ranked.collect()}
    release_persisted()
    assert total == len(vals)
    want_order = sorted(rows, key=lambda t: (t[1], t[0]))
    want = {id_: i + 1 for i, (id_, _) in enumerate(want_order)}
    assert got == want


def test_global_prefix_sum_exact_decimal(spark):
    """Weighted prefix sum: exact DECIMAL running totals equal the
    single-node sorted cumsum, any order direction, dupes included."""
    from decimal import Decimal

    from map_reduce_in_go_spark.functions.ranks import with_global_prefix_sum

    rows = [(i, Decimal(f"{(i * 37) % 100}.{(i * 7) % 100:02d}")) for i in range(257)]
    df = spark.createDataFrame(rows, "id long, v decimal(22,2)")
    ranked, n, total = with_global_prefix_sum(
        df, [F.desc("v"), F.asc("id")], "v", "rnk", "cum"
    )
    got = {r["id"]: (r["rnk"], r["cum"]) for r in ranked.collect()}
    release_persisted()
    assert n == len(rows)
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    run = Decimal(0)
    for i, (id_, v) in enumerate(order):
        run += v
        assert got[id_] == (i + 1, run), id_
    assert total == run


def test_global_prefix_sum_rejects_null_values(spark):
    """NULL in value_col must fail loudly (r8 advice): F.sum's offsets skip
    NULLs while the Arrow fold would propagate them — two silently
    disagreeing views of the same column."""
    import pytest
    from decimal import Decimal

    from map_reduce_in_go_spark.functions.ranks import with_global_prefix_sum

    rows = [(1, Decimal("1.00")), (2, None), (3, Decimal("3.00"))]
    df = spark.createDataFrame(rows, "id long, v decimal(22,2)")
    with pytest.raises(Exception, match="NULL"):
        ranked, _, _ = with_global_prefix_sum(
            df, [F.asc("id")], "v", "rnk", "cum"
        )
        ranked.collect()
    release_persisted()


def test_orders_pareto_empty_input(spark, tmp_path):
    """Empty orders table: orders_pareto returns zero rows instead of
    raising float(None) (r8 advice)."""
    from map_reduce_in_go_spark.plans.tpch import orders_pareto
    from map_reduce_in_go_spark.sources.tables import load_table

    real = load_table(spark, "/root/testdata/sf0.001", "orders")
    real.limit(0).write.parquet(str(tmp_path / "orders.parquet"))
    out = orders_pareto(spark, str(tmp_path))
    assert out.count() == 0
    release_persisted()
