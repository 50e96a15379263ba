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


def test_global_dense_rank_matches_pandas(spark):
    """Fused dense rank: equal tuples share a rank, ranks are dense
    1..#distinct in tuple order, totals are exact — vs pandas."""
    import pandas as pd

    from map_reduce_in_go_spark.functions.ranks import with_global_dense_rank

    rows = [(i, (i * 7) % 23, (i * 13) % 5) for i in range(997)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    ranked, n, d = with_global_dense_rank(df, ["a", "b"], "rk")
    got = ranked.toPandas().sort_values("id").reset_index(drop=True)
    release_persisted()
    pdf = pd.DataFrame(rows, columns=["id", "a", "b"])
    want = (
        pdf[["a", "b"]]
        .apply(tuple, axis=1)
        .rank(method="dense")
        .astype(int)
    )
    assert n == len(rows)
    assert d == pdf[["a", "b"]].drop_duplicates().shape[0]
    assert list(got.sort_values("id")["rk"]) == list(want)


def test_global_dense_rank_out_cols_drops_keys(spark):
    """out_cols trims the Arrow payload: only the requested columns plus
    the rank come back."""
    from map_reduce_in_go_spark.functions.ranks import with_global_dense_rank

    df = spark.createDataFrame(
        [(1, "xx"), (2, "yy"), (3, "xx")], "id long, k string"
    )
    ranked, n, d = with_global_dense_rank(df, ["k"], "rk", out_cols=["id"])
    assert ranked.columns == ["id", "rk"]
    got = {r["id"]: r["rk"] for r in ranked.collect()}
    release_persisted()
    assert (n, d) == (3, 2)
    assert got == {1: 1, 3: 1, 2: 2}


def test_suffix_round_join_is_exchange_free(spark):
    """Plan pin for the suffix-array odd-round shape: a doc_id-partitioned,
    (doc_id, pos)-sorted cached frame self-joined on (doc_id, pos) must
    reuse the cache's partitioning — zero shuffle exchanges (the whole
    point of persisting instead of checkpointing on alternate rounds)."""
    from pyspark.sql import functions as F

    from map_reduce_in_go_spark.functions.caching import scoped_persist

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_co = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # suffix_array sets this for its rounds (see operators/suffix.py) —
    # the pin verifies the reuse it buys
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try:
        df = spark.range(5000).select(
            (F.col("id") % 100).alias("doc_id"),
            (F.col("id") % 53).alias("pos"),
            F.col("id").alias("r"),
        )
        ranks = scoped_persist(
            df.repartition(8, "doc_id").sortWithinPartitions("doc_id", "pos")
        )
        ranks.count()
        shifted = ranks.select(
            "doc_id", (F.col("pos") - 4).alias("pos"), F.col("r").alias("r2")
        )
        j = ranks.join(shifted, ["doc_id", "pos"], "left")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the cached repartition's own exchange appears inside the
        # InMemoryRelation dump; the join must add NO new one
        assert "ENSURE_REQUIREMENTS" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", old_co)
        release_persisted()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-20, max_value=20), min_size=0, max_size=300
    )
)
def test_global_dense_rank_property(spark, vals):
    """For ANY input (heavy duplication by design of the small value
    range, skew, empty), the fused dense rank equals pandas' dense rank
    and the returned totals are exact."""
    from map_reduce_in_go_spark.functions.ranks import with_global_dense_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long") if rows else (
        spark.range(0).select(F.col("id"), F.lit(0).alias("v"))
    )
    ranked, n, d = with_global_dense_rank(df, ["v"], "rk")
    got = {r["id"]: r["rk"] for r in ranked.collect()}
    release_persisted()
    assert n == len(vals)
    assert d == len(set(vals))
    order = sorted(set(vals))
    want_rank = {v: i + 1 for i, v in enumerate(order)}
    assert got == {i: want_rank[v] for i, v in rows}
