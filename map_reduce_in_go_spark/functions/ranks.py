"""Distributed global rank — dense 1..N ordering without a global window.

``Window.orderBy`` with no ``partitionBy`` funnels every row through ONE
reducer (Spark emits a plan warning for it); the scalable shape is the
two-level hierarchical prefix the repo already uses for token prefix sums
(``shard_pack``):

1. ``repartitionByRange`` on the sort key — partition boundaries respect
   the global order, so partition id determines an order-contiguous slab;
2. per-partition counts (≤ #partitions rows) to the driver, cumulative
   offsets broadcast back as a literal map;
3. global rank = offset[partition] + partition-local ``row_number`` (a
   partitioned window — parallel, no single reducer).

Ranks are exact and dense as long as the sort key is a TOTAL order (pass
a unique tiebreaker column); ties across a range boundary would otherwise
land either side nondeterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame, order_cols: list[Column], rank_col: str = "r"
) -> tuple[DataFrame, int]:
    """(df + dense 1-based ``rank_col`` over ``order_cols``, total rows).

    The input is range-repartitioned and persisted via ``scoped_persist``
    (the per-partition count pass and the rank pass must see the same
    partitioning); callers release it with ``release_persisted`` as usual.
    """
    from .caching import scoped_persist

    n_part = df.sparkSession.sparkContext.defaultParallelism
    part = scoped_persist(
        df.repartitionByRange(n_part, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    sizes = sorted(
        part.groupBy("_pid").agg(F.count("*").alias("c")).collect(),
        key=lambda r: r["_pid"],
    )
    offs: dict[int, int] = {}
    total = 0
    for r in sizes:
        offs[r["_pid"]] = total
        total += r["c"]
    if not offs:  # empty input: rank column still resolvable
        return part.withColumn(rank_col, F.lit(None).cast("long")).drop("_pid"), 0
    off_expr = F.create_map(*[F.lit(x) for pid_off in offs.items() for x in pid_off])
    wloc = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = part.withColumn(
        rank_col, (off_expr[F.col("_pid")] + F.row_number().over(wloc)).cast("long")
    ).drop("_pid")
    return ranked, total
