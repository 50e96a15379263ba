"""Distributed global rank — dense 1..N ordering without a global window.

``Window.orderBy`` with no ``partitionBy`` funnels every row through ONE
reducer (Spark emits a plan warning for it); the scalable shape is the
two-level hierarchical prefix the repo already uses for token prefix sums
(``shard_pack``):

1. ``repartitionByRange`` on the sort key + ``sortWithinPartitions`` —
   partition boundaries respect the global order, so partition id
   determines an order-contiguous slab and rows inside it are sorted;
2. per-partition counts (partial-agg shuffle of ≤ #partitions rows) to
   the driver, cumulative offsets broadcast back;
3. global rank = offset[partition] + a running counter inside ONE
   order-preserving Arrow pass (``mapInPandas`` sees a partition's
   batches in order, so the counter is the partition-local row number).

Step 3 previously used ``Window.partitionBy(_pid)`` — correct, but that
re-shuffles EVERY row on _pid just to sort slabs that are already
contiguous and sorted. The Arrow counter does it shuffle-free: the only
full-data exchange in the whole rank is the range partition itself
(pinned in tests/test_plans.py).

Ranks are exact and dense as long as the sort key is a TOTAL order (pass
a unique tiebreaker column); ties across a range boundary would otherwise
land either side nondeterministically. Keep the input frame NARROW (ids +
sort keys) — every column rides through Arrow; join wide payloads back by
id afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame, order_cols: list[Column], rank_col: str = "r"
) -> tuple[DataFrame, int]:
    """(df + dense 1-based ``rank_col`` over ``order_cols``, total rows).

    The input is range-repartitioned and persisted via ``scoped_persist``
    (the count pass and the rank pass must see the same partitioning);
    callers release it with ``release_persisted`` as usual.
    """
    from .caching import scoped_persist

    n_part = df.sparkSession.sparkContext.defaultParallelism
    part = scoped_persist(
        df.repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
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

    bc = df.sparkSession.sparkContext.broadcast(offs)
    out_fields = [f"{f.name}" for f in part.schema.fields if f.name != "_pid"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in part.schema.fields
        if f.name != "_pid"
    ) + f", {rank_col} long"

    def rank_gen(batches):
        import numpy as np

        offsets = bc.value
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[out_fields].copy()
            out[rank_col] = base + seen + np.arange(1, len(pdf) + 1, dtype=np.int64)
            seen += len(pdf)
            yield out

    return part.mapInPandas(rank_gen, schema=out_schema), total


def with_global_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    rank_col: str = "r",
    prefix_col: str = "cum",
):
    """(df + dense rank + INCLUSIVE global prefix sum of ``value_col`` over
    ``order_cols``, total rows, total value).

    The weighted generalization of :func:`with_global_rank` (same
    two-level shape as ``shard_pack``'s token prefix sum, but over an
    arbitrary sort order): per-partition VALUE sums ride back with the
    row-count offsets, and the Arrow pass accumulates both counters.
    ``value_col`` may be DECIMAL — pandas surfaces it as exact
    ``decimal.Decimal`` objects and the running sum stays exact, so
    cumulative money is order-independent bit-for-bit.
    """
    from .caching import scoped_persist

    n_part = df.sparkSession.sparkContext.defaultParallelism
    part = scoped_persist(
        df.repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    sizes = sorted(
        part.groupBy("_pid")
        .agg(F.count("*").alias("c"), F.sum(value_col).alias("v"))
        .collect(),
        key=lambda r: r["_pid"],
    )
    offs: dict[int, tuple] = {}
    total_n = 0
    total_v = None
    for r in sizes:
        if r["v"] is None and r["c"] > 0:
            # an all-NULL partition: same contract violation the Arrow pass
            # rejects below, caught one job earlier
            raise ValueError(
                f"with_global_prefix_sum: NULL in {value_col!r}; "
                "filter or fill nulls before ranking"
            )
        offs[r["_pid"]] = (total_n, total_v)
        total_n += r["c"]
        total_v = r["v"] if total_v is None else total_v + r["v"]
    if not offs:
        empty = (
            part.withColumn(rank_col, F.lit(None).cast("long"))
            .withColumn(prefix_col, F.lit(None).cast(df.schema[value_col].dataType))
            .drop("_pid")
        )
        return empty, 0, None

    bc = df.sparkSession.sparkContext.broadcast(offs)
    value_type = part.schema[value_col].dataType.simpleString()
    out_fields = [f.name for f in part.schema.fields if f.name != "_pid"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in part.schema.fields
        if f.name != "_pid"
    ) + f", {rank_col} long, {prefix_col} {value_type}"

    def gen(batches):
        import numpy as np

        offsets = bc.value
        seen = 0
        run = None
        for pdf in batches:
            if not len(pdf):
                continue
            base_n, base_v = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[out_fields].copy()
            out[rank_col] = base_n + seen + np.arange(1, len(pdf) + 1, dtype=np.int64)
            seen += len(pdf)
            if pdf[value_col].isna().any():
                # fail loudly: F.sum skips NULLs in the offsets while the
                # fold below would propagate/raise on them — the two views
                # of the data would silently disagree
                raise ValueError(
                    f"with_global_prefix_sum: NULL in {value_col!r}; "
                    "filter or fill nulls before ranking"
                )
            cums = []
            for v in pdf[value_col]:
                run = v if run is None else run + v
                cums.append(run if base_v is None else base_v + run)
            out[prefix_col] = cums
            yield out

    return part.mapInPandas(gen, schema=out_schema), total_n, total_v
