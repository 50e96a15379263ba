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


def with_global_dense_rank(
    df: DataFrame,
    cols: list[str],
    rank_col: str = "r",
    out_cols: list[str] | None = None,
) -> tuple[DataFrame, int, int]:
    """(df + dense 1-based ``rank_col`` over the ascending tuple ``cols``,
    total rows, number of distinct tuples).

    The fused form of ``distinct → with_global_rank → join-back`` (three
    full-frame shuffles) in ONE range partition of the full frame: equal
    tuples land in the same range partition (Spark's RangePartitioner
    routes by key, so duplicates never straddle a boundary), an Arrow
    pass counts per-partition DISTINCT tuples (new-tuple flags against
    the previous sorted row), the ≤ #partitions counts become broadcast
    offsets, and a second Arrow pass over the same cached partitioning
    assigns rank = offset + running cumsum of the flags. Equal tuples get
    equal ranks; ranks are dense 1..#distinct in tuple order.

    ``cols`` must be non-null (nulls would need an ordering convention
    the flag comparison doesn't define — callers fill sentinels first).
    The distinct count comes back for free, so iterative callers (prefix
    doubling) need no extra ``max(r)`` job per round. ``out_cols``
    restricts the columns carried through the rank pass's Arrow transfer
    (sort keys are often dead after ranking — a 32-char key column is
    most of the bytes otherwise moved); default keeps every column.
    """
    import numpy as np
    import pandas as pd

    from .caching import scoped_persist

    n_part = df.sparkSession.sparkContext.defaultParallelism
    order_cols = [F.asc(c) for c in cols]
    part = scoped_persist(
        df.repartitionByRange(n_part, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )

    def _new_flags(pdf: pd.DataFrame, prev: tuple | None):
        """Boolean per row: tuple differs from the previous sorted row
        (``prev`` carries the last tuple of the previous batch)."""
        n = len(pdf)
        flags = np.zeros(n, dtype=bool)
        for c in cols:
            v = pdf[c].to_numpy()
            if n > 1:
                flags[1:] |= v[1:] != v[:-1]
        first = tuple(pdf[c].iloc[0] for c in cols)
        flags[0] = prev is None or first != prev
        last = tuple(pdf[c].iloc[-1] for c in cols)
        return flags, last

    def count_gen(batches):
        prev = None
        for pdf in batches:
            if not len(pdf):
                continue
            flags, prev = _new_flags(pdf, prev)
            yield pd.DataFrame(
                {
                    "_pid": [int(pdf["_pid"].iloc[0])],
                    "c": [len(pdf)],
                    "d": [int(flags.sum())],
                }
            )

    sizes: dict[int, list[int]] = {}
    for r in part.mapInPandas(count_gen, schema="_pid int, c long, d long").collect():
        agg = sizes.setdefault(r["_pid"], [0, 0])
        agg[0] += r["c"]
        agg[1] += r["d"]
    offs: dict[int, int] = {}
    total = 0
    n_distinct = 0
    for pid in sorted(sizes):
        offs[pid] = n_distinct
        total += sizes[pid][0]
        n_distinct += sizes[pid][1]
    keep = set(out_cols) if out_cols is not None else None
    out_fields = [
        f.name
        for f in part.schema.fields
        if f.name != "_pid" and (keep is None or f.name in keep)
    ]
    if not offs:
        # same schema-order projection as the non-empty path — an empty
        # corpus must not reorder columns for positional consumers
        empty = part.withColumn(rank_col, F.lit(None).cast("long")).select(
            *out_fields, rank_col
        )
        return empty, 0, 0

    bc = df.sparkSession.sparkContext.broadcast(offs)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in part.schema.fields
        if f.name in out_fields
    ) + f", {rank_col} long"

    def rank_gen(batches):
        prev = None
        seen_new = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = bc.value[int(pdf["_pid"].iloc[0])]
            flags, prev = _new_flags(pdf, prev)
            out = pdf[out_fields].copy()
            out[rank_col] = base + seen_new + np.cumsum(flags).astype(np.int64)
            seen_new += int(flags.sum())
            yield out

    return part.mapInPandas(rank_gen, schema=out_schema), total, n_distinct


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
