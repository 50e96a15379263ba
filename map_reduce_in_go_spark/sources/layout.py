"""Z-order data layout: multi-dimensional clustering for file skipping.

Per-file min/max stats (``ManifestTable.stats_cols``) only prune when the
layout puts similar values in the same files. A sort by one column makes
that column's ranges tight but leaves every other column's file range
spanning the whole domain — a predicate on the second column prunes
nothing. The lakehouse answer (Delta OPTIMIZE ZORDER BY, Iceberg sort
orders; the underlying curve is Morton order, public since 1966) is to
sort by the **interleaved bits** of the clustered columns so every file
covers a compact box in the multi-dimensional space, and ANY clustered
column's range predicate skips most files.

Everything here is Catalyst expressions + ``repartitionByRange``:

1. one tiny aggregate computes each column's global [min, max] (at 100 TB
   these come from table metadata for free);
2. each value is scaled to a 16-bit integer rank approximation
   ``(v - min) / (max - min) * 65535``;
3. bits are interleaved into a single long (``aggregate`` over bit
   positions — codegen, no UDF);
4. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` makes each
   output file a contiguous z-range, i.e. a compact box.

The range repartition's sampling pass is the same cost Spark pays for any
global sort; no shuffle beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-column resolution; 2 cols × 16 bits fit a long easily


def _scaled(col: str, lo: float, hi: float) -> Column:
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    x = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(float(span))
    return F.least(
        F.floor(x * F.lit(float(1 << Z_BITS))).cast("long"),
        F.lit((1 << Z_BITS) - 1),
    )


def zvalue(scaled: list[Column]) -> Column:
    """Morton interleave of pre-scaled 16-bit integer columns, as a long."""
    n = len(scaled)
    z = F.lit(0).cast("long")
    for bit in range(Z_BITS):
        for j, s in enumerate(scaled):
            # bit `bit` of column j lands at position bit*n + j
            z = z + F.shiftleft(
                F.shiftright(s, bit).bitwiseAND(F.lit(1)), bit * n + j
            ).cast("long")
    return z


def zorder_layout(df: DataFrame, cols: list[str], num_files: int) -> DataFrame:
    """Return ``df`` clustered for writing as ``num_files`` z-ordered files.

    Numeric columns only (the bit interleave needs a linear scale), except
    the single-column case: a Morton curve of one dimension IS the linear
    sort, so ``cols=[c]`` range-sorts directly and works for any orderable
    type (string band hashes included). The caller writes the result
    (e.g. ``ManifestTable.overwrite``) — each part file then covers a
    compact box in ``cols`` space and per-file min/max stats prune on any
    of the clustered columns.
    """
    if len(cols) == 1:
        return df.repartitionByRange(num_files, cols[0]).sortWithinPartitions(
            cols[0]
        )
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    scaled = [
        _scaled(c, float(bounds[f"lo_{c}"]), float(bounds[f"hi_{c}"]))
        for c in cols
    ]
    return (
        df.withColumn("__z", zvalue(scaled))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
