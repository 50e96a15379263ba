"""Parquet star-schema loaders for the driver-generated testdata.

Tables (see TESTDATA.md): TPC-H-ish ``region nation customer supplier part
orders lineitem`` plus ``events`` (stream-shaped), ``documents`` (text
corpus), ``embeddings`` (64-dim float vectors).

Scans stay declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown, column pruning and partition pruning for free. At 100 TB these
would be partitioned/bucketed parquet or Iceberg tables — the reader call
does not change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough (at any TPC-H scale proportion) to broadcast.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as raw int64 nanos and derive both an exact
    integer-microsecond column (``ts_us``) and a proper timestamp (``ts``).

    DuckDB auto-casts the same column to microsecond TIMESTAMP (truncating),
    so ``ts_us`` = ``epoch_us(ts)`` on the oracle side, exactly.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        df.withColumn("ts_us", F.expr("ts DIV 1000"))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLES))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_documents_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` hash-distributed across all cores before CPU work.

    The testdata documents table is a single parquet file — one input
    split — so per-doc CPU kernels (tokenize / shingle / regex) would run
    as ONE task no matter how many cores exist (AQE cannot split inside a
    row group). One explicit doc_id repartition fixes the harness case; on
    a production layout (many files/row groups) the scan parallelizes by
    itself and this shuffle is the first thing to drop.
    """
    return load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
