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
    """Load ``events.parquet``, normalizing ``ts`` across physical encodings.

    The upstream generator has produced (at different times) TIMESTAMP(NANOS)
    — which Spark surfaces as int64 with ``nanosAsLong`` — and plain
    ``timestamp[us]`` (TIMESTAMP or TIMESTAMP_NTZ depending on
    ``isAdjustedToUTC``). Rather than hard-code one encoding, branch on the
    dtype Spark actually infers and derive the same two columns every time:

    - ``ts_us``: exact integer epoch-microseconds (long)
    - ``ts``: session-TZ timestamp (session TZ is pinned UTC in session.py,
      so NTZ→TZ casts are wall-clock identity)

    DuckDB reads the same file as microsecond TIMESTAMP, so the oracle-side
    ``epoch_us(ts)`` matches ``ts_us`` exactly in every encoding.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    # Harmless for non-NANOS files; required to read the NANOS encoding at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # int64 nanoseconds since epoch
        df = df.withColumn("ts_us", F.expr("ts DIV 1000"))
    elif isinstance(ts_type, (TimestampType, TimestampNTZType)):
        # unix_micros rejects TIMESTAMP_NTZ; the cast is a no-op for
        # TIMESTAMP and a UTC wall-clock-identity conversion for NTZ.
        df = df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    else:
        raise TypeError(
            f"events.ts has unsupported dtype {ts_type}; expected int64 nanos "
            "or a timestamp type"
        )
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


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
