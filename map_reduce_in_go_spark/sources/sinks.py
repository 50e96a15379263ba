"""Partitioned parquet sinks — the 100 TB storage layout.

At scale the events table is date-partitioned so time-window queries prune
whole directories at planning time instead of scanning 100 TB. These two
functions are the write/read pair; the test asserts the physical plan shows
``PartitionFilters`` carrying the date predicate (i.e., pruning happens in
the scan, not after it).

Writer notes for real deployments: pair ``partitionBy`` with
``sortWithinPartitions`` on the query key to get run-length-friendly
parquet, and size ``spark.sql.files.maxRecordsPerFile`` so a hot date
doesn't produce one giant file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(events: DataFrame, path: str) -> None:
    """Write the events table date-partitioned (event_date=YYYY-MM-DD dirs)."""
    (
        events.withColumn("event_date", F.to_date("ts"))
        .repartition("event_date")
        .sortWithinPartitions("user_id", "ts_us")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


_FORMATS = ("parquet", "orc", "json", "csv")


def write_table_as(df: DataFrame, path: str, fmt: str) -> None:
    """Write a table in any supported batch format (columnar or text).

    Parquet/ORC keep types and support predicate pushdown + pruning — the
    only sane 100 TB formats; JSON/CSV are interchange surfaces (the
    reference's native I/O is line-oriented text). CSV gets a header so the
    read side can bind names before applying the typed schema.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_table_as(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    """Read back any supported format; text formats require the schema
    (CSV/JSON are untyped on disk — inferring would scan and guess)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    r = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        r = r.schema(schema)
        if fmt == "csv":
            r = r.option("header", "true")
    return r.load(path)
