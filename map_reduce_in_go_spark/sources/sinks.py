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
