"""Text-file sources.

The reference feeds whole files to mappers: the coordinator splits a
comma-separated file list into map tasks (main.go:130) and each worker reads
its file and calls ``Map(filename, contents)`` (distributed/worker.go:126-137).

Spark-first equivalent: the ``binaryFile`` reader yields one row per file
with its path — the natural unit for whole-file mappers — while ``read_lines``
is the line-oriented variant for big single files (splittable, preferred at
100 TB where a single document should never be a task boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_files(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """One row per file: (filename, contents). Globs and dirs supported."""
    if isinstance(paths, str):
        paths = [paths]
    df = spark.read.format("binaryFile").load(paths)
    return df.select(
        F.col("path").alias("filename"),
        F.decode(F.col("content"), "UTF-8").alias("contents"),
    )


def read_lines(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """One row per line: (filename, line). Splittable — scales to huge files."""
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.text(paths)
        .select(
            F.input_file_name().alias("filename"),
            F.col("value").alias("line"),
        )
    )
