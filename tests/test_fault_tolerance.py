"""Task-failure injection: retried tasks must produce identical output.

The reference TESTS worker failure and reassignment (its coordinator
re-queues a task whose worker dies and a second worker completes it —
distributed/task.go retry/straggler machinery, coordinator_test.go).
The Spark mapping is ``spark.task.maxFailures=3`` (session.py), but a
config is a claim, not evidence — these tests inject a REAL first-attempt
failure inside an Arrow kernel via ``TaskContext.attemptNumber()`` and
prove (a) the job completes because the scheduler re-runs the task, and
(b) the retried run is value-identical to an unfaulted run: the engine's
kernels are deterministic per partition, so a retry is invisible in the
output — the same at-least-once-execution / exactly-once-result contract
the reference's JSON-intermediate rename dance provides.
"""

from __future__ import annotations

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import functions as F

from map_reduce_in_go_spark.functions.caching import release_persisted


def _flaky_square(fail_first_attempt: bool):
    """mapInPandas kernel: squares `v`; optionally dies on attempt 0 of
    partition 0 — exactly once per job, before yielding anything."""

    def gen(batches):
        ctx = TaskContext.get()
        if (
            fail_first_attempt
            and ctx is not None
            and ctx.partitionId() == 0
            and ctx.attemptNumber() == 0
        ):
            raise RuntimeError("injected first-attempt task failure")
        for pdf in batches:
            yield pd.DataFrame({"v": pdf["v"], "sq": pdf["v"] * pdf["v"]})

    return gen


def test_injected_task_failure_is_retried_to_identical_output(spark):
    """A kernel that dies on its first attempt must still complete the job
    (maxFailures=3 re-runs it) with output equal to the unfaulted run."""
    df = spark.range(10_000).select(F.col("id").alias("v")).repartition(8)
    schema = "v long, sq long"
    clean = sorted(
        (r["v"], r["sq"])
        for r in df.mapInPandas(_flaky_square(False), schema=schema).collect()
    )
    faulted = sorted(
        (r["v"], r["sq"])
        for r in df.mapInPandas(_flaky_square(True), schema=schema).collect()
    )
    assert faulted == clean
    assert len(faulted) == 10_000


def test_injected_failure_in_shuffle_stage_is_retried(spark, sf_dir):
    """Same injection upstream of an aggregation: the failed map task's
    shuffle output is regenerated and the aggregate is hash-identical.
    This is the reference's exact scenario — a map worker dying before
    its intermediate files are consumed by reducers."""
    from map_reduce_in_go_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def tokens_kernel(fail: bool):
        def gen(batches):
            ctx = TaskContext.get()
            if (
                fail
                and ctx is not None
                and ctx.partitionId() == 0
                and ctx.attemptNumber() == 0
            ):
                raise RuntimeError("injected map-side failure")
            for pdf in batches:
                out = pdf["text"].str.split().explode().dropna()
                yield pd.DataFrame(
                    {"word": out.astype(str)}
                )

        return gen

    def wordcount(fail: bool):
        mapped = docs.repartition(8).mapInPandas(
            tokens_kernel(fail), schema="word string"
        )
        return sorted(
            (r["word"], r["cnt"])
            for r in mapped.groupBy("word")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )

    assert wordcount(True) == wordcount(False)
    release_persisted()
