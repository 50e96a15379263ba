"""Approximate/sketch operators — the 100 TB versions of exact cousins.

At scale, exact countDistinct is a full shuffle of the key universe and
exact percentiles need a global sort; HyperLogLog++ and t-digest style
sketches turn both into fixed-size mergeable state. Sketch values are
engine-specific, so the driver records rows-only checks; the pytest suite
asserts the estimates bracket the exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .wordcount import _doc_words


def distinct_words_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct token estimate per source (vs exact distinct_words)."""
    return (
        _doc_words(spark, sf_dir)
        .groupBy("source")
        .agg(F.approx_count_distinct("word", rsd=0.02).alias("n_distinct_approx"))
    )


def events_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate percentiles per event type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 4).alias("p50_approx"),
        F.round(F.expr("approx_percentile(value, 0.95, 10000)"), 4).alias(
            "p95_approx"
        ),
        F.count("*").alias("n"),
    )


def sketch_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregated mergeable HLL sketches: the 100 TB distinct-count cube.

    Builds one Datasketches HLL sketch per (day, event_type) — the stored
    rollup a real pipeline materializes once per partition — then answers
    the per-type distinct-user question by ``hll_union_agg`` over the day
    sketches, never re-touching the raw events. The pytest twin asserts the
    union-of-parts estimate equals the single-pass whole-table sketch
    estimate exactly (register-state merging is order- and
    partitioning-invariant), which is the property that lets sketches
    answer any date-range query from per-partition state.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"), F.count("*").alias("n"))
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("n").alias("n_events"),
        F.count("*").alias("n_days"),
    )


ORACLES: dict[str, str] = {}
