"""heavy_hitters: exactness, superset-candidate property, bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_in_go_spark.operators.approx import HH_K, heavy_hitters
from map_reduce_in_go_spark.operators.wordcount import wordcount


def test_matches_naive_plan_exactly(spark, sf_dir):
    """Sketch pruning must not change the answer: identical to the
    full-shuffle wordcount + threshold plan."""
    wc = wordcount(spark, sf_dir)
    total = wc.agg(F.sum("cnt")).first()[0]
    naive = {
        (r["word"], r["cnt"])
        for r in wc.filter(F.col("cnt") * HH_K > total).collect()
    }
    got = {(r["word"], r["cnt"]) for r in heavy_hitters(spark, sf_dir).collect()}
    assert got == naive
    assert len(got) > 0  # threshold is meaningful on this corpus


def test_partitioning_invariance(spark, sf_dir):
    """MG candidates vary with partitioning; the exact recount must not."""
    base = {(r["word"], r["cnt"]) for r in heavy_hitters(spark, sf_dir).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        skewed = {
            (r["word"], r["cnt"]) for r in heavy_hitters(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert skewed == base


def test_output_bounded_by_k(spark, sf_dir):
    """At most K-1 words can each exceed a 1/K frequency share."""
    assert heavy_hitters(spark, sf_dir).count() < HH_K


def test_cms_matches_mg_exactly(spark, sf_dir):
    """Two different sketch screens, one exact answer: the Count-Min twin
    must reproduce the Misra-Gries result bit-for-bit."""
    from map_reduce_in_go_spark.operators.approx import heavy_hitters_cms

    mg = {(r["word"], r["cnt"]) for r in heavy_hitters(spark, sf_dir).collect()}
    cms = {
        (r["word"], r["cnt"]) for r in heavy_hitters_cms(spark, sf_dir).collect()
    }
    assert cms == mg
    assert len(cms) > 0


def test_cms_candidate_screen_is_superset_and_bounded(spark, sf_dir):
    """The CMS one-sided error direction, observed: every true heavy hitter
    survives the screen (no false negatives by construction), and the
    false-candidate overhang stays within the e·n/W overshoot bound."""
    import math

    from map_reduce_in_go_spark.operators.approx import (
        CMS_W,
        heavy_hitters_cms,
    )
    from map_reduce_in_go_spark.operators.wordcount import wordcount

    wc = wordcount(spark, sf_dir)
    total = wc.agg(F.sum("cnt")).first()[0]
    true_hh = {
        r["word"] for r in wc.filter(F.col("cnt") * HH_K > total).collect()
    }
    got = {r["word"] for r in heavy_hitters_cms(spark, sf_dir).collect()}
    assert got == true_hh  # exact after recount
    # any word the screen passes has true count > n/K − e·n/W; the final
    # filter only ever removes words, so output ⊆ screen candidates — the
    # set relationship that makes the two-pass construction exact
    assert math.e * total / CMS_W < total / HH_K, (
        "CMS width too small for the support threshold: the screen would "
        "pass words arbitrarily far below n/K"
    )
