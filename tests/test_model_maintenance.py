"""Incremental maintenance for the served models: counts at rest fold
to EXACTLY the retrain-over-union model; appends are ledgered
exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_in_go_spark.sources.manifest_table import ManifestTable
from map_reduce_in_go_spark.sources.tables import load_table


def _halves(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return (
        docs.filter(F.pmod("doc_id", F.lit(2)) == 0),
        docs.filter(F.pmod("doc_id", F.lit(2)) == 1),
    )


def test_kn_incremental_equals_retrain(spark, sf_dir, tmp_path):
    from map_reduce_in_go_spark.functions.caching import release_persisted
    from map_reduce_in_go_spark.operators.tfidf import (
        _doc_bigrams,
        _kn_scores,
        kn_model_append,
        train_kn_model,
    )

    half1, half2 = _halves(spark, sf_dir)

    inc_root = str(tmp_path / "kn_inc")
    tbl = ManifestTable(inc_root)
    tbl.append(
        _doc_bigrams(half1).groupBy("v", "w").agg(F.count(F.lit(1)).alias("cvw")),
        op="kn-train",
    )
    assert kn_model_append(inc_root, half2, op="kn-batch-2")
    assert kn_model_append(inc_root, half2, op="kn-batch-2") is False  # ledger

    full_root = str(tmp_path / "kn_full")
    train_kn_model(spark, sf_dir, full_root)

    try:
        inc = {(r["v"], r["w"], r["s"]) for r in _kn_scores(spark, inc_root).collect()}
        full = {
            (r["v"], r["w"], r["s"]) for r in _kn_scores(spark, full_root).collect()
        }
    finally:
        release_persisted()
    assert inc == full and inc  # score-identical model → identical scoring


def test_langid_incremental_equals_retrain(spark, sf_dir, tmp_path):
    from map_reduce_in_go_spark.operators.text_analysis import (
        _gram_expr,
        langid_model_append,
        train_langid_model,
    )

    half1, half2 = _halves(spark, sf_dir)

    inc_root = str(tmp_path / "lid_inc")
    tbl = ManifestTable(inc_root)
    batch1 = half1.select("lang", F.lower(F.col("text")).alias("t"))
    tbl.append(
        batch1.select("lang", F.explode(F.expr(_gram_expr())).alias("g"))
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("c")),
        op="langid-train",
    )
    assert langid_model_append(inc_root, half2, op="lid-batch-2")
    assert langid_model_append(inc_root, half2, op="lid-batch-2") is False

    full_root = str(tmp_path / "lid_full")
    train_langid_model(spark, sf_dir, full_root)

    def folded(root):
        return {
            (r["lang"], r["g"]): r["c"]
            for r in ManifestTable(root)
            .read(spark)
            .groupBy("lang", "g")
            .agg(F.sum("c").alias("c"))
            .collect()
        }

    inc, full = folded(inc_root), folded(full_root)
    assert inc == full and inc  # count-identical model → identical scoring


def test_dsir_incremental_equals_retrain(spark, sf_dir, tmp_path):
    from map_reduce_in_go_spark.operators.curation import (
        _dsir_bucket_counts,
        _dsir_lambda,
        dsir_model_append,
        train_dsir_model,
    )

    half1, half2 = _halves(spark, sf_dir)

    inc_root = str(tmp_path / "dsir_inc")
    ManifestTable(inc_root).append(
        _dsir_bucket_counts(half1.select("text", "lang")), op="dsir-train"
    )
    assert dsir_model_append(inc_root, half2, op="dsir-batch-2")
    assert dsir_model_append(inc_root, half2, op="dsir-batch-2") is False

    full_root = str(tmp_path / "dsir_full")
    train_dsir_model(spark, sf_dir, full_root)

    def lam(root):
        return {(r["b"], r["lam"]) for r in _dsir_lambda(spark, root).collect()}

    inc, full = lam(inc_root), lam(full_root)
    assert inc == full and len(inc) == 512
