"""Tests for the training-data curation operators (operators/curation.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from map_reduce_in_go_spark.operators import curation as cur


def test_hash_bucket_matches_duckdb(spark):
    """The Spark conv() bucket and the DuckDB '0x' cast parse the same hex."""
    keys = spark.range(0, 500).select(
        F.col("id"),
        cur.hash_bucket(F.col("id")).alias("b"),
        cur.hash_bucket(F.col("id"), "strat:").alias("bs"),
    )
    got = {r["id"]: (r["b"], r["bs"]) for r in keys.collect()}
    want = duckdb.sql(
        f"SELECT id, {cur.sql_hash_bucket('id')} AS b,"
        f" {cur.sql_hash_bucket('id', 'strat:')} AS bs"
        " FROM range(0, 500) t(id)"
    ).fetchall()
    for key, b, bs in want:
        assert got[key] == (b, bs)


def test_split_deterministic_and_complete(spark, sf_dir):
    a = cur.split_train_test(spark, sf_dir)
    b = cur.split_train_test(spark, sf_dir).repartition(7)
    rows_a = {r["doc_id"]: r["split"] for r in a.collect()}
    rows_b = {r["doc_id"]: r["split"] for r in b.collect()}
    assert rows_a == rows_b  # content-keyed: stable under repartitioning
    assert set(rows_a.values()) <= {"train", "valid", "test"}
    n = len(rows_a)
    n_train = sum(1 for s in rows_a.values() if s == "train")
    assert 0.6 * n <= n_train <= 0.95 * n  # ~80% with small-corpus slack


def test_split_no_shuffle(spark, sf_dir):
    plan = cur.split_train_test(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map stage: survives any scale


def test_sample_stratified_respects_rates(spark, sf_dir):
    kept = cur.sample_stratified(spark, sf_dir).collect()
    for r in kept:
        rate = cur.SAMPLE_RATES.get(r["lang"], cur.SAMPLE_DEFAULT)
        assert r["bucket"] < rate


def test_contamination_bounds_and_signal(spark, sf_dir):
    rows = cur.contamination_ngram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_grams"]
        assert 0.0 <= r["contam_ratio"] <= 1.0
        assert r["doc_id"] % cur.BENCH_MOD != 0  # benchmark docs excluded


def test_quality_repetition_flag_consistent(spark, sf_dir):
    rows = cur.quality_repetition(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (r["top1_ratio"] <= 0.1) == r["keep"]
        assert 0.0 <= r["dup_trigram_ratio"] <= 1.0
        assert r["top1_ratio"] > 0.0


def test_shard_pack_matches_flat_prefix_sum(spark, sf_dir):
    """The hierarchical (block-cumsum) plan equals the flat global window."""
    rows = sorted(
        cur.shard_pack(spark, sf_dir).collect(), key=lambda r: r["doc_id"]
    )
    run = 0
    for r in rows:
        assert r["offset"] == run
        assert r["shard_id"] == run // cur.SHARD_TOKENS
        run += r["n_tok"]
    shards = {r["shard_id"] for r in rows}
    assert shards == set(range(len(shards)))  # dense shard ids


def test_shard_pack_window_is_blockwise(spark, sf_dir):
    """No single-partition window over the full table: the per-doc running
    sum must be partitioned by block (only the tiny block-totals cumsum may
    be global)."""
    plan = cur.shard_pack(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"RunningWindowFunction.*|Window \[.*", plan)
    per_doc = [w for w in windows if "n_tok" in w and "doc_id" in w]
    assert per_doc and all("blk" in w for w in per_doc)


def test_domain_mix_shares_sum_to_one(spark, sf_dir):
    rows = cur.domain_mix(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["weight"] == pytest.approx(
            (1.0 / len(rows)) / (r["n_tokens"] / sum(x["n_tokens"] for x in rows)),
            rel=1e-4,
        )


def test_sequence_pack_invariants(spark, sf_dir):
    """The packing ledger must conserve tokens and fill every non-final
    sequence to exactly CTX_TOKENS."""
    from pyspark.sql import functions as F

    from map_reduce_in_go_spark.operators.curation import (
        CTX_TOKENS,
        sequence_pack,
    )
    from map_reduce_in_go_spark.functions.text import tokens
    from map_reduce_in_go_spark.sources.tables import load_table

    seqs = sequence_pack(spark, sf_dir).orderBy("seq_id").collect()
    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(F.size(tokens(F.col("text")))).alias("n"))
        .collect()[0]["n"]
    )
    assert [r["seq_id"] for r in seqs] == list(range(len(seqs)))
    assert sum(r["n_tokens"] for r in seqs) == total
    for r in seqs[:-1]:
        assert r["n_tokens"] == CTX_TOKENS
    assert 0 < seqs[-1]["n_tokens"] <= CTX_TOKENS
    assert sum(r["n_starts"] for r in seqs) == 500  # every doc starts once
    for r in seqs:
        assert r["n_docs"] >= r["n_starts"]
        assert r["n_docs"] >= 1


def test_mix_temperature_flattens_the_mixture(spark, sf_dir):
    """q must sum to 1 and sit strictly between natural and uniform:
    head languages downweighted, tail languages upweighted."""
    from map_reduce_in_go_spark.operators.curation import mix_temperature

    rows = mix_temperature(spark, sf_dir).collect()
    assert abs(sum(r["mix_share"] for r in rows) - 1.0) < 1e-4
    uniform = 1.0 / len(rows)
    for r in rows:
        p, q = r["token_share"], r["mix_share"]
        if p > uniform:
            assert p > q > uniform - 1e-9  # head: shrunk toward uniform
        elif p < uniform:
            assert p < q < uniform + 1e-9  # tail: boosted toward uniform
        # q here is the 6dp-rounded share; the operator divides pre-rounding
        assert r["sample_factor"] == pytest.approx(q / p, abs=1e-4)


def test_dsir_selects_target_like_documents(spark, sf_dir):
    """Importance weights must separate the target slice: the average
    log-weight of en docs must exceed the non-en average, and the selected
    set must be majority-target."""
    from pyspark.sql import functions as F

    from map_reduce_in_go_spark.operators.curation import (
        DSIR_TARGET_LANG,
        dsir_select,
    )
    from map_reduce_in_go_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = dsir_select(spark, sf_dir).join(docs, "doc_id").collect()
    tgt = [r for r in j if r["lang"] == DSIR_TARGET_LANG]
    other = [r for r in j if r["lang"] != DSIR_TARGET_LANG]
    assert tgt and other
    mean = lambda rs: sum(r["log_weight"] for r in rs) / len(rs)  # noqa: E731
    assert mean(tgt) > mean(other)
    sel = [r for r in j if r["selected"]]
    assert sel, "selection must be non-empty"
    n_tgt_sel = sum(1 for r in sel if r["lang"] == DSIR_TARGET_LANG)
    assert n_tgt_sel / len(sel) > 0.5


def test_reservoir_exact_k_and_rerun_stable(spark, sf_dir):
    """Exactly K per language (or the whole group when smaller), identical
    sample under a different partitioning, and disjoint from rate-based
    sampling semantics (fixed size, not binomial)."""
    from pyspark.sql import functions as F

    from map_reduce_in_go_spark.operators.curation import (
        RESERVOIR_K,
        sample_reservoir,
    )
    from map_reduce_in_go_spark.sources.tables import load_table

    got = sample_reservoir(spark, sf_dir).collect()
    sizes = {}
    for r in got:
        sizes[r["lang"]] = sizes.get(r["lang"], 0) + 1
    group_n = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(sizes) == set(group_n)
    for lang, n in group_n.items():
        assert sizes[lang] == min(RESERVOIR_K, n)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = sample_reservoir(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert {(r["doc_id"], r["rk"]) for r in again} == {
        (r["doc_id"], r["rk"]) for r in got
    }


def test_split_leakage_safe_keeps_pairs_together(spark, sf_dir):
    """The leakage guarantee itself: every MinHash candidate pair — the
    near-dup evidence — lands in ONE split, and docs outside any cluster
    get exactly their split_train_test assignment."""
    from map_reduce_in_go_spark.functions.caching import release_persisted
    from map_reduce_in_go_spark.operators.curation import (
        split_leakage_safe,
        split_train_test,
    )
    from map_reduce_in_go_spark.operators.dedup import dedup_minhash

    splits = {
        r["doc_id"]: (r["rep_id"], r["split"])
        for r in split_leakage_safe(spark, sf_dir).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash(spark, sf_dir).collect()
    ]
    assert pairs, "corpus should contain near-duplicates"
    for a, b in pairs:
        assert splits[a][1] == splits[b][1], (a, b, splits[a], splits[b])
        assert splits[a][0] == splits[b][0]  # same representative
    clustered = {d for p in pairs for d in p}
    base = {
        r["doc_id"]: r["split"] for r in split_train_test(spark, sf_dir).collect()
    }
    release_persisted()
    for d, (rep, s) in splits.items():
        if d not in clustered:
            assert rep == d
            assert s == base[d]


def test_split_leakage_safe_shares_stay_near_nominal(spark, sf_dir):
    """Cluster atomicity moves whole dup groups between splits, so
    realized shares can drift from the nominal 80/10/10 — the rebalancing
    stat a pipeline monitors. Pin that on this corpus the drift stays
    small (clusters are a minor mass fraction) and the three splits
    partition the corpus exactly."""
    from map_reduce_in_go_spark.functions.caching import release_persisted
    from map_reduce_in_go_spark.operators.curation import split_leakage_safe

    rows = split_leakage_safe(spark, sf_dir).collect()
    release_persisted()
    n = len(rows)
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + 1
    assert sum(by_split.values()) == n
    shares = {s: 100.0 * c / n for s, c in by_split.items()}
    assert abs(shares.get("train", 0) - 80) < 8, shares
    assert abs(shares.get("valid", 0) - 10) < 8, shares
    assert abs(shares.get("test", 0) - 10) < 8, shares
