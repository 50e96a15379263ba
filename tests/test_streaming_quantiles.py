"""Streaming quantile rollup: ledgered batches, exact-when-small,
pinned rank error when sampled, order-invariant merge, budget-honest
compaction, CAS race safety."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from map_reduce_in_go_spark.sources.manifest_table import ManifestTable
from map_reduce_in_go_spark.sources.tables import load_table
from map_reduce_in_go_spark.streaming.quantiles import (
    QS_B,
    compact_quantiles,
    quantile_batch,
    quantiles_from_store,
)


def _exact_by_type(spark, events):
    out = {}
    for r in events.select("event_type", "value").collect():
        out.setdefault(r["event_type"], []).append(r["value"])
    return {t: np.sort(np.array(v)) for t, v in out.items()}


def _order_stat(sorted_vals: np.ndarray, rank: float) -> float:
    """Value at 1-based rank ⌈rank⌉ (clamped)."""
    i = min(max(int(math.ceil(rank)) - 1, 0), len(sorted_vals) - 1)
    return float(sorted_vals[i])


def test_small_batches_fold_exactly(spark, sf_dir, tmp_path):
    """Batches under QS_B per type store exact multisets: the fold IS the
    exact order statistic, err 0 — and a replayed op is a no-op."""
    ev = load_table(spark, sf_dir, "events")
    tbl = ManifestTable(str(tmp_path / "q"))
    for i in range(3):
        assert quantile_batch(
            spark, ev.filter(F.pmod("event_id", F.lit(3)) == i), tbl, i
        )
    assert quantile_batch(spark, ev.limit(5), tbl, 1) is False  # ledger
    exact = _exact_by_type(spark, ev)
    got = {r["event_type"]: r for r in quantiles_from_store(spark, tbl).collect()}
    assert set(got) == set(exact)
    for t, v in exact.items():
        n = len(v)
        assert got[t]["n"] == n and got[t]["rank_err"] == 0
        assert got[t]["q50"] == _order_stat(v, 0.5 * n)
        assert got[t]["q95"] == _order_stat(v, 0.95 * n)

    # cross-operator parity: the batch twin's exact interpolated
    # percentile lies between adjacent order statistics, so the fold (an
    # order statistic at the same rank) brackets it within one rank
    from map_reduce_in_go_spark.operators.approx import events_quantiles_approx

    batch = {
        r["event_type"]: r for r in events_quantiles_approx(spark, sf_dir).collect()
    }
    for t, v in exact.items():
        n = len(v)
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            lo = _order_stat(v, q * n - 1)
            hi = _order_stat(v, q * n + 2)
            assert lo - 1e-4 <= batch[t][col] <= hi + 1e-4, (t, col)
        assert batch[t]["approx_ok"]


def test_sampled_fold_within_pinned_rank_error(spark, sf_dir, tmp_path):
    """A batch big enough to sample answers within its own stated rank
    budget — the bound travels WITH the data and the test holds it to it."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    big = ev
    for _ in range(4):
        big = big.unionAll(big)  # 16×: per-type size ≫ QS_B
    tbl = ManifestTable(str(tmp_path / "q"))
    assert quantile_batch(spark, big, tbl, 0)
    exact = _exact_by_type(spark, big)
    got = {r["event_type"]: r for r in quantiles_from_store(spark, tbl).collect()}
    for t, v in exact.items():
        n = len(v)
        assert n > QS_B  # the sampling path actually ran
        err = got[t]["rank_err"]
        assert 0 < err <= 2 * math.ceil(n / QS_B)
        for q, col in ((0.5, "q50"), (0.95, "q95")):
            lo = _order_stat(v, q * n - err)
            hi = _order_stat(v, q * n + err)
            assert lo <= got[t][col] <= hi, (t, col)


def test_merge_is_order_invariant(spark, sf_dir, tmp_path):
    """Landing the same batches in a different order folds to IDENTICAL
    answers — the mergeability property that makes the rollup a rollup."""
    ev = load_table(spark, sf_dir, "events")
    a = ManifestTable(str(tmp_path / "qa"))
    b = ManifestTable(str(tmp_path / "qb"))
    for i in (0, 1, 2):
        quantile_batch(spark, ev.filter(F.pmod("event_id", F.lit(3)) == i), a, i)
    for i in (2, 0, 1):
        quantile_batch(spark, ev.filter(F.pmod("event_id", F.lit(3)) == i), b, i)
    ra = {tuple(r) for r in quantiles_from_store(spark, a).collect()}
    rb = {tuple(r) for r in quantiles_from_store(spark, b).collect()}
    assert ra == rb and ra


def test_compaction_budget_honest_and_appendable(spark, sf_dir, tmp_path):
    """Compaction folds to one row per type, adds its recompression cost
    to the stored budget, keeps answers within the widened bound, and a
    post-compaction batch still folds in."""
    ev = load_table(spark, sf_dir, "events")
    big = ev.select("event_type", "value")
    for _ in range(4):
        big = big.unionAll(big)
    tbl = ManifestTable(str(tmp_path / "q"))
    for i in range(2):
        # split 16× replica into two interleaved halves via a synthetic id
        quantile_batch(
            spark,
            big.withColumn("rid", F.monotonically_increasing_id()).filter(
                F.pmod("rid", F.lit(2)) == i
            ),
            tbl,
            i,
        )
    before = {r["event_type"]: r for r in quantiles_from_store(spark, tbl).collect()}
    n_types = len(before)
    compact_quantiles(spark, tbl)
    assert tbl.read(spark).count() == n_types  # one row per type
    after = {r["event_type"]: r for r in quantiles_from_store(spark, tbl).collect()}
    exact = _exact_by_type(spark, big)
    for t, v in exact.items():
        n = len(v)
        assert after[t]["n"] == n
        assert after[t]["rank_err"] >= before[t]["rank_err"]  # budget grew
        err = after[t]["rank_err"]
        assert err <= 6 * math.ceil(n / QS_B)  # bounded growth
        for q, col in ((0.5, "q50"), (0.95, "q95")):
            lo = _order_stat(v, q * n - err)
            hi = _order_stat(v, q * n + err)
            assert lo <= after[t][col] <= hi, (t, col)

    # post-compaction append: totals advance, answers still bracketed
    small = load_table(spark, sf_dir, "events")
    quantile_batch(spark, small, tbl, 7)
    final = {r["event_type"]: r for r in quantiles_from_store(spark, tbl).collect()}
    for t in exact:
        assert final[t]["n"] == len(exact[t]) + np.sum(
            [1 for r in small.select("event_type").collect() if r["event_type"] == t]
        )


def test_compact_cas_retries_on_concurrent_append(spark, sf_dir, tmp_path):
    """A quantile_batch landing between compaction's fold and its
    overwrite must not be silently discarded (its op is ledgered — a
    replay would be refused, losing the rows forever)."""
    from map_reduce_in_go_spark.streaming import quantiles as mod

    ev = load_table(spark, sf_dir, "events")
    tbl = ManifestTable(str(tmp_path / "q"))
    quantile_batch(spark, ev.filter(F.pmod("event_id", F.lit(2)) == 0), tbl, 0)
    late = ev.filter(F.pmod("event_id", F.lit(2)) == 1)

    real = mod._merged_cdfs
    fired = {"n": 0}

    def race(sp, t, version=None):
        state = real(sp, t, version)
        if fired["n"] == 0:
            fired["n"] += 1
            quantile_batch(sp, late, t, 1)
        return state

    mod._merged_cdfs = race
    try:
        compact_quantiles(spark, tbl)
    finally:
        mod._merged_cdfs = real

    assert fired["n"] == 1
    exact = _exact_by_type(spark, ev)
    got = {r["event_type"]: r for r in quantiles_from_store(spark, tbl).collect()}
    for t, v in exact.items():
        assert got[t]["n"] == len(v)  # the late batch's rows survived
