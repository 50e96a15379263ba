"""Evolvable IVF index: build → probe parity, silhouette-driven split,
atomic catalog swap, snapshot isolation for concurrent readers."""

from __future__ import annotations

import pytest

from map_reduce_in_go_spark.functions.caching import release_persisted
from map_reduce_in_go_spark.operators.ivf_index import EvolvableIvfIndex


@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    ix = EvolvableIvfIndex(str(tmp_path_factory.mktemp("ivf") / "index"))
    ix.build(spark, sf_dir)
    return ix


def _topk(df):
    return sorted(map(tuple, df.collect()))


def test_probe_matches_static_indexed_query(spark, sf_dir, idx):
    """Before any evolution, the catalog-served probe returns exactly what
    the oracle-checked ann_ivf_indexed serves from the static layout."""
    from map_reduce_in_go_spark.operators.similarity import ann_ivf_indexed

    got = _topk(idx.probe(spark, sf_dir))
    release_persisted()
    want = _topk(ann_ivf_indexed(spark, sf_dir))
    release_persisted()
    assert got == want


def test_split_improves_cell_and_keeps_recall(spark, sf_dir, idx):
    """Splitting the worst-margin cell must (a) add exactly one cell,
    (b) strictly improve the split members' mean cosine-to-centroid, and
    (c) not degrade probe recall vs exact top-k by more than the probed-
    fraction shrink explains (empirical floor pinned on this corpus)."""
    from map_reduce_in_go_spark.operators.similarity import _bruteforce_topk

    exact = {}
    for q, v, _, _ in _bruteforce_topk(spark, sf_dir).collect():
        exact.setdefault(q, set()).add(v)
    release_persisted()

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(q, set()) & vs) / len(vs) for q, vs in exact.items()
        ) / len(exact)

    margins = {
        r["assigned_cid"]: r["mean_margin"]
        for r in idx.cell_margins(spark).collect()
    }
    release_persisted()
    before_stored = {
        r["cid"]: (r["n_members"], r["mean_cos"])
        for r in idx.stored_cell_stats(spark).collect()
    }
    worst = min(margins, key=lambda c: (margins[c], c))
    n_before = len(before_stored)
    r_before = recall(idx.probe(spark, sf_dir))
    release_persisted()
    v0 = idx.catalog.version()

    v1 = idx.split_worst_cell(spark)
    assert v1 == v0 + 1

    snap = idx.snapshot(spark)
    assert len(snap) == len(before_stored) + 1
    assert worst not in [c for c, _, _, _ in snap]

    after_stored = {
        r["cid"]: (r["n_members"], r["mean_cos"])
        for r in idx.stored_cell_stats(spark).collect()
    }
    # the two children hold exactly the split cell's members, each closer to
    # its own (mean) centroid than the parent membership was to the old one
    kids = [c for c in after_stored if c not in before_stored]
    assert len(kids) == 2
    n_kids = sum(after_stored[c][0] for c in kids)
    assert n_kids == before_stored[worst][0]
    mean_cos_kids = (
        sum(after_stored[c][0] * after_stored[c][1] for c in kids) / n_kids
    )
    assert mean_cos_kids > before_stored[worst][1], "split did not tighten cell"
    # untouched cells' storage is untouched
    for c in before_stored:
        if c != worst:
            assert after_stored[c] == before_stored[c]

    # The IVF contract after a split: finer cells mean a fixed nprobe scans
    # FEWER members (cost drops), and recall at a MATCHED probed *fraction*
    # holds. Compare before@nprobe=2 (2/5 of cells) with
    # after@nprobe=ceil(2·6/5)=3 (3/6) — same fraction, smaller cells, so
    # probed volume is ≤ before's at nprobe=3.
    import math

    from map_reduce_in_go_spark.operators.similarity import NPROBE

    matched = math.ceil(NPROBE * (n_before + 1) / n_before)
    r_after = recall(idx.probe(spark, sf_dir, nprobe=matched))
    release_persisted()
    assert r_after >= r_before - 0.05, (r_before, r_after)
    # and the split children are strictly cheaper to probe than the parent
    assert max(after_stored[c][0] for c in kids) < before_stored[worst][0]


def test_snapshot_isolation_across_split(spark, sf_dir, tmp_path):
    """A reader that resolved the catalog before a split keeps serving the
    exact pre-split results afterwards — no half-built index visible."""
    ix = EvolvableIvfIndex(str(tmp_path / "index"))
    ix.build(spark, sf_dir)
    v0 = ix.catalog.version()
    before = _topk(ix.probe(spark, sf_dir, catalog_version=v0))
    release_persisted()
    ix.split_worst_cell(spark)
    release_persisted()
    again = _topk(ix.probe(spark, sf_dir, catalog_version=v0))
    release_persisted()
    assert again == before


def test_split_cas_replans_on_concurrent_commit(spark, sf_dir, tmp_path):
    """A maintenance racer committing mid-split forces a replan, not a
    clobber: the loser's split lands on top of the winner's state."""
    ix = EvolvableIvfIndex(str(tmp_path / "index"))
    ix.build(spark, sf_dir)
    orig = ix.cell_margins
    state = {"raced": False}

    def racing_margins(spark_, catalog_version=None):
        if not state["raced"]:
            state["raced"] = True
            EvolvableIvfIndex(ix.root).split_worst_cell(spark_)
        return orig(spark_, catalog_version)

    ix.cell_margins = racing_margins
    n0 = len(ix.snapshot(spark))
    ix.split_worst_cell(spark)
    release_persisted()
    assert len(ix.snapshot(spark)) == n0 + 2  # both splits present


def test_recenter_tightens_all_cells_without_rewrite(spark, sf_dir, tmp_path):
    """Moving centroids to member means improves (or holds) every cell's
    stored mean cosine, touches zero data files, and bumps one version."""
    ix = EvolvableIvfIndex(str(tmp_path / "index"))
    ix.build(spark, sf_dir)
    before = {
        r["cid"]: r["mean_cos"] for r in ix.stored_cell_stats(spark).collect()
    }
    paths_before = {(p, v) for _, _, p, v in ix.snapshot(spark)}
    v0 = ix.catalog.version()
    assert ix.recenter_cells(spark) == v0 + 1
    after = {
        r["cid"]: r["mean_cos"] for r in ix.stored_cell_stats(spark).collect()
    }
    assert {(p, v) for _, _, p, v in ix.snapshot(spark)} == paths_before
    assert set(after) == set(before)
    assert all(after[c] >= before[c] for c in before), (before, after)
    assert sum(after.values()) > sum(before.values())


def test_merge_closest_cells_preserves_membership(spark, sf_dir, tmp_path):
    """Merging rewrites only the two merged cells, keeps every vector, and
    the probe path still serves full top-k afterwards."""
    ix = EvolvableIvfIndex(str(tmp_path / "index"))
    ix.build(spark, sf_dir)
    stats0 = {
        r["cid"]: r["n_members"] for r in ix.stored_cell_stats(spark).collect()
    }
    snap0 = {c: (p, v) for c, _, p, v in ix.snapshot(spark)}
    ix.merge_closest_cells(spark)
    stats1 = {
        r["cid"]: r["n_members"] for r in ix.stored_cell_stats(spark).collect()
    }
    snap1 = {c: (p, v) for c, _, p, v in ix.snapshot(spark)}
    assert len(stats1) == len(stats0) - 1
    assert sum(stats1.values()) == sum(stats0.values())  # no vector lost
    merged = [c for c in stats1 if c not in stats0]
    assert len(merged) == 1
    untouched = set(stats1) - set(merged)
    for c in untouched:  # untouched cells' tables not rewritten
        assert snap1[c] == snap0[c]
    topk = ix.probe(spark, sf_dir).collect()
    release_persisted()
    assert topk and len({r["query_id"] for r in topk}) >= 1
