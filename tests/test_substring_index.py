"""Served substring index: every occurrence found, none invented, files
actually pruned, short patterns rejected loudly."""

from __future__ import annotations

import pytest

from map_reduce_in_go_spark.sources.manifest_table import ManifestTable
from map_reduce_in_go_spark.sources.substring_index import (
    ANCHOR_W,
    build_substring_index,
    substring_search,
)
from map_reduce_in_go_spark.sources.tables import load_table


def _all_occurrences(text: str, pattern: str):
    """Brute force incl. overlapping matches, 1-based offsets."""
    out, start = [], 0
    while True:
        i = text.find(pattern, start)
        if i < 0:
            return out
        out.append(i + 1)
        start = i + 1


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ssidx") / "index")
    build_substring_index(spark, sf_dir, root)
    return root


def test_substring_search_matches_bruteforce(spark, sf_dir, index_dir):
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    docs = sorted(texts)
    # patterns cut from real docs: a doc prefix, a mid-doc slice, a slice
    # from a duplicated doc (many occurrences), and one absent string
    t0 = texts[docs[0]]
    t_mid = texts[docs[len(docs) // 2]]
    patterns = [
        t0[:ANCHOR_W],
        t_mid[10 : 10 + ANCHOR_W + 17],
        max(texts.values(), key=len)[: ANCHOR_W + 5],
        "z" * ANCHOR_W,  # tokens are lowercase words; 32 z's occur nowhere
    ]
    got: dict[str, set] = {p: set() for p in patterns}
    for r in substring_search(spark, sf_dir, index_dir, patterns).collect():
        got[r["pattern"]].add((r["doc_id"], r["pos"]))
    for p in patterns:
        want = {
            (d, pos)
            for d, text in texts.items()
            for pos in _all_occurrences(text, p)
        }
        assert got[p] == want, p
    assert got["z" * ANCHOR_W] == set()
    # at least one pattern matched somewhere (real slices always do)
    assert any(got[p] for p in patterns[:3])


def test_substring_search_prunes_files(spark, sf_dir, index_dir):
    """Point probes must open strictly fewer files than the index holds —
    the whole reason for the hash-clustered layout."""
    from pyspark.sql import functions as F

    tbl = ManifestTable(index_dir, stats_cols=["h"])
    probe = (
        spark.createDataFrame([("x" * ANCHOR_W,)], "p string")
        .select(F.xxhash64(F.substring("p", 1, ANCHOR_W)).alias("h"))
        .collect()[0]["h"]
    )
    files, total = tbl.files_pruned_in("h", [probe], tbl.version())
    assert total > 1  # the index really is multi-file
    assert len(files) < total


def test_substring_search_rejects_short_patterns(spark, sf_dir, index_dir):
    with pytest.raises(ValueError, match="ANCHOR_W"):
        substring_search(spark, sf_dir, index_dir, ["tiny"])


def test_incremental_append_and_optimize(spark, sf_dir, tmp_path):
    """Maintenance path: an index built from half the corpus, extended by
    a ledgered append of the other half, answers searches over BOTH
    halves; a replayed op contributes nothing; re-clustering restores
    point-probe pruning after the append widened file ranges."""
    from pyspark.sql import functions as F

    from map_reduce_in_go_spark.sources.substring_index import (
        INDEX_FILES,
        index_append,
        optimize_index,
        substring_search,
    )
    from map_reduce_in_go_spark.sources.tables import load_table

    root = str(tmp_path / "index")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    half1 = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
    half2 = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)

    tbl = ManifestTable(root, stats_cols=["h"])
    from map_reduce_in_go_spark.sources.substring_index import _gram_rows

    tbl.append(_gram_rows(half1), op="build-half1")
    tbl.compact(spark, num_files=INDEX_FILES, zorder_cols=["h"])

    assert index_append(root, half2, op="batch-2")
    assert index_append(root, half2, op="batch-2") is False  # ledger

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    odd = next(d for d in sorted(texts) if d % 2 == 1)
    pattern = texts[odd][5 : 5 + ANCHOR_W]
    got = {
        (r["doc_id"], r["pos"])
        for r in substring_search(spark, sf_dir, root, [pattern]).collect()
    }
    want = {
        (d, pos)
        for d, text in texts.items()
        for pos in _all_occurrences(text, pattern)
    }
    assert got == want and (odd, 6) in got

    # appended files widen ranges; one optimize restores tight pruning
    optimize_index(spark, root)
    probe = (
        spark.createDataFrame([(pattern,)], "p string")
        .select(F.xxhash64(F.substring("p", 1, ANCHOR_W)).alias("h"))
        .collect()[0]["h"]
    )
    tbl2 = ManifestTable(root, stats_cols=["h"])
    files, total = tbl2.files_pruned_in("h", [probe], tbl2.version())
    assert total > 1 and len(files) < total
    # and the re-clustered index still answers identically
    again = {
        (r["doc_id"], r["pos"])
        for r in substring_search(spark, sf_dir, root, [pattern]).collect()
    }
    assert again == want
