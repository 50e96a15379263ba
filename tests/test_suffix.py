"""Distributed suffix array (prefix doubling): full order vs brute force,
and the longest-repeated-substring reduction over adjacent LCPs."""

from __future__ import annotations

from map_reduce_in_go_spark.functions.caching import release_persisted
from map_reduce_in_go_spark.operators.suffix import (
    longest_repeated_substring,
    suffix_array,
)
from map_reduce_in_go_spark.sources.tables import load_table


def _texts(spark, sf_dir):
    return {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }


def test_suffix_array_matches_bruteforce(spark, sf_dir):
    """The distributed prefix-doubling order must equal a single-node
    sorted(suffixes) over the ENTIRE real corpus — every suffix, exact
    total order, ties (exact-dup docs) broken by (doc_id, pos)."""
    texts = _texts(spark, sf_dir)
    brute = sorted(
        (text[p - 1 :], d, p)
        for d, text in texts.items()
        for p in range(1, len(text) + 1)
    )
    got = suffix_array(spark, sf_dir).collect()
    release_persisted()
    assert len(got) == len(brute)
    by_rank = sorted(got, key=lambda r: r["sa_rank"])
    # dense 1..n ranks
    assert [r["sa_rank"] for r in by_rank] == list(range(1, len(brute) + 1))
    assert [(r["doc_id"], r["pos"]) for r in by_rank] == [
        (d, p) for _, d, p in brute
    ]


def test_longest_repeated_substring(spark, sf_dir):
    """SA reduction: the reported LCP equals the brute-force maximum over
    adjacent sorted suffixes, and the reported pair really shares a
    common prefix of that length."""
    texts = _texts(spark, sf_dir)
    brute = sorted(
        (text[p - 1 :], d, p)
        for d, text in texts.items()
        for p in range(1, len(text) + 1)
    )

    def lcp(a, b):
        m = min(len(a), len(b))
        i = 0
        while i < m and a[i] == b[i]:
            i += 1
        return i

    want = max(lcp(brute[i][0], brute[i + 1][0]) for i in range(len(brute) - 1))

    row = longest_repeated_substring(spark, sf_dir).collect()[0]
    release_persisted()
    assert row["lcp"] == want
    a = texts[row["doc_a"]][row["pos_a"] - 1 :]
    b = texts[row["doc_b"]][row["pos_b"] - 1 :]
    assert a[: row["lcp"]] == b[: row["lcp"]]
    assert want > 0  # the corpus contains repeats (dup docs exist)


def test_lcp_block_size_self_sizes():
    """The auto knob: capped at the memory bound, floored at the per-task
    overhead bound, and otherwise targeting two task waves per core."""
    from map_reduce_in_go_spark.operators.suffix import (
        LCP_BLOCK,
        LCP_BLOCK_MIN,
        _lcp_block_size,
    )

    assert _lcp_block_size(0, 32) == LCP_BLOCK  # degenerate: cap
    assert _lcp_block_size(100, 32) == LCP_BLOCK_MIN  # tiny corpus: floor
    assert _lcp_block_size(1_500_000, 32) == -(-1_500_000 // 64)  # 2 waves
    assert _lcp_block_size(100_000_000, 32) == LCP_BLOCK  # capped at scale
