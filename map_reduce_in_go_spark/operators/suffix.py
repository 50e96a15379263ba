"""Distributed generalized suffix array — prefix doubling in DataFrames.

The suffix array is the classical index behind exact substring search,
longest-repeated-substring mining, and the Lee et al. (2022) substring
dedup family (`dedup_substring` implements their k-gram run form; this
module builds the underlying structure itself). A single-node build is
O(n log n) (Manber & Myers, 1990); the distributed form here expresses
exactly that prefix-doubling recurrence as DataFrame rounds:

1. **Init**: one row per suffix (doc_id, pos) — O(corpus chars) rows —
   keyed by its first ``INIT_W`` characters; dense-rank those keys with
   the hierarchical global rank (``functions/ranks.py``, range partition
   + Arrow counter, no single-reducer window).
2. **Double**: a suffix's order by its first 2k chars is the pair
   (rank_k(pos), rank_k(pos + k)) — one self-equijoin on (doc_id,
   pos + k) with sentinel 0 for past-the-end (a proper prefix sorts
   first), then a dense re-rank of the distinct pairs. Each round is a
   bounded number of keyed shuffles over O(chars) rows of three longs;
   ``localCheckpoint`` keeps lineage flat (the `pagerank_docs`
   discipline).
3. **Stop** when every rank is unique (real text converges in 2-3
   rounds past INIT_W) or 2k exceeds the longest document — equal-suffix
   ties (exact duplicate docs) can never separate and are broken by
   (doc_id, pos) at the end.

At 100 TB the per-round cost is two hash joins and one range partition
over fixed-width rows — the same shuffle shape as the relational
operators; nothing ever holds a document, let alone the corpus, in one
task. Comparisons are bounded by construction (ranks, never strings,
after init).

Suffix ranks are not SQL-replayable in one query (the recurrence is
iterative), so this ships as a pytest component with a brute-force
sorted-suffixes oracle over the real corpus — the same honesty contract
as the evolvable IVF index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.caching import free_local_checkpoint, scoped_persist
from ..functions.ranks import with_global_rank
from ..sources.tables import load_documents_parallel

INIT_W = 8  # characters resolved by the initial key sort
MAX_ROUNDS = 12  # 8 · 2^12 = 32k chars — far past any testdata doc
LCP_MAX = 1024  # adjacent-LCP comparison cap (bytes moved: chars × this)


def _dense_rank_on(df: DataFrame, cols: list[str]) -> DataFrame:
    """Attach dense rank ``rk`` of the tuple ``cols`` (same tuple → same
    rank, ranks 1..#distinct in tuple order) via the shuffle-lean global
    rank over the DISTINCT tuple set, joined back."""
    distinct = df.select(*cols).distinct()
    ranked, _ = with_global_rank(distinct, [F.asc(c) for c in cols], "rk")
    return df.join(ranked, cols)


def suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, sa_rank): every corpus suffix with its position in
    the generalized suffix array (1-based; pos is 1-based within doc).

    ``sa_rank`` is the suffix's place in the lexicographic order of ALL
    suffixes of ALL documents; exactly-equal suffixes (duplicate docs)
    tie-break by (doc_id, pos), so the output is a total order and
    deterministic.
    """
    docs = load_documents_parallel(spark, sf_dir).select("doc_id", "text")
    sufs = (
        docs.select(
            "doc_id", F.explode(F.expr("sequence(1, length(text))")).alias("pos"), "text"
        )
        .select(
            "doc_id", "pos", F.expr(f"substr(text, pos, {INIT_W})").alias("k0")
        )
    )
    from ..functions.caching import release_persisted

    ranks = (
        _dense_rank_on(sufs, ["k0"])
        .select("doc_id", "pos", F.col("rk").alias("r"))
        .localCheckpoint(eager=True)
    )
    release_persisted()  # drop the round's rank-frame cache (checkpointed)
    n = ranks.count()
    max_len = docs.agg(F.max(F.length("text"))).collect()[0][0] or 0
    last_ckpt = ranks
    k = INIT_W
    for _ in range(MAX_ROUNDS):
        if k >= max_len:
            break  # first k chars = whole longest doc: order is final
            # (exact-duplicate suffixes stay tied at ANY k — without this
            # stop they would force MAX_ROUNDS every time)
        n_distinct = ranks.agg(F.max("r")).collect()[0][0]
        if n_distinct == n:
            break  # every suffix fully ordered
        shifted = ranks.select(
            "doc_id", (F.col("pos") - k).alias("pos"), F.col("r").alias("r2")
        )
        paired = ranks.join(shifted, ["doc_id", "pos"], "left").fillna(
            {"r2": 0}
        )  # sentinel 0: a proper prefix sorts before every extension
        ranks = (
            _dense_rank_on(paired, ["r", "r2"])
            .select("doc_id", "pos", F.col("rk").alias("r"))
            .localCheckpoint(eager=True)
        )
        release_persisted()
        free_local_checkpoint(last_ckpt)
        last_ckpt = ranks
        k *= 2
    # final total order: rank, then (doc_id, pos) for equal-suffix ties
    out, _ = with_global_rank(
        ranks, [F.asc("r"), F.asc("doc_id"), F.asc("pos")], "sa_rank"
    )
    return out.select("doc_id", "pos", "sa_rank")


def longest_repeated_substring(
    spark: SparkSession, sf_dir: str, top_n: int = 1
) -> DataFrame:
    """(length, doc_a, pos_a, doc_b, pos_b): the longest substring that
    occurs at least twice anywhere in the corpus (across or within docs).

    Classical SA reduction: the longest repeat is the maximum common
    prefix of some pair of suffixes ADJACENT in suffix order — so only
    the O(n) adjacent pairs are compared, never all pairs. The LCP of
    each adjacent pair is computed in one Arrow pass over
    (suffix, next-suffix) text slices re-attached by position. Slices are
    capped at ``LCP_MAX`` chars so the pass moves O(chars · LCP_MAX)
    bytes, not the quadratic full-suffix payload; a result AT the cap is
    a lower bound and the caller re-runs with a larger cap (never needed
    on natural text — repeats longer than the cap mean the dedup family
    upstream hasn't run; the testdata's longest repeat IS a full 513-char
    duplicate document, which the default cap covers).
    """
    import pandas as pd

    sa = scoped_persist(suffix_array(spark, sf_dir))
    docs = load_documents_parallel(spark, sf_dir).select("doc_id", "text")
    with_text = sa.join(docs, "doc_id").select(
        "sa_rank",
        F.col("doc_id"),
        F.col("pos"),
        F.expr(f"substr(text, pos, {LCP_MAX})").alias("suf"),
    )
    nxt = with_text.select(
        (F.col("sa_rank") - 1).alias("sa_rank"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("suf").alias("suf_b"),
    )
    pairs = with_text.join(nxt, "sa_rank")

    def lcp(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for a, b in zip(pdf["suf"], pdf["suf_b"]):
                m = min(len(a), len(b))
                i = 0
                while i < m and a[i] == b[i]:
                    i += 1
                out.append(i)
            yield pd.DataFrame(
                {
                    "lcp": out,
                    "doc_a": pdf["doc_id"],
                    "pos_a": pdf["pos"],
                    "doc_b": pdf["doc_b"],
                    "pos_b": pdf["pos_b"],
                }
            )

    scored = pairs.mapInPandas(
        lcp, schema="lcp long, doc_a long, pos_a long, doc_b long, pos_b long"
    )
    return scored.orderBy(
        F.desc("lcp"), F.asc("doc_a"), F.asc("pos_a"), F.asc("doc_b"), F.asc("pos_b")
    ).limit(top_n)
