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

At 100 TB the per-round cost is one self-equijoin and one fused range
partition over fixed-width rows — the same shuffle shape as the
relational operators; nothing ever holds a document, let alone the
corpus, in one task. Comparisons are bounded by construction (ranks,
never strings, after init).

Suffix RANKS are not SQL-replayable in one query (the recurrence is
iterative) and stay pytest-pinned against a brute-force sorted-suffixes
oracle; the :func:`longest_repeated_substring` reduction IS replayable
(one ORDER BY + lead() + first-mismatch scan) and is the registered
driver-checkable query for the family (r9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.caching import (
    free_local_checkpoint,
    persisted_count,
    release_persisted_since,
    scoped_persist,
)
from ..functions.ranks import with_global_dense_rank, with_global_rank
from ..sources.tables import load_documents_parallel

# Characters resolved by the initial key sort. Each extra init char costs
# one byte/suffix in the ONE init range partition; each halving of INIT_W
# costs a whole extra doubling round (2 exchanges + 2 Arrow passes over
# every suffix). 32 resolves typical natural-text suffix collisions in the
# init sort; the knob trades init shuffle width against round count, and
# both are linear in corpus chars at any scale. The ACTUAL width
# self-sizes per corpus (r10, the knob the r9 comments named): from the
# max-doc-length stats scan, pick the smallest power of two in
# [INIT_W, INIT_W_MAX] that clears the longest doc in ≤ 3 doubling
# rounds — per-round JOB overhead dominates long before init bytes do,
# and a pathological corpus of book-length docs caps at INIT_W_MAX
# rather than paying an unbounded init sort.
INIT_W = 32
INIT_W_MAX = 128
MAX_ROUNDS = 12  # 32 · 2^12 = 128k chars — far past any testdata doc


def _init_w(max_len: int) -> int:
    """Initial rank width for a corpus whose longest doc is ``max_len``."""
    w = INIT_W
    while w < INIT_W_MAX and max_len > w * (1 << 3):  # > 3 rounds from w
        w *= 2
    return w
LCP_MAX = 1024  # adjacent-LCP comparison cap (bytes moved: chars × this)
# SA-order block-size CAP for the adjacent-LCP pass: each task holds one
# block of suffix slices (≤ LCP_BLOCK × LCP_MAX bytes ≈ 64 MB worst case).
# The actual block size self-sizes DOWN from the cap so small corpora
# still fan out across every core (see _lcp_block_size); block count
# n/B sets the parallelism at scale.
LCP_BLOCK = 65536
LCP_BLOCK_MIN = 4096  # below this, per-task overhead dominates the kernel


def _lcp_block_size(n: int, parallelism: int) -> int:
    """Block size for n suffixes: the memory cap, shrunk until the pass
    has ≥ 2 blocks per core (the r10-declared auto knob, landed r9)."""
    if n <= 0:
        return LCP_BLOCK
    target = -(-n // (2 * parallelism))  # ceil: 2 waves of tasks
    return max(LCP_BLOCK_MIN, min(LCP_BLOCK, target))


def suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, sa_rank): every corpus suffix with its position in
    the generalized suffix array (1-based; pos is 1-based within doc).

    ``sa_rank`` is the suffix's place in the lexicographic order of ALL
    suffixes of ALL documents; exactly-equal suffixes (duplicate docs)
    tie-break by (doc_id, pos), so the output is a total order and
    deterministic.

    Per-round plan (the r9 fusion — previously two distinct+rank+join
    dense ranks per round, ~7 jobs): exactly TWO exchanges. The round
    output is hash-partitioned on ``doc_id`` once, so the shift self-join
    reuses both sides' partitioning (doc_id is a prefix subset of the
    (doc_id, pos) join keys — no exchange, plan-pinned in
    tests/test_suffix.py), and the re-rank is ONE fused range partition
    via :func:`with_global_dense_rank`, which also returns the distinct
    count — so the old per-round ``max(r)`` convergence job is free.
    Round outputs are persisted (the self-join reads them twice);
    lineage is cut by ``localCheckpoint`` every OTHER round.
    """
    # Spark ≥3.3 refuses to reuse a join side partitioned on a SUBSET of
    # the join keys unless this is off (skew guard for pathological
    # few-key sides). Here the subset reuse is the point: odd-round caches
    # are doc_id-partitioned so the (doc_id, pos) self-join needs no
    # exchange. Scoped set/restore — every join in this function is
    # planned (and its round materialized) before the restore runs.
    _CO_PART = "spark.sql.requireAllClusterKeysForCoPartition"
    co_part_old = spark.conf.get(_CO_PART, "true")
    spark.conf.set(_CO_PART, "false")
    try:
        return _suffix_array_impl(spark, sf_dir)
    finally:
        # INVARIANT (r9 advice): the restore is correct only because every
        # conf-reliant join inside _suffix_array_impl is MATERIALIZED there
        # (each odd-round self-join's output is localCheckpoint'ed or
        # persisted before the next round plans); the DataFrame returned to
        # the caller is planned after this restore and must not itself
        # contain a subset-key co-partition join. Any new join added to the
        # impl that escapes un-materialized breaks this — materialize it.
        spark.conf.set(_CO_PART, co_part_old)


def _suffix_array_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_part = spark.sparkContext.defaultParallelism
    docs_all = load_documents_parallel(spark, sf_dir).select("doc_id", "text")
    # Duplicate-document collapse (r9): byte-identical docs contribute
    # byte-identical suffix sets whose ranks can never separate — on a
    # dup-heavy corpus the doubling rounds would drag every copy along
    # forever (the 10× replica is 90% permanent ties). Build the SA over
    # one representative per distinct text and fan ranks back out at the
    # end: equal texts get equal ranks by construction and the final
    # total order already breaks those ties by (doc_id, pos), so the
    # output is bit-identical to the full computation (pinned by the
    # brute-force test) while the iterative core runs at distinct-text
    # scale. This is also the honest 100 TB posture — dedup before index.
    digests = docs_all.select("doc_id", F.md5("text").alias("dg"))
    reps = digests.groupBy("dg").agg(F.min("doc_id").alias("rep_id"))
    rep_map = digests.join(reps, "dg").select("doc_id", "rep_id")
    docs = docs_all.join(
        reps.select(F.col("rep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    # empty-doc guard (r9 advice): sequence(1, 0) is the DESCENDING [1, 0],
    # so an empty text would inject two spurious empty suffixes and shift
    # every sa_rank — same footgun already fixed in dedup_containment_exact
    docs = docs.filter(F.length("text") > 0)
    # stats scan FIRST: max doc length sizes the init width (and the
    # convergence stop below) — one cheap agg over the collapsed docs
    max_len = docs.agg(F.max(F.length("text"))).collect()[0][0] or 0
    init_w = _init_w(max_len)
    sufs = (
        docs.select(
            "doc_id", F.explode(F.expr("sequence(1, length(text))")).alias("pos"), "text"
        )
        .select(
            "doc_id", "pos", F.expr(f"substr(text, pos, {init_w})").alias("k0")
        )
    )
    mark = persisted_count()
    ranked, n, n_distinct = with_global_dense_rank(
        sufs, ["k0"], "rk", out_cols=["doc_id", "pos"]
    )
    ranks = ranked.select(
        "doc_id", "pos", F.col("rk").alias("r")
    ).localCheckpoint(eager=True)
    release_persisted_since(mark)  # init rank cache (checkpointed past)
    last_ckpt = ranks
    k = init_w
    rounds = 0
    # stop when every rank is unique, or the first k chars cover the whole
    # longest doc (exact-duplicate suffixes stay tied at ANY k — without
    # the max_len stop they would force MAX_ROUNDS every time)
    while n_distinct < n and k < max_len:
        if rounds >= MAX_ROUNDS:
            # returning here would silently mis-order suffixes that agree
            # on their first INIT_W·2^MAX_ROUNDS chars (r8 advice)
            raise RuntimeError(
                f"suffix_array: prefix doubling did not converge in "
                f"{MAX_ROUNDS} rounds (k={k}, {n_distinct}/{n} distinct, "
                f"max doc length {max_len}); raise MAX_ROUNDS for corpora "
                f"with documents beyond {init_w * 2 ** MAX_ROUNDS} chars"
            )
        shifted = ranks.select(
            "doc_id", (F.col("pos") - k).alias("pos"), F.col("r").alias("r2")
        )
        paired = ranks.join(shifted, ["doc_id", "pos"], "left").fillna(
            {"r2": 0}
        )  # sentinel 0: a proper prefix sorts before every extension
        prev_distinct = n_distinct
        ranked, _, n_distinct = with_global_dense_rank(
            paired, ["r", "r2"], "rk", out_cols=["doc_id", "pos"]
        )
        if n_distinct == prev_distinct:
            # partition-refinement fixpoint (Hopcroft invariant): a doubling
            # round that separates NOTHING proves every remaining tie agrees
            # at all positions — the ties are equal suffixes and the order
            # is final, no matter how long the documents run on
            break
        out_round = ranked.select("doc_id", "pos", F.col("rk").alias("r"))
        rounds += 1
        k *= 2
        if rounds % 2 == 0 or n_distinct == n or k >= max_len:
            # lineage cut: materialize, then free the superseded segment.
            # (localCheckpoint erases partitioning info, so repartitioning
            # first would be wasted — the following round's join re-exchanges
            # both sides regardless; plan-checked in tests/test_suffix.py)
            ranks = out_round.localCheckpoint(eager=True)
            release_persisted_since(mark)
            free_local_checkpoint(last_ckpt)
            last_ckpt = ranks
        else:
            # odd round: cache co-partitioned on doc_id and pre-sorted, so
            # the next round's (doc_id, pos) self-join runs exchange- and
            # sort-free off the InMemoryTableScan (which, unlike a
            # checkpoint scan, preserves partitioning + ordering)
            ranks = scoped_persist(
                out_round.repartition(n_part, "doc_id").sortWithinPartitions(
                    "doc_id", "pos"
                )
            )
    # fan the representative ranks back out to every duplicate doc (slim
    # doc-grain map joined at suffix grain; AQE broadcasts it when small)
    full = rep_map.join(
        ranks.withColumnRenamed("doc_id", "rep_id"), "rep_id"
    ).select("doc_id", "pos", "r")
    # final total order: rank, then (doc_id, pos) for equal-suffix ties
    out, _ = with_global_rank(
        full, [F.asc("r"), F.asc("doc_id"), F.asc("pos")], "sa_rank"
    )
    return out.select("doc_id", "pos", "sa_rank")


def longest_repeated_substring(
    spark: SparkSession, sf_dir: str, top_n: int = 25
) -> DataFrame:
    """(length, doc_a, pos_a, doc_b, pos_b): the longest substrings that
    occur at least twice anywhere in the corpus (across or within docs),
    top ``top_n`` adjacent suffix pairs by LCP (deterministic tie-break
    on (doc_a, pos_a, doc_b, pos_b)).

    Registered driver query (r9): the DuckDB oracle rebuilds the suffix
    order as a single ORDER BY over all suffix strings plus a lead()
    window, and computes each adjacent pair's LCP with a first-mismatch
    list_position — a true brute-force replay that never sees the
    prefix-doubling recurrence, so a ranking bug anywhere in
    :func:`suffix_array` breaks the value hash.

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
    import numpy as np
    import pandas as pd

    sa = scoped_persist(suffix_array(spark, sf_dir))
    docs = load_documents_parallel(spark, sf_dir).select("doc_id", "text")
    with_text = sa.join(docs, "doc_id").select(
        "sa_rank",
        F.col("doc_id"),
        F.col("pos"),
        F.expr(f"substr(text, pos, {LCP_MAX})").alias("suf"),
    )
    # Adjacent pairing WITHOUT the former rank self-join (which shuffled
    # every suffix slice twice): route each row to a deterministic
    # SA-order block of B ranks, duplicating only each block's first row
    # into the previous block so the cross-boundary pair is still
    # computed — text moves through exactly ONE shuffle, and the kernel
    # compares consecutive rows. B self-sizes from the (cached) SA's row
    # count so small corpora still fan out across every core.
    B = _lcp_block_size(sa.count(), spark.sparkContext.defaultParallelism)
    blk = with_text.withColumn(
        "blk", F.expr(f"CAST((sa_rank - 1) DIV {B} AS LONG)")
    )
    boundary = with_text.filter(
        (F.col("sa_rank") % B == 1) & (F.col("sa_rank") > 1)
    ).withColumn("blk", F.expr(f"CAST((sa_rank - 2) DIV {B} AS LONG)"))
    tagged = blk.unionByName(boundary)

    def _np_lcp(a_strs: list, b_strs: list) -> np.ndarray:
        """Vectorized LCP of row-aligned string lists, in CODE POINTS —
        the unit the DuckDB oracle's char comparison and the `pos` offsets
        use (r9 advice: the former byte-wise form silently diverged on
        non-ASCII or NUL-bearing text). Each string becomes a row of a
        uint32 matrix via UTF-32-LE; A pads with 0x7FFFFFF0 and B with
        0x7FFFFFFF — both outside the Unicode range (max U+10FFFF), so
        pads can never equal a real character (including U+0000) or each
        other, and the first A!=B position IS the LCP: a proper prefix
        mismatches at its own end (pad vs char), equal strings at their
        shared length (pad vs pad) — no special cases."""
        out = np.empty(len(a_strs), np.int64)
        CH = 4096
        for s in range(0, len(a_strs), CH):
            aa = [x.encode("utf-32-le") for x in a_strs[s : s + CH]]
            bb = [x.encode("utf-32-le") for x in b_strs[s : s + CH]]
            # +1 sentinel column: two equal strings of exactly `width`
            # chars would otherwise have no mismatch and argmax would
            # return 0 instead of width
            width = max(1, max(len(x) // 4 for x in aa + bb)) + 1
            A = np.full((len(aa), width), 0x7FFFFFF0, np.uint32)
            B = np.full((len(aa), width), 0x7FFFFFFF, np.uint32)
            for i, (x, y) in enumerate(zip(aa, bb)):
                A[i, : len(x) // 4] = np.frombuffer(x, np.uint32)
                B[i, : len(y) // 4] = np.frombuffer(y, np.uint32)
            out[s : s + CH] = (A != B).argmax(axis=1)
        return out

    def _block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "lcp": pd.Series(dtype="int64"),
                "doc_a": pd.Series(dtype="int64"),
                "pos_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "pos_b": pd.Series(dtype="int64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("sa_rank")
        ranks = pdf["sa_rank"].to_numpy()
        keep = ranks[1:] == ranks[:-1] + 1  # dense ranks: always true
        if not keep.any():
            return empty
        sufs = pdf["suf"].tolist()
        a_idx = np.nonzero(keep)[0]
        lcps = _np_lcp([sufs[i] for i in a_idx], [sufs[i + 1] for i in a_idx])
        return pd.DataFrame(
            {
                "lcp": lcps,
                "doc_a": pdf["doc_id"].to_numpy()[a_idx],
                "pos_a": pdf["pos"].to_numpy()[a_idx],
                "doc_b": pdf["doc_id"].to_numpy()[a_idx + 1],
                "pos_b": pdf["pos"].to_numpy()[a_idx + 1],
            }
        )

    scored = tagged.groupBy("blk").applyInPandas(
        _block_pairs,
        schema="lcp long, doc_a long, pos_a long, doc_b long, pos_b long",
    )
    return scored.orderBy(
        F.desc("lcp"), F.asc("doc_a"), F.asc("pos_a"), F.asc("doc_b"), F.asc("pos_b")
    ).limit(top_n)


# Brute-force SQL replay of the SA reduction: sort ALL suffix strings, pair
# each with its successor via lead(), LCP = position of first mismatching
# char (capped at LCP_MAX exactly like the Spark kernel's slice). O(total
# suffix chars) sort in DuckDB — fine at oracle scale, quadratic-free.
ORACLES = {
    "longest_repeated_substring": f"""
    WITH sufs AS (
      SELECT doc_id, i AS pos, substr(text, i) AS suf
      FROM documents, LATERAL unnest(range(1, length(text) + 1)) AS u(i)
    ), ordered AS (
      SELECT doc_id, pos, suf,
             lead(doc_id) OVER w AS doc_b,
             lead(pos) OVER w AS pos_b,
             lead(suf) OVER w AS suf_b
      FROM sufs
      WINDOW w AS (ORDER BY suf, doc_id, pos)
    ), pairs AS (
      SELECT doc_id AS doc_a, pos AS pos_a, doc_b, pos_b,
             coalesce(
               nullif(list_position(
                 list_transform(
                   range(1, least(len(suf), len(suf_b), {LCP_MAX}) + 1),
                   i -> substr(suf, i, 1) = substr(suf_b, i, 1)),
                 false), 0) - 1,
               least(len(suf), len(suf_b), {LCP_MAX})) AS lcp
      FROM ordered WHERE doc_b IS NOT NULL
    )
    SELECT CAST(lcp AS BIGINT) AS lcp, doc_a, CAST(pos_a AS BIGINT) AS pos_a,
           doc_b, CAST(pos_b AS BIGINT) AS pos_b
    FROM pairs
    ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b
    LIMIT 25
    """,
}
