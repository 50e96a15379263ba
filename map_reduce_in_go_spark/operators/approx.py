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

from ..functions.text import sql_tokens
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


# Heavy-hitter support threshold: report words with count·K > total tokens
# (frequency above 1/K). K is also the Misra-Gries summary capacity — the
# size that guarantees the candidate pass misses no true heavy hitter.
HH_K = 500


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters via sketch-pruned two-pass counting.

    ``wordcount + HAVING`` shuffles the entire key universe to answer a
    question whose output is at most K rows. The streaming-literature plan
    (Misra-Gries summaries, mergeable per Agarwal et al., PODS'12) does it
    with bounded state:

    1. **Candidate pass, zero shuffle**: each partition folds its tokens
       into a Misra-Gries summary of capacity K (Arrow-batched pandas:
       exact value_counts per batch merged into the running summary, then
       shrunk to K by subtracting the (K+1)-th count — the mergeable-MG
       reduction). Any word with global count > n/K must exceed its
       partition share n_p/K somewhere, and MG keeps everything above
       n_p/(K+1), so the union of partition candidates is a SUPERSET of
       the true heavy hitters regardless of partitioning. One row per
       partition: (part_n, candidate array) — KB-sized state per task.
    2. **Exact recount, shuffle only candidates**: semi-join the token
       stream against the broadcast candidate set (≤ #partitions·K words),
       count exactly, keep ``cnt·K > n``. False candidates die here, so
       the output is exact and partitioning-invariant — which is what lets
       the driver hash-check this row against plain SQL.

    At 100 TB the shuffle carries only candidate-word rows instead of the
    full token keyspace — the classic sketch-then-verify reduction.
    """
    from ..functions.caching import scoped_persist

    words = _doc_words(spark, sf_dir).select("word")

    def mg_summaries(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            for w, c in pdf["word"].value_counts().items():
                counts[w] = counts.get(w, 0) + int(c)
            if len(counts) > HH_K:
                cut = sorted(counts.values(), reverse=True)[HH_K]
                counts = {w: c - cut for w, c in counts.items() if c > cut}
        yield pd.DataFrame({"part_n": [n], "cands": [list(counts)]})

    summaries = scoped_persist(
        words.mapInPandas(mg_summaries, "part_n long, cands array<string>")
    )
    total = summaries.agg(F.sum("part_n")).collect()[0][0] or 0  # bounded scalar
    cands = summaries.select(F.explode("cands").alias("word")).distinct()
    return (
        words.join(F.broadcast(cands), "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * HH_K > F.lit(int(total)))
    )


ORACLES: dict[str, str] = {
    "heavy_hitters": f"""
    WITH words AS (
      SELECT unnest({sql_tokens('text')}) AS word
      FROM documents
    ), tot AS (SELECT count(*) AS n FROM words)
    SELECT word, count(*) AS cnt FROM words GROUP BY word
    HAVING count(*) * {HH_K} > (SELECT n FROM tot)
    """,
}


# Count-Min sketch shape: D independent hash rows × W counters. With the
# corpus at n tokens, a CMS estimate overshoots by at most ~n/W per row
# (ε = e/W); W=4096 keeps the false-candidate screen tight at HH_K=500.
CMS_W = 4096
CMS_D = 4


def _cms_hashes(word: str) -> list[int]:
    """D row-indices from one md5: 4 disjoint 8-hex-char slices mod W.

    One digest per distinct word per partition; slices are independent
    uniform 32-bit draws, the standard cheap stand-in for D pairwise-
    independent hash functions.
    """
    import hashlib

    h = hashlib.md5(word.encode("utf-8")).hexdigest()
    return [int(h[8 * d : 8 * d + 8], 16) % CMS_W for d in range(CMS_D)]


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters via a Count-Min candidate screen (Cormode &
    Muthukrishnan 2005) — the sketch-comparison twin of
    :func:`heavy_hitters` (Misra-Gries).

    Same two-pass exact-output contract, different sketch trade:

    1. **Sketch pass**: each partition folds its tokens into a D×W
       Count-Min array (exact value_counts per Arrow batch, one md5 per
       distinct word, vectorized scatter-add). Partition sketches MERGE BY
       PLAIN ADDITION — the property Misra-Gries lacks (its merge must
       re-shrink and loses mass), and why CMS is the one you pre-aggregate
       per shard and union later at 100 TB. Driver folds P sketches of
       fixed size (D·W·8 B ≈ 128 KB) — bounded state, no key universe.
    2. **Candidate + exact count pass**: re-scan tokens; each partition
       counts locally (exact), queries the broadcast global sketch for its
       distinct words, and emits local counts ONLY for words whose CMS
       estimate clears the n/K support. CMS never underestimates, so the
       candidate set is a superset of the true heavy hitters regardless of
       partitioning; summing the per-partition exact local counts then
       gives exact global counts for every candidate with NO third scan.
       The final ``cnt·K > n`` filter kills false candidates.

    Output is identical to :func:`heavy_hitters` (same support threshold),
    so the same plain-SQL oracle hash-checks it; the pytest twin compares
    the two sketches' candidate-set sizes — the measurable cost difference
    between an overestimate screen (CMS) and a summary screen (MG).
    """
    import numpy as np

    from ..functions.caching import scoped_persist
    from .wordcount import _doc_words

    words = scoped_persist(_doc_words(spark, sf_dir).select("word"))

    def sketch_pass(batches):
        import pandas as pd

        cms = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        n = 0
        counts: dict[str, int] = {}
        for pdf in batches:
            n += len(pdf)
            for w, c in pdf["word"].value_counts().items():
                counts[w] = counts.get(w, 0) + int(c)
        for w, c in counts.items():
            for d, h in enumerate(_cms_hashes(w)):
                cms[d, h] += c
        yield pd.DataFrame({"part_n": [n], "sketch": [cms.ravel().tolist()]})

    parts = words.mapInPandas(
        sketch_pass, "part_n long, sketch array<long>"
    ).collect()  # ≤ #partitions rows × 128 KB — bounded driver state
    total = int(sum(r["part_n"] for r in parts))
    global_cms = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for r in parts:
        global_cms += np.asarray(r["sketch"], dtype=np.int64)  # sketch merge
    global_cms = global_cms.reshape(CMS_D, CMS_W)
    bc = spark.sparkContext.broadcast(global_cms)

    def count_pass(batches):
        import pandas as pd

        cms = bc.value
        counts: dict[str, int] = {}
        for pdf in batches:
            for w, c in pdf["word"].value_counts().items():
                counts[w] = counts.get(w, 0) + int(c)
        if not counts:
            return
        ws = list(counts)
        est = np.array(
            [min(cms[d, h] for d, h in enumerate(_cms_hashes(w))) for w in ws],
            dtype=np.int64,
        )
        keep = est * HH_K > total
        yield pd.DataFrame(
            {
                "word": [w for w, k in zip(ws, keep) if k],
                "c": [counts[w] for w, k in zip(ws, keep) if k],
            }
        )

    return (
        words.mapInPandas(count_pass, "word string, c long")
        .groupBy("word")
        .agg(F.sum("c").alias("cnt"))
        .filter(F.col("cnt") * HH_K > F.lit(total))
    )


# identical output contract → identical oracle
ORACLES["heavy_hitters_cms"] = ORACLES["heavy_hitters"]
