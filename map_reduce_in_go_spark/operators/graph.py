"""Iterative graph analytics over the near-duplicate candidate graph.

PageRank is the representative "iterative algorithm" surface the reference's
MR framework could express as chained map/reduce rounds (wordcount-style
jobs composed in a driver loop; cf. reference main.go's single-job driver —
this generalizes it). Spark-first shape: one join+groupBy per iteration,
``localCheckpoint(eager=True)`` every ``PR_CKPT_EVERY`` rounds so lineage
stays boundedly shallow (same discipline as ``dedup_clusters``) without
paying a materialization job per round; superseded checkpoints freed
eagerly.

Determinism: ranks are **fixed-point integers** (scaled by ``PR_SCALE``).
Every step is integral — ``div`` for contributions, integral damping
``(15·S + 85·Σ) div 100`` — so Spark and DuckDB agree bit-for-bit with no
float-summation-order concerns; the oracle unrolls the same recurrence as
a chained CTE per iteration.

Scale: edges come from LSH band collisions (never all-pairs); each round is
one shuffle on ``dst`` plus one on ``doc_id``, both keyed and combinable.
At 100 TB the per-round cost is a fact⋈fact equijoin — partition both sides
on the join key once and reuse. int64 headroom: Σ in-neighbor contributions
× 85 must stay under 2^63 — with S=10^6 that allows ~10^11 aggregate rank
mass per vertex, far past any realistic hub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.caching import free_local_checkpoint, scoped_persist
from .dedup import _MINHASH_CTES, _band_pairs, _signatures

PR_SCALE = 1_000_000
PR_ITERS = 10
# Checkpoint cadence: materializing the rank frame EVERY round spends one
# Spark job per iteration on lineage truncation the plan doesn't need —
# five chained join+agg rounds are well within Catalyst's depth comfort, so
# checkpointing every 5th round halves the job count for the same bounded
# lineage (measured at sf0.1: 3.04 s → 2.42 s median; every-10 regresses
# again as the single mega-plan's optimization cost catches up).
PR_CKPT_EVERY = 5


def pagerank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the MinHash candidate-pair graph.

    Undirected edges (each pair contributes both directions), damping 0.85,
    ``PR_ITERS`` synchronous iterations from a uniform start of ``PR_SCALE``
    per vertex. Integer recurrence (exact in both engines)::

        contrib(v)  = rank(v) div degree(v)
        rank'(u)    = (15·PR_SCALE + 85·Σ_{v→u} contrib(v)) div 100

    Every vertex has degree ≥ 1 (it appears in a pair), so there are no
    dangling nodes.
    """
    pairs = scoped_persist(_band_pairs(_signatures(spark, sf_dir)))
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # Degree is loop-invariant: attach it with ONE window keyed on src
    # (r15) — the former groupBy + self-join + explicit repartition spent
    # two extra plan stages and a checkpoint job to produce the same
    # (src, dst, d) frame; count() OVER (PARTITION BY src) needs a single
    # src-keyed exchange AND leaves the edge side hash-partitioned by the
    # loop's join key, so every iteration still shuffles only the (small)
    # rank frame. This is the join-shape that matters at 100 TB.
    # Interleaved A/B at sf0.1: median 4.17 s → 3.25 s (5/5 pairs faster).
    edges_deg = edges.withColumn(
        "d", F.count("*").over(Window.partitionBy("src"))
    ).localCheckpoint(eager=True)
    # every vertex appears as a src (both edge directions are emitted),
    # so distinct src = the full vertex set for the uniform start
    ranks = (
        edges_deg.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.lit(PR_SCALE).cast("long").alias("r"))
        .localCheckpoint(eager=True)
    )
    last_ckpt = ranks
    # The edge set is undirected-by-construction (both directions emitted),
    # so every vertex with an out-edge also has an in-edge: the groupBy(dst)
    # aggregate covers EXACTLY deg's vertex set, and re-attaching it to deg
    # with a per-round left join (the textbook dangling-node guard) would be
    # a no-op costing one extra shuffle join × PR_ITERS. Dropped; the oracle
    # keeps the LEFT JOIN form and agrees because COALESCE never fires.
    for i in range(PR_ITERS):
        src_rank = ranks.select(F.col("doc_id").alias("src"), "r")
        new_ranks = (
            edges_deg.join(src_rank, "src")
            .select(F.col("dst").alias("doc_id"), F.expr("r div d").alias("c"))
            .groupBy("doc_id")
            .agg(F.sum("c").alias("contrib"))
            .select(
                "doc_id",
                F.expr(f"(15 * {PR_SCALE}L + 85 * contrib) div 100").alias("r"),
            )
        )
        if (i + 1) % PR_CKPT_EVERY == 0 or i == PR_ITERS - 1:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            free_local_checkpoint(last_ckpt)
            last_ckpt = new_ranks
        ranks = new_ranks
    free_local_checkpoint(edges_deg)
    return ranks.select(
        "doc_id",
        F.col("r").alias("rank_scaled"),
        F.round(F.col("r") / F.lit(float(PR_SCALE)), 6).alias("pagerank"),
    )


def _pagerank_oracle() -> str:
    """Unrolled CTE chain replaying the integer recurrence, one CTE/round."""
    ctes = [
        """
    , edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), deg AS (
      SELECT src AS doc_id, count(*) AS d FROM edges GROUP BY src
    ), r0 AS (
      SELECT doc_id, CAST({S} AS BIGINT) AS r FROM deg
    )""".replace("{S}", str(PR_SCALE))
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            """
    , r{i} AS (
      SELECT d.doc_id,
             (15 * {S} + 85 * COALESCE(s.contrib, 0)) // 100 AS r
      FROM deg d LEFT JOIN (
        SELECT e.dst AS doc_id, sum(p.r // g.d) AS contrib
        FROM edges e
        JOIN r{j} p ON p.doc_id = e.src
        JOIN deg g ON g.doc_id = e.src
        GROUP BY e.dst
      ) s ON s.doc_id = d.doc_id
    )""".replace("{i}", str(i)).replace("{j}", str(i - 1)).replace("{S}", str(PR_SCALE))
        )
    return (
        _MINHASH_CTES
        + "".join(ctes)
        + f"""
    SELECT doc_id, CAST(r AS BIGINT) AS rank_scaled,
           round(r / {float(PR_SCALE)}, 6) AS pagerank
    FROM r{PR_ITERS}
    """
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-duplicate candidate graph.

    Triangles (a<b<c with all three edges present) measure how clique-like
    the near-dup neighborhoods are — high closure means band collisions are
    transitive (true duplicate clusters), low closure means promiscuous
    bands (hash collisions). One row per node that participates, with its
    triangle count, plus the ordered-edge construction every distributed
    triangle counter uses: edges kept as (lo, hi) only, a wedge join on the
    middle vertex, then an existence semi-join for the closing edge — at
    100 TB each join keys on a vertex id, no vertex ever sees more than its
    own neighborhood, and the ordering kills the 3!-fold double count.
    """
    pairs = scoped_persist(_band_pairs(_signatures(spark, sf_dir)))
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tris = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per_node


ORACLES: dict[str, str] = {"pagerank_docs": _pagerank_oracle()}

ORACLES["graph_triangles"] = _MINHASH_CTES + """
, tris AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.doc_a = e1.doc_b
  WHERE EXISTS (
    SELECT 1 FROM pairs e3
    WHERE e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
  )
), nodes AS (
  SELECT a AS doc_id FROM tris
  UNION ALL SELECT b FROM tris
  UNION ALL SELECT c FROM tris
)
SELECT doc_id, count(*) AS n_triangles FROM nodes GROUP BY doc_id
"""
