"""End-to-end training-data curation pipeline, composed from the
registered operators — the "clean a crawl for LLM pretraining" flow:

    language filter (en) → quality gate → exact-dup keeper → near-dup drop

Each stage is the *same* plan the standalone operator registers (language
and quality scores come from ``text_analysis``, near-dup pairs from the
MinHash-LSH ``dedup`` pipeline), so this is a composition proof: the
operators chain into one lazy Catalyst plan with no materialization
between stages. The oracle nests the standalone oracles as CTEs and
applies identical predicates, so the composite result is hash-verified
end to end.

Scale: stages are filters and one window over md5(text) plus the LSH
pair join — nothing here adds a shuffle beyond what the parts already
cost; at 100 TB you materialize the pair list once and reuse it, which
is exactly how the plan composes (the pairs subtree is the shared
``_band_pairs`` plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import NUM_PERM
from .dedup import ORACLES as _DEDUP_ORACLES
from .dedup import dedup_minhash
from .text_analysis import ORACLES as _TA_ORACLES
from .text_analysis import text_langid, text_quality

QUALITY_MIN = 0.62
NEAR_DUP_MIN_MATCH = NUM_PERM // 2  # 16/32 agreeing minhashes ≈ J ≥ 0.5
KEEP_LANG = "en"


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept documents after the four curation stages, with their scores."""
    lang = text_langid(spark, sf_dir).filter(F.col("pred_lang") == KEEP_LANG)
    qual = text_quality(spark, sf_dir).filter(F.col("quality") >= QUALITY_MIN)
    docs = load_table(spark, sf_dir, "documents")
    keeper = docs.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))).alias("kid"),
    ).filter(F.col("doc_id") == F.col("kid"))
    near_b = (
        dedup_minhash(spark, sf_dir)
        .filter(F.col("n_match") >= NEAR_DUP_MIN_MATCH)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        lang.select("doc_id", "score")
        .join(qual.select("doc_id", "n_tokens", "quality"), "doc_id")
        .join(keeper.select("doc_id"), "doc_id", "left_semi")
        .join(near_b, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "score", "quality")
    )


ORACLES: dict[str, str] = {
    "corpus_clean": f"""
    WITH lang AS ({_TA_ORACLES["text_langid"]}),
    qual AS ({_TA_ORACLES["text_quality"]}),
    mh AS ({_DEDUP_ORACLES["dedup_minhash"]}),
    keeper AS (
      SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS kid
        FROM documents
      ) WHERE doc_id = kid
    )
    SELECT l.doc_id, q.n_tokens, l.score, q.quality
    FROM lang l
    JOIN qual q ON q.doc_id = l.doc_id
    WHERE l.pred_lang = '{KEEP_LANG}'
      AND q.quality >= {QUALITY_MIN}
      AND l.doc_id IN (SELECT doc_id FROM keeper)
      AND l.doc_id NOT IN (
        SELECT doc_b FROM mh WHERE n_match >= {NEAR_DUP_MIN_MATCH}
      )
    """,
}
