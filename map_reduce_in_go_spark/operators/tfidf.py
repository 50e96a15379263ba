"""TF-IDF — the canonical MapReduce chained-jobs example, as one plan.

The MapReduce formulation needs three chained jobs (term counts, doc
frequencies, join + score). Declaratively it's two aggregations and a
broadcast join; Catalyst pipelines them with partial aggregation on both
shuffles.

Determinism: tf and df are exact ints; idf = ln(N/df) is computed from the
same ints on both engines and rounded at 6dp (libm vs JVM ln can differ in
the last ulp — far below the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.caching import scoped_persist
from .wordcount import _doc_words

TOP_TERMS = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document."""
    words = _doc_words(spark, sf_dir)
    # tf feeds three consumers (df, n_docs, scoring) — materialize once;
    # the host releases the handle via caching.release_persisted()
    tf = scoped_persist(words.groupBy("doc_id", "word").agg(F.count("*").alias("tf")))
    df = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tf.select("doc_id").distinct().count()
    scored = (
        tf.join(F.broadcast(df), "word")
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_TERMS)
        .select("doc_id", "word", "tf", "df", "score", "rnk")
    )


from ..functions.text import sql_tokens  # noqa: E402

_TOK = sql_tokens("text")

ORACLES: dict[str, str] = {
    "tfidf_top_terms": f"""
    WITH words AS (
      SELECT doc_id, unnest({_TOK}) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM words
    ), scored AS (
      SELECT tf.doc_id, tf.word, tf.tf, df.df,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tf, df, score,
           CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, word ASC) AS INTEGER) AS rnk
    FROM scored
    QUALIFY rnk <= {TOP_TERMS}
    """,
}


SIM_THRESHOLD = 0.6


def doc_similarity_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity for MinHash-LSH candidate pairs.

    The sparse-vector twin of dedup_embedding_blocked: candidates come from
    the MinHash band join (operators/dedup.py — bucketed, never all-pairs),
    then each pair's cosine is an inverted-index join: tf-idf weights of the
    two docs equijoined on word, summed per pair. At 100 TB both joins key
    on (doc, word) / band hashes — no cross product anywhere.

    Determinism: weights are 6dp-rounded then fixed to DECIMAL(12,6), so
    dot products and squared norms aggregate exactly (order-independent);
    the final divide + 6dp round is identical IEEE math on both engines.
    """
    from .dedup import _band_pairs, _signatures

    pairs = _band_pairs(_signatures(spark, sf_dir))
    words = _doc_words(spark, sf_dir)
    tf = scoped_persist(
        words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tf.select("doc_id").distinct().count()
    w = scoped_persist(
        tf.join(F.broadcast(df), "word").select(
            "doc_id",
            "word",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
            .cast("decimal(12,6)")
            .alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("norm")
    )
    wa = w.select(
        F.col("doc_id").alias("doc_a"), "word", F.col("w").alias("wa")
    )
    wb = w.select(
        F.col("doc_id").alias("doc_b"), "word", F.col("w").alias("wb")
    )
    dots = (
        pairs.join(wa, "doc_a")
        .join(wb, ["doc_b", "word"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("double").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cos_tfidf"
            ),
        )
        .filter(F.col("cos_tfidf") >= SIM_THRESHOLD)
    )


from .dedup import _MINHASH_CTES  # noqa: E402

ORACLES["doc_similarity_tfidf"] = _MINHASH_CTES + f"""
    , words AS (
      SELECT doc_id, unnest({_TOK}) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
    ), dfreq AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM words
    ), wts AS (
      SELECT doc_id, word,
             CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6)
                  AS DECIMAL(12,6)) AS w
      FROM tf CROSS JOIN n JOIN dfreq USING (word)
    ), norms AS (
      SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS norm
      FROM wts GROUP BY doc_id
    ), dots AS (
      SELECT p.doc_a, p.doc_b, CAST(sum(a.w * b.w) AS DOUBLE) AS dot
      FROM pairs p
      JOIN wts a ON a.doc_id = p.doc_a
      JOIN wts b ON b.doc_id = p.doc_b AND b.word = a.word
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT d.doc_a, d.doc_b,
           round(d.dot / (na.norm * nb.norm), 6) AS cos_tfidf
    FROM dots d
    JOIN norms na ON na.doc_id = d.doc_a
    JOIN norms nb ON nb.doc_id = d.doc_b
    WHERE round(d.dot / (na.norm * nb.norm), 6) >= {SIM_THRESHOLD}
"""
