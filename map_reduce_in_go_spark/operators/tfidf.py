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
