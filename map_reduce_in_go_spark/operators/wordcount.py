"""Core MapReduce-parity operators over the ``documents`` corpus.

These re-express the reference's application surface (WordCount —
map_reduce/wordcount.go — plus the classic MapReduce companions: distributed
grep, inverted index, top-k) as native DataFrame plans:

- tokenize = ``split`` + ``transform`` + ``filter`` (whole-stage codegen)
- count    = ``groupBy().count()`` → map-side partial aggregation, one
  shuffle keyed by word. At 100 TB word keys are near-uniform (Zipf head is
  handled by partial agg: each task pre-counts its own "the"s), so no salting
  is needed — AQE coalesces the tail.

Each public function is a ``queries()`` entry; ``ORACLES`` holds the DuckDB
equivalent run by the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import WordCountMapper, WordCountReducer, run_mapreduce
from ..functions.text import sql_shingles, sql_tokens, tokens
from ..sources.tables import load_table, spread_partitions


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file corpus → single input split; spread tokenization across
    # cores (a real multi-split table would not need the repartition)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spread_partitions(spark, sf_dir, "documents"), "doc_id"
    )
    return docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("word")
    )


def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference flagship: word → count over the whole corpus."""
    return (
        _doc_words(spark, sf_dir)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def wordcount_topk(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """Top-k words (count desc, word asc) — deterministic boundary."""
    return (
        wordcount(spark, sf_dir)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(k)
    )


def distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct token count per source (distinct = one more shuffle; at scale
    prefer approx_count_distinct — exact kept here for the oracle)."""
    return (
        _doc_words(spark, sf_dir)
        .groupBy("source")
        .agg(F.countDistinct("word").alias("n_distinct"))
    )


def grep_count(spark: SparkSession, sf_dir: str, pattern: str = "spark") -> DataFrame:
    """Distributed grep: docs matching a regex, counted per source.

    The filter is a pushed-down-friendly predicate over the scan; classic
    MapReduce example #2 from the original paper.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(pattern))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → sorted doc_id list (classic MapReduce example #3).

    Emitted as a comma-joined string so the oracle compare is
    representation-stable across engines.
    """
    return (
        _doc_words(spark, sf_dir)
        .groupBy("word")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("doc_id")), lambda d: d.cast("string")
                ),
                ",",
            ).alias("doc_ids"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def wordcount_salted(spark: SparkSession, sf_dir: str, n_salt: int = 8) -> DataFrame:
    """Word count via two-phase salted aggregation (skew-key pattern).

    For heavy-hitter keys at 100 TB (Zipf head words), a single groupBy key
    can bottleneck one reducer. Salting splits each key into ``n_salt``
    sub-keys for the first (parallel) aggregation, then a second tiny
    aggregation merges the partials. Results are identical to ``wordcount``
    — same oracle — which is exactly the point of the pattern.
    """
    salted = _doc_words(spark, sf_dir).withColumn(
        "salt", F.pmod(F.hash("doc_id"), F.lit(n_salt))
    )
    partial = salted.groupBy("word", "salt").agg(F.count("*").alias("c"))
    return partial.groupBy("word").agg(F.sum("c").alias("cnt"))


def bigram_topk(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Top-k word bigrams (n-gram language statistics building block)."""
    from ..functions.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(k)
    )


def cooccurrence_topk(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Top-k co-occurring word pairs within a ±2 token window.

    The MapReduce "pairs" pattern (Lin & Dyer) as window functions: lead()
    over document order emits each (word, neighbor) pair once per position,
    then one aggregation counts them. Pairs are canonicalized (a ≤ b) so
    direction doesn't split counts.

    Both lead distances are computed in ONE window pass (one sort of each
    doc partition), then stacked with posexplode — two passes over the same
    Window was the one redundant-sort shape left in the codebase (r7
    verdict finding #2); plan now has a single Window node, pinned in
    tests/test_plans.py.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").repartition(
        spread_partitions(spark, sf_dir, "documents"), "doc_id"
    )
    words = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        words.select(
            "word",
            F.lead("word", 1).over(w).alias("n1"),
            F.lead("word", 2).over(w).alias("n2"),
        )
        .select("word", F.explode(F.array("n1", "n2")).alias("nbr"))
        .filter(F.col("nbr").isNotNull())
        .select(
            F.least("word", "nbr").alias("w1"), F.greatest("word", "nbr").alias("w2")
        )
    )
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def mapreduce_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount through the *generic* Arrow Mapper/Reducer path.

    Proves reference users can run unmodified map/reduce logic: the
    documents table stands in for the file corpus (doc_id → filename).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("filename"),
        F.col("text").alias("contents"),
    )
    out = run_mapreduce(docs, WordCountMapper(), WordCountReducer())
    return out.select(F.col("key").alias("word"), F.col("value").alias("cnt_str"))


_TOK = sql_tokens("text")

_WORDS_CTE = f"""
WITH words AS (
  SELECT doc_id, source, unnest({_TOK}) AS word
  FROM documents
)
"""

ORACLES: dict[str, str] = {
    "wordcount": _WORDS_CTE
    + "SELECT word, count(*) AS cnt FROM words GROUP BY word",
    "wordcount_salted": _WORDS_CTE
    + "SELECT word, count(*) AS cnt FROM words GROUP BY word",
    "wordcount_topk": _WORDS_CTE
    + """
    SELECT word, count(*) AS cnt FROM words GROUP BY word
    ORDER BY cnt DESC, word ASC LIMIT 100
    """,
    "distinct_words": _WORDS_CTE
    + "SELECT source, count(DISTINCT word) AS n_distinct FROM words GROUP BY source",
    "grep_count": """
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE regexp_matches(text, 'spark')
    GROUP BY source
    """,
    "inverted_index": _WORDS_CTE
    + """
    SELECT word,
           array_to_string(list_transform(list_sort(list(DISTINCT doc_id)),
                                          d -> CAST(d AS VARCHAR)), ',') AS doc_ids,
           count(DISTINCT doc_id) AS n_docs
    FROM words GROUP BY word
    """,
    "mapreduce_generic": _WORDS_CTE
    + "SELECT word, CAST(count(*) AS VARCHAR) AS cnt_str FROM words GROUP BY word",
    "cooccurrence_topk": f"""
    WITH t AS (
      SELECT doc_id, {_TOK} AS toks FROM documents
    ), pos AS (
      SELECT doc_id, t2.i AS pos, toks[t2.i] AS word
      FROM t CROSS JOIN (SELECT unnest(range(1, (SELECT max(len(toks)) + 1 FROM t))) AS i) t2
      WHERE t2.i <= len(toks)
    ), pairs AS (
      SELECT least(a.word, b.word) AS w1, greatest(a.word, b.word) AS w2
      FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      UNION ALL
      SELECT least(a.word, b.word) AS w1, greatest(a.word, b.word) AS w2
      FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 2
    )
    SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2
    ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 50
    """,
    "bigram_topk": f"""
    WITH t AS (
      SELECT doc_id, {_TOK} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, unnest({sql_shingles('toks', 2)}) AS bigram FROM t
    )
    SELECT bigram, count(*) AS cnt FROM sh GROUP BY bigram
    ORDER BY cnt DESC, bigram ASC LIMIT 50
    """,
}
