"""Plan pin for corpus_clean_fused: the fused form must actually fuse.

The fused twin's contract is ONE corpus scan + one tokenize feeding
language, quality, the exact-dup hash and the MinHash shingles, vs the
composed form's four independent operator subtrees (each re-reading and
re-tokenizing). r7 measured the fusion 2× at 10× scale but the sf0.1
driver sample briefly showed the twins tied — this pins the structural
property itself so a regression (a stage accidentally re-deriving from
the raw table) is caught without a benchmark."""

from __future__ import annotations

from map_reduce_in_go_spark.functions.caching import release_persisted
from map_reduce_in_go_spark.operators.pipeline import (
    corpus_clean,
    corpus_clean_composed,
    corpus_clean_fused,
)


def _raw_doc_relations(df) -> int:
    """Raw (non-cached) documents relations in the optimized logical plan.

    InMemoryRelation is a LEAF — its cached child plan is not traversed —
    so reads routed through the persisted base don't count, and the
    string-dump inflation of plan.toString() can't skew the number."""

    def walk(node) -> int:
        cls = node.getClass().getSimpleName()
        # a LogicalRelation's toString has no path — identify documents by
        # its schema (the only table with a `text` column)
        s = node.toString()
        cnt = 1 if "LogicalRelation" in cls and "parquet" in s and "text#" in s else 0
        ch = node.children()
        for i in range(ch.size()):
            cnt += walk(ch.apply(i))
        return cnt

    return walk(df._jdf.queryExecution().optimizedPlan())


def test_fused_form_scans_documents_once(spark, sf_dir):
    # measure the composed form FIRST on a clean cache slate — once the
    # fused twin's tokenized base is registered, the CacheManager
    # substitutes it into the standalone operators' subtrees too
    # (legitimate reuse, but it would hide the raw-read count)
    release_persisted()
    composed_raw = _raw_doc_relations(corpus_clean_composed(spark, sf_dir))
    release_persisted()
    # composed: lang, quality, and the keeper window each re-read the raw
    # table (the MinHash subtree reads it through its signature cache)
    assert composed_raw >= 3, composed_raw
    fused = corpus_clean_fused(spark, sf_dir)
    # fused: every read goes through the persisted tokenized base
    assert _raw_doc_relations(fused) == 0
    # and the fusion is not at the cost of correctness: identical rows
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, corpus_clean_composed(spark, sf_dir).collect()))
    # the registered key now serves the fused plan (r14) — pin the alias
    c = sorted(map(tuple, corpus_clean(spark, sf_dir).collect()))
    assert c == b
    release_persisted()
    assert a == b
