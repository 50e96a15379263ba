"""Plan-hygiene audit over every registered query.

Builds each registered query's DataFrame at a small SF and inspects the
physical plan for the anti-patterns that kill 100 TB runs:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — quadratic joins
  (allowlisted only where the build side is a known 1-row scalar);
- ``BatchEvalPython`` — row-at-a-time Python UDFs (Arrow-batched
  ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas`` are
  the sanctioned Python paths and are reported separately);
- UNPARTITIONED sorted ``Window`` — Spark warns "No Partition Defined
  for Window operation! Moving all data to a single partition": every
  input row funnels through ONE reducer. Allowlisted only where the
  window's input is provably bounded (a post-``limit`` rank, a
  block-summary frame) — never a corpus-sized frame (r9 verdict
  blind spot);
- missing parquet pushdown on scans that filter constants.

Writes a one-line-per-query report and exits non-zero on violations, so
it can gate a round the way tools/check_correctness.py gates values.

Usage: python tools/plan_audit.py [--sf /root/testdata/sf0.001] [keys...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose plans legitimately contain a BroadcastNestedLoopJoin: the
# build side is a broadcast BOUNDED frame — a single-row scalar (global
# count, corpus total: O(n·1)) or a small literal/spine table driving a
# documented inequality join (5-row value bands; the day spine of
# events_weekly_active, whose equi rewrite is events_range_join_bucketed's
# pattern). Never an unbounded side.
SCALAR_CROSS_OK = {
    "events_range_join",  # 5-row literal bands, broadcast inequality join
    "events_weekly_active",  # broadcast day-spine lookback join
    "sample_weighted",  # 1-row total + z scalar crosses
    "events_funnel",  # 1-row step-count scalar crosses
    "tfidf_top_terms",
    "doc_similarity_tfidf",
    "bm25_search",
    "doc_surprisal",
    "ngram_lm_kn",
    "perplexity_buckets",
    "domain_mix",
    "mix_temperature",
    "dsir_select",
    "corpus_budget_select",
    "q11_important_stock",
    "q15_top_supplier",
    "q22_idle_customers",
    "basket_pairs",
    "events_zscore",
    "events_outliers",
    "events_anomaly_mad",
    "quality_classifier",
    "winnow_contamination",
    "contamination_ngram",
    "langid_confusion",
    "langid_trained",
    "doc_fingerprint",
    "corpus_clean",
    "corpus_clean_fused",
    "quality_repetition",
    "sentence_dedup",
    "dedup_substring",
    "dedup_substring_apply",
    "heavy_hitters",
    "heavy_hitters_cms",
    "pipeline_trending_served",  # 1-row vocab-total scalar cross
    # same _trending_from_token_counts fold, same 1-row scalar cross —
    # served from the replica / a time-travel snapshot / the post-upsert
    # clone respectively
    "pipeline_trending_replica",
    "pipeline_trending_asof",
    "pipeline_trending_upsert",
    "pipeline_trending_branch",
    "pipeline_trending_rebase",
    "pipeline_trending_gated",  # same fold served from the gated catalog
}

# Queries whose plans legitimately contain an UNPARTITIONED sorted Window:
# the window's input is BOUNDED before it runs — a TakeOrderedAndProject
# limit feeds it (rank-the-top-k: ≤ k rows), or it runs over a per-block
# summary frame (≤ #blocks rows). Never the corpus itself.
GLOBAL_WINDOW_OK = {
    "bm25_search",  # rank of the BM25_TOP=100 survivors of a limit
    "basket_pairs",  # rank of the BASKET_TOP=100 survivors of a limit
    # block-summary cumsum over the 64×-reduced block-total frame, whose
    # result is then BROADCAST back — the frame must stay broadcast-small
    # regardless, so the window never sees more rows than the broadcast
    # does; the docstrings name the recursion step for extreme scale
    "shard_pack",
    "sequence_pack",
}


def find_global_windows(plan: str) -> list[str]:
    """Window nodes with an order spec but NO partition spec — the
    single-reducer shape. A partitioned+ordered Window prints
    ``Window [fns], [part], [order]`` (three top-level bracket groups);
    unpartitioned-but-sorted prints ``Window [fns], [order]`` (two, the
    second carrying ASC/DESC markers). Partition-only windows (two
    groups, no sort markers in the last) are fine — no global sort."""
    hits = []
    for line in plan.splitlines():
        m = re.search(r"(?:^|[\s:+-]- )Window(?:GroupLimit)? (\[.*)$", line)
        if not m or "WindowGroupLimit" in line:
            continue
        rest = m.group(1)
        groups, depth, start = [], 0, None
        for i, ch in enumerate(rest):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(rest[start : i + 1])
        if len(groups) == 2 and re.search(
            r"\b(ASC|DESC) NULLS (FIRST|LAST)", groups[1]
        ):
            hits.append(line.strip())
    return hits


def audit_one(spark, name: str, fn, sf_dir: str) -> dict:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    feats = {
        "cartesian": "CartesianProduct" in plan,
        "bnlj": "BroadcastNestedLoopJoin" in plan,
        "python_row_udf": "BatchEvalPython" in plan,
        "arrow_python": bool(
            re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
        "broadcast_join": "BroadcastHashJoin" in plan,
        "pushed": "PushedFilters: [" in plan
        and any(seg[0] not in "]" for seg in plan.split("PushedFilters: [")[1:]),
        "global_window": find_global_windows(plan),
    }
    viol = []
    if feats["cartesian"]:
        viol.append("CartesianProduct")
    if feats["bnlj"] and name not in SCALAR_CROSS_OK:
        viol.append("BroadcastNestedLoopJoin(unallowlisted)")
    if feats["python_row_udf"]:
        viol.append("BatchEvalPython(row-at-a-time)")
    if feats["global_window"] and name not in GLOBAL_WINDOW_OK:
        viol.append("UnpartitionedWindow(single-reducer)")
    feats["violations"] = viol
    return feats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from map_reduce_in_go_spark import registry
    from map_reduce_in_go_spark.functions.caching import release_persisted
    from map_reduce_in_go_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    keys = args.keys or list(qs)
    bad = 0
    n_arrow = n_bcast = 0
    for name in keys:
        try:
            feats = audit_one(spark, name, qs[name], args.sf)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        finally:
            release_persisted()
        n_arrow += feats["arrow_python"]
        n_bcast += feats["broadcast_join"]
        if feats["violations"]:
            bad += 1
            print(f"FAIL  {name}: {', '.join(feats['violations'])}")
        else:
            tags = []
            if feats["arrow_python"]:
                tags.append("arrow")
            if feats["broadcast_join"]:
                tags.append("bcast")
            if feats["pushed"]:
                tags.append("pushdown")
            print(f"ok    {name}{(' [' + ','.join(tags) + ']') if tags else ''}")
    print(
        f"\n{len(keys) - bad}/{len(keys)} clean; "
        f"{n_arrow} use Arrow-batched Python, {n_bcast} broadcast-join, "
        f"0 row-at-a-time Python UDFs allowed"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
