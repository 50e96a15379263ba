"""Profile: IVF-PQ cell handling inside a retraction (r13 decision).

r12 verdict #4 asked for either a MOR deferral for PQ-cell members or a
measured closure. This tool builds the corpus pipeline WITH the PQ
side-channel on real testdata, picks victims spread across every
occupied cell (the worst case for cell rewrites), and measures:

- detection, per-cell job loop (the pre-r13 shape): one membership-probe
  Spark job per cell — O(#cells) driver job submissions;
- detection, one union-scan job (the r13 shape, `_touched_cells`);
- the full COW retraction with every occupied cell touched.

Run: python tools/profile_cells.py [--sf /root/testdata/sf0.01]
Prints one JSON line; numbers land in SURVEY's closure + BENCH_NOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from map_reduce_in_go_spark.operators.pq_index import PqIvfIndex
    from map_reduce_in_go_spark.sources.tables import load_table
    from map_reduce_in_go_spark.streaming.corpus_pipeline import (
        _touched_cells,
        corpus_batch_txn,
        member,
        retract_docs,
    )

    tmp = tempfile.mkdtemp(prefix="cellprof-")
    root = os.path.join(tmp, "cat")
    idx = PqIvfIndex(root)
    idx.build(spark, args.sf, include_codes=False)
    cat = idx.catalog

    docs = load_table(spark, args.sf, "documents").select(
        "doc_id", "text", "lang"
    )
    embs = load_table(spark, args.sf, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("e")
    )
    for i in range(2):
        b = docs.filter(F.pmod("doc_id", F.lit(2)) == i)
        e = embs.join(b.select("doc_id"), "doc_id", "left_semi")
        assert corpus_batch_txn(spark, b, cat, i, emb_batch=e)

    # one victim per occupied cell — every cell must rewrite
    txn = cat.transaction(spark)
    cells = [r["cell"] for r in txn.read("centroids").collect()]
    victims: list[int] = []
    occupied = 0
    for c in cells:
        row = txn.read(c).select("vec_id").first()
        if row is not None:
            victims.append(int(row["vec_id"]))
            occupied += 1
    vec_ids = spark.createDataFrame(
        [(v,) for v in victims], "vec_id long"
    )

    # detection, pre-r13 shape: one probe JOB per cell
    t0 = time.monotonic()
    touched_loop = []
    for c in cells:
        if (
            txn.read(c)
            .join(vec_ids, "vec_id", "left_semi")
            .limit(1)
            .count()
        ):
            touched_loop.append(c)
    t_loop = time.monotonic() - t0

    # detection, r13 shape: ONE union-scan job
    t0 = time.monotonic()
    touched_union = _touched_cells(spark, txn, cells, vec_ids)
    t_union = time.monotonic() - t0
    assert sorted(touched_loop) == touched_union

    # the full retraction, every occupied cell touched (worst case)
    n_corpus_files = len(txn.files("corpus"))
    t0 = time.monotonic()
    assert retract_docs(spark, cat, victims, op="prof-erase")
    t_retract = time.monotonic() - t0
    left = member(spark, cat, "corpus").count()

    print(
        json.dumps(
            {
                "sf": args.sf,
                "n_cells": len(cells),
                "occupied_cells": occupied,
                "touched_cells": len(touched_union),
                "victims": len(victims),
                "corpus_files": n_corpus_files,
                "detect_per_cell_jobs_s": round(t_loop, 3),
                "detect_union_one_job_s": round(t_union, 3),
                "full_cow_retraction_s": round(t_retract, 3),
                "corpus_rows_left": left,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
