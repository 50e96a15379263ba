"""Replicate a testdata sf dir K× (key-shifted) for scale stress runs.

Fact/entity tables get disjoint key ranges per copy (orderkey, custkey,
event_id, user_id, doc_id, vec_id); the always-small dims (region, nation,
supplier, part) stay as-is, exactly like a larger TPC-H SF would behave.
events.ts is written as int64 epoch-nanos so the Spark loader's
nanos-as-long path reads the replica the same way it reads the original.

Usage: python tools/make_scale.py [--src /root/testdata/sf0.1] \
           [--out /tmp/sfscale1] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SHIFTS = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "customer": {"c_custkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_AS_IS = ("region", "nation", "supplier", "part")


def _write_perturbed_embeddings(args) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    src = papq.read_table(f"{args.src}/embeddings.parquet")
    n = src.num_rows
    base = np.stack(
        [np.asarray(v, dtype=np.float32) for v in src["embedding"].to_pylist()]
    )
    labels = src["label"].to_pylist()
    rng = np.random.RandomState(7)
    mats, ids = [base], [np.arange(n)]
    for i in range(1, args.k):
        mats.append(base + 0.15 * rng.randn(*base.shape).astype(np.float32))
        ids.append(np.arange(n) + i * SHIFTS["embeddings"]["vec_id"])
    big = np.concatenate(mats)
    bid = np.concatenate(ids)
    tbl = pa.table(
        {
            "vec_id": pa.array(bid.tolist(), pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in big], pa.list_(pa.float32())
            ),
            "label": pa.array(labels * args.k, pa.int32()),
        }
    )
    papq.write_table(tbl, f"{args.out}/embeddings.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfscale1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--perturb-embeddings",
        action="store_true",
        help="replica embeddings get seeded 0.15-sigma noise instead of "
        "exact copies — models growth by NEW vectors (exact duplicates "
        "are inseparable by any hash and belong to the dedup family); "
        "this is the corpus used for the B-per-log-n LSH sizing numbers "
        "in SURVEY section 6",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{args.out}/{t}.parquet' (FORMAT parquet)"
        )

    for t, shifts in SHIFTS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"{c} + k.k * {shifts[c]} AS {c}")
            elif t == "events" and c == "ts":
                sel.append("epoch_ns(ts) AS ts")
            else:
                sel.append(c)
        if t == "embeddings" and args.perturb_embeddings:
            _write_perturbed_embeddings(args)
            continue
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{args.src}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(range(0, {args.k})) AS k) k) "
            f"TO '{args.out}/{t}.parquet' (FORMAT parquet)"
        )
    n = con.execute(
        f"SELECT count(*) FROM '{args.out}/lineitem.parquet'").fetchone()[0]
    print(f"wrote {args.out} (k={args.k}, lineitem rows={n})")


if __name__ == "__main__":
    main()
