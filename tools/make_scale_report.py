"""Emit a diffable 1x/10x scale artifact for the headline suite (r13).

r12 verdict #6: the 10x-replica sweeps that used to live as prose in
BENCH_NOTES become a per-round JSON artifact (SCALE_r{N}.json) so scale
trends diff round-over-round like BENCH does. The tool:

1. builds a key-shifted Kx replica of the base sf dir with
   tools/make_scale.py (skipped when the out dir already holds one);
2. runs bench.py twice as subprocesses — once on the base dir, once on
   the replica — with SPARK_GRAFT_BENCH_REPS=1 (one sample per query:
   the artifact tracks SCALING, the per-round BENCH artifact owns
   absolute medians);
3. prints ONE JSON line with per-query (base_s, kx_s, ratio) triples
   plus both sweeps' machine-honesty fields.

Reading it: ratio ≈ K means the operator scales linearly in input (the
expected shape for scans/aggs at fixed parallelism); ratio well BELOW K
means sublinear state (index probes, lattice serving); ratio well above
K on a query that should be linear is the regression to chase.

Usage: python tools/make_scale_report.py [--src /root/testdata/sf0.1]
           [--k 10] [--out /tmp/sfscale_report] > SCALE_r13.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench(sf_dir: str, reps: int = 1) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_REPS"] = str(reps)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench.py printed no JSON for {sf_dir}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sfscale_report")
    args = ap.parse_args()

    # replica reuse is keyed on (src, k): a marker file records what the
    # out dir holds, so a stale replica built at a different scale or
    # from a different source is rebuilt, never silently relabeled
    marker = os.path.join(args.out, "_scale_marker.json")
    want = {"src": os.path.abspath(args.src), "k": args.k}
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = json.load(f)
    if have != want or not os.path.exists(
        os.path.join(args.out, "lineitem.parquet")
    ):
        if os.path.isdir(args.out):
            import shutil

            shutil.rmtree(args.out)
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_scale.py"),
                "--src",
                args.src,
                "--out",
                args.out,
                "--k",
                str(args.k),
            ],
            check=True,
            stdout=sys.stderr,
        )
        with open(marker, "w") as f:
            json.dump(want, f)

    base = _bench(args.src)
    big = _bench(args.out)
    queries = {}
    dropped = []
    for q, b in base["queries"].items():
        t = big["queries"].get(q)
        ok = t is not None and b is not None and t > 0 and b > 0
        if not ok:
            dropped.append(q)  # no silent caps: name what the median skips
        queries[q] = {
            "base_s": b,
            f"{args.k}x_s": t,
            "ratio": round(t / b, 2) if ok else None,
        }
    if dropped:
        print(f"ratio excluded (zero/missing timing): {dropped}", file=sys.stderr)
    import statistics

    ratios = [v["ratio"] for v in queries.values() if v["ratio"] is not None]
    print(
        json.dumps(
            {
                "metric": "headline_scale_ratio",
                "k": args.k,
                "base_sf_dir": args.src,
                "base_total_s": base["value"],
                f"{args.k}x_total_s": big["value"],
                "total_ratio": round(big["value"] / base["value"], 2),
                "median_ratio": round(statistics.median(ratios), 2),
                "ratio_excluded": dropped,
                "queries": queries,
                "base_steal_s": base.get("cpu_steal_delta_sec"),
                f"{args.k}x_steal_s": big.get("cpu_steal_delta_sec"),
                "base_contaminated": base.get("contaminated", False),
                f"{args.k}x_contaminated": big.get("contaminated", False),
            }
        )
    )


if __name__ == "__main__":
    main()
