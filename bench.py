"""Benchmark headline queries; prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default all cores).

Each query is executed through the noop sink (forces full computation of
every column with no driver collect overhead — a count() would let
Catalyst prune the columns nothing aggregates over, so map-only queries
would time the scan instead of the work) after a warmup of the session
JVM. Every query runs REPS times and the reported number is the median —
Python-worker-heavy queries have 2-3x run-to-run variance that a single
sample hides.

Machine-honesty fields in the artifact: ``cpu_steal_delta_sec``
(hypervisor theft during the sweep; past 10% of wall the sweep reruns
and the last attempt is flagged ``contaminated``) and
``cpu_sec_process`` (this process tree's user+system CPU seconds for
the sweep, via getrusage SELF+CHILDREN) — wall inflated by neighbors
shows up as wall rising while CPU seconds hold, diagnosable from the
JSON alone.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "wordcount",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash",
    # r14 (r13 verdict #6): dedup_embedding DROPPED from the headline
    # suite — the by-design quadratic oracle-exact twin rode at 98.5x
    # in the 10x scale artifact and would dominate every future one,
    # hiding real regressions. It stays registered and oracle-checked;
    # dedup_embedding_blocked represents the family here.
    "dedup_embedding_blocked",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "q21_late_supplier",
    "events_asof_join",
    "text_quality",
    "doc_fingerprint",
    # r14 (r13 verdict #5): corpus_clean now SERVES the fused plan (it
    # beat the composed form at 10x in two consecutive scale artifacts),
    # so corpus_clean_fused leaves the suite — it would time the same
    # plan twice. Both stay registered; the composed reference lives on
    # as corpus_clean_composed (pytest-pinned output-identical).
    "corpus_clean",
    "contamination_ngram",
    "shard_pack",
    "pii_redact",
    "dedup_incremental",
    "pagerank_docs",
    "orders_global_topn",
    # r9 refresh: flagship operators added r3-r8 (the old 25 keep their
    # order above so per-round numbers stay comparable)
    "heavy_hitters",
    "knn_graph",
    "dedup_substring",
    "sequence_pack",
    "dsir_select",
    "langid_trained",
    "corpus_shuffle",
    "dedup_containment_exact",
    # r10: the served-index twin of dedup_substring (steady-state probes
    # the persisted gram-frequency table; first rep pays the build)
    "dedup_substring_indexed",
    # r12: the lattice-served cube query (first rep pays the 3-batch
    # lattice build; steady state folds O(days × types) partial rows)
    "events_cube_nav",
    # r14 additions: the containment serve twin (steady state skips the
    # per-run gram explosion), the perceptual image hash, the audio FFT
    # pass, and the sketch-served overlap
    "dedup_containment_indexed",
    "dedup_image_phash",
    "audio_spectral",
    "events_cube_overlap",
    # r15 additions: the image cluster capstone (star contraction over
    # phash pairs), the served phash-index probe (first rep pays the
    # build + OPTIMIZE; steady state is O(batch)), and the audio
    # fingerprint twin of the image hash
    "dedup_image_clusters",
    "dedup_image_incremental",
    "dedup_audio_fingerprint",
]


def read_steal_seconds() -> float | None:
    """Hypervisor CPU-steal seconds from /proc/stat (aggregate cpu line).

    Recorded before/after the run so every bench number self-annotates
    its machine honesty: a large steal delta means the absolute seconds
    are elevated by the hypervisor, not by code (see BENCH_NOTES.md).
    """
    try:
        with open("/proc/stat") as fh:
            fields = fh.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        ticks = int(fields[8])
        return round(ticks / os.sysconf("SC_CLK_TCK"), 1)
    except (OSError, IndexError, ValueError):
        return None


def read_tree_cpu_seconds() -> float | None:
    """User+system CPU seconds of this process and every live descendant.

    getrusage(RUSAGE_CHILDREN) only counts REAPED children — the Spark
    JVM (and its Python worker daemons) live for the whole bench, so
    their CPU would be invisible to it. Walking /proc/<pid>/stat over
    the process tree captures them live. Recorded before/after each
    sweep: steal catches hypervisor theft, but cache/memory-bandwidth
    contention from neighbors shows up as WALL rising while these CPU
    seconds hold — making a contended run diagnosable from the JSON
    alone (r10 verdict #9).
    """
    try:
        tck = os.sysconf("SC_CLK_TCK")
        info: dict[int, tuple[int, int]] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as fh:
                    data = fh.read()
                # field 2 (comm) may hold spaces/parens: parse after last ')'
                rest = data[data.rindex(")") + 2 :].split()
                info[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
            except (OSError, ValueError):
                continue  # pid exited mid-walk
        children: dict[int, list[int]] = {}
        for pid, (ppid, _t) in info.items():
            children.setdefault(ppid, []).append(pid)
        total = 0
        stack = [os.getpid()]
        while stack:
            p = stack.pop()
            if p in info:
                total += info[p][1]
            stack.extend(children.get(p, []))
        return round(total / tck, 1)
    except (OSError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from map_reduce_in_go_spark import registry
    from map_reduce_in_go_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # JVM/codegen warmup on the smallest sf (agg path + tokenizer/HOF path),
    # plus one Arrow/mapInPandas query so the Python worker pool is forked
    # before anything is timed (worker startup is ~1 s × cores of pure noise
    # that otherwise lands on whichever ANN query runs first)
    qs["q6_forecast_revenue"](spark, "/root/testdata/sf0.001").count()
    qs["wordcount"](spark, "/root/testdata/sf0.001").count()
    qs["ann_bruteforce"](spark, "/root/testdata/sf0.001").count()

    from map_reduce_in_go_spark.functions.caching import release_persisted

    release_persisted()  # drop any caches the warmup queries pinned

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def run_suite() -> tuple[dict[str, float], float, float | None, float | None]:
        """One timed sweep → (per-query medians, wall, steal Δ, cpu Δ)."""
        s0 = read_steal_seconds()
        c0 = read_tree_cpu_seconds()
        w0 = time.time()
        times: dict[str, float] = {}
        for name in HEADLINE:
            samples = []
            for _ in range(reps):
                t0 = time.time()
                # noop sink, not count(): a count() lets Catalyst prune columns
                # nothing aggregates over, so map-only queries (regex scrubs,
                # per-row scores) would time the scan instead of the work
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
                # drop scoped caches so every rep is a cold, comparable run
                release_persisted()
            times[name] = round(statistics.median(samples), 3)
        wall = time.time() - w0
        s1 = read_steal_seconds()
        c1 = read_tree_cpu_seconds()
        delta = round(s1 - s0, 1) if s0 is not None and s1 is not None else None
        cpu = round(c1 - c0, 1) if c0 is not None and c1 is not None else None
        return times, wall, delta, cpu

    # Steal gate (r9 verdict): a run timed under heavy hypervisor theft
    # (BENCH_r09 recorded 101 s of steal during a 46 s suite) measures the
    # neighbors, not the code. If steal exceeds STEAL_FRAC of wall, rerun
    # the whole sweep (up to STEAL_RETRIES); if the last attempt is still
    # contaminated, say so IN the artifact instead of masquerading as a
    # regression.
    STEAL_FRAC = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_FRAC", "0.10"))
    STEAL_RETRIES = int(os.environ.get("SPARK_GRAFT_BENCH_STEAL_RETRIES", "1"))
    attempts = 0
    while True:
        times, wall, steal_delta, cpu_sec = run_suite()
        attempts += 1
        contaminated = steal_delta is not None and steal_delta > STEAL_FRAC * wall
        if not contaminated or attempts > STEAL_RETRIES:
            break
        print(
            f"bench: steal {steal_delta}s > {STEAL_FRAC:.0%} of {wall:.1f}s "
            f"wall — rerunning (attempt {attempts + 1})",
            file=sys.stderr,
        )

    total = round(sum(times.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        pass  # non-standard dir name (e.g. a scale-replica path): keep the string
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf or None,
        "cpu_steal_delta_sec": steal_delta,
        "cpu_sec_process": cpu_sec,
        "bench_attempts": attempts,
    }
    if contaminated:
        out["contaminated"] = True
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
