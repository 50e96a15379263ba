"""Product-quantization ANN: compression ratio, determinism, recall floor,
and the exact-rescore contract (reported cosines are true cosines)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from map_reduce_in_go_spark.functions.caching import release_persisted
from map_reduce_in_go_spark.operators import pq
from map_reduce_in_go_spark.operators.similarity import _vectors, ann_bruteforce


def test_codes_compress_and_are_deterministic(spark, sf_dir):
    books = pq.train_codebooks(spark, sf_dir)
    assert books.shape == (pq.PQ_M, pq.PQ_K, 64 // pq.PQ_M)
    codes = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq.encode(spark, sf_dir, books).collect()
    }
    n_vecs = _vectors(spark, sf_dir).count()
    assert len(codes) == n_vecs
    for c in codes.values():
        assert len(c) == pq.PQ_M
        assert all(0 <= x < pq.PQ_K for x in c)
    # compression: M × log2(K) bits vs 64 float32 dims
    compressed_bits = pq.PQ_M * int(np.log2(pq.PQ_K))
    assert 64 * 32 / compressed_bits >= 32
    # determinism: retrain + re-encode reproduces every code
    books2 = pq.train_codebooks(spark, sf_dir)
    assert np.array_equal(books, books2)
    codes2 = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq.encode(spark, sf_dir, books2).collect()
    }
    assert codes2 == codes


def test_train_sample_bounded_under_replication(spark, sf_dir, tmp_path):
    """Codebook training's driver collect is O(1) in corpus size: a 20×
    replica (10k vectors > PQ_TRAIN_MAX) still collects ≤ PQ_TRAIN_MAX
    rows, deterministically — the 100 TB posture the module docstring
    claims. (The old fixed-mod sample was N/2 = O(corpus).)"""
    import pyarrow as pa
    import pyarrow.parquet as papq

    src = papq.read_table(f"{sf_dir}/embeddings.parquet")
    n = src.num_rows
    reps = []
    for i in range(20):
        t = src.set_column(
            0, "vec_id", pa.array([v + i * n for v in range(n)], pa.int64())
        )
        reps.append(t)
    big = pa.concat_tables(reps)
    papq.write_table(big, str(tmp_path / "embeddings.parquet"))

    s1 = pq._train_sample(spark, str(tmp_path))
    s2 = pq._train_sample(spark, str(tmp_path))
    assert len(s1) <= pq.PQ_TRAIN_MAX
    assert len(s1) >= pq.PQ_TRAIN_MAX // 2  # still a real sample, not degenerate
    assert [r["vec_id"] for r in s1] == [r["vec_id"] for r in s2]  # deterministic
    # and the small corpus is used in full (no cap distortion below the max)
    assert len(pq._train_sample(spark, sf_dir)) == n


def test_pq_recall_floor_and_true_cosines(spark, sf_dir):
    exact = {}
    for r in ann_bruteforce(spark, sf_dir).collect():
        exact.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos"]
    release_persisted()
    got = {}
    for r in pq.ann_pq(spark, sf_dir).collect():
        got.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos"]
    release_persisted()
    assert set(got) == set(exact)  # every query answered
    hits = total = 0
    for q, nbrs in exact.items():
        overlap = set(nbrs) & set(got[q])
        hits += len(overlap)
        total += len(nbrs)
        for n in overlap:  # exact rescore: identical 6dp cosines
            assert got[q][n] == nbrs[n]
    recall = hits / total
    assert recall >= 0.6, f"PQ recall@10 {recall:.2f} < 0.6"


def test_ivf_pq_composition_recall_and_candidate_cut(spark, sf_dir):
    """IVF,PQ: candidates come only from probed cells (a strict subset of
    ann_pq's full-scan candidates), recall stays near the IVF ceiling, and
    overlapping neighbors carry identical exact cosines."""
    from map_reduce_in_go_spark.operators.similarity import ann_ivf

    ivf = {}
    for r in ann_ivf(spark, sf_dir).collect():
        ivf.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos"]
    release_persisted()
    got = {}
    for r in pq.ann_ivf_pq(spark, sf_dir).collect():
        got.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos"]
    release_persisted()
    assert set(got) == set(ivf)
    hits = total = 0
    for q, nbrs in ivf.items():
        overlap = set(nbrs) & set(got[q])
        hits += len(overlap)
        total += len(nbrs)
        for n in overlap:
            assert got[q][n] == nbrs[n]  # same exact 6dp cosine
    # PQ's ADC cut inside the SAME probed cells (a real ~4x rescore cut
    # here: 50 of ~200 cell candidates). The isotropic test corpus is
    # PQ's WORST case — no cluster structure to quantize — so the floor
    # is set at its measured-minus-margin level; clustered real
    # embeddings sit far above it.
    assert hits / total >= 0.7, f"IVF,PQ vs IVF agreement {hits/total:.2f}"
