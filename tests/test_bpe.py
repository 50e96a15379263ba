"""BPE tokenizer training: merge determinism, compression, round-trip."""

from __future__ import annotations

from map_reduce_in_go_spark.operators import bpe


def test_merges_deterministic_and_compressive(spark, sf_dir):
    merges = bpe.train_bpe(spark, sf_dir, n_merges=40)
    assert 0 < len(merges) <= 40
    assert merges == bpe.train_bpe(spark, sf_dir, n_merges=40)
    enc = bpe.bpe_encode(spark, sf_dir, merges).collect()
    base = bpe.bpe_encode(spark, sf_dir, []).collect()
    n_units = sum(r["n_units"] for r in enc)
    n_chars = sum(r["n_units"] for r in base)  # no merges → 1 unit per char+EOW
    assert n_units < n_chars * 0.8, "40 merges should compress >20%"
    # encoding is byte-stable across partitionings
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = bpe.bpe_encode(spark, sf_dir, merges).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert {(r["doc_id"], r["units_md5"]) for r in again} == {
        (r["doc_id"], r["units_md5"]) for r in enc
    }


def test_encoder_matches_training_segmentation_and_roundtrips(spark, sf_dir):
    """The greedy rank encoder must reproduce training's final symbol
    sequence for every trained word, and concatenating units must
    reconstruct the word exactly (lossless segmentation)."""
    merges = bpe.train_bpe(spark, sf_dir, n_merges=40)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    freqs = bpe.word_frequencies(spark, sf_dir)
    # replay training's vocab evolution to get the reference segmentation
    vocab = {tuple(w) + (bpe.EOW,): w for w in freqs}
    for a, b in merges:
        merged = a + b
        nv = {}
        for syms, w in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = w
        vocab = nv
    want = {w: list(syms) for syms, w in vocab.items()}
    for w in list(freqs)[:500]:
        got = bpe._encode_word(w, ranks)
        assert got == want[w], (w, got, want[w])
        assert "".join(got).removesuffix(bpe.EOW) == w  # lossless
