"""Byte-pair-encoding tokenizer training — the tokenizer half of a
training-data pipeline.

Sennrich, Haddow & Birch (ACL 2016): BPE merges are learned from the
WORD-FREQUENCY table, not the raw corpus — which is what makes the
algorithm scale. The distributed step is the one shuffle that builds
(word, count) — at 100 TB still a wordcount — and the merge loop then
runs over that bounded vocabulary on the driver, exactly like every
production trainer (HuggingFace tokenizers, SentencePiece) which trains
on counted words regardless of corpus size. Encoding with the learned
merges is a pure map stage (Arrow-batched, per-distinct-token memoized).

Determinism: merge selection is (max pair count, lexicographic pair)
tie-broken, so the merge list — and therefore every encoding — is
byte-stable across runs and partitionings; pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table, spread_partitions

EOW = "</w>"  # end-of-word marker (merges can't cross word boundaries)


def word_frequencies(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """(word → count) over the corpus: the trainer's only distributed pass."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spread_partitions(spark, sf_dir, "documents"), "doc_id"
    )
    rows = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )  # bounded: the distinct-word vocabulary, not the corpus
    return {r["w"]: r["c"] for r in rows}


def train_bpe(
    spark: SparkSession, sf_dir: str, n_merges: int = 40
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word frequencies."""
    freqs = word_frequencies(spark, sf_dir)
    # vocab state: symbol tuple → count
    vocab = {tuple(w) + (EOW,): c for w, c in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # deterministic: highest count, then lexicographically smallest pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges greedily by learned rank (the standard BPE encoder)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    spark: SparkSession, sf_dir: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, n_words, n_units, units_md5) — the corpus BPE-encoded.

    A zero-shuffle Arrow map stage: each batch encodes its tokens with a
    per-batch memo over distinct words (Zipf makes the memo hit rate the
    dominant term — the same trick fast tokenizers use). ``units_md5``
    fingerprints the exact unit sequence so tests can pin byte-stability
    without materializing the sequences.
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    def enc(batches):
        import hashlib

        import pandas as pd

        rk = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out_id, out_nw, out_nu, out_md5 = [], [], [], []
            for doc_id, toks in zip(pdf["doc_id"], pdf["toks"]):
                units: list[str] = []
                for w in toks:
                    u = memo.get(w)
                    if u is None:
                        u = _encode_word(w, rk)
                        memo[w] = u
                    units.extend(u)
                out_id.append(doc_id)
                out_nw.append(len(toks))
                out_nu.append(len(units))
                out_md5.append(
                    hashlib.md5("\x00".join(units).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "n_words": out_nw,
                    "n_units": out_nu,
                    "units_md5": out_md5,
                }
            )

    docs = load_table(spark, sf_dir, "documents").repartition(
        spread_partitions(spark, sf_dir, "documents"), "doc_id"
    )
    return docs.select("doc_id", tokens(F.col("text")).alias("toks")).mapInPandas(
        enc, schema="doc_id long, n_words long, n_units long, units_md5 string"
    )
