from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_in_go_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image_stub,
    extract_features,
    multimodal_meta,
    sample_frames,
    with_payload,
)
from map_reduce_in_go_spark.sources.tables import load_table


def test_decode_stub_deterministic():
    a = decode_image_stub(b"hello world")
    b = decode_image_stub(b"hello world")
    assert a == b
    assert a["n_bytes"] == 11


def test_payload_roundtrip(spark, sf_dir):
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    row = docs.select(
        "text", "payload", F.length("payload").alias("n")
    ).first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]
    assert row["n"] == len(row["text"].encode())


def test_meta_matches_direct_compute(spark, sf_dir):
    out = multimodal_meta(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").limit(50).collect()
    }
    import hashlib

    for r in out:
        payload = docs[r["doc_id"]].encode()
        assert r["n_bytes"] == len(payload)
        assert r["digest"] == hashlib.md5(payload).hexdigest()
        assert r["fake_width"] == len(payload) % 640 + 64


def test_frame_sampling_fanout(spark, sf_dir):
    import hashlib
    import math

    docs = with_payload(load_table(spark, sf_dir, "documents")).limit(10)
    frames = sample_frames(docs, every=64, frame=32).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, rows in by_doc.items():
        payload = texts[doc_id].encode()
        assert len(rows) == math.ceil(len(payload) / 64)
        first = min(rows, key=lambda r: r["frame_idx"])
        assert first["frame_digest"] == hashlib.md5(payload[:32]).hexdigest()


def test_feature_extraction_shape(spark, sf_dir):
    docs = with_payload(load_table(spark, sf_dir, "documents")).limit(20)
    out = extract_features(docs).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["features"]) == FEATURE_DIM
        assert all(isinstance(x, float) for x in r["features"])
