from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from map_reduce_in_go_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_ppm,
    encode_ppm,
    extract_features,
    multimodal_meta,
    sample_frames,
    with_payload,
    with_ppm_payload,
)
from map_reduce_in_go_spark.sources.tables import load_table


def test_ppm_roundtrip_is_a_real_image():
    """encode_ppm emits a valid binary PPM; decode_ppm parses dims out of
    the HEADER BYTES (not out of the input length) and validates the
    raster. The bytes are a file any Netpbm-reading tool opens."""
    payload = encode_ppm(b"hello world, twelve bytes plus")
    assert payload.startswith(b"P6\n")
    meta = decode_ppm(payload)
    n = len(b"hello world, twelve bytes plus")
    assert meta["width"] == n % 29 + 4
    assert meta["height"] == n % 13 + 4
    assert meta["maxval"] == 255
    # pixel_sum equals the tiled byte sum
    total = meta["width"] * meta["height"] * 3
    tiled = (b"hello world, twelve bytes plus" * (total // n + 1))[:total]
    assert meta["pixel_sum"] == sum(tiled)


def test_decode_ppm_rejects_malformed():
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF not a ppm")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + b"x" * 5)  # truncated raster
    # a header written by someone else decodes fine (it's a real format)
    other = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    assert decode_ppm(other) == {
        "width": 2,
        "height": 1,
        "maxval": 255,
        "pixel_sum": 210,
    }


def test_payload_roundtrip(spark, sf_dir):
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    row = docs.select(
        "text", "payload", F.length("payload").alias("n")
    ).first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]
    assert row["n"] == len(row["text"].encode())


def test_meta_matches_direct_compute(spark, sf_dir):
    """The distributed encode→decode pipeline equals a local encode→decode
    of the same docs, including the payload md5 (pinning the exact bytes
    Spark synthesized, which the SQL oracle can't see)."""
    out = multimodal_meta(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").limit(50).collect()
    }
    payload_digests = {
        r["doc_id"]: hashlib.md5(bytes(r["payload"])).hexdigest()
        for r in with_ppm_payload(
            load_table(spark, sf_dir, "documents").limit(50)
        ).collect()
    }
    for r in out:
        local = decode_ppm(encode_ppm(docs[r["doc_id"]].encode()))
        assert r["width"] == local["width"]
        assert r["height"] == local["height"]
        assert r["pixel_sum"] == local["pixel_sum"]
        assert r["digest"] == hashlib.md5(docs[r["doc_id"]].encode()).hexdigest()
        assert (
            payload_digests[r["doc_id"]]
            == hashlib.md5(encode_ppm(docs[r["doc_id"]].encode())).hexdigest()
        )


def test_frame_sampling_fanout(spark, sf_dir):
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


def test_feature_extraction_from_decoded_pixels(spark, sf_dir):
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = extract_features(with_ppm_payload(docs)).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(out) == 20
    for r in out:
        assert len(r["features"]) == FEATURE_DIM
        payload = encode_ppm(texts[r["doc_id"]].encode())
        meta = decode_ppm(payload)
        w, h = meta["width"], meta["height"]
        px = np.frombuffer(payload[-w * h * 3 :], dtype=np.uint8).reshape(
            h, w, 3
        )
        assert r["features"][0] == float(w)
        assert r["features"][1] == float(h)
        assert r["features"][2] == pytest.approx(px[:, :, 0].mean())


def test_empty_and_null_docs_are_excluded(spark):
    """Zero-byte and NULL texts have no image: with_ppm_payload filters
    them (matching the oracle's predicate) instead of crashing the job."""
    df = spark.createDataFrame(
        [(1, "real content here"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = with_ppm_payload(df).collect()
    assert [r["doc_id"] for r in rows] == [1]
    meta = decode_ppm(bytes(rows[0]["payload"]))
    assert meta["width"] > 0 and meta["pixel_sum"] > 0
