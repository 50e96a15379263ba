"""End-to-end multimodal hand-off: WebDataset → decode → features.

Composition proof across the storage and kernel layers: the corpus is
exported to the training-loader tar layout (sources/webdataset.py), read
back at shard granularity, synthesized into REAL binary-PPM payloads,
genuinely decoded, and reduced to per-image feature vectors — the whole
chain one lazy plan per stage, values pinned against a local
encode→decode→feature reference for EVERY document. This is the shape a
multimodal curation pipeline actually runs: bytes in a loader format on
one side, typed feature columns on the other."""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_in_go_spark.operators.multimodal import (
    decode_ppm,
    encode_ppm,
    extract_features,
    with_ppm_payload,
)
from map_reduce_in_go_spark.sources.tables import load_table
from map_reduce_in_go_spark.sources.webdataset import (
    export_webdataset,
    read_webdataset,
)


def test_webdataset_to_decoded_features_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "wds")
    export_webdataset(spark, sf_dir, out)
    docs = read_webdataset(spark, out)
    feats = {
        r["doc_id"]: (r["n_bytes"], list(r["features"]))
        for r in extract_features(with_ppm_payload(docs)).collect()
    }
    source = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    # every source doc survived the tar round-trip into a feature vector
    assert set(feats) == set(source)
    for doc_id, text in source.items():
        payload = encode_ppm(text.encode())
        meta = decode_ppm(payload)
        w, h = meta["width"], meta["height"]
        px = np.frombuffer(payload[-w * h * 3 :], dtype=np.uint8).reshape(
            h, w, 3
        )
        n_bytes, fv = feats[doc_id]
        assert n_bytes == len(payload)
        assert fv[0] == float(w) and fv[1] == float(h)
        assert fv[2] == pytest.approx(px[:, :, 0].mean())
        assert fv[5] == pytest.approx(px.std())
        assert (fv[6], fv[7]) == (float(px.min()), float(px.max()))
