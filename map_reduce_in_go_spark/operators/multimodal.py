"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a ``binary``
column (or a pointer + byte-range into an object store), keep typed metadata
columns alongside, and run decode/feature kernels as Arrow-batched Python
(``mapInPandas``) — one Python invocation per batch, zero-copy via Arrow.

The decode libraries (PIL/ffmpeg/etc.) are not in this container, so
:func:`decode_image_stub` is a clearly-marked deterministic fake behind an
import-try; the Spark-side plumbing (schema, batching, partitioning) is real
and tested. ``multimodal_meta`` routes the documents corpus through the
binary path end-to-end and emits SQL-checkable metadata, so the oracle gate
covers the plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

META_SCHEMA = (
    "doc_id long, n_bytes long, digest string, fake_width long, fake_height long"
)
FEATURE_DIM = 8
FEATURE_SCHEMA = f"doc_id long, n_bytes long, features array<double>"


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder.

    Real deployments replace this body with e.g. PIL decode + resize; the
    call signature and the Arrow batch shape around it do not change.
    """
    try:
        import PIL.Image  # noqa: F401  # pragma: no cover

        raise NotImplementedError(
            "real decode path not wired in this container build"
        )
    except ImportError:
        pass
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": n % 640 + 64,
        "fake_height": (n * 7) % 480 + 64,
    }


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text stand in for
    an encoded image)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "UTF-8"))


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: payload → mapInPandas decode-stub → metadata."""
    docs = with_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                meta = decode_image_stub(payload)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": meta["n_bytes"],
                        "digest": hashlib.md5(payload).hexdigest(),
                        "fake_width": meta["fake_width"],
                        "fake_height": meta["fake_height"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "digest", "fake_width", "fake_height"],
            )

    return docs.mapInPandas(_extract, schema=META_SCHEMA)


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: payload → fixed-dim double vector.

    Deterministic fake features (byte histogram moments); the Arrow batch
    shape is exactly what a real embedding model would use.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                feats = [
                    float(sum(payload[i::FEATURE_DIM]) % 1000)
                    for i in range(FEATURE_DIM)
                ]
                out.append(
                    {"doc_id": int(doc_id), "n_bytes": len(payload), "features": feats}
                )
            yield pd.DataFrame(out, columns=["doc_id", "n_bytes", "features"])

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _feat, schema=FEATURE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_bytes long, frame_digest string"


def sample_frames(docs_with_payload: DataFrame, every: int = 64, frame: int = 32) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads.

    Treats the binary payload as a frame container: every ``every`` bytes a
    ``frame``-byte window is cut and fingerprinted. A real decoder (ffmpeg)
    would replace the slicing; the batching, schema and fan-out (one row in
    → N frame rows out) are exactly what production needs.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                for idx, off in enumerate(range(0, len(payload), every)):
                    chunk = payload[off : off + frame]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame_bytes": len(chunk),
                            "frame_digest": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_digest"]
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _sample, schema=FRAME_SCHEMA
    )


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered frame-sampling query: the 1→N binary fan-out, oracle-checked.

    Routes the corpus through :func:`with_payload` → :func:`sample_frames`
    (real binary slicing in Arrow batches). The DuckDB oracle replays the
    frame grid with *character* slicing, which is byte-exact because the
    synthetic corpus is pure ASCII (octet_length == length at every sf —
    a non-ASCII corpus would need a BLOB-slicing oracle instead).
    """
    return sample_frames(with_payload(load_table(spark, sf_dir, "documents")))


ORACLES: dict[str, str] = {
    "multimodal_frames": """
    WITH b AS (
      SELECT doc_id, text, length(text) AS n FROM documents
    ), grid AS (
      SELECT doc_id, text, n, t.o AS off
      FROM b CROSS JOIN (
        SELECT unnest(range(0, (SELECT max(n) FROM b), 64)) AS o
      ) t
      WHERE t.o < n
    )
    SELECT doc_id, CAST(off // 64 AS BIGINT) AS frame_idx,
           CAST(length(substring(text, CAST(off + 1 AS BIGINT), 32)) AS BIGINT)
             AS frame_bytes,
           md5(substring(text, CAST(off + 1 AS BIGINT), 32)) AS frame_digest
    FROM grid
    """,
    "multimodal_meta": """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST(octet_length(encode(text)) % 640 + 64 AS BIGINT) AS fake_width,
           CAST((octet_length(encode(text)) * 7) % 480 + 64 AS BIGINT) AS fake_height
    FROM documents
    """,
}
