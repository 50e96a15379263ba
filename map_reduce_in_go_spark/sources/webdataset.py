"""WebDataset-style tar shard export — the training-loader hand-off format.

Large-scale training jobs stream samples from sequential tar shards
(the public WebDataset convention: one tar per shard, one file per sample
member, sample key as the member basename) because object-store sequential
reads at shard granularity beat per-sample random reads by orders of
magnitude. This sink is the last mile of the curation pipeline: take the
deterministic :func:`~..operators.curation.shard_pack` assignment, write
each shard as one tar, and return the shard MANIFEST (id, sample count,
token count, byte size, content digest) as a DataFrame — the index a
training launcher shuffles and assigns to data-loader workers.

Plan shape: one repartition on ``shard_id`` co-locates each shard's
samples on one task, then ``applyInPandas`` writes that shard's tar
sequentially (samples in doc_id order → byte-deterministic tars, digest
pinned by test) and emits its one manifest row. At 100 TB this is the
standard export topology: #tasks = #shards, each task streams its
samples once, no driver involvement. Tar members carry fixed mtime/uid
so replayed exports produce byte-identical shards (rerun-stable like
every sink here).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import shard_pack
from ..sources.tables import load_table


def export_webdataset(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> DataFrame:
    """Write shard-%05d.tar files under ``out_dir``; returns the manifest."""
    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    assign = shard_pack(spark, sf_dir).select("doc_id", "n_tok", "shard_id")
    samples = docs.join(assign, "doc_id").repartition(
        spark.sparkContext.defaultParallelism, "shard_id"
    )

    def write_shard(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        shard_id = int(pdf["shard_id"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard_id:05d}.tar")
        # attempt-unique tmp: two concurrent attempts of the same task
        # (speculation, zombie retry) must not interleave writes into one
        # file — each writes its own tmp and the os.replace publishes
        # whichever byte-identical attempt lands last, atomically
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with tarfile.open(tmp, "w") as tar:
            for _, row in pdf.iterrows():
                key = f"{int(row['doc_id']):09d}"
                meta = json.dumps(
                    {
                        "doc_id": int(row["doc_id"]),
                        "lang": row["lang"],
                        "source": row["source"],
                    },
                    sort_keys=True,
                )  # proper escaping, still byte-deterministic
                for ext, payload in (
                    ("txt", row["text"].encode("utf-8")),
                    ("json", meta.encode("utf-8")),
                ):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0  # fixed: byte-identical re-exports
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(payload))
        os.replace(tmp, path)  # atomic publish per shard
        digest = hashlib.md5(open(path, "rb").read()).hexdigest()
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "n_samples": [len(pdf)],
                "n_tokens": [int(pdf["n_tok"].sum())],
                "n_bytes": [os.path.getsize(path)],
                "tar_md5": [digest],
            }
        )

    manifest_schema = (
        "shard_id long, n_samples long, n_tokens long, n_bytes long, tar_md5 string"
    )
    # Eagerly materialize: the export is a side-effecting transformation, so
    # the write must run exactly once — a lazily returned plan would rewrite
    # every shard on each downstream action. The manifest is one row per
    # shard (bounded), so collect + re-create is the honest shape.
    rows = (
        samples.groupBy("shard_id")
        .applyInPandas(write_shard, schema=manifest_schema)
        .collect()
    )
    return spark.createDataFrame(rows, schema=manifest_schema)


def read_webdataset(spark: SparkSession, in_dir: str) -> DataFrame:
    """Read shard-*.tar WebDataset shards back into (doc_id, text, lang,
    source, shard_id) — the import side of the hand-off format, so a
    corpus can round-trip through the training-loader layout.

    Plan: ``binaryFile`` scan (one task per shard — the same
    sequential-read granularity loaders use) + tar parse per shard in
    one Arrow pass. Sample members are re-paired by key (basename), so
    partial shards or reordered members still parse.
    """
    import json as _json

    files = spark.read.format("binaryFile").load(
        os.path.join(in_dir, "shard-*.tar")
    ).select("path", "content")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                shard_id = int(os.path.basename(path)[6:11])
                by_key: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        by_key.setdefault(key, {})[ext] = tar.extractfile(m).read()
                rows = []
                for key in sorted(by_key):
                    parts = by_key[key]
                    meta = _json.loads(parts["json"].decode("utf-8"))
                    rows.append(
                        {
                            "doc_id": meta["doc_id"],
                            "text": parts["txt"].decode("utf-8"),
                            "lang": meta["lang"],
                            "source": meta["source"],
                            "shard_id": shard_id,
                        }
                    )
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(
        parse,
        schema="doc_id long, text string, lang string, source string, shard_id long",
    )
