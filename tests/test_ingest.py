"""Streaming ingestion dedup: stream → index probe → idempotent landing."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from map_reduce_in_go_spark.sources.manifest_table import ManifestTable
from map_reduce_in_go_spark.sources.tables import load_table
from map_reduce_in_go_spark.streaming.ingest import ingest_batch, start_dedup_ingest

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_ingest_batch_sequence_and_replay(spark, sf_dir, tmp_path):
    """Two batches through the ledgered path: batch 1 bootstraps the index,
    batch 2 dedups against batch 1's survivors; replaying either batch is
    a no-op (same version, same output)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.pmod("doc_id", F.lit(3)) == 1)
    b2 = docs.filter(F.pmod("doc_id", F.lit(3)) == 2)
    tbl = ManifestTable(str(tmp_path / "idx"))
    out = str(tmp_path / "landing")

    assert ingest_batch(spark, b1, tbl, out, 0) is True
    v_after_b1 = tbl.version()
    surv1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert surv1 and surv1 <= {r["doc_id"] for r in b1.collect()}

    assert ingest_batch(spark, b2, tbl, out, 1) is True
    surv_all = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    surv2 = surv_all - surv1
    assert surv2 and all(i % 3 == 2 for i in surv2)
    # index covers every survivor's bands and nothing else doc-wise
    idx_docs = {r["doc_id"] for r in tbl.read(spark).select("doc_id").distinct().collect()}
    # docs with <3 tokens emit no bands; survivors without bands can't be indexed
    assert idx_docs <= surv_all

    # replay: ledgered ops short-circuit BEFORE recomputation
    v = tbl.version()
    assert ingest_batch(spark, b1, tbl, out, 0) is False
    assert ingest_batch(spark, b2, tbl, out, 1) is False
    assert tbl.version() == v
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == surv_all
    assert v_after_b1 < v

    # a DIFFERENT writer's batch 0 is not mistaken for writer 1's replay:
    # the ledger key carries the app identity
    out2 = str(tmp_path / "landing2")
    assert ingest_batch(spark, b1, tbl, out2, 0, app_id="backfill") is True
    assert "backfill-batch-0" in tbl.committed_ops()


def test_ingest_stream_end_to_end(spark, tmp_path):
    """Real foreachBatch wiring: two file-source micro-batches land disjoint
    survivors and grow the index by one commit per batch."""
    drop = tmp_path / "drop"
    drop.mkdir()
    texts1 = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
        (3, "one two three four five six seven eight"),
    ]
    texts2 = [
        (4, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of corpus
        (5, "nine ten eleven twelve thirteen fourteen fifteen"),
    ]
    (drop / "b1.json").write_text(
        "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in texts1)
    )
    time.sleep(1.1)  # file-source orders batches by mod time
    (drop / "b2.json").write_text(
        "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in texts2)
    )
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(drop))
    )
    idx_root = str(tmp_path / "idx")
    out = str(tmp_path / "landing")
    q = start_dedup_ingest(stream, idx_root, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # 2 drops as an in-batch dup of 1; 4 drops as a cross-batch dup; 3/5 novel
    assert got == {1, 3, 5}
    tbl = ManifestTable(idx_root)
    assert tbl.version() == 1  # bootstrap overwrite + one append
    ops = tbl.committed_ops()
    assert {"ingest-batch-0", "ingest-batch-1"} <= ops


def test_ingest_stream_restart_resumes(spark, tmp_path):
    """Stop/restart with the same checkpoint: the restarted query processes
    only the new file, continues the batch-id sequence, and dedups against
    the index state the first run left behind."""
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "b1.json").write_text(
        json.dumps({"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"})
    )
    idx_root = str(tmp_path / "idx")
    out = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(drop))
        )
        q = start_dedup_ingest(stream, idx_root, out, ckpt)
        q.awaitTermination(120)

    run()  # batch 0: doc 1 survives, bootstraps the index
    time.sleep(1.1)
    (drop / "b2.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in (
                {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta"},
                {"doc_id": 3, "text": "one two three four five six seven"},
            )
        )
    )
    run()  # restart: batch 1 only; doc 2 is a dup of the indexed doc 1

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 3}
    tbl = ManifestTable(idx_root)
    assert {"ingest-batch-0", "ingest-batch-1"} <= tbl.committed_ops()


def test_cross_writer_race_reprobes_delta(spark, tmp_path, monkeypatch):
    """A backfill writer committing between this batch's probe and its append
    must not leave both writers' copies of a shared near-duplicate: the CAS
    append fails, the batch re-probes the racer's delta files, and only the
    novel doc survives."""
    from map_reduce_in_go_spark.operators.dedup import bands_of_docs
    from map_reduce_in_go_spark.streaming import ingest as ing

    shared = "the quick brown fox jumps over the lazy dog again and again"
    batch = spark.createDataFrame(
        [(1, shared), (2, "completely different words about manifest logs here")],
        DOC_SCHEMA,
    )
    racer = spark.createDataFrame([(100, shared)], DOC_SCHEMA)
    tbl = ManifestTable(str(tmp_path / "idx"))
    out = str(tmp_path / "landing")
    state = {"raced": False}
    orig_write = ing.write_batch_idempotent

    def racing_write(df, bid, out_dir):
        if not state["raced"]:
            state["raced"] = True  # backfill lands AFTER our probe ran
            ManifestTable(tbl.root).append(
                bands_of_docs(racer), op="backfill-batch-0"
            )
        return orig_write(df, bid, out_dir)

    monkeypatch.setattr(ing, "write_batch_idempotent", racing_write)
    assert ing.ingest_batch(spark, batch, tbl, out, 0, app_id="stream") is True
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {2}, "doc 1 duplicated the racer's doc 100 and must drop"
    idx_docs = {
        r["doc_id"] for r in tbl.read(spark).select("doc_id").distinct().collect()
    }
    assert idx_docs == {100, 2}
    assert {"backfill-batch-0", "stream-batch-0"} <= tbl.committed_ops()


def test_ingest_auto_compaction_bounds_files(spark, sf_dir, tmp_path):
    """With max_files set, repeated batches keep the index's file count
    bounded and the dedup content intact."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tbl = ManifestTable(str(tmp_path / "idx"))
    out = str(tmp_path / "landing")
    for i in range(4):
        batch = docs.filter(F.pmod("doc_id", F.lit(4)) == i)
        assert ingest_batch(spark, batch, tbl, out, i, max_files=2) is True
    assert len(tbl.files()) <= 2 + 1, "compaction did not bound file count"
    # all four batches' survivors landed and index covers them
    landed = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    idx_docs = {
        r["doc_id"] for r in tbl.read(spark).select("doc_id").distinct().collect()
    }
    assert idx_docs <= landed
    assert len(landed) > 0


def test_ingest_batch_txn_sequence_replay_and_atomicity(spark, sf_dir, tmp_path):
    """Catalog-transaction ingest: corpus + band index move together, the
    catalog ledger gives replay detection, and orphan member commits (a
    crash between member appends and the catalog CAS) stay invisible."""
    from map_reduce_in_go_spark.sources.catalog import TableCatalog
    from map_reduce_in_go_spark.streaming.ingest import ingest_batch_txn

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.pmod("doc_id", F.lit(3)) == 1)
    b2 = docs.filter(F.pmod("doc_id", F.lit(3)) == 2)
    cat = TableCatalog(str(tmp_path / "cat"))

    assert ingest_batch_txn(spark, b1, cat, 0) is True
    surv1 = {r["doc_id"] for r in cat.read(spark, "corpus").collect()}
    assert surv1 and surv1 <= {r["doc_id"] for r in b1.collect()}

    assert ingest_batch_txn(spark, b2, cat, 1) is True
    surv_all = {r["doc_id"] for r in cat.read(spark, "corpus").collect()}
    assert all(i % 3 == 2 for i in surv_all - surv1)
    # index ⊆ corpus at every published snapshot (the atomicity invariant)
    idx_docs = {
        r["doc_id"]
        for r in cat.read(spark, "band_index").select("doc_id").distinct().collect()
    }
    assert idx_docs <= surv_all

    # replay: catalog ledger short-circuits, nothing moves
    v = cat.version()
    assert ingest_batch_txn(spark, b1, cat, 0) is False
    assert ingest_batch_txn(spark, b2, cat, 1) is False
    assert cat.version() == v

    # simulated crash mid-transaction: member appends land, catalog CAS
    # never does → published snapshot unchanged, and the replayed batch
    # completes the work (the orphans stay unreferenced)
    txn = cat.transaction(spark)
    txn.append("corpus", docs.filter(F.col("doc_id") == 0).select("doc_id", "text"))
    del txn
    assert {r["doc_id"] for r in cat.read(spark, "corpus").collect()} == surv_all


def test_ingest_txn_stream_end_to_end(spark, tmp_path):
    """foreachBatch wiring for the catalog form: same dedup outcome as the
    single-table stream, exactly-once via the catalog ledger."""
    from map_reduce_in_go_spark.sources.catalog import TableCatalog
    from map_reduce_in_go_spark.streaming.ingest import start_dedup_ingest_txn

    drop = tmp_path / "drop"
    drop.mkdir()
    texts1 = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
        (3, "one two three four five six seven eight"),
    ]
    texts2 = [
        (4, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of corpus
        (5, "nine ten eleven twelve thirteen fourteen fifteen"),
    ]
    (drop / "b1.json").write_text(
        "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in texts1)
    )
    time.sleep(1.1)
    (drop / "b2.json").write_text(
        "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in texts2)
    )
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(drop))
    )
    cat_root = str(tmp_path / "cat")
    q = start_dedup_ingest_txn(stream, cat_root, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    cat = TableCatalog(cat_root)
    got = {r["doc_id"] for r in cat.read(spark, "corpus").collect()}
    assert got == {1, 3, 5}
    assert {"ingest-batch-0", "ingest-batch-1"} <= cat.committed_ops()
    assert cat.version() == 1  # one catalog publication per micro-batch


def test_ingest_stats_probed_index_same_survivors(spark, sf_dir, tmp_path):
    """A stats-enabled index (band_hash skipping + hash-sorted in-loop
    compaction) must produce the identical survivor set, while probes
    provably skip files on the sorted layout."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.pmod("doc_id", F.lit(3)) == 1)
    b2 = docs.filter(F.pmod("doc_id", F.lit(3)) == 2)

    plain = ManifestTable(str(tmp_path / "plain"))
    out_p = str(tmp_path / "landing_plain")
    ingest_batch(spark, b1, plain, out_p, 0)
    ingest_batch(spark, b2, plain, out_p, 1)
    want = {r["doc_id"] for r in spark.read.parquet(out_p).collect()}

    statted = ManifestTable(
        str(tmp_path / "statted"), stats_cols=["band_hash"]
    )
    out_s = str(tmp_path / "landing_statted")
    # max_files=1 forces the in-loop compaction whenever the index holds
    # more than one file, which (for a stats table) rewrites into the
    # 8-file hash-sorted layout
    ingest_batch(spark, b1, statted, out_s, 0, max_files=1)
    ingest_batch(spark, b2, statted, out_s, 1, max_files=1)
    got = {r["doc_id"] for r in spark.read.parquet(out_s).collect()}
    assert got == want
    assert len(statted.files()) == 8  # sorted multi-file layout in place

    # the sorted layout + a clustered probe set actually skips files
    hashes = sorted(
        r["band_hash"]
        for r in statted.read(spark).select("band_hash").distinct().collect()
    )
    kept, total = statted.files_pruned_in("band_hash", hashes[:4])
    assert total == 8 and 0 < len(kept) < total
