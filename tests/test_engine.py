"""Generic Mapper/Reducer engine: end-to-end parity with native wordcount,
FNV-1a partitioner bit-parity with the Go implementation, output layout."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from map_reduce_in_go_spark.engine import (
    WordCountMapper,
    WordCountReducer,
    run_mapreduce,
    write_output,
)
from map_reduce_in_go_spark.functions.hashing import fnv1a_32, reduce_bucket


def _fnv1a_py(s: str) -> int:
    # independent re-implementation of Go's fnv.New32a (hash/fnv)
    h = 2166136261
    for b in s.encode():
        h ^= b
        h = (h * 16777619) % (1 << 32)
    return h


def test_fnv1a_bit_parity(spark):
    # includes multi-byte UTF-8 (Go's ihash hashes []byte, not codepoints)
    words = ["the", "quick", "brown", "fox", "a", "spark", "zebra!",
             "café", "naïve", "Åland", "źdźbło", "日本語", "", "résumé"]
    df = spark.createDataFrame([Row(w=w) for w in words])
    got = {r["w"]: r["h"] for r in df.select("w", fnv1a_32(F.col("w")).alias("h")).collect()}
    for w in words:
        assert got[w] == _fnv1a_py(w), w


def test_reduce_bucket_range(spark):
    df = spark.createDataFrame([Row(w=f"word{i}") for i in range(50)])
    buckets = [
        r["b"] for r in df.select(reduce_bucket(F.col("w"), 5).alias("b")).collect()
    ]
    assert set(buckets) <= set(range(5))
    assert len(set(buckets)) > 1


def test_generic_mapreduce_matches_native(spark, sf_dir):
    from map_reduce_in_go_spark.operators.wordcount import mapreduce_generic, wordcount

    generic = {
        (r["word"], int(r["cnt_str"])) for r in mapreduce_generic(spark, sf_dir).collect()
    }
    native = {(r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()}
    assert generic == native


def test_run_mapreduce_small(spark):
    files = spark.createDataFrame(
        [
            Row(filename="a.txt", contents="The fox. THE FOX!"),
            Row(filename="b.txt", contents="fox?"),
        ]
    )
    out = run_mapreduce(files, WordCountMapper(), WordCountReducer())
    got = {(r["key"], r["value"]) for r in out.collect()}
    assert got == {("the", "2"), ("fox", "3")}


def test_write_output_layout(spark, tmp_path):
    files = spark.createDataFrame(
        [Row(filename="a.txt", contents="apple banana cherry apple")]
    )
    out = run_mapreduce(files, WordCountMapper(), WordCountReducer())
    path = str(tmp_path / "mr-out")
    write_output(out, path, n_reduce=3)
    bucket_dirs = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(path, "bucket=*"))
    )
    assert bucket_dirs  # at least one bucket materialized
    # every key is in the bucket FNV-1a says it should be in
    expected = {
        "apple": (_fnv1a_py("apple") & 0x7FFFFFFF) % 3,
        "banana": (_fnv1a_py("banana") & 0x7FFFFFFF) % 3,
        "cherry": (_fnv1a_py("cherry") & 0x7FFFFFFF) % 3,
    }
    for word, bucket in expected.items():
        hits = []
        for f in glob.glob(os.path.join(path, "bucket=*", "*.csv")):
            with open(f) as fh:
                if any(line.split("\t")[0] == word for line in fh):
                    hits.append(os.path.basename(os.path.dirname(f)))
        assert hits == [f"bucket={bucket}"], (word, hits)


def test_custom_partitioner_end_to_end(spark):
    """Pluggable routing (distributed/worker.go:170-174 made ihash % nReduce
    the seam): a user partitioner replaces FNV-1a, results stay identical to
    the default path, and co-location is real — every key of one bucket is
    folded by one reduce task."""
    files = spark.createDataFrame(
        [
            Row(filename="a.txt", contents="The fox. THE FOX! dog dog bird"),
            Row(filename="b.txt", contents="fox? dog emu"),
        ]
    )
    # route by first letter mod n_reduce — deliberately not a hash
    first_letter = lambda key, n: (F.ascii(F.substring(key, 1, 1)) % n).cast("int")

    out = run_mapreduce(
        files, WordCountMapper(), WordCountReducer(),
        partitioner=first_letter, n_reduce=2,
    )
    got = {(r["key"], r["value"]) for r in out.collect()}
    assert got == {("the", "2"), ("fox", "3"), ("dog", "3"), ("bird", "1"), ("emu", "1")}

    # co-location: keys sharing a bucket land in the same output partition
    with_pid = out.withColumn("pid", F.spark_partition_id())
    pid_of = {r["key"]: r["pid"] for r in with_pid.collect()}
    bucket_of = {k: ord(k[0]) % 2 for k in pid_of}
    for a in pid_of:
        for b in pid_of:
            if bucket_of[a] == bucket_of[b]:
                assert pid_of[a] == pid_of[b], (a, b)

    # write path honors the same partitioner
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "mr-out")
        write_output(out, path, n_reduce=2, partitioner=first_letter)
        for f in glob.glob(os.path.join(path, "bucket=*", "*.csv")):
            bucket = int(os.path.basename(os.path.dirname(f)).split("=")[1])
            with open(f) as fh:
                for line in fh:
                    word = line.split("\t")[0]
                    assert ord(word[0]) % 2 == bucket, (word, bucket)


def test_fault_tolerance_confs(spark):
    """Reference parity (task.go:11,13,264-304): retry cap + straggler
    speculation must both be SET — a multiplier without the enable flag is
    a no-op."""
    assert spark.conf.get("spark.task.maxFailures") == "3"
    assert spark.conf.get("spark.speculation") == "true"
    assert spark.conf.get("spark.speculation.multiplier") == "1.5"
