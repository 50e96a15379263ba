"""Fail fast — with a readable message — when the driver regenerates testdata.

Round 4 lost every events-touching query because ``events.parquet`` drifted
from TIMESTAMP(NANOS) to ``timestamp[us]`` and the loader hard-coded one
encoding. These tests pin (a) the dtypes every loader assumes, via pyarrow so
a drift fails in seconds without a Spark session, and (b) that ``_load_events``
handles every encoding the generator has ever produced, by writing synthetic
files in each encoding and running the real loader against them.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from map_reduce_in_go_spark.sources.tables import TABLES, _load_events

# same override conftest honors, so the drift guard pins the directory the
# rest of the suite actually reads
SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# Column → acceptable pyarrow dtypes. Loaders branch where a set has >1 entry;
# a dtype outside the set means new loader work, and this test names the column.
EXPECTED = {
    "region": {"r_regionkey": {"int32", "int64"}, "r_name": {"string", "large_string"}},
    "nation": {"n_nationkey": {"int32", "int64"}, "n_regionkey": {"int32", "int64"}},
    "customer": {"c_custkey": {"int64"}, "c_acctbal": {"double", "decimal128(12, 2)"}},
    "supplier": {"s_suppkey": {"int64"}, "s_nationkey": {"int32", "int64"}},
    "part": {"p_partkey": {"int64"}, "p_retailprice": {"double", "decimal128(12, 2)"}},
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_totalprice": {"double", "decimal128(12, 2)"},
        "o_orderdate": {"date32[day]", "timestamp[us]", "timestamp[ns]"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double", "decimal128(12, 2)", "int64"},
        "l_extendedprice": {"double", "decimal128(12, 2)"},
        "l_discount": {"double", "decimal128(12, 2)"},
        "l_shipdate": {"date32[day]", "timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # every encoding _load_events supports; anything else must fail HERE
        "ts": {"int64", "timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
    },
    "documents": {"doc_id": {"int64"}, "text": {"string", "large_string"}},
    "embeddings": {"vec_id": {"int64"}, "embedding": {"list<element: float>", "list<item: float>", "list<element: double>", "list<item: double>"}},
}


@pytest.mark.parametrize("table", TABLES)
def test_testdata_dtypes_match_loader_assumptions(table):
    path = os.path.join(SF, f"{table}.parquet")
    schema = pq.read_schema(path)
    fields = {f.name: str(f.type) for f in schema}
    for col, allowed in EXPECTED.get(table, {}).items():
        assert col in fields, (
            f"TESTDATA DRIFT: {table}.parquet lost column {col!r}; "
            f"present: {sorted(fields)}"
        )
        assert fields[col] in allowed, (
            f"TESTDATA DRIFT: {table}.{col} is now {fields[col]!r}, loaders "
            f"only handle {sorted(allowed)} — update sources/tables.py"
        )


def _write_events(tmp_path, ts_array):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


# 2024-01-01 00:00:01.5 and friends, as epoch micros
MICROS = [1704067201500000, 1704067202250000, 1704067203000000]


@pytest.mark.parametrize(
    "encoding",
    ["nanos_int64", "timestamp_us", "timestamp_us_utc", "timestamp_ns"],
)
def test_load_events_handles_every_encoding(spark, tmp_path, encoding):
    if encoding == "nanos_int64":
        # plain int64 column named ts (the nanosAsLong shape Spark surfaces)
        ts = pa.array([m * 1000 for m in MICROS], pa.int64())
    elif encoding == "timestamp_us":
        ts = pa.array(MICROS, pa.timestamp("us"))
    elif encoding == "timestamp_us_utc":
        ts = pa.array(MICROS, pa.timestamp("us", tz="UTC"))
    else:
        ts = pa.array([m * 1000 for m in MICROS], pa.timestamp("ns"))

    sf_dir = _write_events(tmp_path, ts)
    df = _load_events(spark, sf_dir)
    rows = {r["event_id"]: r["ts_us"] for r in df.select("event_id", "ts_us").collect()}
    assert rows == {1: MICROS[0], 2: MICROS[1], 3: MICROS[2]}
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.schema["ts_us"].dataType.typeName() == "long"


def test_load_events_real_testdata(spark):
    """The recipe must work on the ACTUAL regenerated parquet, not just synthetic."""
    df = _load_events(spark, SF)
    first = df.select("ts", "ts_us").limit(1).collect()[0]
    assert first["ts_us"] is not None and first["ts_us"] > 1_600_000_000_000_000
