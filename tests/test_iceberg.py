"""Iceberg v2 engine tests: Avro codec (incl. JVM cross-validation),
table roundtrips, time travel, pruning, positional deletes, and the
foreign-feature loud-fail gates."""

from __future__ import annotations

import io
import json
import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.iceberg_avro import (
    AvroError,
    _zigzag_decode,
    _zigzag_encode,
    read_avro,
    write_avro,
)
from mergermetrics_lakehouse_pipeline_spark.sources.iceberg_log import (
    IcebergProtocolError,
    current_metadata,
    delete_where_iceberg,
    read_iceberg,
    scan_plan,
    table_history,
    write_iceberg,
)

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Avro codec
# ---------------------------------------------------------------------------

NASTY_SCHEMA = {
    "type": "record",
    "name": "nasty",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "l", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {
            "name": "nested",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "inner",
                    "fields": [
                        {"name": "x", "type": "int"},
                        {"name": "y", "type": ["null", "bytes"], "default": None},
                    ],
                },
            ],
            "default": None,
        },
        # reuse of a named type by reference
        {"name": "nested2", "type": ["null", "inner"], "default": None},
    ],
}

NASTY_RECORDS = [
    {
        "s": "héllo ✓",
        "l": -(2**62),
        "i": -1,
        "b": True,
        "d": 3.5,
        "by": b"\x00\xff",
        "opt": 7,
        "arr": ["a", "", "c"],
        "m": {"k1": 1, "k2": -2},
        "nested": {"x": 5, "y": b"zz"},
        "nested2": {"x": -5, "y": None},
    },
    {
        "s": "",
        "l": 2**62,
        "i": 2**31 - 1,
        "b": False,
        "d": -0.0,
        "by": b"",
        "opt": None,
        "arr": [],
        "m": {},
        "nested": None,
        "nested2": None,
    },
]


def test_avro_python_roundtrip(tmp_path):
    p = str(tmp_path / "t.avro")
    write_avro(p, NASTY_SCHEMA, NASTY_RECORDS, metadata={"k": "v"})
    schema, meta, recs = read_avro(p)
    assert recs == NASTY_RECORDS
    assert meta["k"] == b"v"
    assert schema == NASTY_SCHEMA


def test_avro_jvm_cross_validation(tmp_path, spark):
    """Files written by the pure-Python codec are readable by the
    official JVM avro library bundled with Spark."""
    p = str(tmp_path / "x.avro")
    write_avro(p, NASTY_SCHEMA, NASTY_RECORDS)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    out = []
    while reader.hasNext():
        out.append(reader.next())
    reader.close()
    assert len(out) == 2
    r0, r1 = out
    assert str(r0.get("s")) == "héllo ✓"
    assert r0.get("l") == -(2**62)
    assert r0.get("opt") == 7
    assert r1.get("opt") is None
    assert r0.get("nested").get("x") == 5
    assert r0.get("m").get(jvm.org.apache.avro.util.Utf8("k2")) == -2
    assert [str(v) for v in r0.get("arr")] == ["a", "", "c"]


def test_avro_empty_file(tmp_path):
    p = str(tmp_path / "e.avro")
    write_avro(p, NASTY_SCHEMA, [])
    _, _, recs = read_avro(p)
    assert recs == []


def test_avro_rejects_unknown_codec(tmp_path):
    with pytest.raises(AvroError):
        write_avro(str(tmp_path / "b.avro"), NASTY_SCHEMA, [], codec="snappy")


def test_zigzag_edge_values():
    for n in (0, -1, 1, 63, -64, 2**63 - 1, -(2**63), 12345678901234):
        buf = io.BytesIO(_zigzag_encode(n))
        assert _zigzag_decode(buf) == n


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    @settings(max_examples=200, deadline=None)
    def test_zigzag_property(n):
        assert _zigzag_decode(io.BytesIO(_zigzag_encode(n))) == n

except ImportError:  # pragma: no cover
    pass


# ---------------------------------------------------------------------------
# table lifecycle
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def orders_df(spark):
    o = spark.read.parquet(f"{SF0001}/orders.parquet")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.year("o_orderdate").alias("o_year"),
    )


@pytest.fixture()
def table(tmp_path, spark, orders_df):
    tbl = str(tmp_path / "orders_ice")
    write_iceberg(
        spark,
        orders_df.filter("o_year <= 1997"),
        tbl,
        partition_by=["o_year"],
    )
    write_iceberg(spark, orders_df.filter("o_year > 1997"), tbl, mode="append")
    return tbl


def test_create_and_append_roundtrip(spark, orders_df, table):
    got = read_iceberg(spark, table)
    assert got.count() == orders_df.count()
    a = got.agg(F.sum("cents")).collect()[0][0]
    b = orders_df.agg(F.sum("cents")).collect()[0][0]
    assert a == b
    # column order and types follow the table schema
    assert [f.name for f in got.schema.fields] == [
        "o_orderkey",
        "o_custkey",
        "cents",
        "o_year",
    ]


def test_unpartitioned_roundtrip(spark, orders_df, tmp_path):
    tbl = str(tmp_path / "flat_ice")
    write_iceberg(spark, orders_df, tbl)
    got = read_iceberg(spark, tbl)
    assert got.count() == orders_df.count()
    sp = scan_plan(tbl)
    assert sp.partition_cols == []
    assert sp.files_total == len(sp.data_files)


def test_time_travel_by_snapshot_and_timestamp(spark, orders_df, table):
    hist = table_history(table)
    assert len(hist) == 2
    v1 = read_iceberg(spark, table, snapshot_id=hist[0]["snapshot-id"])
    assert v1.count() == orders_df.filter("o_year <= 1997").count()
    ts = read_iceberg(spark, table, as_of_ms=hist[0]["timestamp-ms"])
    assert ts.count() == v1.count()
    with pytest.raises(IcebergProtocolError):
        read_iceberg(spark, table, as_of_ms=hist[0]["timestamp-ms"] - 10_000)
    with pytest.raises(IcebergProtocolError):
        read_iceberg(spark, table, snapshot_id=123)


def test_partition_and_manifest_pruning(spark, orders_df, table):
    # manifest B covers years > 1997 only: its field summaries prune it
    sp = scan_plan(table, prune=[("o_year", "=", 1996)])
    assert sp.manifests_total == 2
    assert sp.manifests_pruned == 1
    assert sp.files_pruned > 0
    got = read_iceberg(spark, table, prune=[("o_year", "=", 1996)])
    assert got.count() == orders_df.filter("o_year = 1996").count()


def test_column_bounds_pruning(spark, orders_df, tmp_path):
    """Min/max bounds from parquet footers prune files without
    partition columns (Iceberg's scan-planning data skipping)."""
    tbl = str(tmp_path / "bounds_ice")
    lo = orders_df.filter("cents < 10000000").coalesce(1)
    hi = orders_df.filter("cents >= 10000000").coalesce(1)
    write_iceberg(spark, lo, tbl)
    write_iceberg(spark, hi, tbl, mode="append")
    sp = scan_plan(tbl, prune=[("cents", ">=", 10_000_000)])
    assert sp.files_pruned >= 1
    got = read_iceberg(spark, tbl, prune=[("cents", ">=", 10_000_000)])
    assert got.count() == hi.count()


def test_positional_deletes(spark, orders_df, table):
    n1 = delete_where_iceberg(spark, table, "cents > 20000000")
    exp1 = orders_df.filter("cents > 20000000").count()
    assert n1 == exp1
    got = read_iceberg(spark, table)
    assert got.count() == orders_df.count() - exp1
    # overlapping second delete only writes net-new positions
    n2 = delete_where_iceberg(spark, table, "cents > 15000000")
    exp2 = orders_df.filter("cents > 15000000 and cents <= 20000000").count()
    assert n2 == exp2
    got = read_iceberg(spark, table)
    assert got.count() == orders_df.filter("cents <= 15000000").count()


def test_deletes_do_not_hit_later_appends(spark, orders_df, table):
    delete_where_iceberg(spark, table, "cents > 20000000")
    survivors = orders_df.filter("cents <= 20000000").count()
    readd = orders_df.filter("cents > 20000000").limit(7)
    write_iceberg(spark, readd, table, mode="append")
    got = read_iceberg(spark, table)
    # sequence numbers: the delete (seq 3) does not apply to data files
    # added by the later append (seq 4)
    assert got.count() == survivors + 7


def test_delete_snapshot_time_travel(spark, orders_df, table):
    pre = read_iceberg(spark, table).count()
    delete_where_iceberg(spark, table, "cents > 20000000")
    hist = table_history(table)
    assert len(hist) == 3
    old = read_iceberg(spark, table, snapshot_id=hist[1]["snapshot-id"])
    assert old.count() == pre  # pre-delete snapshot still fully readable


# ---------------------------------------------------------------------------
# loud-fail gates
# ---------------------------------------------------------------------------


def _mutate_metadata(table: str, fn) -> None:
    mdir = os.path.join(table, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    p = os.path.join(mdir, f"v{n}.metadata.json")
    with open(p) as fh:
        meta = json.load(fh)
    fn(meta)
    with open(p, "w") as fh:
        json.dump(meta, fh)


def test_gate_format_version(spark, table):
    _mutate_metadata(table, lambda m: m.update({"format-version": 3}))
    with pytest.raises(IcebergProtocolError, match="format-version"):
        read_iceberg(spark, table)


def test_gate_non_identity_transform(spark, table):
    def bucketify(m):
        m["partition-specs"][0]["fields"][0]["transform"] = "bucket[16]"

    _mutate_metadata(table, bucketify)
    with pytest.raises(IcebergProtocolError, match="transform"):
        read_iceberg(spark, table)


def test_gate_equality_deletes(spark, orders_df, table):
    # forge an equality-delete entry by rewriting a delete manifest
    delete_where_iceberg(spark, table, "cents > 20000000")
    meta = current_metadata(table)
    snap = [s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]][0]
    _, _, mfs = read_avro(snap["manifest-list"])
    dm = [m for m in mfs if m["content"] == 1][0]
    schema, mmeta, entries = read_avro(dm["manifest_path"])
    for e in entries:
        e["data_file"]["content"] = 2  # equality deletes
    write_avro(
        dm["manifest_path"],
        schema,
        entries,
        metadata={k: v.decode() for k, v in mmeta.items() if k not in ("avro.schema", "avro.codec")},
    )
    with pytest.raises(IcebergProtocolError, match="equality"):
        read_iceberg(spark, table)


def test_gate_not_a_table(spark, tmp_path):
    with pytest.raises(IcebergProtocolError, match="version hint"):
        read_iceberg(spark, str(tmp_path / "nope"))


def test_gate_nested_schema(spark, tmp_path):
    df = spark.range(3).select(F.struct("id").alias("s"))
    with pytest.raises(IcebergProtocolError, match="unsupported Spark type"):
        write_iceberg(spark, df, str(tmp_path / "nested_ice"))
