"""Type widening (reader-writer feature ``typeWidening``): a table
created with delta.enableTypeWidening=true widens column types on
mergeSchema-style writes instead of rejecting them, records each widen
in the field's delta.typeChanges metadata, and reads pre-widen files
(narrow physical type) through an explicit upcasting scan schema.

Reference parity: the reference's platform evolves Delta schemas on
write (1_customer_data_processing.py writes with implicit evolution);
the widening matrix is delta.io PROTOCOL.md's stable set.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    delete_rows,
    read_delta,
    snapshot,
    truncate_log,
    update_rows,
    write_checkpoint,
    write_delta,
)

_TW_CONF = {"delta.enableTypeWidening": "true"}


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _narrow(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "cast(id as int) as a",
        "cast(id * 0.5 as float) as b",
        "cast(id as string) as s",
    )


def _wide(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "cast(id as long) as a",
        "cast(id * 0.5 as double) as b",
        "cast(id as string) as s",
    )


def test_create_stamps_feature(spark, tbl):
    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    proto = snapshot(spark, tbl).protocol
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "typeWidening" in proto["readerFeatures"]
    assert "typeWidening" in proto["writerFeatures"]
    # the legacy-implied writer features are restated
    assert "appendOnly" in proto["writerFeatures"]


def test_widen_records_type_changes_and_reads_back(spark, tbl):
    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    write_delta(_wide(spark, 100, 104), tbl, mode="append")
    snap = snapshot(spark, tbl)
    by_name = {f.name: f for f in snap.schema.fields}
    assert by_name["a"].dataType.simpleString() == "bigint"
    assert by_name["b"].dataType.simpleString() == "double"
    assert by_name["a"].metadata["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long"}
    ]
    assert by_name["b"].metadata["delta.typeChanges"] == [
        {"fromType": "float", "toType": "double"}
    ]
    assert "delta.typeChanges" not in (by_name["s"].metadata or {})

    out = read_delta(spark, tbl)
    assert dict(out.dtypes) == {"a": "bigint", "b": "double", "s": "string"}
    assert sorted(r.a for r in out.collect()) == list(range(5)) + [
        100, 101, 102, 103,
    ]
    assert out.agg(F.sum("b")).first()[0] == pytest.approx(
        sum(i * 0.5 for i in range(5)) + sum(i * 0.5 for i in (100, 101, 102, 103))
    )


def test_pre_widen_files_stay_physically_narrow(spark, tbl):
    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    v0_files = set(snapshot(spark, tbl, 0).files)
    write_delta(_wide(spark, 100, 104), tbl, mode="append")
    for rel in v0_files:
        sch = pq.read_schema(glob.glob(f"{tbl}/{rel}")[0])
        assert sch.field("a").type == "int32"
        assert sch.field("b").type == "float"
    # and the post-widen files are wide
    new = set(snapshot(spark, tbl).files) - v0_files
    for rel in new:
        sch = pq.read_schema(f"{tbl}/{rel}")
        assert sch.field("a").type == "int64"
        assert sch.field("b").type == "double"


def test_narrower_incoming_frame_upcasts(spark, tbl):
    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    write_delta(_wide(spark, 100, 104), tbl, mode="append")
    write_delta(_narrow(spark, 200, 202), tbl, mode="append")
    out = read_delta(spark, tbl)
    assert out.count() == 11
    assert out.agg(F.sum("a")).first()[0] == sum(range(5)) + 406 + 401
    # no extra typeChanges entry for the upcast append
    by_name = {f.name: f for f in snapshot(spark, tbl).schema.fields}
    assert len(by_name["a"].metadata["delta.typeChanges"]) == 1


def test_successive_widens_accumulate(spark, tbl):
    mk = lambda t, lo, hi: spark.range(lo, hi).selectExpr(
        f"cast(id as {t}) as a", "cast(id as string) as s"
    )
    write_delta(mk("byte", 0, 5), tbl, configuration=_TW_CONF)
    write_delta(mk("short", 10, 12), tbl, mode="append")
    write_delta(mk("long", 20, 22), tbl, mode="append")
    by_name = {f.name: f for f in snapshot(spark, tbl).schema.fields}
    assert by_name["a"].dataType.simpleString() == "bigint"
    assert by_name["a"].metadata["delta.typeChanges"] == [
        {"fromType": "byte", "toType": "short"},
        {"fromType": "short", "toType": "long"},
    ]
    assert sorted(r.a for r in read_delta(spark, tbl).collect()) == [
        0, 1, 2, 3, 4, 10, 11, 20, 21,
    ]


def test_without_property_still_rejects(spark, tbl):
    write_delta(_narrow(spark, 0, 5), tbl)
    with pytest.raises(DeltaProtocolError, match="type change"):
        write_delta(_wide(spark, 100, 104), tbl, mode="append")


def test_non_widening_change_rejects(spark, tbl):
    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    bad = spark.range(5).selectExpr(
        "cast(id as string) as a", "cast(id as float) as b",
        "cast(id as string) as s",
    )
    with pytest.raises(DeltaProtocolError, match="type change"):
        write_delta(bad, tbl, mode="append")


def test_widen_on_identity_column_rejects(spark, tbl):
    df = spark.range(5).selectExpr("cast(id as int) as k")
    write_delta(
        df, tbl, configuration=_TW_CONF,
        identity={"uid": {"start": 1, "step": 1}},
    )
    # identity columns are LongType; try to widen the USER column is
    # fine, but retyping uid (long -> double is a legal widen on the
    # matrix... but not on an identity declaration) must reject
    bad = spark.range(5).selectExpr(
        "cast(id as int) as k", "cast(id as double) as uid"
    )
    with pytest.raises(DeltaProtocolError):
        write_delta(bad, tbl, mode="append")


def test_dml_on_widened_table(spark, tbl):
    write_delta(_narrow(spark, 0, 10), tbl, configuration=_TW_CONF)
    write_delta(_wide(spark, 100, 104), tbl, mode="append")
    delete_rows(spark, tbl, "a < 3")
    update_rows(spark, tbl, "a >= 100", {"b": "b + 1000.0"})
    out = read_delta(spark, tbl)
    assert out.count() == 11
    assert out.filter("b > 999").count() == 4
    assert dict(out.dtypes)["a"] == "bigint"


def test_widened_schema_survives_checkpoint_truncation(spark, tbl):
    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    write_delta(_wide(spark, 100, 104), tbl, mode="append")
    write_checkpoint(spark, tbl)
    truncate_log(tbl)
    snap = snapshot(spark, tbl)
    by_name = {f.name: f for f in snap.schema.fields}
    assert by_name["a"].metadata["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long"}
    ]
    assert sorted(r.a for r in read_delta(spark, tbl).collect()) == list(
        range(5)
    ) + [100, 101, 102, 103]


def test_pysource_reads_widened_table(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        register_delta_source,
    )

    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    write_delta(_wide(spark, 100, 104), tbl, mode="append")
    register_delta_source(spark)
    got = (
        spark.read.format("delta_pylog").option("path", tbl).load()
    )
    assert dict(got.dtypes)["a"] == "bigint"
    assert sorted(r.a for r in got.collect()) == sorted(
        r.a for r in read_delta(spark, tbl).collect()
    )


def test_widen_plus_add_column_in_one_write(spark, tbl):
    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    evolved = spark.range(100, 103).selectExpr(
        "cast(id as long) as a",
        "cast(id * 0.5 as float) as b",
        "cast(id as string) as s",
        "cast(id % 2 as int) as extra",
    )
    write_delta(evolved, tbl, mode="append")
    snap = snapshot(spark, tbl)
    by_name = {f.name: f for f in snap.schema.fields}
    assert by_name["a"].dataType.simpleString() == "bigint"
    assert "extra" in by_name
    out = read_delta(spark, tbl)
    # pre-evolution rows NULL-fill the added column
    assert out.filter("extra is null").count() == 5
    assert out.agg(F.sum("a")).first()[0] == sum(range(5)) + 303


def test_unsupported_foreign_type_change_gated(spark, tbl):
    """Review r10 finding #5: a foreign typeChanges trail outside the
    implemented matrix (e.g. the spec's date->timestampNtz) must raise
    the clean protocol error at plan time, on BOTH readers, not an
    opaque parquet conversion failure mid-scan."""
    import json
    import os

    write_delta(_narrow(spark, 0, 5), tbl, configuration=_TW_CONF)
    write_delta(_wide(spark, 100, 104), tbl, mode="append")
    # forge a trail this reader does not implement
    commit = os.path.join(tbl, "_delta_log", f"{1:020d}.json")
    lines = []
    with open(commit, encoding="utf-8") as fh:
        for line in fh:
            a = json.loads(line)
            if "metaData" in a:
                sch = json.loads(a["metaData"]["schemaString"])
                for f in sch["fields"]:
                    if f["name"] == "a":
                        f["metadata"]["delta.typeChanges"] = [
                            {"fromType": "date", "toType": "timestampNtz"}
                        ]
                a["metaData"]["schemaString"] = json.dumps(sch)
            lines.append(json.dumps(a))
    with open(commit, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")

    with pytest.raises(DeltaProtocolError, match="timestampNtz"):
        read_delta(spark, tbl).collect()

    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        _table_schema,
    )

    with pytest.raises(DeltaProtocolError, match="timestampNtz"):
        _table_schema(tbl)
