"""variantType (round 11): Delta tables carrying Spark VARIANT columns
— reader-writer feature stamping at create and on mergeSchema
evolution, roundtrip through the log engine's own scan, DML over
variant payloads, and the python-datasource gate (pyarrow cannot read
the parquet VARIANT logical type)."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    _schema_has_variant,
    delete_delta,
    read_delta,
    snapshot,
    write_delta,
)


def _vdf(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        "id",
        F.parse_json(
            F.format_string('{"k": %d, "tag": "t%d"}', "id", F.expr("id % 3"))
        ).alias("props"),
    )


def _root(tag: str) -> str:
    return os.path.join(tempfile.mkdtemp(prefix=f"mm_{tag}_"), "t")


def test_variant_create_stamps_reader_writer_feature(spark):
    root = _root("vt")
    write_delta(_vdf(spark, 0, 10), root, mode="overwrite")
    proto = snapshot(spark, root).protocol
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    # legacy capabilities restated (the v7 contract)
    assert "appendOnly" in proto["writerFeatures"]


def test_variant_roundtrip_and_extraction(spark):
    root = _root("vt")
    write_delta(_vdf(spark, 0, 10), root, mode="overwrite")
    write_delta(_vdf(spark, 10, 15), root, mode="append")
    back = read_delta(spark, root)
    assert dict(back.dtypes)["props"] == "variant"
    got = {
        r.id: (r.k, r.tag)
        for r in back.select(
            "id",
            F.expr("variant_get(props, '$.k', 'bigint')").alias("k"),
            F.expr("variant_get(props, '$.tag', 'string')").alias("tag"),
        ).collect()
    }
    assert got == {i: (i, f"t{i % 3}") for i in range(15)}


def test_variant_schema_evolution_upgrades_protocol(spark):
    root = _root("vt_evo")
    write_delta(spark.range(5).select("id"), root, mode="overwrite")
    pre = snapshot(spark, root).protocol
    assert "readerFeatures" not in pre and pre["minReaderVersion"] == 1
    write_delta(_vdf(spark, 5, 8).withColumnRenamed("props", "v"), root,
                mode="append")
    proto = snapshot(spark, root).protocol
    assert proto["minReaderVersion"] == 3
    assert "variantType" in proto["readerFeatures"]
    back = read_delta(spark, root)
    assert back.count() == 8
    # pre-evolution rows read NULL for the new variant column
    assert back.filter("v IS NULL").count() == 5


def test_variant_delete_copy_on_write(spark):
    root = _root("vt_dml")
    write_delta(_vdf(spark, 0, 12), root, mode="overwrite")
    delete_delta(spark, root, "id", 0, 3)  # drop ids 0..3
    back = read_delta(spark, root)
    assert back.count() == 8
    ks = sorted(
        r.k
        for r in back.select(
            F.expr("variant_get(props, '$.k', 'bigint')").alias("k")
        ).collect()
    )
    assert ks == list(range(4, 12))


def test_variant_pysource_gate(spark):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        DeltaLogDataSource,
    )

    root = _root("vt_py")
    write_delta(_vdf(spark, 0, 4), root, mode="overwrite")
    spark.dataSource.register(DeltaLogDataSource)
    with pytest.raises(Exception, match="variantType|VARIANT"):
        spark.read.format("delta_pylog").option("path", root).load().count()


def test_foreign_variant_feature_names_accepted(spark):
    """A foreign log stamping the preview alias must still open."""
    root = _root("vt_alias")
    write_delta(_vdf(spark, 0, 4), root, mode="overwrite")
    log = os.path.join(root, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(log) if l.strip()]
    for a in actions:
        if "protocol" in a:
            a["protocol"]["readerFeatures"] = ["variantType-preview"]
            a["protocol"]["writerFeatures"] = [
                "variantType-preview" if f == "variantType" else f
                for f in a["protocol"]["writerFeatures"]
            ]
    with open(log, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    assert read_delta(spark, root).count() == 4


def test_foreign_unknown_reader_feature_still_raises(spark):
    root = _root("vt_unk")
    write_delta(_vdf(spark, 0, 4), root, mode="overwrite")
    log = os.path.join(root, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(log) if l.strip()]
    for a in actions:
        if "protocol" in a:
            a["protocol"]["readerFeatures"] = ["shreddedVariant2030"]
    with open(log, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(DeltaProtocolError):
        snapshot(spark, root)


def test_schema_has_variant_walks_nested_types(spark):
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
        VariantType,
    )

    assert _schema_has_variant(VariantType())
    assert _schema_has_variant(
        StructType([StructField("a", ArrayType(VariantType()))])
    )
    assert _schema_has_variant(MapType(StringType(), VariantType()))
    assert not _schema_has_variant(
        StructType([StructField("a", ArrayType(LongType()))])
    )
