"""Column-mapping WRITE path + metadata-only ALTER COLUMN (round 7,
VERDICT r6 next-step #1): creating tables with
delta.columnMapping.mode=name, appending/overwriting them (data files
carry physical ``col-<uuid>`` parquet names; partitionValues and stats
keys are physical), RENAME/DROP/ADD COLUMN as pure metaData commits,
and DML/DV/CDF on mapped tables. Parity target: the reference's
platform enables column mapping by default on modern tables — rename
and drop are the first schema-evolution commands a user runs."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    add_check_constraint,
    add_column,
    delete_delta_dv,
    delete_rows,
    drop_column,
    merge_delta,
    optimize_delta,
    read_cdf,
    read_delta,
    read_delta_pruned,
    rename_column,
    restore_delta,
    snapshot,
    update_rows,
    write_delta,
)

CM_CONF = {"delta.columnMapping.mode": "name"}


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _kv(spark, n=20):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        (F.col("id") % 3).alias("b"),
    )


def _physical_parquet_names(tbl_path):
    """Union of column names across all data parquet footers."""
    import pyarrow.parquet as pq

    names = set()
    for root, dirs, files in os.walk(tbl_path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for n in files:
            if n.endswith(".parquet"):
                sch = pq.ParquetFile(os.path.join(root, n)).schema_arrow
                names |= set(sch.names)
    return names


@pytest.mark.parametrize("partitioned", [False, True])
def test_create_mapped_table_physical_files_logical_reads(
    spark, tbl, partitioned
):
    df = _kv(spark)
    write_delta(
        df, tbl,
        partition_by=["b"] if partitioned else None,
        configuration=CM_CONF,
    )
    snap = snapshot(spark, tbl)
    assert snap.column_mapping_mode == "name"
    assert snap.protocol["minReaderVersion"] == 2
    assert snap.protocol["minWriterVersion"] == 5
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "3"
    # every physical name is col-<hex>, never a logical name
    phys = {snap.physical(c) for c in ("k", "v", "b")}
    assert all(p.startswith("col-") for p in phys)
    file_cols = _physical_parquet_names(tbl)
    assert file_cols <= phys  # partition col is dir-encoded when partitioned
    assert not ({"k", "v", "b"} & file_cols)
    # add actions: partitionValues and stats keys are PHYSICAL
    for a in snap.files.values():
        if partitioned:
            assert set(a["partitionValues"]) == {snap.physical("b")}
        st = json.loads(a["stats"])
        assert set(st["minValues"]) <= phys
    # logical read round-trips
    out = read_delta(spark, tbl)
    assert out.columns == ["k", "v", "b"]
    assert _rows(out) == _rows(df)
    # stats pruning by LOGICAL name still works
    pruned, skipped = read_delta_pruned(spark, tbl, "k", 0, 3)
    assert _rows(pruned.filter("k <= 3")) == _rows(df.filter("k <= 3"))


def test_append_and_schema_evolution_on_mapped_table(spark, tbl):
    write_delta(_kv(spark, 10), tbl, configuration=CM_CONF)
    write_delta(_kv(spark, 20).filter("k >= 10"), tbl, mode="append")
    assert read_delta(spark, tbl).count() == 20
    # evolution: new column gets a FRESH id and physical name
    evolved = _kv(spark, 25).filter("k >= 20").withColumn(
        "extra", F.col("k") * 100
    )
    write_delta(evolved, tbl, mode="append")
    snap = snapshot(spark, tbl)
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "4"
    assert snap.physical("extra").startswith("col-")
    out = read_delta(spark, tbl)
    assert out.columns == ["k", "v", "b", "extra"]
    got = {r["k"]: r["extra"] for r in out.collect()}
    assert got[24] == 2400 and got[0] is None  # old files NULL-fill


def test_rename_column_is_metadata_only(spark, tbl):
    write_delta(_kv(spark, 12), tbl, configuration=CM_CONF)
    files_before = set(snapshot(spark, tbl).files)
    phys_before = snapshot(spark, tbl).physical("v")
    v = rename_column(spark, tbl, "v", "value")
    snap = snapshot(spark, tbl)
    assert set(snap.files) == files_before  # ZERO data files touched
    assert snap.physical("value") == phys_before  # same physical column
    out = read_delta(spark, tbl)
    assert out.columns == ["k", "value", "b"]
    assert _rows(out.select("value")) == {(i * 10,) for i in range(12)}
    # appends after the rename land in the SAME physical column
    write_delta(
        _kv(spark, 15).filter("k >= 12").withColumnRenamed("v", "value"),
        tbl, mode="append",
    )
    assert _rows(read_delta(spark, tbl).select("value")) == {
        (i * 10,) for i in range(15)
    }
    # time travel before the rename sees the OLD logical name
    assert read_delta(spark, tbl, version=v - 1).columns == ["k", "v", "b"]


def test_rename_partition_column(spark, tbl):
    write_delta(_kv(spark, 12), tbl, partition_by=["b"], configuration=CM_CONF)
    rename_column(spark, tbl, "b", "bucket")
    snap = snapshot(spark, tbl)
    assert snap.partition_columns == ["bucket"]
    out = read_delta(spark, tbl)
    assert _rows(out.select("bucket")) == {(i % 3,) for i in range(12)}
    pruned, skipped = read_delta_pruned(spark, tbl, "bucket", 1, 1)
    assert skipped > 0


def test_drop_column_then_readd_does_not_resurrect(spark, tbl):
    write_delta(_kv(spark, 8), tbl, configuration=CM_CONF)
    drop_column(spark, tbl, "v")
    out = read_delta(spark, tbl)
    assert out.columns == ["k", "b"]
    # re-adding the same logical name maps to a FRESH physical column:
    # the old values must NOT resurface
    add_column(spark, tbl, "v", "bigint")
    snap = snapshot(spark, tbl)
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "4"
    vals = _rows(read_delta(spark, tbl).select("v"))
    assert vals == {(None,)}


def test_alter_guards(spark, tbl):
    # unmapped table: rename/drop are rejected (metadata-only would lie)
    write_delta(_kv(spark, 5), tbl)
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        rename_column(spark, tbl, "v", "value")
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        drop_column(spark, tbl, "v")
    # but metadata-only ADD COLUMN works anywhere (NULL-fill semantics)
    add_column(spark, tbl, "note", "string")
    assert read_delta(spark, tbl).columns == ["k", "v", "b", "note"]

    mapped = tbl + "_m"
    write_delta(_kv(spark, 5), mapped, configuration=CM_CONF)
    with pytest.raises(DeltaProtocolError, match="no such column"):
        rename_column(spark, mapped, "zz", "value")
    with pytest.raises(DeltaProtocolError, match="already exists"):
        rename_column(spark, mapped, "v", "k")
    add_check_constraint(spark, mapped, "v_nonneg", "v >= 0")
    with pytest.raises(DeltaProtocolError, match="v_nonneg"):
        rename_column(spark, mapped, "v", "value")
    with pytest.raises(DeltaProtocolError, match="v_nonneg"):
        drop_column(spark, mapped, "v")


def test_dml_and_cdf_on_mapped_table(spark, tbl):
    write_delta(
        _kv(spark, 20), tbl,
        configuration={**CM_CONF, "delta.enableChangeDataFeed": "true"},
    )
    v1, _n = delete_rows(spark, tbl, "k >= 15")
    v2, _n = update_rows(spark, tbl, "k < 3", {"v": "v + 1"})
    out = read_delta(spark, tbl)
    assert _rows(out.select("k", "v")) == {
        (i, i * 10 + (1 if i < 3 else 0)) for i in range(15)
    }
    # cdc files are physically named but read back logical
    cdf = read_cdf(spark, tbl, from_version=v1)
    types = {r["_change_type"] for r in cdf.collect()}
    assert types == {"delete", "update_preimage", "update_postimage"}
    dels = _rows(cdf.filter("_change_type = 'delete'").select("k"))
    assert dels == {(k,) for k in range(15, 20)}


def test_merge_and_optimize_on_mapped_table(spark, tbl):
    write_delta(_kv(spark, 10), tbl, configuration=CM_CONF)
    src = spark.range(8, 12).select(
        F.col("id").alias("k"),
        F.lit(-1).cast("long").alias("v"),
        (F.col("id") % 3).alias("b"),
    )
    merge_delta(spark, tbl, src, "k")
    got = {r["k"]: r["v"] for r in read_delta(spark, tbl).collect()}
    assert got[8] == got[11] == -1 and got[0] == 0 and len(got) == 12
    optimize_delta(spark, tbl, target_files=1)
    assert len(snapshot(spark, tbl).files) == 1
    got2 = {r["k"]: r["v"] for r in read_delta(spark, tbl).collect()}
    assert got2 == got
    # compacted files still carry physical names
    phys = _physical_parquet_names(tbl)
    assert all(p.startswith("col-") for p in phys)


def test_dv_delete_on_mapped_table_upgrades_features(spark, tbl):
    write_delta(_kv(spark, 20), tbl, configuration=CM_CONF)
    v, n_dv = delete_delta_dv(spark, tbl, "k", 5, 9)
    assert n_dv >= 1
    snap = snapshot(spark, tbl)
    assert snap.protocol["minReaderVersion"] == 3
    # the v3 upgrade re-states the legacy columnMapping capability
    assert set(snap.protocol["readerFeatures"]) >= {
        "columnMapping", "deletionVectors",
    }
    assert _rows(read_delta(spark, tbl).select("k")) == {
        (k,) for k in range(20) if not 5 <= k <= 9
    }


def test_restore_reverts_rename(spark, tbl):
    write_delta(_kv(spark, 6), tbl, configuration=CM_CONF)
    v_ren = rename_column(spark, tbl, "v", "value")
    restore_delta(spark, tbl, v_ren - 1)
    assert read_delta(spark, tbl).columns == ["k", "v", "b"]


def test_overwrite_schema_on_mapped_table_keeps_ids_for_kept_columns(
    spark, tbl
):
    write_delta(_kv(spark, 6), tbl, configuration=CM_CONF)
    phys_k = snapshot(spark, tbl).physical("k")
    replacement = spark.range(4).select(
        F.col("id").alias("k"), F.concat(F.lit("x"), F.col("id")).alias("tag")
    )
    write_delta(replacement, tbl, mode="overwrite", overwrite_schema=True)
    snap = snapshot(spark, tbl)
    assert snap.column_mapping_mode == "name"
    assert snap.physical("k") == phys_k  # kept column keeps identity
    assert snap.physical("tag").startswith("col-")
    assert int(snap.configuration["delta.columnMapping.maxColumnId"]) == 4
    assert _rows(read_delta(spark, tbl)) == {(i, f"x{i}") for i in range(4)}
