"""Column mapping ID MODE (round 7): creation, parquet-footer field
ids, read-by-field-id resolution (including foreign files whose parquet
column names match NOTHING — only the ids), schema evolution, DML and
metadata-only ALTER on id-mapped tables. Parity target: delta-spark's
delta.columnMapping.mode=id (the mode Databricks assigns to tables
created with mapping on from birth; readers must match by
parquet.field.id, not by name)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    delete_rows,
    drop_column,
    read_delta,
    read_delta_pruned,
    rename_column,
    snapshot,
    write_delta,
)

ID_CONF = {"delta.columnMapping.mode": "id"}


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


def _footer_field_ids(tbl_path):
    """{parquet column name: field id} across all data files."""
    import pyarrow.parquet as pq

    out = {}
    for root, dirs, files in os.walk(tbl_path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for n in files:
            if n.endswith(".parquet"):
                sch = pq.ParquetFile(os.path.join(root, n)).schema_arrow
                for f in sch:
                    fid = (f.metadata or {}).get(b"PARQUET:field_id")
                    out[f.name] = int(fid) if fid is not None else None
    return out


def test_create_id_mode_writes_field_ids_and_reads_back(spark, tbl):
    df = _kv(spark)
    write_delta(df, tbl, configuration=ID_CONF)
    snap = snapshot(spark, tbl)
    assert snap.column_mapping_mode == "id"
    assert snap.protocol["minReaderVersion"] == 2
    assert snap.protocol["minWriterVersion"] == 5
    ids = _footer_field_ids(tbl)
    # physical col-<uuid> names AND footer field ids = the schema's ids
    assert set(ids) == {snap.physical(c) for c in ("k", "v", "b")}
    by_logical = {
        f.name: int(f.metadata["delta.columnMapping.id"])
        for f in snap.schema.fields
    }
    assert {snap.physical(c): i for c, i in by_logical.items()} == ids
    out = read_delta(spark, tbl)
    assert out.columns == ["k", "v", "b"]
    assert _rows(out) == _rows(df)


def test_id_mode_resolves_foreign_names_by_field_id(spark, tbl):
    """The distinguishing id-mode behavior: a foreign writer's parquet
    column names may match NOTHING in the committed schema — resolution
    must go through parquet.field.id alone. (A name-mode reader would
    NULL-fill every column here.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(tbl, "_delta_log"))
    t = pa.table(
        {
            "totally_unrelated": pa.array([1, 2, 3], pa.int64()),
            "other_name": pa.array(["a", "b", "c"]),
        }
    )
    sch = pa.schema(
        [
            pa.field(
                "totally_unrelated",
                pa.int64(),
                metadata={b"PARQUET:field_id": b"1"},
            ),
            pa.field(
                "other_name", pa.string(), metadata={b"PARQUET:field_id": b"2"}
            ),
        ]
    )
    pq.write_table(t.cast(sch), os.path.join(tbl, "part-000.parquet"))
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "key",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-zzz1",
                    },
                },
                {
                    "name": "label",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-zzz2",
                    },
                },
            ],
        }
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "2",
                },
            }
        },
        {
            "add": {
                "path": "part-000.parquet",
                "partitionValues": {},
                "size": os.path.getsize(
                    os.path.join(tbl, "part-000.parquet")
                ),
                "dataChange": True,
            }
        },
    ]
    with open(
        os.path.join(tbl, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    out = read_delta(spark, tbl)
    assert out.columns == ["key", "label"]
    assert _rows(out) == {(1, "a"), (2, "b"), (3, "c")}


def test_id_mode_evolution_dml_and_alter(spark, tbl):
    df = _kv(spark, 12)
    write_delta(df, tbl, partition_by=["b"], configuration=ID_CONF)
    # evolution: the new column gets id 4 and a footer field id
    write_delta(
        _kv(spark, 15).filter("k >= 12").withColumn("extra", F.col("k") + 1),
        tbl,
        mode="append",
    )
    snap = snapshot(spark, tbl)
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "4"
    got = {r["k"]: r["extra"] for r in read_delta(spark, tbl).collect()}
    assert got[14] == 15 and got[0] is None
    # stats pruning via logical name still works (physical stats keys)
    pruned, skipped = read_delta_pruned(spark, tbl, "k", 0, 3)
    assert _rows(pruned.filter("k <= 3").select("k")) == {
        (i,) for i in range(4)
    }
    # predicate DML rewrites correctly through the id-mapped scan
    delete_rows(spark, tbl, "k % 2 = 1")
    assert _rows(read_delta(spark, tbl).select("k")) == {
        (i,) for i in range(15) if i % 2 == 0
    }
    # metadata-only ALTER works in id mode too (ids keep files valid)
    rename_column(spark, tbl, "v", "value")
    drop_column(spark, tbl, "extra")
    out = read_delta(spark, tbl)
    assert out.columns == ["k", "value", "b"]
    assert _rows(out.select("value")) == {
        (i * 10,) for i in range(15) if i % 2 == 0
    }


def test_id_mode_file_without_ids_raises(spark, tbl):
    """A data file with NO parquet field ids under an id-mode table is
    a protocol violation — the scan must fail loudly, never silently
    name-match (or NULL-fill) the wrong columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    write_delta(_kv(spark, 6), tbl, configuration=ID_CONF)
    snap = snapshot(spark, tbl)
    # smuggle in an id-less file under an existing add's path
    rel = next(iter(snap.files))
    pq.write_table(
        pa.table({snap.physical("k"): pa.array([99], pa.int64())}),
        os.path.join(tbl, rel),
    )
    with pytest.raises(Exception):
        read_delta(spark, tbl).collect()


def test_unknown_mapping_mode_still_rejected(spark, tbl):
    write_delta(_kv(spark, 5), tbl)
    log = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    with open(log) as fh:
        lines = [json.loads(line) for line in fh.read().splitlines()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"][
                "delta.columnMapping.mode"
            ] = "wat"
    with open(log, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(DeltaProtocolError, match="wat"):
        read_delta(spark, tbl)


def test_id_mode_dml_resolves_foreign_names_by_field_id(spark, tbl):
    """Round-7 review finding #4: DML discovery scans must also resolve
    by field id — a foreign-named id-mode file must have its matching
    rows FOUND (a name-matching discovery would silently miss them and
    the delete would no-op)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(tbl, "_delta_log"))
    t = pa.table(
        {
            "totally_unrelated": pa.array([1, 2, 3], pa.int64()),
            "other_name": pa.array(["a", "b", "c"]),
        }
    )
    sch = pa.schema(
        [
            pa.field(
                "totally_unrelated",
                pa.int64(),
                metadata={b"PARQUET:field_id": b"1"},
            ),
            pa.field(
                "other_name", pa.string(), metadata={b"PARQUET:field_id": b"2"}
            ),
        ]
    )
    pq.write_table(t.cast(sch), os.path.join(tbl, "part-000.parquet"))
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "key",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-zzz1",
                    },
                },
                {
                    "name": "label",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-zzz2",
                    },
                },
            ],
        }
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "2",
                },
            }
        },
        {
            "add": {
                "path": "part-000.parquet",
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(tbl, "part-000.parquet")),
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(tbl, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    v, n = delete_rows(spark, tbl, "key = 2")
    assert n == 1  # the file WAS discovered and rewritten
    assert _rows(read_delta(spark, tbl)) == {(1, "a"), (3, "c")}
