"""Pure-Python Apache Iceberg v2 table engine (read + write + deletes).

The north star names "Delta/Iceberg" as the lakehouse surface; Delta is
covered by sources/delta_log.py and this module is its Iceberg sibling,
built from the public table spec alone (iceberg.apache.org/spec):

    <table>/metadata/v<N>.metadata.json      table metadata (JSON)
    <table>/metadata/version-hint.text       current metadata pointer
    <table>/metadata/snap-<id>-1-<uuid>.avro manifest list (Avro OCF)
    <table>/metadata/<uuid>-m0.avro          manifest file  (Avro OCF)
    <table>/data/...                         parquet data + delete files

A snapshot is fully determined by metadata: current/chosen snapshot ->
manifest list -> manifests -> data files + positional delete files.
Sequence numbers (v2) order deletes against data: a positional delete
file applies to a data file iff data_sequence_number <= the delete's
sequence number; entries written by the committing snapshot carry
``null`` and inherit the manifest's sequence number, exactly as the
spec's inheritance rules prescribe.

Scale: manifests are metadata — O(data files), not O(rows) — and every
Iceberg reader (iceberg-spark's planner included) materializes manifest
entries to plan the scan, so driver-side decode is the canonical shape.
The DATA path stays fully distributed: the planned file list feeds one
``spark.read.parquet(*files)`` (with ``basePath`` so identity-partition
directories project JVM-side), and positional deletes are applied as a
``_metadata.file_path`` / ``_metadata.row_index`` anti-join — the same
executor-side mechanism as Delta deletion vectors (delta_dv.py), no
driver row traffic.

Pruning: manifest-list partition field summaries prune whole manifests;
per-file partition values and column lower/upper bounds (Iceberg
single-value binary serialization) prune files — ``scan_plan`` reports
both so tests can pin the file-skipping behavior, not just results.

Foreign-feature posture (same as delta_log): anything this engine does
not implement fails LOUDLY at the reader gate — format-version != 2,
non-identity partition transforms, equality deletes, non-parquet data
files — rather than returning wrong rows.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import time
import uuid
from dataclasses import dataclass, field
from datetime import date, datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

from .delta_log import _strip_scheme
from .iceberg_avro import read_avro, write_avro


class IcebergProtocolError(RuntimeError):
    """Unsupported/foreign Iceberg feature — refuse rather than corrupt."""


_EPOCH = date(1970, 1, 1)


# ---------------------------------------------------------------------------
# schema <-> Iceberg type mapping (flat schemas; field ids 1..N in order)
# ---------------------------------------------------------------------------

_TO_ICE: dict[type, str] = {
    ST.BooleanType: "boolean",
    ST.IntegerType: "int",
    ST.LongType: "long",
    ST.FloatType: "float",
    ST.DoubleType: "double",
    ST.StringType: "string",
    ST.DateType: "date",
    ST.BinaryType: "binary",
}


def _spark_to_ice_type(dt: ST.DataType) -> str:
    if isinstance(dt, ST.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, ST.TimestampType):
        return "timestamptz"
    if isinstance(dt, ST.TimestampNTZType):
        return "timestamp"
    ice = _TO_ICE.get(type(dt))
    if ice is None:
        raise IcebergProtocolError(
            f"unsupported Spark type for Iceberg schema: {dt.simpleString()}"
            " (nested/complex columns are out of this engine's scope)"
        )
    return ice


def _ice_to_spark_type(ice: str) -> ST.DataType:
    if ice.startswith("decimal"):
        p, s = ice[ice.index("(") + 1 : ice.index(")")].split(",")
        return ST.DecimalType(int(p), int(s.strip()))
    m = {
        "boolean": ST.BooleanType(),
        "int": ST.IntegerType(),
        "long": ST.LongType(),
        "float": ST.FloatType(),
        "double": ST.DoubleType(),
        "string": ST.StringType(),
        "date": ST.DateType(),
        "binary": ST.BinaryType(),
        "timestamptz": ST.TimestampType(),
        "timestamp": ST.TimestampNTZType(),
    }
    if ice not in m:
        raise IcebergProtocolError(f"unsupported Iceberg type: {ice!r}")
    return m[ice]


def _ice_schema(schema: ST.StructType) -> dict[str, Any]:
    fields = []
    for i, f_ in enumerate(schema.fields, start=1):
        fields.append(
            {
                "id": i,
                "name": f_.name,
                "required": False,
                "type": _spark_to_ice_type(f_.dataType),
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _spark_schema(ice: dict[str, Any]) -> ST.StructType:
    return ST.StructType(
        [
            ST.StructField(f_["name"], _ice_to_spark_type(f_["type"]), True)
            for f_ in ice["fields"]
        ]
    )


# ---------------------------------------------------------------------------
# Iceberg single-value binary serialization (bound values; spec appendix D)
# ---------------------------------------------------------------------------


def _ser_bound(ice_type: str, v: Any) -> bytes | None:
    if v is None:
        return None
    if ice_type == "int":
        return struct.pack("<i", int(v))
    if ice_type == "long":
        return struct.pack("<q", int(v))
    if ice_type == "float":
        return struct.pack("<f", float(v))
    if ice_type == "double":
        return struct.pack("<d", float(v))
    if ice_type == "string":
        return str(v).encode("utf-8")
    if ice_type == "boolean":
        return b"\x01" if v else b"\x00"
    if ice_type == "date":
        d = v if isinstance(v, date) else date.fromisoformat(str(v))
        return struct.pack("<i", (d - _EPOCH).days)
    if ice_type in ("timestamp", "timestamptz"):
        if isinstance(v, datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=timezone.utc)
            return struct.pack("<q", int(v.timestamp() * 1_000_000))
        return None
    return None  # decimal/binary bounds: omitted (optional per spec)


def _deser_bound(ice_type: str, b: bytes | None) -> Any:
    if b is None:
        return None
    if ice_type == "int":
        return struct.unpack("<i", b)[0]
    if ice_type == "long":
        return struct.unpack("<q", b)[0]
    if ice_type == "float":
        return struct.unpack("<f", b)[0]
    if ice_type == "double":
        return struct.unpack("<d", b)[0]
    if ice_type == "string":
        return b.decode("utf-8")
    if ice_type == "boolean":
        return b != b"\x00"
    if ice_type == "date":
        return _EPOCH.fromordinal(_EPOCH.toordinal() + struct.unpack("<i", b)[0])
    return None


# ---------------------------------------------------------------------------
# Avro schemas for manifests and manifest lists (spec field ids)
# ---------------------------------------------------------------------------


def _opt(name: str, typ: Any, fid: int) -> dict[str, Any]:
    return {"name": name, "type": ["null", typ], "default": None, "field-id": fid}


def _req(name: str, typ: Any, fid: int) -> dict[str, Any]:
    return {"name": name, "type": typ, "field-id": fid}


def _ibytes_map(name: str, fid: int, kv_name: str) -> dict[str, Any]:
    """Iceberg's array-based logical map<int, bytes> for column bounds."""
    return _opt(
        name,
        {
            "type": "array",
            "logicalType": "map",
            "items": {
                "type": "record",
                "name": kv_name,
                "fields": [
                    _req("key", "int", 117),
                    _req("value", "bytes", 118),
                ],
            },
        },
        fid,
    )


def _partition_avro(spec_fields: list[dict], ice_fields: dict[int, str]) -> dict:
    """Avro record for the data_file.partition struct (r102)."""
    fields = []
    for pf in spec_fields:
        src = ice_fields[pf["source-id"]]
        ice_t = src
        avro_t = {
            "int": "int",
            "long": "long",
            "string": "string",
            "date": {"type": "int", "logicalType": "date"},
            "boolean": "boolean",
            "double": "double",
            "float": "float",
        }.get(ice_t)
        if avro_t is None:
            raise IcebergProtocolError(
                f"unsupported partition source type {ice_t!r}"
            )
        fields.append(_opt(pf["name"], avro_t, pf["field-id"]))
    return {"type": "record", "name": "r102", "fields": fields}


def _manifest_entry_schema(partition_schema: dict) -> dict[str, Any]:
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            _req("content", "int", 134),
            _req("file_path", "string", 100),
            _req("file_format", "string", 101),
            _req("partition", partition_schema, 102),
            _req("record_count", "long", 103),
            _req("file_size_in_bytes", "long", 104),
            _ibytes_map("lower_bounds", 125, "k117_v118"),
            _ibytes_map("upper_bounds", 128, "k126_v127"),
            _opt("split_offsets", {"type": "array", "items": "long"}, 132),
            _opt("sort_order_id", "int", 140),
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            _req("status", "int", 0),
            _opt("snapshot_id", "long", 1),
            _opt("sequence_number", "long", 3),
            _opt("file_sequence_number", "long", 4),
            _req("data_file", data_file, 2),
        ],
    }


_FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        _req("contains_null", "boolean", 509),
        _opt("contains_nan", "boolean", 518),
        _opt("lower_bound", "bytes", 510),
        _opt("upper_bound", "bytes", 511),
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        _req("manifest_path", "string", 500),
        _req("manifest_length", "long", 501),
        _req("partition_spec_id", "int", 502),
        _req("content", "int", 517),
        _req("sequence_number", "long", 515),
        _req("min_sequence_number", "long", 516),
        _req("added_snapshot_id", "long", 503),
        _req("added_files_count", "int", 504),
        _req("existing_files_count", "int", 505),
        _req("deleted_files_count", "int", 506),
        _req("added_rows_count", "long", 512),
        _req("existing_rows_count", "long", 513),
        _req("deleted_rows_count", "long", 514),
        _opt("partitions", {"type": "array", "items": _FIELD_SUMMARY}, 507),
    ],
}


# ---------------------------------------------------------------------------
# table metadata
# ---------------------------------------------------------------------------


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _hint_path(path: str) -> str:
    return os.path.join(_meta_dir(path), "version-hint.text")


def current_metadata(path: str) -> dict[str, Any]:
    hint = _hint_path(path)
    if not os.path.exists(hint):
        raise IcebergProtocolError(f"not an Iceberg table (no version hint): {path}")
    with open(hint) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(_meta_dir(path), f"v{n}.metadata.json")) as fh:
        meta = json.load(fh)
    if meta.get("format-version") != 2:
        raise IcebergProtocolError(
            f"unsupported Iceberg format-version {meta.get('format-version')!r}"
            " (this engine implements v2)"
        )
    return meta


def _check_spec(meta: dict[str, Any]) -> list[dict]:
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    spec = specs[meta["default-spec-id"]]
    for pf in spec["fields"]:
        if pf["transform"] not in ("identity", "void"):
            raise IcebergProtocolError(
                f"unsupported partition transform {pf['transform']!r}"
                " (identity only)"
            )
    return [pf for pf in spec["fields"] if pf["transform"] == "identity"]


@dataclass
class IcebergScan:
    """Planned scan: live data files + deletes after pruning."""

    snapshot_id: int
    sequence_number: int
    schema: ST.StructType
    partition_cols: list[str]
    data_files: list[dict[str, Any]] = field(default_factory=list)
    delete_files: list[dict[str, Any]] = field(default_factory=list)
    manifests_total: int = 0
    manifests_pruned: int = 0
    files_total: int = 0
    files_pruned: int = 0


def _select_snapshot(
    meta: dict[str, Any], snapshot_id: int | None, as_of_ms: int | None
) -> dict[str, Any]:
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snapshot_id is not None:
        if snapshot_id not in snaps:
            raise IcebergProtocolError(f"unknown snapshot-id {snapshot_id}")
        return snaps[snapshot_id]
    if as_of_ms is not None:
        live = [
            e
            for e in meta.get("snapshot-log", [])
            if e["timestamp-ms"] <= as_of_ms
        ]
        if not live:
            raise IcebergProtocolError(
                f"no snapshot at or before timestamp {as_of_ms}"
            )
        return snaps[live[-1]["snapshot-id"]]
    cur = meta.get("current-snapshot-id")
    if cur is None or cur == -1:
        raise IcebergProtocolError("table has no current snapshot")
    return snaps[cur]


# --- pruning ---------------------------------------------------------------


def _cmp_prune(op: str, lo: Any, hi: Any, lit: Any) -> bool:
    """True iff a file/manifest whose value range is [lo, hi] can be
    SKIPPED for predicate ``col <op> lit``. Missing bounds => keep."""
    if op in (">", ">="):
        return hi is not None and (hi < lit or (op == ">" and hi == lit))
    if op in ("<", "<="):
        return lo is not None and (lo > lit or (op == "<" and lo == lit))
    if op == "=":
        return (lo is not None and lo > lit) or (hi is not None and hi < lit)
    raise IcebergProtocolError(f"unsupported prune op {op!r}")


def scan_plan(
    path: str,
    *,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    prune: list[tuple[str, str, Any]] | None = None,
) -> IcebergScan:
    """Plan a snapshot scan: manifest-list -> manifests -> files, with
    manifest-level (partition field summaries) and file-level (partition
    values + column bounds) pruning for ``prune`` conjuncts
    [(column, op, literal)], op in <, <=, >, >=, =."""
    meta = current_metadata(path)
    spec_fields = _check_spec(meta)
    schemas = {s["schema-id"]: s for s in meta["schemas"]}
    ice = schemas[meta["current-schema-id"]]
    ice_by_id = {f_["id"]: f_ for f_ in ice["fields"]}
    name_to_id = {f_["name"]: f_["id"] for f_ in ice["fields"]}
    part_by_name = {
        pf["name"]: pf for pf in spec_fields
    }  # identity: partition name == source column name
    snap = _select_snapshot(meta, snapshot_id, as_of_ms)
    scan = IcebergScan(
        snapshot_id=snap["snapshot-id"],
        sequence_number=snap["sequence-number"],
        schema=_spark_schema(ice),
        partition_cols=[pf["name"] for pf in spec_fields],
    )
    prune = prune or []

    _, _, mf_entries = read_avro(snap["manifest-list"])
    for mf in mf_entries:
        scan.manifests_total += 1
        # manifest-level pruning from partition field summaries
        skip = False
        summaries = mf.get("partitions") or []
        for (col, op, lit) in prune:
            pf = part_by_name.get(col)
            if pf is None:
                continue
            idx = next(
                (i for i, s in enumerate(spec_fields) if s["name"] == col), None
            )
            if idx is None or idx >= len(summaries):
                continue
            s = summaries[idx]
            ice_t = ice_by_id[pf["source-id"]]["type"]
            lo = _deser_bound(ice_t, s.get("lower_bound"))
            hi = _deser_bound(ice_t, s.get("upper_bound"))
            if _cmp_prune(op, lo, hi, lit):
                skip = True
                break
        if skip and mf["content"] == 0:
            scan.manifests_pruned += 1
            continue

        _, mmeta, entries = read_avro(mf["manifest_path"])
        if mmeta.get("content", b"data").decode() == "deletes" or mf["content"] == 1:
            for e in entries:
                if e["status"] == 2:
                    continue
                df_ = e["data_file"]
                if df_["content"] == 2:
                    raise IcebergProtocolError(
                        "equality deletes are not supported by this engine"
                    )
                seq = e["sequence_number"]
                df_["_seq"] = mf["sequence_number"] if seq is None else seq
                scan.delete_files.append(df_)
            continue
        for e in entries:
            if e["status"] == 2:  # DELETED entry: file left the snapshot
                continue
            df_ = e["data_file"]
            if df_["file_format"].upper() != "PARQUET":
                raise IcebergProtocolError(
                    f"unsupported file format {df_['file_format']!r}"
                )
            scan.files_total += 1
            seq = e["sequence_number"]
            df_["_seq"] = mf["sequence_number"] if seq is None else seq
            # file-level pruning: identity partition values, then bounds
            skip = False
            lbs = {kv["key"]: kv["value"] for kv in (df_.get("lower_bounds") or [])}
            ubs = {kv["key"]: kv["value"] for kv in (df_.get("upper_bounds") or [])}
            for (col, op, lit) in prune:
                if col in part_by_name:
                    pv = df_["partition"].get(col)
                    if pv is not None and _cmp_prune(op, pv, pv, lit):
                        skip = True
                        break
                fid = name_to_id.get(col)
                if fid is None:
                    continue
                ice_t = ice_by_id[fid]["type"]
                lo = _deser_bound(ice_t, lbs.get(fid))
                hi = _deser_bound(ice_t, ubs.get(fid))
                if _cmp_prune(op, lo, hi, lit):
                    skip = True
                    break
            if skip:
                scan.files_pruned += 1
                continue
            scan.data_files.append(df_)
    return scan


# ---------------------------------------------------------------------------
# read path
# ---------------------------------------------------------------------------


def _local(p: str) -> str:
    return p[len("file://") :] if p.startswith("file://") else p


def read_iceberg(
    spark: SparkSession,
    path: str,
    *,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    prune: list[tuple[str, str, Any]] | None = None,
    _scan: IcebergScan | None = None,
) -> DataFrame:
    """Read an Iceberg v2 table snapshot as a DataFrame (time travel via
    ``snapshot_id`` or ``as_of_ms``; optional scan pruning)."""
    scan = _scan or scan_plan(
        path, snapshot_id=snapshot_id, as_of_ms=as_of_ms, prune=prune
    )
    full = scan.schema
    if not scan.data_files:
        return spark.createDataFrame([], full)
    files = [_local(f_["file_path"]) for f_ in scan.data_files]
    file_schema = ST.StructType(
        [f_ for f_ in full.fields if f_.name not in scan.partition_cols]
    )
    reader = spark.read.schema(file_schema)
    if scan.partition_cols:
        reader = reader.option("basePath", os.path.join(path, "data"))
    df = reader.parquet(*files)

    if scan.delete_files:
        # positional deletes: (file_path, pos) anti-join on file metadata
        # columns, executor-side — the Delta DV mechanism (delta_dv.py).
        # A delete applies iff data_sequence_number <= delete sequence
        # number; data seqs ride a broadcast O(files) dim.
        del_paths = [_local(f_["file_path"]) for f_ in scan.delete_files]
        dseq = {}
        for f_ in scan.delete_files:
            p = _local(f_["file_path"])
            dseq[p] = max(dseq.get(p, 0), f_["_seq"])
        ddf = (
            spark.read.parquet(*del_paths)
            .withColumn("__dpath", _strip_scheme(F.col("_metadata.file_path")))
            .withColumn(
                "__dseq",
                F.coalesce(
                    *[
                        F.when(F.col("__dpath") == p, F.lit(s))
                        for p, s in dseq.items()
                    ]
                )
                if len(dseq) <= 64
                else F.lit(max(dseq.values())),
            )
            .select(
                _strip_scheme(F.col("file_path")).alias("__tgt"),
                F.col("pos").alias("__pos"),
                "__dseq",
            )
        )
        fseq = [
            (_local(f_["file_path"]), int(f_["_seq"])) for f_ in scan.data_files
        ]
        from .delta_log import _local_df

        seq_dim = _local_df(spark, fseq, "__fpath string, __fseq bigint")
        df = (
            df.withColumn("__fpath", _strip_scheme(F.col("_metadata.file_path")))
            .withColumn("__ridx", F.col("_metadata.row_index"))
            .join(F.broadcast(seq_dim), "__fpath", "left")
            .join(
                ddf,
                (F.col("__fpath") == F.col("__tgt"))
                & (F.col("__ridx") == F.col("__pos"))
                & (F.col("__fseq") <= F.col("__dseq")),
                "left_anti",
            )
            .drop("__fpath", "__ridx", "__fseq")
        )
    out = df
    if prune:
        for (col, op, lit) in prune:
            expr = {"<": "<", "<=": "<=", ">": ">", ">=": ">=", "=": "="}[op]
            out = out.filter(F.expr(f"`{col}` {expr} {lit!r}"))
    return out.select(
        *[F.col(f_.name).cast(f_.dataType) for f_ in full.fields]
    )


def table_history(path: str) -> list[dict[str, Any]]:
    """snapshot-log entries (timestamp-ms, snapshot-id) oldest-first."""
    return list(current_metadata(path).get("snapshot-log", []))


# ---------------------------------------------------------------------------
# write path
# ---------------------------------------------------------------------------


def _pv_from_dir(raw: str, dt: ST.DataType) -> Any:
    from urllib.parse import unquote

    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    raw = unquote(raw)
    if isinstance(dt, (ST.IntegerType, ST.LongType)):
        return int(raw)
    if isinstance(dt, ST.DoubleType):
        return float(raw)
    if isinstance(dt, ST.BooleanType):
        return raw.lower() == "true"
    if isinstance(dt, ST.DateType):
        return (date.fromisoformat(raw) - _EPOCH).days
    return raw


def _collect_parquet_stats(
    fpath: str, file_schema: ST.StructType, ice_fields: list[dict]
) -> tuple[int, list[dict], list[dict]]:
    """(record_count, lower_bounds, upper_bounds) from parquet footers —
    metadata-only reads via pyarrow, no row IO."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fpath).metadata
    by_name = {f_["name"]: f_ for f_ in ice_fields}
    lows: dict[int, Any] = {}
    highs: dict[int, Any] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            st_ = c.statistics
            if st_ is None or not st_.has_min_max or name not in by_name:
                continue
            fid = by_name[name]["id"]
            mn, mx = st_.min, st_.max
            lows[fid] = mn if fid not in lows or mn < lows[fid] else lows[fid]
            highs[fid] = mx if fid not in highs or mx > highs[fid] else highs[fid]
    lb, ub = [], []
    for fid, v in sorted(lows.items()):
        b = _ser_bound(by_name_id(ice_fields, fid)["type"], v)
        if b is not None:
            lb.append({"key": fid, "value": b})
    for fid, v in sorted(highs.items()):
        b = _ser_bound(by_name_id(ice_fields, fid)["type"], v)
        if b is not None:
            ub.append({"key": fid, "value": b})
    return md.num_rows, lb, ub


def by_name_id(ice_fields: list[dict], fid: int) -> dict:
    return next(f_ for f_ in ice_fields if f_["id"] == fid)


def _write_data_files(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: list[str],
    ice: dict[str, Any],
) -> list[dict[str, Any]]:
    """Write df as parquet under <table>/data and return data_file
    structs (path, partition tuple, record count, size, bounds)."""
    from .. import scratch

    staging = scratch.scratch_dir("mm_ice_stage_")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)

    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    dtypes = {f_.name: f_.dataType for f_ in df.schema.fields}
    file_schema = ST.StructType(
        [f_ for f_ in df.schema.fields if f_.name not in partition_by]
    )
    out: list[dict[str, Any]] = []
    for root, _dirs, fnames in os.walk(staging):
        for fn in sorted(fnames):
            if not fn.endswith(".parquet"):
                continue
            rel = os.path.relpath(root, staging)
            # partition values from hive-style dir components
            pvals: dict[str, Any] = {}
            if rel != ".":
                for comp in rel.split(os.sep):
                    k, _, v = comp.partition("=")
                    pvals[k] = _pv_from_dir(v, dtypes[k])
            tgt_dir = data_dir if rel == "." else os.path.join(data_dir, rel)
            os.makedirs(tgt_dir, exist_ok=True)
            tgt = os.path.join(tgt_dir, f"{uuid.uuid4().hex}.parquet")
            shutil.move(os.path.join(root, fn), tgt)
            nrows, lb, ub = _collect_parquet_stats(
                tgt, file_schema, ice["fields"]
            )
            out.append(
                {
                    "content": 0,
                    "file_path": f"file://{tgt}",
                    "file_format": "PARQUET",
                    "partition": pvals,
                    "record_count": nrows,
                    "file_size_in_bytes": os.path.getsize(tgt),
                    "lower_bounds": lb or None,
                    "upper_bounds": ub or None,
                    "split_offsets": None,
                    "sort_order_id": None,
                }
            )
    return out


def _write_manifest(
    path: str,
    files: list[dict[str, Any]],
    ice: dict[str, Any],
    spec_fields: list[dict],
    snapshot_id: int,
    *,
    content: str = "data",
) -> dict[str, Any]:
    """Write one manifest (all entries ADDED, sequence inherited) and
    return its manifest_file (manifest-list entry) with the sequence
    number fields left for the committer to fill."""
    ice_by_id = {f_["id"]: f_["type"] for f_ in ice["fields"]}
    pschema = _partition_avro(spec_fields, ice_by_id)
    entry_schema = _manifest_entry_schema(pschema)
    os.makedirs(_meta_dir(path), exist_ok=True)
    mpath = os.path.join(_meta_dir(path), f"{uuid.uuid4().hex}-m0.avro")
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": None,  # inherit from manifest list
            "file_sequence_number": None,
            "data_file": f_,
        }
        for f_ in files
    ]
    write_avro(
        mpath,
        entry_schema,
        entries,
        metadata={
            "schema": json.dumps(ice),
            "partition-spec": json.dumps(spec_fields),
            "partition-spec-id": "0",
            "format-version": "2",
            "content": content,
        },
    )
    # partition field summaries for manifest-level pruning
    summaries = []
    for pf in spec_fields:
        vals = [f_["partition"].get(pf["name"]) for f_ in files]
        nn = [v for v in vals if v is not None]
        ice_t = ice_by_id[pf["source-id"]]
        summaries.append(
            {
                "contains_null": any(v is None for v in vals),
                "contains_nan": None,
                "lower_bound": _ser_bound(ice_t, min(nn)) if nn else None,
                "upper_bound": _ser_bound(ice_t, max(nn)) if nn else None,
            }
        )
    nrows = sum(f_["record_count"] for f_ in files)
    return {
        "manifest_path": mpath,
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0,
        "content": 0 if content == "data" else 1,
        "sequence_number": -1,  # committer fills
        "min_sequence_number": -1,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": nrows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": summaries or None,
    }


def _commit(
    path: str,
    meta: dict[str, Any] | None,
    new_manifests: list[dict[str, Any]],
    operation: str,
    schema: ST.StructType | None = None,
    partition_by: list[str] | None = None,
    carry_manifests: list[dict[str, Any]] | None = None,
) -> dict[str, Any]:
    """Author the next snapshot + metadata.json (HadoopTables layout)."""
    now_ms = int(time.time() * 1000)
    mdir = _meta_dir(path)
    os.makedirs(mdir, exist_ok=True)
    if meta is None:
        ice = _ice_schema(schema)
        by_name = {f_["name"]: f_["id"] for f_ in ice["fields"]}
        spec_fields = [
            {
                "name": c,
                "transform": "identity",
                "source-id": by_name[c],
                "field-id": 1000 + i,
            }
            for i, c in enumerate(partition_by or [])
        ]
        meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": f"file://{path}",
            "last-sequence-number": 0,
            "last-updated-ms": now_ms,
            "last-column-id": len(ice["fields"]),
            "current-schema-id": 0,
            "schemas": [ice],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 999 + len(spec_fields),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {},
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
            "refs": {},
        }
        version = 0
    else:
        with open(_hint_path(path)) as fh:
            version = int(fh.read().strip())

    seq = meta["last-sequence-number"] + 1
    snap_id = now_ms * 1000 + len(meta["snapshots"])  # unique, monotonic
    for mf in new_manifests:
        mf["sequence_number"] = seq
        mf["min_sequence_number"] = seq
        mf["added_snapshot_id"] = snap_id
    all_manifests = list(carry_manifests or []) + new_manifests
    ml_path = os.path.join(
        mdir, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro"
    )
    write_avro(
        ml_path,
        _MANIFEST_FILE_SCHEMA,
        all_manifests,
        metadata={"format-version": "2"},
    )
    parent = meta.get("current-snapshot-id")
    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": ml_path,
        "summary": {"operation": operation},
        "schema-id": meta["current-schema-id"],
    }
    if parent is not None and parent != -1:
        snapshot["parent-snapshot-id"] = parent
    meta["snapshots"].append(snapshot)
    meta["snapshot-log"].append(
        {"timestamp-ms": now_ms, "snapshot-id": snap_id}
    )
    meta["current-snapshot-id"] = snap_id
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms

    new_version = version + 1
    mfile = os.path.join(mdir, f"v{new_version}.metadata.json")
    tmp = f"{mfile}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, mfile)
    with open(_hint_path(path), "w") as fh:
        fh.write(str(new_version))
    return meta


def write_iceberg(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Create (overwrite) or append to an Iceberg v2 table with identity
    partitioning."""
    partition_by = partition_by or []
    if mode == "overwrite":
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path)
        meta = None
        ice = _ice_schema(df.schema)
        by_name = {f_["name"]: f_["id"] for f_ in ice["fields"]}
        spec_fields = [
            {
                "name": c,
                "transform": "identity",
                "source-id": by_name[c],
                "field-id": 1000 + i,
            }
            for i, c in enumerate(partition_by)
        ]
        carry: list[dict[str, Any]] = []
        op = "append"
    elif mode == "append":
        meta = current_metadata(path)
        spec_fields = _check_spec(meta)
        ice = {s["schema-id"]: s for s in meta["schemas"]}[
            meta["current-schema-id"]
        ]
        partition_by = [pf["name"] for pf in spec_fields]
        snap = _select_snapshot(meta, None, None)
        _, _, carry = read_avro(snap["manifest-list"])
        op = "append"
    else:
        raise IcebergProtocolError(f"unsupported write mode {mode!r}")

    files = _write_data_files(spark, df, path, partition_by, ice)
    # snapshot id is assigned inside _commit; manifest entries carry it
    # redundantly (informational) — use a placeholder then let inheritance
    # rules drive sequence numbers.
    manifest = _write_manifest(path, files, ice, spec_fields, -1)
    _commit(
        path,
        meta,
        [manifest],
        op,
        schema=df.schema,
        partition_by=partition_by,
        carry_manifests=carry,
    )


def delete_where_iceberg(
    spark: SparkSession, path: str, predicate: str
) -> int:
    """Merge-on-read DELETE: write positional delete files for rows
    matching ``predicate`` (v2 position deletes: file_path, pos —
    sorted, as the spec requires) and commit a delete snapshot. Returns
    the number of deleted positions."""
    meta = current_metadata(path)
    spec_fields = _check_spec(meta)
    ice = {s["schema-id"]: s for s in meta["schemas"]}[
        meta["current-schema-id"]
    ]
    scan = scan_plan(path)
    df = read_iceberg(spark, path, _scan=scan)
    # positions come from the raw (pre-delete) file read: re-read with
    # metadata columns, apply EXISTING deletes first so a row already
    # deleted is not re-deleted, then filter the predicate.
    files = [_local(f_["file_path"]) for f_ in scan.data_files]
    file_schema = ST.StructType(
        [
            f_
            for f_ in scan.schema.fields
            if f_.name not in scan.partition_cols
        ]
    )
    reader = spark.read.schema(file_schema)
    if scan.partition_cols:
        reader = reader.option("basePath", os.path.join(path, "data"))
    raw = reader.parquet(*files).select(
        "*",
        _strip_scheme(F.col("_metadata.file_path")).alias("__fpath"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    for f_ in scan.schema.fields:  # identity partition cols via basePath
        if f_.name in scan.partition_cols:
            raw = raw.withColumn(f_.name, F.col(f_.name).cast(f_.dataType))
    if scan.delete_files:
        # exclude rows an earlier delete snapshot already removed so the
        # new delete file holds only net-new positions
        prior = spark.read.parquet(
            *[_local(f_["file_path"]) for f_ in scan.delete_files]
        ).select(
            _strip_scheme(F.col("file_path")).alias("__fpath"),
            F.col("pos").alias("__pos"),
        )
        raw = raw.join(prior, ["__fpath", "__pos"], "left_anti")
    matched = (
        raw.filter(predicate)
        .select(
            F.concat(F.lit("file://"), F.col("__fpath")).alias("file_path"),
            F.col("__pos").alias("pos"),
        )
        .orderBy("file_path", "pos")
    )
    n = matched.count()
    if n == 0:
        return 0
    from .. import scratch

    staging = scratch.scratch_dir("mm_ice_del_")
    matched.coalesce(1).write.mode("overwrite").parquet(staging)
    data_dir = os.path.join(path, "data")
    out_files: list[dict[str, Any]] = []
    for fn in sorted(os.listdir(staging)):
        if not fn.endswith(".parquet"):
            continue
        tgt = os.path.join(data_dir, f"{uuid.uuid4().hex}-deletes.parquet")
        shutil.move(os.path.join(staging, fn), tgt)
        out_files.append(
            {
                "content": 1,  # position deletes
                "file_path": f"file://{tgt}",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(tgt),
                "lower_bounds": None,
                "upper_bounds": None,
                "split_offsets": None,
                "sort_order_id": None,
            }
        )
    # delete files are partition-unscoped (path-scoped): spec field list
    # for the delete manifest is the table spec but values are null —
    # write with empty partition struct by reusing the spec (values {}).
    manifest = _write_manifest(
        path, out_files, ice, spec_fields, -1, content="deletes"
    )
    snap = _select_snapshot(meta, None, None)
    _, _, carry = read_avro(snap["manifest-list"])
    _commit(path, meta, [manifest], "delete", carry_manifests=carry)
    return n
