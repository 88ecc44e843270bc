"""Pure-Python Delta Lake transaction-log reader (+ minimal writer).

The reference persists every table as Delta
(`.format("delta")` on all writes, e.g. 1_customer_data_processing.py:50-53)
and delta-spark cannot be installed in this container (SCALE.md), so
S6's real-Delta execution stays environment-gated. This module closes
the READ side from public knowledge alone: the Delta transaction-log
protocol is an open spec (delta.io `PROTOCOL.md`), and a snapshot is
fully determined by metadata:

    <table>/_delta_log/00000000000000000000.json      newline-delimited
    <table>/_delta_log/<v>.checkpoint.parquet         consolidated state
    <table>/_delta_log/_last_checkpoint               pointer {version,...}

Each JSON line holds ONE action object: ``add`` (file enters the
snapshot), ``remove`` (file leaves), ``metaData`` (schema/partitioning),
``protocol`` (reader/writer feature gates), ``commitInfo``/``txn``
(informational). Snapshot-at-version-V = latest checkpoint <= V, then
replay JSON commits (checkpoint_version, V] in order; per path the last
add/remove wins.

Scale: the log is metadata-sized — O(files), not O(rows) — and every
Delta reader (including delta-spark's own Snapshot) materializes the
file list to plan the scan, so driver-side parsing here is the
canonical shape, not a shortcut. The DATA path stays fully distributed:
the reconstructed file list feeds one `spark.read.parquet(*files)` with
``basePath`` so hive-style partition directories prune/project JVM-side
exactly as a native Delta scan would.

The writer half (`write_delta`) is the minimal single-writer protocol
subset — parquet files + authored JSON commits, no checkpointing locks,
no concurrent-writer conflict detection (that needs a LogStore with
atomic put-if-absent; documented out of scope). It exists so the engine
can produce protocol-valid tables other engines can read, and so the
reader has genuine round-trip coverage without delta-spark.

Reader compatibility: protocol minReaderVersion 1 and 2 are accepted
(2 adds column-mapping support gates; we accept only tables whose
metadata does NOT enable column mapping). Version 3+ (readerFeatures,
e.g. deletion vectors, v2 checkpoints) raises a clear error instead of
returning wrong rows.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

LOG_DIR = "_delta_log"


class DeltaProtocolError(RuntimeError):
    """Table requires reader features this implementation doesn't have."""


@dataclass
class DeltaSnapshot:
    """Reconstructed table state at one version."""

    version: int
    schema: StructType
    partition_columns: list[str]
    #: add-action dicts keyed by (decoded) relative path
    files: dict[str, dict[str, Any]] = field(default_factory=dict)
    configuration: dict[str, str] = field(default_factory=dict)
    #: streaming-writer watermarks: appId -> highest committed version
    #: (the protocol's `txn` action — Delta's idempotent-sink mechanism)
    txns: dict[str, int] = field(default_factory=dict)


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, LOG_DIR)


def _commit_file(table_path: str, version: int) -> str:
    return os.path.join(_log_path(table_path), f"{version:020d}.json")


def _list_versions(table_path: str) -> tuple[list[int], dict[int, list[str]]]:
    """Commit versions present as JSON, and checkpoint version -> its
    parquet part files (one for single-part checkpoints; the complete
    ``<v>.checkpoint.<i>.<n>.parquet`` set for multi-part ones, which
    other engines write for large tables — an incomplete set raises
    rather than silently reading half the state)."""
    commits: list[int] = []
    checkpoints: dict[int, list[str]] = {}
    multi: dict[int, dict[int, tuple[int, str]]] = {}
    log_dir = _log_path(table_path)
    for name in os.listdir(log_dir):
        if name.endswith(".json") and name[:20].isdigit():
            commits.append(int(name[:20]))
        elif name.endswith(".checkpoint.parquet") and name[:20].isdigit():
            checkpoints[int(name[:20])] = [os.path.join(log_dir, name)]
        elif ".checkpoint." in name and name.endswith(".parquet"):
            # <version>.checkpoint.<part>.<n_parts>.parquet
            bits = name.split(".")
            if len(bits) == 5 and bits[0].isdigit() and bits[2].isdigit():
                multi.setdefault(int(bits[0]), {})[int(bits[2])] = (
                    int(bits[3]),
                    os.path.join(log_dir, name),
                )
            else:
                raise DeltaProtocolError(f"unrecognized checkpoint {name!r}")
    for v, parts in multi.items():
        n_parts = next(iter(parts.values()))[0]
        if sorted(parts) != list(range(1, n_parts + 1)):
            raise DeltaProtocolError(
                f"multi-part checkpoint v{v} incomplete: have parts "
                f"{sorted(parts)} of {n_parts}"
            )
        checkpoints[v] = [p for _, (_, p) in sorted(parts.items())]
    return sorted(commits), checkpoints


def _check_protocol(action: dict[str, Any]) -> None:
    v = int(action.get("minReaderVersion", 1))
    if v >= 3 or action.get("readerFeatures"):
        raise DeltaProtocolError(
            f"table requires reader version {v} features "
            f"{action.get('readerFeatures')}; this reader supports "
            "minReaderVersion <= 2 without column mapping"
        )


def _apply_action(snap: DeltaSnapshot, action: dict[str, Any]) -> None:
    if "add" in action:
        a = action["add"]
        snap.files[unquote(a["path"])] = a
    elif "remove" in action:
        snap.files.pop(unquote(action["remove"]["path"]), None)
    elif "metaData" in action:
        m = action["metaData"]
        conf = dict(m.get("configuration") or {})
        if conf.get("delta.columnMapping.mode", "none") != "none":
            raise DeltaProtocolError("column mapping not supported")
        snap.schema = StructType.fromJson(json.loads(m["schemaString"]))
        snap.partition_columns = list(m.get("partitionColumns") or [])
        snap.configuration = conf
    elif "protocol" in action:
        _check_protocol(action["protocol"])
    elif "txn" in action:
        t = action["txn"]
        prev = snap.txns.get(t["appId"], -1)
        snap.txns[t["appId"]] = max(prev, int(t["version"]))


def _read_checkpoint(
    spark: SparkSession, snap: DeltaSnapshot, ckpt_files: list[str]
) -> None:
    """Fold a checkpoint (one action per row, struct columns
    add/remove/metaData/protocol; one or many parquet parts) into the
    snapshot. Read JVM-side, collected as JSON rows — checkpoint size
    is O(live files)."""
    df = spark.read.option("mergeSchema", "true").parquet(*ckpt_files)
    for col in ("protocol", "metaData", "add", "remove", "txn"):
        if col not in df.columns:
            continue
        probe = (
            f"{col}.path" if col in ("add", "remove")
            else f"{col}.appId" if col == "txn"
            else col
        )
        rows = (
            df.filter(F.col(probe).isNotNull())
            .select(F.to_json(col).alias("j"))
            .collect()
        )
        for row in rows:
            _apply_action(snap, {col: json.loads(row.j)})


def snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DeltaSnapshot:
    """Reconstruct the table state at ``version`` (default: latest)."""
    commits, checkpoints = _list_versions(table_path)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"no Delta log at {_log_path(table_path)}")
    latest = max(commits + list(checkpoints))
    target = latest if version is None else version
    if version is not None and version not in set(commits) | set(checkpoints):
        raise ValueError(
            f"version {version} not in log (have commits {commits})"
        )

    snap = DeltaSnapshot(version=target, schema=StructType([]), partition_columns=[])
    start = 0
    usable_ckpts = [v for v in checkpoints if v <= target]
    if usable_ckpts:
        ckpt_v = max(usable_ckpts)
        _read_checkpoint(spark, snap, checkpoints[ckpt_v])
        start = ckpt_v + 1
    for v in range(start, target + 1):
        path = _commit_file(table_path, v)
        if not os.path.exists(path):
            if v in checkpoints:  # state already folded in
                continue
            raise FileNotFoundError(
                f"missing commit {v} (log truncated past last checkpoint?)"
            )
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _apply_action(snap, json.loads(line))
    if not snap.schema.fields:
        raise DeltaProtocolError("no metaData action found in log")
    return snap


def read_delta(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Scan a Delta table via its transaction log — S6/time-travel read
    parity without delta-spark.

    The scan itself is a plain distributed parquet read over exactly the
    snapshot's live files; ``basePath`` recovers hive-style partition
    columns so partition pruning/projection happen in the JVM scan node.
    An empty snapshot returns an empty frame with the table schema.
    """
    snap = snapshot(spark, table_path, version)
    if not snap.files:
        return spark.createDataFrame([], snap.schema)
    paths = [os.path.join(table_path, p) for p in snap.files]
    # mergeSchema: files written before a column was added lack it; the
    # unified read schema fills NULLs, then the committed schema pins
    # column order/presence
    reader = spark.read.option("mergeSchema", "true")
    if snap.partition_columns:
        reader = reader.option("basePath", table_path)
    df = reader.parquet(*paths)
    missing = [f for f in snap.schema.fields if f.name not in df.columns]
    for f in missing:  # every live file predates the column
        df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df.select(*[F.col(f.name) for f in snap.schema.fields])


# --------------------------------------------------------------------------
# minimal single-writer protocol subset
# --------------------------------------------------------------------------


def _schema_json(df: DataFrame) -> str:
    return df.schema.json()


def _partition_values_from_path(rel_path: str, partition_columns: list[str]) -> dict:
    vals: dict[str, str] = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            if k in partition_columns:
                vals[k] = unquote(v)
    return vals


def _list_data_files(table_path: str, known: set[str]) -> list[str]:
    """Relative paths of parquet data files not already in ``known``."""
    out = []
    for root, dirs, names in os.walk(table_path):
        if LOG_DIR in root.split(os.sep):
            continue
        dirs[:] = [d for d in dirs if d != LOG_DIR]
        for n in names:
            if n.endswith(".parquet") and not n.startswith("."):
                rel = os.path.relpath(os.path.join(root, n), table_path)
                if rel not in known:
                    out.append(rel)
    return sorted(out)


def write_delta(
    df: DataFrame,
    table_path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Write ``df`` as a protocol-valid Delta commit; returns the version.

    Single-writer only: commits are authored with plain file creation,
    no atomic put-if-absent LogStore, so concurrent writers can clobber
    each other — the documented gap real delta-spark closes. Data files
    are written by Spark's distributed parquet sink (hive-style dirs
    when partitioned); only the metadata-sized commit JSON is authored
    driver-side.

    ``txn=(app_id, version)`` stamps the commit with the protocol's
    ``txn`` action — Delta's idempotent-streaming-sink mechanism: a
    restarted writer consults ``last_txn_version`` and skips batches it
    already committed, giving exactly-once table contents over
    at-least-once batch delivery.
    """
    partition_by = list(partition_by or [])
    spark = df.sparkSession
    os.makedirs(_log_path(table_path), exist_ok=True)
    commits, checkpoints = _list_versions(table_path)
    known_versions = set(commits) | set(checkpoints)
    new_version = max(known_versions) + 1 if known_versions else 0

    prev_files: dict[str, dict] = {}
    evolved_schema: StructType | None = None
    prev_configuration: dict[str, str] = {}
    if new_version > 0:
        prev = snapshot(spark, table_path)
        prev_configuration = prev.configuration
        # partitioning is a TABLE property, not a per-write choice:
        # inherit it when the caller omits partition_by, reject a
        # conflicting spec (files written outside the hive layout would
        # be unreadable / metaData would be clobbered)
        if not partition_by:
            partition_by = list(prev.partition_columns)
        elif partition_by != prev.partition_columns and prev.partition_columns:
            raise DeltaProtocolError(
                f"table is partitioned by {prev.partition_columns}; "
                f"cannot write with partition_by={partition_by}"
            )
        if mode == "overwrite":
            prev_files = prev.files
        # mergeSchema-style evolution (S5 over the real format): an
        # append/overwrite whose frame adds columns re-commits metaData
        # with the widened schema; dropping or retyping columns is
        # rejected (Delta requires explicit overwriteSchema for that).
        old_fields = {f.name: f.dataType for f in prev.schema.fields}
        new_fields = {f.name: f.dataType for f in df.schema.fields}
        for name, dt in old_fields.items():
            if name in new_fields and new_fields[name] != dt:
                raise DeltaProtocolError(
                    f"column {name!r} type change {dt} -> {new_fields[name]} "
                    "needs an explicit schema overwrite"
                )
        if set(old_fields) - set(new_fields):
            raise DeltaProtocolError(
                f"{mode} is missing existing columns "
                f"{sorted(set(old_fields) - set(new_fields))}; Delta writes "
                "may add columns (mergeSchema) but dropping needs an "
                "explicit schema overwrite"
            )
        added_cols = [f for f in df.schema.fields if f.name not in old_fields]
        if added_cols:
            evolved = StructType(
                list(prev.schema.fields if mode == "append" else [])
                + (
                    [f for f in df.schema.fields]
                    if mode == "overwrite"
                    else added_cols
                )
            )
            evolved_schema = evolved

    before = set(_list_data_files(table_path, set()))
    writer = df.write.mode("append").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(table_path)
    added = _list_data_files(table_path, before)

    now_ms = int(time.time() * 1000)
    actions: list[dict[str, Any]] = []
    if new_version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _schema_json(df),
                    "partitionColumns": partition_by,
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    elif evolved_schema is not None:
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": evolved_schema.json(),
                    # carry the table's partitioning/config forward — an
                    # evolution commit widens the schema, nothing else
                    "partitionColumns": partition_by,
                    "configuration": prev_configuration,
                }
            }
        )
    if mode == "overwrite":
        for rel in prev_files:
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    stat_cols = _stats_columns(df.schema, partition_by)
    for rel in added:
        full = os.path.join(table_path, rel)
        add: dict[str, Any] = {
            "path": rel,
            "partitionValues": _partition_values_from_path(rel, partition_by),
            "size": os.path.getsize(full),
            "modificationTime": now_ms,
            "dataChange": True,
        }
        st = _file_stats(full, stat_cols)
        if st is not None:
            add["stats"] = json.dumps(st)
        actions.append({"add": add})
    if txn is not None:
        actions.append({"txn": {"appId": txn[0], "version": int(txn[1]), "lastUpdated": now_ms}})
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
            }
        }
    )
    with open(_commit_file(table_path, new_version), "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return new_version


def write_checkpoint(spark: SparkSession, table_path: str) -> int:
    """Author a single-part checkpoint at the latest version and point
    ``_last_checkpoint`` at it, so readers can skip replaying earlier
    JSON commits. Checkpoint rows carry the same action structs as the
    JSON lines (protocol, metaData, one add per live file)."""
    snap = snapshot(spark, table_path)
    rows = (
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": snap.schema.json(),
                    "partitionColumns": snap.partition_columns,
                    "configuration": snap.configuration,
                }
            },
        ]
        + [{"add": a} for a in snap.files.values()]
        + [
            {"txn": {"appId": app, "version": v}}
            for app, v in sorted(snap.txns.items())
        ]
    )
    jdf = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows], 1)
    )
    ckpt = os.path.join(_log_path(table_path), f"{snap.version:020d}.checkpoint.parquet")
    tmp = ckpt + ".tmpdir"
    jdf.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        n for n in os.listdir(tmp) if n.endswith(".parquet") and not n.startswith(".")
    )
    os.replace(os.path.join(tmp, part), ckpt)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    with open(
        os.path.join(_log_path(table_path), "_last_checkpoint"), "w", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps({"version": snap.version, "size": len(rows)}))
    return snap.version


def vacuum_delta(spark: SparkSession, table_path: str) -> list[str]:
    """Remove data files no longer referenced by the CURRENT snapshot —
    Delta VACUUM with retention 0 (the protocol's file-GC story:
    unreferenced files are safe to delete once no retained reader needs
    them; real deployments keep a retention window for in-flight
    readers, which a single-process engine doesn't have). Time travel
    to versions whose files were reclaimed fails afterwards, exactly as
    VACUUM past the retention horizon does on Delta.

    Driver-side filesystem metadata work, O(files) — no Spark job.
    Returns the removed relative paths.
    """
    snap = snapshot(spark, table_path)
    live = {os.path.normpath(p) for p in snap.files}
    removed = []
    for rel in _list_data_files(table_path, set()):
        if os.path.normpath(rel) not in live:
            os.remove(os.path.join(table_path, rel))
            removed.append(rel)
    # prune now-empty hive partition dirs
    for root, dirs, names in os.walk(table_path, topdown=False):
        if LOG_DIR in root.split(os.sep) or root == table_path:
            continue
        if not dirs and not names:
            os.rmdir(root)
    return sorted(removed)


def last_txn_version(spark: SparkSession, table_path: str, app_id: str) -> int:
    """Highest batch version the writer ``app_id`` has committed to this
    table (-1 if none) — the restart probe of the idempotent-sink
    protocol: skip every batch with version <= this."""
    try:
        return snapshot(spark, table_path).txns.get(app_id, -1)
    except FileNotFoundError:
        return -1


#: column types whose parquet footer stats are JSON-safe AND whose
#: Python min/max compare correctly against probe values in
#: prune_files_by_stats (DECIMAL min/max arrive as decimal.Decimal —
#: not JSON-serializable and type-unsafe to compare — so decimal
#: columns simply carry no stats and are conservatively kept)
_STATS_SAFE_TYPES = {
    "byte", "short", "integer", "long", "float", "double",
    "string", "date", "timestamp", "timestamp_ntz", "boolean",
}


def _stats_columns(schema: StructType, partition_by: list[str]) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if f.name not in partition_by
        and f.dataType.typeName() in _STATS_SAFE_TYPES
    ][:32]  # Delta's default dataSkippingNumIndexedCols


def _file_stats(full_path: str, stat_cols: list[str]) -> dict | None:
    """Per-file column stats for the add action's ``stats`` field
    (Delta's data-skipping JSON: numRecords / minValues / maxValues),
    read from the parquet footer via pyarrow — driver-side O(files)
    metadata work, no data scan."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(full_path).metadata
        schema_names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins: dict[str, Any] = {}
        maxs: dict[str, Any] = {}
        for c in stat_cols:
            if c not in schema_names:
                continue
            col_idx = schema_names[c]
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                if st is None or not st.has_min_max:
                    return None  # stats unavailable -> no skipping claim
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                mins[c], maxs[c] = _json_safe(lo), _json_safe(hi)
        return {"numRecords": md.num_rows, "minValues": mins, "maxValues": maxs}
    except Exception:
        return None


def _json_safe(v: Any) -> Any:
    import datetime

    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def prune_files_by_stats(
    snap: DeltaSnapshot, col: str, lo: Any = None, hi: Any = None
) -> tuple[list[str], int]:
    """Data skipping: the subset of the snapshot's files whose stats
    interval [min, max] for ``col`` can intersect [lo, hi] — files with
    disjoint intervals are eliminated WITHOUT being opened, the Delta
    stats-skipping read path. Files lacking stats are conservatively
    kept. Returns (relative paths, n_skipped)."""
    lo, hi = _json_safe(lo), _json_safe(hi)  # dates/timestamps compare
    # as ISO strings, matching the serialized stats form
    keep, skipped = [], 0
    for rel, a in snap.files.items():
        st = a.get("stats")
        if isinstance(st, str):
            st = json.loads(st)
        fmin = (st or {}).get("minValues", {}).get(col)
        fmax = (st or {}).get("maxValues", {}).get(col)
        if fmin is None or fmax is None:
            # partition columns carry no footer stats; their single
            # value IS the file's [min, max]
            pv = a.get("partitionValues", {}).get(col)
            if pv is not None:
                try:
                    pv_t = type(lo if lo is not None else hi)(pv)
                    fmin = fmax = pv_t
                except (TypeError, ValueError):
                    fmin = fmax = pv
        if fmin is None or fmax is None:
            keep.append(rel)
            continue
        if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
            skipped += 1
            continue
        keep.append(rel)
    return keep, skipped


def read_delta_pruned(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo: Any = None,
    hi: Any = None,
) -> tuple[DataFrame, int]:
    """Stats-pruned Delta scan: plan only the files whose [min,max] for
    ``col`` intersects [lo, hi] (the caller still applies the exact row
    filter — skipping is a superset guarantee). Returns (frame,
    n_files_skipped)."""
    snap = snapshot(spark, table_path)
    keep, skipped = prune_files_by_stats(snap, col, lo, hi)
    if not keep:
        return spark.createDataFrame([], snap.schema), skipped
    reader = spark.read.option("mergeSchema", "true")
    if snap.partition_columns:
        reader = reader.option("basePath", table_path)
    df = reader.parquet(*[os.path.join(table_path, p) for p in keep])
    for f in snap.schema.fields:
        if f.name not in df.columns:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df.select(*[F.col(f.name) for f in snap.schema.fields]), skipped


def overwrite_partitions_delta(
    df: DataFrame,
    table_path: str,
    *,
    partition_by: list[str],
) -> int:
    """Dynamic partition overwrite (Delta ``replaceWhere`` semantics for
    the partitions present in ``df``): remove actions are emitted ONLY
    for files whose partitionValues match a partition the incoming
    frame carries; every other partition's files are untouched — the
    incremental-pipeline write pattern where refresh cost tracks the
    affected partitions, not the table.
    """
    spark = df.sparkSession
    snap = snapshot(spark, table_path)
    if snap.partition_columns != partition_by:
        raise DeltaProtocolError(
            f"table is partitioned by {snap.partition_columns}, not {partition_by}"
        )
    def _hive_val(v) -> str:
        # Spark writes NULL partition values to the
        # __HIVE_DEFAULT_PARTITION__ directory
        return "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)

    new_parts = {
        tuple(_hive_val(r[c]) for c in partition_by)
        for r in df.select(*partition_by).distinct().collect()
    }
    doomed = [
        rel
        for rel, a in snap.files.items()
        if tuple(str(a.get("partitionValues", {}).get(c)) for c in partition_by)
        in new_parts
    ]

    before = set(_list_data_files(table_path, set()))
    writer = df.write.mode("append").format("parquet").partitionBy(*partition_by)
    writer.save(table_path)
    added = _list_data_files(table_path, before)

    now_ms = int(time.time() * 1000)
    actions: list[dict[str, Any]] = []
    for rel in doomed:
        actions.append(
            {"remove": {"path": rel, "deletionTimestamp": now_ms, "dataChange": True}}
        )
    stat_cols = _stats_columns(snap.schema, partition_by)
    for rel in added:
        full = os.path.join(table_path, rel)
        add: dict[str, Any] = {
            "path": rel,
            "partitionValues": _partition_values_from_path(rel, partition_by),
            "size": os.path.getsize(full),
            "modificationTime": now_ms,
            "dataChange": True,
        }
        st = _file_stats(full, stat_cols)
        if st is not None:
            add["stats"] = json.dumps(st)
        actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "OVERWRITE", "predicate": "dynamic"},
            }
        }
    )
    commits, checkpoints = _list_versions(table_path)
    new_version = max(set(commits) | set(checkpoints)) + 1
    with open(_commit_file(table_path, new_version), "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return new_version


def optimize_delta(
    spark: SparkSession,
    table_path: str,
    *,
    target_files: int = 4,
    zorder_by: tuple[str, str] | None = None,
) -> int:
    """OPTIMIZE (bin-packing compaction, optionally ZORDER BY two
    columns): rewrite the current snapshot's data as ``target_files``
    files per partition and commit remove+add with
    ``dataChange: false`` — the protocol's marker that the transaction
    reorganizes bytes without changing table content (streaming readers
    may skip it). Old files stay on disk for time travel until
    ``vacuum_delta``.

    With ``zorder_by``, rows are clustered along the Morton curve of
    the two columns before the rewrite (operators/layout.py), so each
    new file has bounded min/max footers in BOTH dimensions and
    ``read_delta_pruned`` skips on either column — the OPTIMIZE
    ZORDER BY mechanism.

    Scale: one distributed read+write of the live data; the commit is
    O(files) metadata.
    """
    from ..operators.layout import _ZKEY, zorder_key

    snap = snapshot(spark, table_path)
    if zorder_by is not None and snap.partition_columns:
        raise DeltaProtocolError(
            "ZORDER BY on a hive-partitioned table would break the "
            "partition-directory layout this reader relies on; compact "
            "without zorder_by, or zorder within an unpartitioned table"
        )
    current = read_delta(spark, table_path)
    if zorder_by is not None:
        keyed = zorder_key(current, *zorder_by)
        current = (
            keyed.repartitionByRange(target_files, F.col(_ZKEY))
            .sortWithinPartitions(_ZKEY)
            .drop(_ZKEY)
        )
    elif snap.partition_columns:
        current = current.repartition(target_files, *snap.partition_columns)
    else:
        current = current.coalesce(target_files)

    before = set(_list_data_files(table_path, set()))
    writer = current.write.mode("append").format("parquet")
    if snap.partition_columns:
        writer = writer.partitionBy(*snap.partition_columns)
    writer.save(table_path)
    added = _list_data_files(table_path, before)

    now_ms = int(time.time() * 1000)
    stat_cols = _stats_columns(snap.schema, snap.partition_columns)
    actions: list[dict[str, Any]] = [
        {"remove": {"path": rel, "deletionTimestamp": now_ms, "dataChange": False}}
        for rel in snap.files
    ]
    for rel in added:
        full = os.path.join(table_path, rel)
        add: dict[str, Any] = {
            "path": rel,
            "partitionValues": _partition_values_from_path(
                rel, snap.partition_columns
            ),
            "size": os.path.getsize(full),
            "modificationTime": now_ms,
            "dataChange": False,
        }
        st = _file_stats(full, stat_cols)
        if st is not None:
            add["stats"] = json.dumps(st)
        actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "OPTIMIZE",
                "operationParameters": {
                    "zOrderBy": list(zorder_by) if zorder_by else []
                },
            }
        }
    )
    commits, checkpoints = _list_versions(table_path)
    new_version = max(set(commits) | set(checkpoints)) + 1
    with open(_commit_file(table_path, new_version), "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return new_version


def delete_delta(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo: Any,
    hi: Any,
) -> tuple[int, int]:
    """Copy-on-write DELETE of rows with ``col`` in [lo, hi]: stats
    pruning first selects the files that CAN contain matches; only
    those are rewritten (matching rows dropped), every other file keeps
    its identity — the surgical-rewrite DML shape that makes deletes on
    a 100 TB table cost O(affected files), not a table rewrite. UPDATE
    is the same mechanism with a projection instead of a drop.

    Returns (new_version, n_files_rewritten). Old files survive for
    time travel until vacuum.
    """
    snap = snapshot(spark, table_path)
    # rewrite candidates = files whose stats interval intersects
    # [lo, hi] (plus stat-less files, conservatively)
    candidates, _ = prune_files_by_stats(snap, col, lo, hi)

    if not candidates:
        return snap.version, 0

    reader = spark.read.option("mergeSchema", "true")
    if snap.partition_columns:
        reader = reader.option("basePath", table_path)
    affected = reader.parquet(
        *[os.path.join(table_path, p) for p in candidates]
    )
    for f in snap.schema.fields:
        if f.name not in affected.columns:
            affected = affected.withColumn(f.name, F.lit(None).cast(f.dataType))
    # NULL predicate rows are NOT matched by DELETE WHERE c BETWEEN
    # (predicate not TRUE) — they must survive the rewrite
    survivors = affected.select(
        *[F.col(f.name) for f in snap.schema.fields]
    ).filter(F.col(col).isNull() | ~F.col(col).between(lo, hi))

    before = set(_list_data_files(table_path, set()))
    writer = survivors.write.mode("append").format("parquet")
    if snap.partition_columns:
        writer = writer.partitionBy(*snap.partition_columns)
    writer.save(table_path)
    added = _list_data_files(table_path, before)

    now_ms = int(time.time() * 1000)
    stat_cols = _stats_columns(snap.schema, snap.partition_columns)
    actions: list[dict[str, Any]] = [
        {"remove": {"path": rel, "deletionTimestamp": now_ms, "dataChange": True}}
        for rel in candidates
    ]
    for rel in added:
        full = os.path.join(table_path, rel)
        add: dict[str, Any] = {
            "path": rel,
            "partitionValues": _partition_values_from_path(
                rel, snap.partition_columns
            ),
            "size": os.path.getsize(full),
            "modificationTime": now_ms,
            "dataChange": True,
        }
        st = _file_stats(full, stat_cols)
        if st is not None:
            add["stats"] = json.dumps(st)
        actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "DELETE",
                "operationParameters": {
                    "predicate": f"{col} BETWEEN {lo} AND {hi}"
                },
            }
        }
    )
    commits, checkpoints = _list_versions(table_path)
    new_version = max(set(commits) | set(checkpoints)) + 1
    with open(_commit_file(table_path, new_version), "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return new_version, len(candidates)


def stream_commit_batches(
    spark: SparkSession, table_path: str, *, from_version: int = 0
):
    """Replay a Delta table's commit history as (version, DataFrame)
    micro-batches — the append-only Delta-as-streaming-source semantics:
    each yielded frame holds exactly the rows ADDED by that commit's
    dataChange files; OPTIMIZE/compaction commits (dataChange: false)
    yield nothing, which is precisely why the protocol carries the flag
    — a streaming reader must not re-emit reorganized bytes. Removes
    with dataChange are rejected (a streaming source over a table with
    updates/deletes needs CDF files; this reader supports the
    append-only contract delta-spark's default source enforces too).

    Each batch is a bounded distributed parquet read; the generator
    itself touches only log metadata.
    """
    commits, _ = _list_versions(table_path)
    snap_schema = snapshot(spark, table_path).schema
    wanted = sorted(c for c in commits if c >= from_version)
    # truncated history (commits checkpointed away) cannot be replayed
    # as batches — fail loudly instead of silently undercounting
    expected = list(range(from_version, (wanted[-1] + 1) if wanted else from_version))
    if wanted != expected:
        missing = sorted(set(expected) - set(wanted))
        raise DeltaProtocolError(
            f"commits {missing} are missing from the log (truncated past a "
            "checkpoint?) — the commit-stream source cannot replay them; "
            "start from the first available commit or consume a snapshot"
        )
    for v in wanted:
        adds, removes_changed = [], False
        with open(_commit_file(table_path, v), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("dataChange", True):
                    adds.append(unquote(action["add"]["path"]))
                elif "remove" in action and action["remove"].get("dataChange", True):
                    removes_changed = True
        if removes_changed and v > from_version:
            raise DeltaProtocolError(
                f"commit {v} removes data (update/delete/overwrite); the "
                "append-only streaming source cannot represent it — "
                "consume a CDF diff instead (delta_cdf_diff pattern)"
            )
        if not adds:
            continue
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(table_path, p) for p in adds]
        )
        for f in snap_schema.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        yield v, df.select(*[F.col(f.name) for f in snap_schema.fields])


def update_delta(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo: Any,
    hi: Any,
    set_exprs: dict[str, str],
) -> tuple[int, int]:
    """Copy-on-write UPDATE of rows with ``col`` in [lo, hi]: the same
    stats-pruned file surgery as ``delete_delta`` — only files whose
    footer stats (or partition value) can intersect the predicate are
    rewritten, matching rows projected through ``set_exprs``
    (column -> SQL expression over the row), everything else untouched.

    Returns (new_version, n_files_rewritten). Old files survive for
    time travel until vacuum.
    """
    snap = snapshot(spark, table_path)
    candidates, _ = prune_files_by_stats(snap, col, lo, hi)
    if not candidates:
        return snap.version, 0

    reader = spark.read.option("mergeSchema", "true")
    if snap.partition_columns:
        reader = reader.option("basePath", table_path)
    affected = reader.parquet(
        *[os.path.join(table_path, p) for p in candidates]
    )
    for f in snap.schema.fields:
        if f.name not in affected.columns:
            affected = affected.withColumn(f.name, F.lit(None).cast(f.dataType))
    affected = affected.select(*[F.col(f.name) for f in snap.schema.fields])

    pred = F.col(col).between(lo, hi)
    rewritten = affected.select(
        *[
            F.when(pred, F.expr(set_exprs[f.name]))
            .otherwise(F.col(f.name))
            .cast(f.dataType)
            .alias(f.name)
            if f.name in set_exprs
            else F.col(f.name)
            for f in snap.schema.fields
        ]
    )

    before = set(_list_data_files(table_path, set()))
    writer = rewritten.write.mode("append").format("parquet")
    if snap.partition_columns:
        writer = writer.partitionBy(*snap.partition_columns)
    writer.save(table_path)
    added = _list_data_files(table_path, before)

    now_ms = int(time.time() * 1000)
    stat_cols = _stats_columns(snap.schema, snap.partition_columns)
    actions: list[dict[str, Any]] = [
        {"remove": {"path": rel, "deletionTimestamp": now_ms, "dataChange": True}}
        for rel in candidates
    ]
    for rel in added:
        full = os.path.join(table_path, rel)
        add: dict[str, Any] = {
            "path": rel,
            "partitionValues": _partition_values_from_path(
                rel, snap.partition_columns
            ),
            "size": os.path.getsize(full),
            "modificationTime": now_ms,
            "dataChange": True,
        }
        st = _file_stats(full, stat_cols)
        if st is not None:
            add["stats"] = json.dumps(st)
        actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "UPDATE",
                "operationParameters": {
                    "predicate": f"{col} BETWEEN {lo} AND {hi}"
                },
            }
        }
    )
    commits, checkpoints = _list_versions(table_path)
    new_version = max(set(commits) | set(checkpoints)) + 1
    with open(_commit_file(table_path, new_version), "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return new_version, len(candidates)
