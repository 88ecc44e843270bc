"""Catalog-owned commits (round 11): the ``catalogOwned-preview``
table feature from the public Delta protocol (delta.io PROTOCOL.md) —
commit ownership moves from the filesystem to a COMMIT COORDINATOR.

Why the feature exists (the 100 TB story): the classic log commits by
atomic put-if-absent on ``<v>.json``, which object stores without
atomic create (S3 without a DynamoDB LogStore) cannot provide, and
which makes every commit a LIST + PUT race. Under catalog ownership a
writer stages its commit under a collision-free name and asks the
catalog to RATIFY it as version v — the catalog serializes ratification
(one cheap conditional write in the catalog database), so commit
latency stops depending on log listing and the put-if-absent
primitive. Backfill copies ratified commits into the classic
``<v>.json`` names lazily, keeping the log self-describing for
catalog-aware readers and for the table's history after a DOWNGRADE.

Wire layout implemented (per the protocol's preview spec):

- staged commits at ``_delta_log/_staged_commits/<v>.<uuid>.json``
  (full 20-digit version + a fresh uuid — concurrent stagers can never
  collide on the name; files that never win ratification are garbage,
  ignored by every reader);
- the reader-writer table feature ``catalogOwned-preview``
  (minReader 3 / minWriter 7) stamped by the upgrade commit — the LAST
  plain filesystem commit the table ever takes;
- a filesystem-only reader MUST NOT read the table (the numbered log
  may be arbitrarily stale): ``snapshot()``/``read_delta`` raise their
  protocol gate on the feature, and only ``snapshot_coordinated`` —
  which consults the coordinator and backfills every ratified commit
  first — opens the scoped-feature context that lets replay proceed.

``FileCommitCoordinator`` is the reference coordinator: catalog state
as a directory where ratifying version v = one atomic
O_CREAT|O_EXCL create of ``<table_id>/<v>.json`` (the same
put-if-absent contract a catalog database row provides). Production
deployments swap in a real catalog; everything above the two-method
surface (``ratify`` / ``ratified``) is coordinator-agnostic.

Parity note: the reference runs on a managed platform whose tables are
catalog-owned by default (Unity Catalog); the reference itself only
ever writes through that platform (e.g.
consolidated_pipeline/1_customer_data_processing.py:50-53), so this
module is extension surface proving the protocol feature on this
engine's own log.
"""

from __future__ import annotations

import functools
import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .delta_log import (
    ConcurrentModificationError,
    DeltaProtocolError,
    DeltaSnapshot,
    _add_action,
    _allow_reader_features,
    _check_rebase,
    _clamp_commit_ts,
    _commit_file,
    _CommitGuard,
    _explicit_features,
    _parse_log_file,
    _scan_files,
    _stage_write,
    _stats_columns,
    _try_write_commit,
    compact_log,
    delete_delta,
    delete_rows,
    merge_delta,
    optimize_delta,
    snapshot,
    stream_cdf_batches,
    stream_commit_batches,
    truncate_log,
    update_delta,
    update_rows,
    vacuum_delta,
    write_checkpoint,
    write_delta,
)

CATALOG_OWNED_FEATURE = "catalogOwned-preview"
_STAGED_DIR = "_staged_commits"
_ENGINE = "mergermetrics-lakehouse-pipeline-spark"


class FileCommitCoordinator:
    """Directory-backed reference commit coordinator.

    Ratification of version v for a table = one atomic
    O_CREAT|O_EXCL create of ``<root>/<table_id>/<v>.json`` carrying
    the staged commit's relative name. Exactly one writer can win each
    version — the same conditional-write contract a catalog database
    provides, made filesystem-observable for tests."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _tdir(self, table_id: str) -> str:
        d = os.path.join(self.root, table_id)
        os.makedirs(d, exist_ok=True)
        return d

    def ratify(self, table_id: str, version: int, staged_name: str) -> bool:
        """Atomically ratify ``staged_name`` as ``version``; False when
        another writer already won this version."""
        path = os.path.join(self._tdir(table_id), f"{version:020d}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump({"staged": staged_name}, fh)
        return True

    def ratified(self, table_id: str) -> dict[int, str]:
        """version -> staged commit name, every ratified commit."""
        out: dict[int, str] = {}
        for name in os.listdir(self._tdir(table_id)):
            stem = name.split(".")[0]
            if name.endswith(".json") and stem.isdigit():
                with open(
                    os.path.join(self._tdir(table_id), name),
                    encoding="utf-8",
                ) as fh:
                    out[int(stem)] = json.load(fh)["staged"]
        return out

    def forget(self, table_id: str, up_to: int) -> list[int]:
        """Drop ratification records at or below ``up_to`` — the
        catalog-side half of log retention (round 13). The protocol
        lets the coordinator forget a commit once it is BACKFILLED
        (the numbered log carries it); retention then additionally
        requires a checkpoint covering it. Callers must guarantee
        both — ``truncate_log_coordinated`` is the safe entry point.
        Returns the forgotten versions."""
        dropped: list[int] = []
        for v in sorted(self.ratified(table_id)):
            if v <= up_to:
                os.remove(
                    os.path.join(self._tdir(table_id), f"{v:020d}.json")
                )
                dropped.append(v)
        return dropped


def _staged_dir(table_path: str) -> str:
    d = os.path.join(table_path, "_delta_log", _STAGED_DIR)
    os.makedirs(d, exist_ok=True)
    return d


def _table_id(table_path: str) -> str:
    """The table's immutable metaData.id — the coordinator key (a real
    catalog keys tables by id, never by path). Spark-free probe."""
    from .delta_pysource import _latest_metadata

    tid = _latest_metadata(table_path).get("id")
    if not tid:
        raise DeltaProtocolError(f"no metaData.id in the log at {table_path}")
    return tid


def _is_catalog_owned(snap: DeltaSnapshot) -> bool:
    return CATALOG_OWNED_FEATURE in (
        set(snap.protocol.get("readerFeatures") or [])
        | set(snap.protocol.get("writerFeatures") or [])
    )


def upgrade_to_catalog_owned(
    spark: SparkSession, table_path: str, coordinator: FileCommitCoordinator
) -> int:
    """Stamp ``catalogOwned-preview`` — the LAST plain filesystem
    commit this table ever takes; every later commit must go through
    the coordinator. Every capability the legacy protocol implied is
    restated explicitly (the v7 contract). Returns the upgrade
    version; the coordinator's history starts empty at that point."""
    for _attempt in range(16):
        snap = snapshot(spark, table_path)
        if _is_catalog_owned(snap):
            raise DeltaProtocolError(f"{table_path} is already catalog-owned")
        rf, wf = _explicit_features(snap)
        actions: list[dict[str, Any]] = [
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "UPGRADE PROTOCOL",
                    "operationParameters": {"feature": CATALOG_OWNED_FEATURE},
                    "engineInfo": _ENGINE,
                }
            },
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": sorted(rf | {CATALOG_OWNED_FEATURE}),
                    "writerFeatures": sorted(wf | {CATALOG_OWNED_FEATURE}),
                }
            },
        ]
        v = snap.version + 1
        if _try_write_commit(table_path, v, actions):
            coordinator._tdir(_table_id(table_path))  # register
            return v
    raise ConcurrentModificationError(
        f"could not win a version for the catalog-owned upgrade of "
        f"{table_path}"
    )


def _stage_commit(
    table_path: str, version: int, actions: list[dict[str, Any]]
) -> str:
    """Write the commit under its collision-free staged name; returns
    the name (relative to _staged_commits/)."""
    name = f"{version:020d}.{uuid.uuid4().hex}.json"
    path = os.path.join(_staged_dir(table_path), name)
    with open(path, "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    return name


def _winner_actions(
    table_path: str, staged_name: str, version: int
) -> list[dict[str, Any]]:
    staged = os.path.join(_staged_dir(table_path), staged_name)
    if os.path.exists(staged):
        return _parse_log_file(staged)
    return _parse_log_file(_commit_file(table_path, version))


def backfill(
    table_path: str,
    coordinator: FileCommitCoordinator,
    up_to: int | None = None,
) -> list[int]:
    """Copy ratified staged commits onto their classic ``<v>.json``
    names — idempotent and race-safe (put-if-absent; a concurrent
    backfiller of the same ratified content is a no-op loss). Any
    client may backfill at any time; the catalog stays authoritative
    regardless. Returns the versions this call materialized."""
    tid = _table_id(table_path)
    done: list[int] = []
    for v, staged_name in sorted(coordinator.ratified(tid).items()):
        if up_to is not None and v > up_to:
            break
        staged = os.path.join(_staged_dir(table_path), staged_name)
        existing = _commit_file(table_path, v)
        if os.path.exists(existing):
            # Not a silent skip: an existing <v>.json must BE the
            # ratified commit (a prior backfill). Anything else means a
            # filesystem writer won the same version the coordinator
            # ratified — split-brain; surface it, never drop the
            # ratified data (round-11 review).
            if os.path.exists(staged) and _parse_log_file(
                existing
            ) != _parse_log_file(staged):
                raise DeltaProtocolError(
                    f"split-brain at version {v} of {table_path}: the "
                    f"filesystem commit differs from the "
                    f"coordinator-ratified staged commit {staged_name}; "
                    "a non-coordinated writer committed to a "
                    "catalog-owned table"
                )
            continue
        if _try_write_commit(table_path, v, _parse_log_file(staged)):
            done.append(v)
    return done


def append_coordinated(
    df: DataFrame, table_path: str, coordinator: FileCommitCoordinator
) -> int:
    """Blind-append ``df`` through the coordinator: stage data files,
    stage the commit JSON under its uuid name, then ratify — losing a
    ratification race re-checks the winner against the optimistic
    conflict matrix (metadata/protocol changes abort; data commits
    compose with a blind append) and retries at the next version.
    The data files are staged ONCE; only the tiny commit JSON restages
    per attempt. No put-if-absent on the numbered log anywhere."""
    spark = df.sparkSession
    snap = snapshot_coordinated(spark, table_path, coordinator)
    tid = _table_id(table_path)
    expected = [f.name for f in snap.schema.fields]
    if [c for c in df.columns] != expected:
        raise ValueError(
            f"append schema {df.columns} != table schema {expected} "
            "(coordinated appends do not evolve schemas)"
        )
    # preview scope: plain-layout tables only. Row tracking / identity /
    # column mapping need the add-action stamping write_delta performs;
    # silently skipping it would corrupt those features' invariants.
    conf = snap.configuration
    if conf.get("delta.enableRowTracking", "").lower() == "true" or conf.get(
        "delta.columnMapping.mode", "none"
    ) != "none" or any(
        "delta.identity.start" in (f.metadata or {})
        for f in snap.schema.fields
    ):
        raise DeltaProtocolError(
            "append_coordinated supports plain-layout tables; this table "
            "carries row tracking / column mapping / identity columns, "
            "whose add-action stamping the coordinated path does not "
            "implement yet"
        )
    rels = _stage_write(df, table_path, snap.partition_columns)
    now_ms = int(time.time() * 1000)
    stat_cols = _stats_columns(snap.schema, snap.partition_columns)
    actions: list[dict[str, Any]] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "Append"},
                "engineInfo": _ENGINE,
            }
        },
        *[
            _add_action(
                table_path, rel, snap.partition_columns, stat_cols, now_ms
            )
            for rel in rels
        ],
    ]
    return _commit_coordinated(
        table_path,
        actions,
        _CommitGuard(blind_append=True),
        snap.version,
        coordinator=coordinator,
    )


def _commit_coordinated(
    table_path: str,
    actions: list[dict[str, Any]],
    guard: _CommitGuard,
    base_version: int,
    *,
    coordinator: FileCommitCoordinator,
) -> int:
    """The coordinated analogue of delta_log._commit (same signature
    plus the coordinator, so DML front ends can take it as their
    ``commit_fn``): stage the commit JSON under its uuid name, ask the
    coordinator to RATIFY it as the next version — losing a
    ratification race re-checks the winner against the SAME optimistic
    conflict matrix the filesystem path uses (_check_rebase: metadata/
    protocol winners abort; data winners disjoint from this
    transaction's read/remove/predicate footprint rebase) and retries
    at the next version. The staged data files are written ONCE by the
    caller; only the tiny commit JSON restages per attempt. No
    put-if-absent on the numbered log anywhere."""
    tid = _table_id(table_path)
    v = base_version + 1
    for _attempt in range(64):
        # make <v-1>.json present so the in-commit-timestamp clamp can
        # read its predecessor (ratified-but-unbackfilled is legal)
        backfill(table_path, coordinator, up_to=v - 1)
        if guard.stamp_row_commit_version:
            for a in actions:
                if "add" in a and "defaultRowCommitVersion" in a["add"]:
                    a["add"]["defaultRowCommitVersion"] = v
        _clamp_commit_ts(table_path, v, actions, ict=guard.ict)
        staged_name = _stage_commit(table_path, v, actions)
        if coordinator.ratify(tid, v, staged_name):
            return v
        # lost the race: the staged file is never-ratified garbage
        os.unlink(os.path.join(_staged_dir(table_path), staged_name))
        winner_name = coordinator.ratified(tid).get(v)
        if winner_name is None:
            raise DeltaProtocolError(
                f"coordinator refused version {v} but reports no winner"
            )
        _check_rebase(_winner_actions(table_path, winner_name, v), guard, v)
        v += 1
    raise ConcurrentModificationError(
        f"could not win a ratification for {table_path} after 64 attempts"
    )


def snapshot_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    version: int | None = None,
) -> DeltaSnapshot:
    """Catalog-consulting snapshot: learn the ratified history from the
    coordinator, backfill everything ratified (making the filesystem
    log provably current — a LIST alone can never prove that), then
    replay with the feature's scoped reader gate open. Staged files
    that never won ratification are invisible throughout (replay reads
    only numbered JSONs)."""
    backfill(table_path, coordinator, up_to=version)
    with _allow_reader_features({CATALOG_OWNED_FEATURE}):
        snap = snapshot(spark, table_path, version)
    if not _is_catalog_owned(snap):
        # Guard BOTH directions: a coordinated writer on a plain table
        # would ratify versions the filesystem path legitimately wins,
        # silently orphaning the ratified data (round-11 review). The
        # plain path already refuses catalog-owned tables; refuse the
        # converse here, which gates every coordinated entry point
        # (append / DML / read all snapshot through this).
        raise DeltaProtocolError(
            f"{table_path} is not catalog-owned; use the plain "
            "write_delta/read_delta path (or upgrade_to_catalog_owned "
            "first) — coordinating commits on a filesystem-owned table "
            "risks split-brain with concurrent filesystem writers"
        )
    return snap


def read_delta_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    version: int | None = None,
) -> DataFrame:
    """Scan a catalog-owned table (the coordinated analogue of
    read_delta)."""
    snap = snapshot_coordinated(spark, table_path, coordinator, version)
    with _allow_reader_features({CATALOG_OWNED_FEATURE}):
        return _scan_files(spark, table_path, snap, list(snap.files))


def create_catalog_owned(
    df: DataFrame,
    table_path: str,
    coordinator: FileCommitCoordinator,
    **write_kwargs: Any,
) -> int:
    """Create a table and hand it to the catalog in one call: commit 0
    lands as a plain filesystem commit (the protocol requires version 0
    backfilled so the table is discoverable), the upgrade commit
    immediately follows. Returns the upgrade version (1)."""
    write_delta(df, table_path, mode="overwrite", **write_kwargs)
    return upgrade_to_catalog_owned(df.sparkSession, table_path, coordinator)


def _coordinated_dml(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    front_end,
    *args: Any,
    **kwargs: Any,
) -> tuple[int, int]:
    """Route a copy-on-write DML front end through the coordinator:
    snapshot via the catalog (backfills + enforces the ownership gate),
    then run the front end against that snapshot with
    ``_commit_coordinated`` as its commit protocol. The front end's
    predicate/whole-table _CommitGuard flows into the ratification
    loop, so conflict semantics are IDENTICAL to the filesystem path —
    a concurrent blind append whose stats prove it disjoint from the
    DML predicate rebases; an intersecting or metadata winner aborts."""
    snap = snapshot_coordinated(spark, table_path, coordinator)
    fn = functools.partial(_commit_coordinated, coordinator=coordinator)
    with _allow_reader_features({CATALOG_OWNED_FEATURE}):
        return front_end(
            spark, table_path, *args, snap=snap, commit_fn=fn, **kwargs
        )


def delete_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    col: str,
    lo: Any,
    hi: Any,
) -> tuple[int, int]:
    """Stats-pruned copy-on-write DELETE on a catalog-owned table —
    delete_delta's surgery (only files whose stats interval intersects
    [lo, hi] rewrite; CDF flows when enabled) committed by
    ratification. Returns (new_version, n_files_rewritten)."""
    return _coordinated_dml(
        spark, table_path, coordinator, delete_delta, col, lo, hi
    )


def update_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    col: str,
    lo: Any,
    hi: Any,
    set_exprs: dict[str, str],
) -> tuple[int, int]:
    """Stats-pruned copy-on-write UPDATE on a catalog-owned table
    (update_delta committed by ratification)."""
    return _coordinated_dml(
        spark, table_path, coordinator, update_delta, col, lo, hi, set_exprs
    )


def delete_rows_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    where: str,
) -> tuple[int, int]:
    """Arbitrary-predicate DELETE (touched-file discovery scan) on a
    catalog-owned table. The discovery scan reads every file, so the
    guard is whole-table: ANY concurrent data winner aborts — same as
    the filesystem path."""
    return _coordinated_dml(
        spark, table_path, coordinator, delete_rows, where
    )


def update_rows_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    where: str,
    set_exprs: dict[str, str],
) -> tuple[int, int]:
    """Arbitrary-predicate UPDATE (touched-file discovery scan) on a
    catalog-owned table, whole-table guard as on the filesystem path."""
    return _coordinated_dml(
        spark, table_path, coordinator, update_rows, where, set_exprs
    )


def merge_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    source: DataFrame,
    key: str | list[str],
    *,
    when_matched: str = "update",
    when_not_matched_by_source: str | None = None,
) -> tuple[int, int]:
    """MERGE INTO a catalog-owned table: merge_delta's touched-file
    algorithm (semi-join discovery, per-target-row update, unmatched
    inserts appended, optional by-source delete) committed by
    ratification. The two-clause guard keeps the source's key interval,
    so a concurrent coordinated append with provably-disjoint stats
    rebases cleanly; the by-source clause holds the whole-table guard.
    Returns (new_version, n_files_rewritten)."""
    return _coordinated_dml(
        spark,
        table_path,
        coordinator,
        merge_delta,
        source,
        key,
        when_matched=when_matched,
        when_not_matched_by_source=when_not_matched_by_source,
    )


# ---------------------------------------------------------------------------
# streaming + log maintenance through the coordinator (round 13,
# VERDICT r12 next-step #2): the filesystem surfaces assume a LIST of
# the numbered log is current, which a catalog-owned table never
# guarantees — every entry point below consults the coordinator and
# backfills to the RATIFIED FRONTIER first, then runs the proven
# filesystem kernel under the scoped reader gate.
# ---------------------------------------------------------------------------


def ratified_frontier(
    table_path: str, coordinator: FileCommitCoordinator
) -> int:
    """The highest version the catalog has ratified (falls back to the
    latest numbered commit when the coordinator history is empty or
    already forgotten — backfilled versions ARE the frontier then).
    Checkpoint versions count as candidates too: after
    ``truncate_log_coordinated`` a fully-retained table may have NO
    numbered JSONs and NO catalog records — its checkpoint alone
    carries the frontier (review round 13: without it, checkpointing a
    healthy just-truncated table raised spuriously until the next
    commit). O(catalog listing) metadata work."""
    from .delta_log import _list_versions

    ratified = coordinator.ratified(_table_id(table_path))
    commits, checkpoints = _list_versions(table_path)
    candidates = set(ratified) | set(commits) | set(checkpoints)
    if not candidates:
        raise DeltaProtocolError(f"no commits at all for {table_path}")
    return max(candidates)


def _require_catalog_owned(table_path: str) -> None:
    """Spark-free ownership gate for the maintenance entry points that
    never build a snapshot (truncate/compact): the upgrade commit is
    always a plain filesystem commit, so the numbered log (or, after
    retention, the checkpoint parquet) always carries the feature
    stamp. Running coordinated maintenance on a filesystem-owned table
    would silently side-create catalog state for it — the converse
    split-brain direction the round-11 review closed for reads/writes
    (review round 13: truncate/compact had bypassed that gate)."""
    from .delta_pysource import _log_files_desc, _scan_log

    proto: dict[str, Any] | None = None
    scanned = _scan_log(table_path)
    checkpoints = scanned[1]
    for _v, path in _log_files_desc(table_path, scanned):
        for action in _parse_log_file(path):
            if "protocol" in action:
                proto = action["protocol"]
                break
        if proto:
            break
    if proto is None and checkpoints:
        import pyarrow.parquet as pq

        for part in checkpoints[max(checkpoints)]:
            t = pq.read_table(part)
            if "protocol" in t.column_names:
                for p in t.column("protocol").to_pylist():
                    if p and p.get("minReaderVersion") is not None:
                        proto = p
                        break
            if proto:
                break
    if proto is None:
        raise DeltaProtocolError(
            f"no protocol action found under {table_path}"
        )
    feats = set(proto.get("readerFeatures") or []) | set(
        proto.get("writerFeatures") or []
    )
    if CATALOG_OWNED_FEATURE not in feats:
        raise DeltaProtocolError(
            f"{table_path} is not catalog-owned; use the plain "
            "truncate_log/compact_log path — coordinating maintenance "
            "on a filesystem-owned table risks split-brain with "
            "concurrent filesystem writers"
        )


def stream_commit_batches_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    *,
    from_version: int = 0,
) -> list[tuple[int, DataFrame]]:
    """Append-only streaming replay of a catalog-owned table: consult
    the coordinator, backfill every ratified commit (the offsets a
    filesystem LIST yields are otherwise arbitrarily stale — the
    streaming bug the feature exists to prevent), then replay the
    numbered log with the filesystem kernel's exact semantics
    (dataChange:false yields nothing; dataChange removes reject).

    Returns the materialized [(version, DataFrame)] list up to the
    ratified frontier rather than a lazy generator: batch plans are
    created inside the scoped reader-gate context (plan creation needs
    the snapshot; a suspended generator would hold the scope open
    across consumer code). Each DataFrame stays a bounded distributed
    parquet read — only log metadata is touched here. Offsets compose
    across calls: resume with from_version = last frontier + 1."""
    snap = snapshot_coordinated(spark, table_path, coordinator)
    del snap  # gate + backfill; replay below re-reads the log
    with _allow_reader_features({CATALOG_OWNED_FEATURE}):
        return list(
            stream_commit_batches(spark, table_path, from_version=from_version)
        )


def write_checkpoint_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    parts: int | None = None,
) -> int:
    """Checkpoint a catalog-owned table AT the ratified frontier: the
    protocol forbids checkpointing a version the numbered log does not
    carry, and a coordinated table's numbered log is only current
    after a backfill — so this consults the catalog, backfills, and
    checkpoints exactly the frontier version. Returns it."""
    snap = snapshot_coordinated(spark, table_path, coordinator)
    frontier = ratified_frontier(table_path, coordinator)
    if snap.version != frontier:
        raise DeltaProtocolError(
            f"snapshot replayed v{snap.version} but the ratified frontier "
            f"is v{frontier} — a commit raced in; retry the checkpoint"
        )
    with _allow_reader_features({CATALOG_OWNED_FEATURE}):
        v = write_checkpoint(spark, table_path, parts)
    return v


def truncate_log_coordinated(
    table_path: str, coordinator: FileCommitCoordinator
) -> list[int]:
    """Log retention for a catalog-owned table — BOTH halves, in the
    only safe order: delete numbered JSONs at or before the latest
    checkpoint (the filesystem half), then have the catalog FORGET
    those versions and drop their staged copies. Forgetting first
    would leave replay unable to prove the removed range ever existed;
    forgetting never-backfilled commits would lose data outright —
    which is why ``FileCommitCoordinator.forget`` is only called here,
    bounded by the truncation horizon (every removed version was, by
    construction, backfilled AND covered by the checkpoint).

    Without the forget step the next ``snapshot_coordinated`` would
    faithfully re-backfill every truncated version from its staged
    copy — retention would silently undo itself. Returns the removed
    versions."""
    _require_catalog_owned(table_path)
    removed = truncate_log(table_path)
    if removed:
        tid = _table_id(table_path)
        horizon = max(removed)
        staged_names = {
            v: n
            for v, n in coordinator.ratified(tid).items()
            if v <= horizon
        }
        coordinator.forget(tid, horizon)
        for name in staged_names.values():
            staged = os.path.join(_staged_dir(table_path), name)
            if os.path.exists(staged):
                os.unlink(staged)
    return removed


def compact_log_coordinated(
    table_path: str,
    coordinator: FileCommitCoordinator,
    start_version: int,
    end_version: int,
) -> str:
    """Minor log compaction over a catalog-owned table's commit range:
    backfill the range first (compaction reconciles the NUMBERED
    files; ratified-but-staged commits would otherwise read as a hole)
    and refuse ranges beyond the ratified frontier — the catalog may
    ratify them mid-compaction, and a compacted file must never
    promise versions the catalog still owns exclusively."""
    _require_catalog_owned(table_path)
    frontier = ratified_frontier(table_path, coordinator)
    if end_version > frontier:
        raise DeltaProtocolError(
            f"compaction range end {end_version} exceeds the ratified "
            f"frontier {frontier}"
        )
    backfill(table_path, coordinator, up_to=end_version)
    return compact_log(table_path, start_version, end_version)


def stream_cdf_batches_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    *,
    from_version: int = 0,
) -> list[tuple[int, DataFrame]]:
    """CDF streaming replay of a catalog-owned table — the DML-capable
    companion of ``stream_commit_batches_coordinated`` (same
    backfill-to-frontier contract, same eager materialization under
    the scoped gate); change frames carry the logical schema plus
    _change_type and _commit_version, exactly as the filesystem
    kernel emits them."""
    snap = snapshot_coordinated(spark, table_path, coordinator)
    del snap
    with _allow_reader_features({CATALOG_OWNED_FEATURE}):
        return list(
            stream_cdf_batches(spark, table_path, from_version=from_version)
        )


def optimize_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    **kwargs: Any,
) -> int:
    """OPTIMIZE a catalog-owned table: the filesystem kernel's
    bin-packing / ZORDER / small-file selection, committed by staged
    ratification (the kernel's read-files guard flows into the
    ratification loop, so a concurrent remove of a compacted file
    aborts and a disjoint blind append rebases — identical conflict
    semantics to the filesystem path). dataChange:false is preserved,
    so coordinated streaming replays skip the reorganization."""
    return _coordinated_dml(
        spark, table_path, coordinator, optimize_delta, **kwargs
    )


def vacuum_coordinated(
    spark: SparkSession,
    table_path: str,
    coordinator: FileCommitCoordinator,
    retain_last: int = 1,
    **kwargs: Any,
) -> list[str]:
    """VACUUM a catalog-owned table — with the one extra step that
    makes it SAFE: backfill every ratified commit first. A vacuum
    driven by a filesystem LIST of a coordinated table would classify
    the data files of ratified-but-staged commits as unreferenced by
    any snapshot and DELETE them — the exact data-destruction mode
    the vacuumProtocolCheck feature exists to prevent, in catalog
    clothing. After backfill the numbered log is provably current and
    the filesystem kernel's retention logic (including its
    aborted-transaction reclamation, which correctly removes
    never-ratified staged commits' data files) applies unchanged."""
    snap = snapshot_coordinated(spark, table_path, coordinator)
    del snap  # ownership gate + backfill to the ratified frontier
    with _allow_reader_features({CATALOG_OWNED_FEATURE}):
        return vacuum_delta(spark, table_path, retain_last, **kwargs)
