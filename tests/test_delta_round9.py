"""Round-9 delta surface: identity columns (writer v6), row tracking
(writer v7: rowTracking + domainMetadata), v2 checkpoints
(manifest + sidecars)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    ConcurrentModificationError,
    DeltaProtocolError,
    clone_delta,
    delete_delta_dv,
    delete_rows,
    merge_delta,
    optimize_delta,
    read_delta,
    read_delta_row_ids,
    snapshot,
    truncate_log,
    update_rows,
    upgrade_protocol_v2_checkpoint,
    write_checkpoint,
    write_checkpoint_v2,
    write_delta,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _names(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id")).alias("name")
    )


# ---------------------------------------------------------------------------
# identity columns
# ---------------------------------------------------------------------------


def test_identity_contiguous_assignment(spark, tbl):
    write_delta(
        _names(spark, 0, 25), tbl, mode="overwrite",
        identity={"uid": {"start": 10, "step": 4}},
    )
    ids = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert ids == [10 + 4 * k for k in range(25)]
    md = {
        f.name: dict(f.metadata or {})
        for f in snapshot(spark, tbl).schema.fields
    }["uid"]
    assert md["delta.identity.highWaterMark"] == 10 + 4 * 24
    assert int(snapshot(spark, tbl).protocol["minWriterVersion"]) >= 6


def test_identity_append_continues(spark, tbl):
    write_delta(
        _names(spark, 0, 7), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1}},
    )
    write_delta(_names(spark, 0, 5, "y"), tbl, mode="append")
    ids = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert ids == list(range(1, 13))


def test_identity_generated_always_rejects_explicit(spark, tbl):
    write_delta(
        _names(spark, 0, 3), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1}},
    )
    bad = spark.range(3).select(
        F.concat(F.lit("z"), F.col("id")).alias("name"),
        F.col("id").alias("uid"),
    )
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        write_delta(bad, tbl, mode="append")


def test_identity_by_default_grid_snap(spark, tbl):
    write_delta(
        _names(spark, 0, 4), tbl, mode="overwrite",
        identity={"uid": {"start": 0, "step": 10, "allow_explicit": True}},
    )
    # off-grid explicit value 47 advances the mark; the next system
    # batch resumes ON the grid strictly above it (50, 60, ...)
    explicit = spark.createDataFrame([("e0", 47)], "name string, uid long")
    write_delta(explicit, tbl, mode="append")
    write_delta(_names(spark, 0, 3, "s"), tbl, mode="append")
    ids = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert ids == [0, 10, 20, 30, 47, 50, 60, 70]


def test_identity_explicit_behind_start_keeps_start(spark, tbl):
    write_delta(
        spark.createDataFrame([("e0", 5)], "name string, uid long"),
        tbl, mode="overwrite",
        identity={"uid": {"start": 100, "step": 1, "allow_explicit": True}},
    )
    write_delta(_names(spark, 0, 2), tbl, mode="append")
    ids = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert ids == [5, 100, 101]


def test_identity_negative_step(spark, tbl):
    write_delta(
        _names(spark, 0, 4), tbl, mode="overwrite",
        identity={"uid": {"start": 0, "step": -5}},
    )
    write_delta(_names(spark, 0, 2, "y"), tbl, mode="append")
    ids = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert ids == [-25, -20, -15, -10, -5, 0]


def test_identity_update_rejected(spark, tbl):
    write_delta(
        _names(spark, 0, 5), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1}},
    )
    with pytest.raises(DeltaProtocolError, match="identity"):
        update_rows(spark, tbl, "uid = 2", {"uid": "99"})


def test_identity_creation_only(spark, tbl):
    write_delta(_names(spark, 0, 5), tbl, mode="overwrite")
    with pytest.raises(DeltaProtocolError, match="creation"):
        write_delta(
            _names(spark, 0, 5), tbl, mode="append",
            identity={"uid": {"start": 1, "step": 1}},
        )


def test_identity_survives_checkpoint_replay(spark, tbl):
    write_delta(
        _names(spark, 0, 5), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1}},
    )
    write_checkpoint(spark, tbl)
    truncate_log(tbl)
    write_delta(_names(spark, 0, 3, "y"), tbl, mode="append")
    ids = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert ids == list(range(1, 9))


# ---------------------------------------------------------------------------
# row tracking
# ---------------------------------------------------------------------------


_RT_CONF = {"delta.enableRowTracking": "true"}


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )


def test_row_tracking_ranges_and_uniqueness(spark, tbl):
    write_delta(_kv(spark, 0, 30), tbl, mode="overwrite",
                configuration=_RT_CONF)
    write_delta(_kv(spark, 30, 50), tbl, mode="append")
    d = read_delta_row_ids(spark, tbl)
    per = {
        int(r.cv): (r.n, r.lo, r.hi)
        for r in d.groupBy(F.col("_row_commit_version").alias("cv"))
        .agg(F.count("*").alias("n"), F.min("_row_id").alias("lo"),
             F.max("_row_id").alias("hi"))
        .collect()
    }
    assert per == {0: (30, 0, 29), 1: (20, 30, 49)}
    assert d.select("_row_id").distinct().count() == 50
    proto = snapshot(spark, tbl).protocol
    assert proto["minWriterVersion"] == 7
    assert {"rowTracking", "domainMetadata"} <= set(proto["writerFeatures"])


def test_row_tracking_hwm_in_domain(spark, tbl):
    write_delta(_kv(spark, 0, 30), tbl, mode="overwrite",
                configuration=_RT_CONF)
    dm = snapshot(spark, tbl).domain_metadata["delta.rowTracking"]
    assert json.loads(dm["configuration"])["rowIdHighWaterMark"] == 29


def test_row_tracking_dv_delete_preserves_ids(spark, tbl):
    write_delta(_kv(spark, 0, 40), tbl, mode="overwrite",
                configuration=_RT_CONF)
    delete_delta_dv(spark, tbl, "k", 10, 19)
    d = read_delta_row_ids(spark, tbl)
    assert d.count() == 30
    assert d.select("_row_id").distinct().count() == 30
    # the mark is untouched: deleted ids are never reissued
    write_delta(_kv(spark, 100, 105), tbl, mode="append")
    d2 = read_delta_row_ids(spark, tbl)
    assert d2.agg(F.max("_row_id")).collect()[0][0] == 44
    assert d2.select("_row_id").distinct().count() == 35


def test_row_tracking_overwrite_never_reuses_ids(spark, tbl):
    write_delta(_kv(spark, 0, 20), tbl, mode="overwrite",
                configuration=_RT_CONF)
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    d = read_delta_row_ids(spark, tbl)
    assert d.agg(F.min("_row_id")).collect()[0][0] == 20
    dm = snapshot(spark, tbl).domain_metadata["delta.rowTracking"]
    assert json.loads(dm["configuration"])["rowIdHighWaterMark"] == 29


def test_row_tracking_rejects_rewriting_dml(spark, tbl):
    write_delta(_kv(spark, 0, 20), tbl, mode="overwrite",
                configuration=_RT_CONF)
    with pytest.raises(DeltaProtocolError, match="row-tracking"):
        delete_rows(spark, tbl, "k = 3")
    with pytest.raises(DeltaProtocolError, match="row-tracking"):
        update_rows(spark, tbl, "k = 3", {"g": "9"})
    with pytest.raises(DeltaProtocolError, match="row-tracking"):
        merge_delta(spark, tbl, _kv(spark, 0, 5), "k")


def test_row_tracking_optimize_materializes_ids(spark, tbl):
    write_delta(_kv(spark, 0, 30), tbl, mode="overwrite",
                configuration=_RT_CONF)
    write_delta(_kv(spark, 30, 50), tbl, mode="append")
    before = {
        r.k: (r._row_id, r._row_commit_version)
        for r in read_delta_row_ids(spark, tbl).collect()
    }
    optimize_delta(spark, tbl, target_files=1)
    after = {
        r.k: (r._row_id, r._row_commit_version)
        for r in read_delta_row_ids(spark, tbl).collect()
    }
    # compaction preserved every row's id AND commit version via the
    # materialized physical columns
    assert after == before
    # the physical columns never leak into logical reads
    assert read_delta(spark, tbl).columns == ["k", "g"]
    # fresh appends after OPTIMIZE continue above the advanced mark
    write_delta(_kv(spark, 100, 103), tbl, mode="append")
    d = read_delta_row_ids(spark, tbl)
    assert d.select("_row_id").distinct().count() == 53
    # a DV delete on the compacted file still preserves survivor ids
    delete_delta_dv(spark, tbl, "k", 0, 9)
    d2 = read_delta_row_ids(spark, tbl)
    assert d2.count() == 43
    assert {r.k: r._row_id for r in d2.collect() if r.k >= 10 and r.k < 50} == {
        k: v[0] for k, v in before.items() if k >= 10
    }


def test_row_tracking_clone_carries_domain(spark, tbl, tmp_path):
    write_delta(_kv(spark, 0, 20), tbl, mode="overwrite",
                configuration=_RT_CONF)
    dst = str(tmp_path / "clone")
    clone_delta(spark, tbl, dst)
    write_delta(_kv(spark, 20, 25), dst, mode="append")
    d = read_delta_row_ids(spark, dst)
    assert d.count() == 25
    assert d.select("_row_id").distinct().count() == 25


def test_row_tracking_checkpoint_preserves_hwm(spark, tbl):
    write_delta(_kv(spark, 0, 20), tbl, mode="overwrite",
                configuration=_RT_CONF)
    write_checkpoint(spark, tbl)
    truncate_log(tbl)
    write_delta(_kv(spark, 20, 30), tbl, mode="append")
    d = read_delta_row_ids(spark, tbl)
    assert d.select("_row_id").distinct().count() == 30
    assert d.agg(F.max("_row_id")).collect()[0][0] == 29


def test_row_tracking_concurrent_appends_conflict():
    # the conflict matrix itself: a winner advancing the same metadata
    # domain must abort the loser even though it is a blind append —
    # its baseRowIds were assigned from a now-stale high-water mark
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        _check_rebase,
        _CommitGuard,
    )

    winner = [
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": 999}),
                "removed": False,
            }
        },
        {"add": {"path": "f.parquet", "dataChange": True}},
    ]
    guard = _CommitGuard(
        blind_append=True,
        domains=frozenset({"delta.rowTracking"}),
        stamp_row_commit_version=True,
    )
    with pytest.raises(ConcurrentModificationError, match="domain"):
        _check_rebase(winner, guard, 1)
    # a plain blind append (no domain writes) still rebases cleanly
    _check_rebase(winner, _CommitGuard(blind_append=True), 1)


def test_row_id_read_requires_tracking(spark, tbl):
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    with pytest.raises(DeltaProtocolError, match="row tracking"):
        read_delta_row_ids(spark, tbl)


# ---------------------------------------------------------------------------
# v2 checkpoints
# ---------------------------------------------------------------------------


def test_v2_checkpoint_roundtrip_with_tombstones(spark, tbl):
    write_delta(_kv(spark, 0, 40), tbl, mode="overwrite")
    write_delta(_kv(spark, 40, 60), tbl, mode="append")
    delete_rows(spark, tbl, "k >= 50")
    v = write_checkpoint_v2(spark, tbl, sidecar_parts=3)
    assert truncate_log(tbl)
    snap = snapshot(spark, tbl)
    assert snap.version == v
    assert snap.tombstones  # remove actions survived via sidecars
    assert read_delta(spark, tbl).count() == 50
    # the engine can keep writing after replaying from the manifest
    write_delta(_kv(spark, 100, 110), tbl, mode="append")
    assert read_delta(spark, tbl).count() == 60


def test_v2_checkpoint_protocol_upgrade_idempotent(spark, tbl):
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    v1 = upgrade_protocol_v2_checkpoint(spark, tbl)
    v2 = upgrade_protocol_v2_checkpoint(spark, tbl)
    assert v2 == v1  # second call commits nothing
    proto = snapshot(spark, tbl).protocol
    assert "v2Checkpoint" in proto["readerFeatures"]
    assert "v2Checkpoint" in proto["writerFeatures"]


def test_v2_checkpoint_missing_sidecar_fails_loudly(spark, tbl):
    write_delta(_kv(spark, 0, 20), tbl, mode="overwrite")
    write_checkpoint_v2(spark, tbl, sidecar_parts=2)
    truncate_log(tbl)
    side_dir = os.path.join(tbl, "_delta_log", "_sidecars")
    victim = sorted(os.listdir(side_dir))[0]
    os.remove(os.path.join(side_dir, victim))
    with pytest.raises(DeltaProtocolError, match="sidecar"):
        snapshot(spark, tbl)


def test_v2_checkpoint_preserves_domain_metadata(spark, tbl):
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite",
                configuration=_RT_CONF)
    write_checkpoint_v2(spark, tbl)
    truncate_log(tbl)
    snap = snapshot(spark, tbl)
    dm = snap.domain_metadata["delta.rowTracking"]
    assert json.loads(dm["configuration"])["rowIdHighWaterMark"] == 9
    # baseRowIds survive the checkpoint add actions
    d = read_delta_row_ids(spark, tbl)
    assert sorted(r._row_id for r in d.collect()) == list(range(10))


# ---------------------------------------------------------------------------
# round-9 interplay edges (post-review hardening)
# ---------------------------------------------------------------------------


def test_identity_overwrite_schema_rejected(spark, tbl):
    write_delta(
        _names(spark, 0, 5), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1}},
    )
    with pytest.raises(DeltaProtocolError, match="identity"):
        write_delta(
            spark.range(3).selectExpr("concat('z', id) AS other"),
            tbl, mode="overwrite", overwrite_schema=True,
        )


def test_row_tracking_overwrite_schema_stamps(spark, tbl):
    write_delta(_kv(spark, 0, 20), tbl, mode="overwrite",
                configuration=_RT_CONF)
    write_delta(
        spark.range(10).selectExpr("id AS k", "id * 2 AS v2"),
        tbl, mode="overwrite", overwrite_schema=True,
    )
    d = read_delta_row_ids(spark, tbl)
    # the schema-replacing overwrite still reserved fresh ids above the
    # old mark (never reused) and advanced the domain
    assert d.count() == 10
    assert d.agg(F.min("_row_id")).collect()[0][0] == 20
    dm = snapshot(spark, tbl).domain_metadata["delta.rowTracking"]
    assert json.loads(dm["configuration"])["rowIdHighWaterMark"] == 29


def test_merge_rejects_generated_always_identity(spark, tbl):
    write_delta(
        _names(spark, 0, 5), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1}},
    )
    src = spark.range(2).selectExpr(
        "concat('m', id) AS name", "CAST(id + 100 AS LONG) AS uid"
    )
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        merge_delta(spark, tbl, src, "name")


def test_merge_by_default_identity_advances_hwm(spark, tbl):
    write_delta(
        _names(spark, 0, 5), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1, "allow_explicit": True}},
    )
    src = spark.createDataFrame(
        [("m0", 500), ("x1", 2)], "name string, uid long"
    )
    merge_delta(spark, tbl, src, "name")
    # a later system-assigned append must continue above the merged 500
    write_delta(_names(spark, 0, 2, "p"), tbl, mode="append")
    ids = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert ids[-2:] == [501, 502]
    assert 500 in ids


def test_identity_explicit_with_nulls_rejected(spark, tbl):
    # review finding: F.max skips NULLs, so a mixed batch used to land
    # NULL ids into the non-nullable identity column
    write_delta(
        _names(spark, 0, 3), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1, "allow_explicit": True}},
    )
    bad = spark.createDataFrame(
        [("x", 100), ("y", None)], "name string, uid long"
    )
    with pytest.raises(DeltaProtocolError, match="NULL"):
        write_delta(bad, tbl, mode="append")


def test_identity_empty_explicit_frame_is_noop(spark, tbl):
    write_delta(
        _names(spark, 0, 3), tbl, mode="overwrite",
        identity={"uid": {"start": 1, "step": 1, "allow_explicit": True}},
    )
    empty = spark.createDataFrame([], "name string, uid long")
    write_delta(empty, tbl, mode="append")  # must not raise
    write_delta(_names(spark, 0, 2, "y"), tbl, mode="append")
    ids = sorted(r.uid for r in read_delta(spark, tbl).collect())
    assert ids == [1, 2, 3, 4, 5]


def test_row_ids_on_partitioned_clone(spark, tbl, tmp_path):
    # review finding: the row-id scan must group by hive base or a
    # partitioned shallow clone (absolute source paths) fails basePath
    src = spark.range(0, 24).selectExpr("id AS k", "id % 3 AS part")
    write_delta(src, tbl, mode="overwrite", partition_by=["part"],
                configuration=_RT_CONF)
    dst = str(tmp_path / "pclone")
    clone_delta(spark, tbl, dst)
    write_delta(
        spark.range(24, 30).selectExpr("id AS k", "id % 3 AS part"),
        dst, mode="append",
    )
    d = read_delta_row_ids(spark, dst)
    assert d.count() == 30
    assert d.select("_row_id").distinct().count() == 30
