"""Checkpoint protection (writer-v7 feature ``checkpointProtection``,
delta.io PROTOCOL.md): history below
``delta.requireCheckpointProtectionBeforeVersion`` may only be cleaned
in one sweep whose boundary checkpoint reaches that version; protected
checkpoints survive partial cleanups, and replay must not reconcile
across one via a straddling log compaction — the interplay of the
engine's truncate_log (r6), v2 checkpoints (r9), and compact_log (r10)
surfaces."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    compact_log,
    read_delta,
    snapshot,
    truncate_log,
    upgrade_protocol_checkpoint_protection,
    vacuum_delta,
    write_checkpoint,
    write_delta,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )


def _commit_path(tbl_path, v):
    return os.path.join(tbl_path, "_delta_log", f"{v:020d}.json")


def test_upgrade_stamps_feature_and_property(spark, tbl):
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    write_delta(_kv(spark, 5, 10), tbl, mode="append")
    v = upgrade_protocol_checkpoint_protection(spark, tbl)
    assert v == 2
    snap = snapshot(spark, tbl)
    p = snap.protocol
    assert p["minWriterVersion"] == 7
    assert "checkpointProtection" in p["writerFeatures"]
    assert p["minReaderVersion"] == 1 and "readerFeatures" not in p
    assert snap.configuration[
        "delta.requireCheckpointProtectionBeforeVersion"
    ] == "2"


def test_truncate_refused_below_protection_then_allowed(spark, tbl):
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    write_delta(_kv(spark, 5, 10), tbl, mode="append")
    write_checkpoint(spark, tbl)  # checkpoint at v1
    write_delta(_kv(spark, 10, 15), tbl, mode="append")  # v2
    upgrade_protocol_checkpoint_protection(spark, tbl, before_version=4)
    # boundary checkpoint (1) is below the protection version (4):
    # partial cleanup refused, protected checkpoint untouched
    with pytest.raises(DeltaProtocolError, match="checkpointProtection"):
        truncate_log(tbl)
    ckpt1 = os.path.join(tbl, "_delta_log", f"{1:020d}.checkpoint.parquet")
    assert os.path.exists(ckpt1)
    # a boundary checkpoint AT OR PAST the protection version unlocks
    # the one-sweep cleanup
    write_checkpoint(spark, tbl)  # at v3 (the upgrade commit) < 4? v3 >= ...
    v = snapshot(spark, tbl).version
    assert v == 3
    write_delta(_kv(spark, 15, 16), tbl, mode="append")  # v4
    write_checkpoint(spark, tbl)  # at v4 >= 4
    removed = truncate_log(tbl)
    assert removed and max(removed) == 4
    assert os.path.exists(ckpt1)  # protected checkpoint survived
    assert read_delta(spark, tbl).count() == 16


def test_compact_refuses_straddling_protected_checkpoint(spark, tbl):
    for lo in range(0, 10, 2):  # v0..v4
        write_delta(
            _kv(spark, lo, lo + 2), tbl,
            mode="overwrite" if lo == 0 else "append",
        )
        if lo == 4:
            write_checkpoint(spark, tbl)  # checkpoint at v2
    upgrade_protocol_checkpoint_protection(spark, tbl)  # v5, protects < 6
    with pytest.raises(DeltaProtocolError, match="straddles"):
        compact_log(tbl, 1, 4)
    # a range entirely PAST the protected checkpoint is fine
    assert os.path.exists(compact_log(tbl, 3, 5))


def test_replay_ignores_straddling_compaction(spark, tbl):
    for lo in range(0, 10, 2):  # v0..v4
        write_delta(
            _kv(spark, lo, lo + 2), tbl,
            mode="overwrite" if lo == 0 else "append",
        )
        if lo == 4:
            write_checkpoint(spark, tbl)  # checkpoint at v2
    # straddling compaction authored BEFORE protection (legal then)
    compact_log(tbl, 1, 4)
    upgrade_protocol_checkpoint_protection(spark, tbl)  # v5, protects < 6
    os.remove(_commit_path(tbl, 3))
    os.remove(_commit_path(tbl, 4))
    # replay resumes at the PROTECTED checkpoint 2; the [1,4] compaction
    # straddles it and must be ignored -> the gap is loud, not folded
    with pytest.raises(FileNotFoundError, match="missing commit 3"):
        snapshot(spark, tbl)
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        _snapshot_partitions,
    )

    with pytest.raises(DeltaProtocolError, match="missing commit 3"):
        _snapshot_partitions(tbl)


def test_replay_uses_straddling_compaction_without_protection(spark, tbl):
    """The r10 behavior is unchanged when protection is off: straddling
    compactions are last-writer-wins safe and substitute for deleted
    commits."""
    for lo in range(0, 10, 2):  # v0..v4
        write_delta(
            _kv(spark, lo, lo + 2), tbl,
            mode="overwrite" if lo == 0 else "append",
        )
        if lo == 4:
            write_checkpoint(spark, tbl)  # checkpoint at v2
    compact_log(tbl, 1, 4)
    os.remove(_commit_path(tbl, 3))
    os.remove(_commit_path(tbl, 4))
    assert read_delta(spark, tbl).count() == 10


def test_vacuum_leaves_protected_checkpoint(spark, tbl):
    write_delta(_kv(spark, 0, 6), tbl, mode="overwrite")
    write_delta(_kv(spark, 6, 12), tbl, mode="append")
    write_checkpoint(spark, tbl)  # at v1
    upgrade_protocol_checkpoint_protection(spark, tbl)  # v2
    write_delta(_kv(spark, 0, 12), tbl, mode="overwrite")  # v3 tombstones
    vacuum_delta(spark, tbl, retain_last=1)
    ckpt1 = os.path.join(tbl, "_delta_log", f"{1:020d}.checkpoint.parquet")
    assert os.path.exists(ckpt1)
    assert read_delta(spark, tbl).count() == 12
