"""Minor log compaction (delta.io PROTOCOL.md): a
``<start>.<end>.compacted.json`` file holds the exact action
reconciliation of its commit range; readers replay it in place of the
individual commit JSONs. Both readers (snapshot/read_delta and the
Python DataSource planner) must honor it — a planner that silently
skipped a compacted gap would plan stale table state."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    compact_log,
    delete_rows,
    read_delta,
    snapshot,
    version_at_timestamp,
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


def _rm_commits(tbl, versions):
    for v in versions:
        os.remove(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))


def _build(spark, tbl):
    """v0 overwrite 0-10, v1 append 10-20, v2 delete k<5, v3 append 20-25."""
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    write_delta(_kv(spark, 10, 20), tbl, mode="append")
    delete_rows(spark, tbl, "k < 5")
    write_delta(_kv(spark, 20, 25), tbl, mode="append")


def test_compaction_replays_deleted_range(spark, tbl):
    _build(spark, tbl)
    before = sorted(r.k for r in read_delta(spark, tbl).collect())
    path = compact_log(tbl, 1, 3)
    assert os.path.basename(path) == (
        f"{1:020d}.{3:020d}.compacted.json"
    )
    _rm_commits(tbl, [1, 2, 3])
    snap = snapshot(spark, tbl)
    assert snap.version == 3
    after = sorted(r.k for r in read_delta(spark, tbl).collect())
    assert after == before == list(range(5, 25))


def test_compaction_reconciles_within_range(spark, tbl):
    _build(spark, tbl)
    with open(compact_log(tbl, 0, 3), encoding="utf-8") as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    adds = [a["add"]["path"] for a in actions if "add" in a]
    removes = [a["remove"]["path"] for a in actions if "remove" in a]
    live = set(snapshot(spark, tbl).files)
    assert set(adds) == live
    # files added then removed inside the range survive only as
    # tombstones, never as adds
    assert not set(adds) & set(removes)
    assert sum(1 for a in actions if "metaData" in a) == 1
    assert sum(1 for a in actions if "protocol" in a) == 1
    # the END commit's commitInfo is preserved
    cis = [a["commitInfo"] for a in actions if "commitInfo" in a]
    assert len(cis) == 1


def test_time_travel_to_compaction_end(spark, tbl):
    _build(spark, tbl)
    at_v2 = sorted(r.k for r in read_delta(spark, tbl, version=2).collect())
    compact_log(tbl, 1, 2)
    _rm_commits(tbl, [1, 2])
    got = sorted(r.k for r in read_delta(spark, tbl, version=2).collect())
    assert got == at_v2 == list(range(5, 20))
    # interior versions are gone — loud, not wrong
    with pytest.raises(ValueError, match="version 1"):
        read_delta(spark, tbl, version=1)


def test_append_after_compaction_keeps_timestamps_monotonic(spark, tbl):
    _build(spark, tbl)
    compact_log(tbl, 1, 3)
    _rm_commits(tbl, [1, 2, 3])
    # the next commit reads its predecessor's timestamp through the
    # compaction file (commitInfo of the end commit is preserved)
    write_delta(_kv(spark, 25, 30), tbl, mode="append")
    v3_ts = None
    with open(
        os.path.join(tbl, "_delta_log", f"{1:020d}.{3:020d}.compacted.json"),
        encoding="utf-8",
    ) as fh:
        for line in fh:
            a = json.loads(line)
            if "commitInfo" in a:
                v3_ts = a["commitInfo"]["timestamp"]
    with open(
        os.path.join(tbl, "_delta_log", f"{4:020d}.json"), encoding="utf-8"
    ) as fh:
        for line in fh:
            a = json.loads(line)
            if "commitInfo" in a:
                assert a["commitInfo"]["timestamp"] > v3_ts
    assert read_delta(spark, tbl).count() == 25
    assert version_at_timestamp(tbl, v3_ts) == 3


def test_checkpoint_plus_compaction_tail(spark, tbl):
    _build(spark, tbl)
    write_checkpoint(spark, tbl)  # at v3
    write_delta(_kv(spark, 25, 30), tbl, mode="append")  # v4
    write_delta(_kv(spark, 30, 35), tbl, mode="append")  # v5
    compact_log(tbl, 4, 5)
    _rm_commits(tbl, [0, 1, 2, 3, 4, 5])
    assert snapshot(spark, tbl).version == 5
    assert sorted(r.k for r in read_delta(spark, tbl).collect()) == list(
        range(5, 35)
    )


def test_pysource_plans_through_compaction(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        register_delta_source,
    )

    _build(spark, tbl)
    expect = sorted(r.k for r in read_delta(spark, tbl).collect())
    compact_log(tbl, 1, 3)
    _rm_commits(tbl, [1, 2, 3])
    register_delta_source(spark)
    got = spark.read.format("delta_pylog").option("path", tbl).load()
    assert sorted(r.k for r in got.collect()) == expect


def test_compaction_requires_full_range(spark, tbl):
    _build(spark, tbl)
    _rm_commits(tbl, [2])
    with pytest.raises(FileNotFoundError, match="commit 2"):
        compact_log(tbl, 1, 3)


def test_bad_range_rejected(spark, tbl):
    _build(spark, tbl)
    with pytest.raises(ValueError):
        compact_log(tbl, 3, 3)
    with pytest.raises(ValueError):
        compact_log(tbl, -1, 2)


def test_write_after_full_compaction_appends_not_recreates(spark, tbl):
    """Review r10 finding #1: a log whose only surviving artifacts are
    compaction files is an EXISTING table — a write must append on top
    of version 3, not re-create at version 0."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        snapshot,
    )

    _build(spark, tbl)
    compact_log(tbl, 0, 3)
    _rm_commits(tbl, [0, 1, 2, 3])
    v = write_delta(_kv(spark, 25, 30), tbl, mode="append")
    assert v == 4
    snap = snapshot(spark, tbl)
    assert snap.version == 4
    assert sorted(r.k for r in read_delta(spark, tbl).collect()) == list(
        range(5, 30)
    )


def test_compaction_straddling_checkpoint_still_replays(spark, tbl):
    """Review r10 finding #3: a compaction range that STARTS below the
    latest checkpoint must still serve the versions above it —
    re-applying reconciled actions over checkpoint state is
    last-writer-wins safe."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        snapshot,
    )

    _build(spark, tbl)  # v0..v3
    write_checkpoint(spark, tbl)  # checkpoint at v3
    write_delta(_kv(spark, 25, 30), tbl, mode="append")  # v4
    write_delta(_kv(spark, 30, 35), tbl, mode="append")  # v5
    compact_log(tbl, 2, 5)  # straddles the checkpoint
    _rm_commits(tbl, [0, 1, 2, 3, 4, 5])
    snap = snapshot(spark, tbl)
    assert snap.version == 5
    assert sorted(r.k for r in read_delta(spark, tbl).collect()) == list(
        range(5, 35)
    )


def test_pysource_raises_on_uncovered_gap(spark, tbl):
    """Review r10 finding #2: the Python DataSource planner must FAIL
    on a commit gap no compaction or checkpoint covers — silently
    skipping it would plan stale state (read_delta raises here too)."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        DeltaProtocolError,
    )
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        _snapshot_partitions,
    )

    _build(spark, tbl)
    _rm_commits(tbl, [2])  # no compaction covers v2
    with pytest.raises(DeltaProtocolError, match="missing commit 2"):
        _snapshot_partitions(tbl)
