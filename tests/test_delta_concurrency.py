"""Optimistic concurrency for the Delta writer (round 6, VERDICT r5
next-step #1): commits land via atomic put-if-absent (hard-link), blind
appends REBASE over concurrent data commits, scoped writes rebase over
provably-disjoint ones, and conflicting transactions abort with
ConcurrentModificationError instead of clobbering each other's commit
JSON — the behavior every reference MERGE gets from Delta's
OptimisticTransaction (1_customer_data_processing.py:311-318)."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    ConcurrentModificationError,
    _CommitGuard,
    _commit,
    _try_write_commit,
    overwrite_partitions_delta,
    read_delta,
    snapshot,
    write_delta,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _base(spark):
    return spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )


def test_concurrent_appends_all_land_with_dense_versions(spark, tbl):
    """N threads appending concurrently: every append lands, versions
    are dense (no clobbered commit JSON), and the snapshot holds the
    union — the first thing a real cluster does to a table."""
    base = _base(spark)
    write_delta(base.filter("k < 8"), tbl, mode="overwrite")  # v0

    slices = [base.filter(f"k >= 8 and k % 4 = {i}") for i in range(4)]
    errors: list[Exception] = []

    def appender(df):
        try:
            write_delta(df, tbl, mode="append")
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(e)

    threads = [threading.Thread(target=appender, args=(s,)) for s in slices]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []

    snap = snapshot(spark, tbl)
    assert snap.version == 4  # dense: v0 + exactly one commit per appender
    for v in range(5):
        assert os.path.exists(
            os.path.join(tbl, "_delta_log", f"{v:020d}.json")
        )
    got = {r.k for r in read_delta(spark, tbl).collect()}
    assert got == set(range(40))


def test_put_if_absent_is_atomic(spark, tbl):
    os.makedirs(os.path.join(tbl, "_delta_log"))
    a = [{"commitInfo": {"operation": "A"}}]
    b = [{"commitInfo": {"operation": "B"}}]
    assert _try_write_commit(tbl, 0, a) is True
    assert _try_write_commit(tbl, 0, b) is False  # loser does NOT clobber
    with open(os.path.join(tbl, "_delta_log", f"{0:020d}.json")) as fh:
        assert json.loads(fh.read())["commitInfo"]["operation"] == "A"
    # no temp litter
    assert [
        n for n in os.listdir(os.path.join(tbl, "_delta_log"))
        if n.endswith(".tmp")
    ] == []


def test_blind_append_rebases_over_concurrent_data_commit(spark, tbl):
    """An append whose intended version was taken by another data commit
    retries at the next version instead of failing."""
    base = _base(spark)
    write_delta(base.filter("k < 10"), tbl, mode="overwrite")  # v0
    write_delta(base.filter("k >= 10 and k < 20"), tbl, mode="append")  # v1

    # a transaction based on the v0 snapshot commits an append: it must
    # land at v2 (rebased over v1), not collide or abort
    v = _commit(
        tbl,
        [{"commitInfo": {"operation": "WRITE"}}],
        _CommitGuard(blind_append=True),
        base_version=0,
    )
    assert v == 2


def test_full_overwrite_aborts_when_concurrent_data_landed(spark, tbl):
    base = _base(spark)
    write_delta(base.filter("k < 10"), tbl, mode="overwrite")  # v0
    write_delta(base.filter("k >= 10 and k < 20"), tbl, mode="append")  # v1

    guard = _CommitGuard(read_whole_table=True, read_files={"some.parquet"})
    with pytest.raises(ConcurrentModificationError, match="appended data"):
        _commit(tbl, [{"commitInfo": {}}], guard, base_version=0)


def test_remove_overlap_aborts(spark, tbl):
    """Two transactions removing the same file (e.g. two OPTIMIZE or a
    DELETE racing a compaction): the loser aborts."""
    base = _base(spark)
    write_delta(base, tbl, mode="overwrite")  # v0
    rel = next(iter(snapshot(spark, tbl).files))
    # winner at v1 removes `rel`
    _try_write_commit(
        tbl,
        1,
        [{"remove": {"path": rel, "dataChange": False}}],
    )
    guard = _CommitGuard(removed={rel}, read_files={rel})
    with pytest.raises(ConcurrentModificationError, match="removed files"):
        _commit(tbl, [{"commitInfo": {}}], guard, base_version=0)


def test_metadata_change_aborts_everything_even_appends(spark, tbl):
    base = _base(spark)
    write_delta(base, tbl, mode="overwrite")  # v0
    _try_write_commit(
        tbl, 1, [{"metaData": {"schemaString": "{}", "partitionColumns": []}}]
    )
    with pytest.raises(ConcurrentModificationError, match="metadata"):
        _commit(
            tbl,
            [{"commitInfo": {}}],
            _CommitGuard(blind_append=True),
            base_version=0,
        )


def test_disjoint_partition_overwrites_both_land(spark, tbl):
    """Dynamic partition overwrite is partition-scoped: a transaction
    that lost the race to a commit touching DIFFERENT partitions
    rebases and lands; one touching the SAME partition aborts."""
    base = _base(spark)
    write_delta(base, tbl, mode="overwrite", partition_by=["p"])  # v0

    # winner: refresh partition p=2 (lands at v1)
    refresh2 = base.filter("p = 2").withColumn("k", F.col("k") + 1000)
    assert overwrite_partitions_delta(refresh2, tbl, partition_by=["p"]) == 1

    # loser based on v0 replacing p=1: disjoint -> rebases to v2
    v = _commit(
        tbl,
        [{"commitInfo": {"operation": "WRITE"}}],
        _CommitGuard(partitions={("1",)}, pcols=["p"]),
        base_version=0,
    )
    assert v == 2

    # loser based on v0 replacing p=2: overlaps the winner -> abort
    with pytest.raises(ConcurrentModificationError, match="partition"):
        _commit(
            tbl,
            [{"commitInfo": {"operation": "WRITE"}}],
            _CommitGuard(partitions={("2",)}, pcols=["p"]),
            base_version=0,
        )


def test_predicate_scoped_dml_rebases_when_stats_disjoint(spark, tbl):
    """A DELETE's conflict scope is its predicate interval: a concurrent
    append whose file stats PROVE disjointness rebases; one that may
    contain matching rows aborts."""
    base = _base(spark)
    write_delta(base.filter("k < 20"), tbl, mode="overwrite")  # v0
    write_delta(base.filter("k >= 30"), tbl, mode="append")  # v1: k in [30,39]

    # DELETE k in [0, 5] based on v0: appended file k>=30 is provably
    # disjoint -> rebase to v2
    v = _commit(
        tbl,
        [{"commitInfo": {"operation": "DELETE"}}],
        _CommitGuard(read_files={"x"}, predicate=("k", 0, 5)),
        base_version=0,
    )
    assert v == 2

    # DELETE k in [0, 35] based on v0: the appended file intersects ->
    # abort (its rows were not part of this transaction's read)
    with pytest.raises(ConcurrentModificationError, match="predicate"):
        _commit(
            tbl,
            [{"commitInfo": {"operation": "DELETE"}}],
            _CommitGuard(read_files={"x"}, predicate=("k", 0, 35)),
            base_version=0,
        )


def test_aborted_transaction_files_are_invisible_and_vacuumable(spark, tbl):
    """A conflicting writer's already-staged data files never enter the
    snapshot and are reclaimed by vacuum — abort leaves no wrong rows."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        _stage_write,
        vacuum_delta,
    )

    base = _base(spark)
    write_delta(base.filter("k < 10"), tbl, mode="overwrite")
    n_before = read_delta(spark, tbl).count()

    # simulate the doomed transaction's data write (staged + moved)
    orphans = _stage_write(base.filter("k >= 30"), tbl, [])
    assert orphans
    assert read_delta(spark, tbl).count() == n_before  # invisible
    removed = vacuum_delta(spark, tbl)
    assert set(orphans) <= set(removed)
    assert read_delta(spark, tbl).count() == n_before


def test_optimize_and_appends_interleave_without_loss(spark, tbl):
    """Integration: a compaction loop races an append loop with REAL
    threads. OPTIMIZE tolerates concurrent appends (they are not part
    of the rewritten set) and appends rebase over everything, so — in
    whatever order the race resolves — every appended row must be
    present exactly once, versions must be dense, and the log must
    replay cleanly."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        optimize_delta,
    )

    base = _base(spark)
    write_delta(base.filter("k < 8"), tbl, mode="overwrite")  # v0

    errors: list[Exception] = []

    def appender():
        try:
            for i in range(1, 5):
                write_delta(
                    base.filter(f"k >= {i * 8} and k < {(i + 1) * 8}"),
                    tbl,
                    mode="append",
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def compactor():
        for _ in range(3):
            try:
                optimize_delta(spark, tbl, target_files=2)
            except ConcurrentModificationError:
                pass  # an append removed nothing; only optimize-vs-
                # optimize overlap aborts — acceptable, retry next loop

    ta = threading.Thread(target=appender)
    tc = threading.Thread(target=compactor)
    ta.start(); tc.start()
    ta.join(); tc.join()
    assert errors == []

    snap = snapshot(spark, tbl)
    # dense versions: every commit number up to latest exists
    for v in range(snap.version + 1):
        assert os.path.exists(
            os.path.join(tbl, "_delta_log", f"{v:020d}.json")
        ), f"commit {v} missing"
    got = sorted(r.k for r in read_delta(spark, tbl).collect())
    assert got == list(range(40))  # no loss, no duplication
