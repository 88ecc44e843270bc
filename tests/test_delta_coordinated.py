"""catalogOwned-preview (round 11): commit ownership at a coordinator —
staged commits, ratification races, backfill, the filesystem-reader
gate, and coordinated time travel."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_coordinated import (
    _stage_commit,
    _staged_dir,
    _table_id,
    append_coordinated,
    backfill,
    CATALOG_OWNED_FEATURE,
    create_catalog_owned,
    FileCommitCoordinator,
    read_delta_coordinated,
    snapshot_coordinated,
    upgrade_to_catalog_owned,
)
from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    ConcurrentModificationError,
    DeltaProtocolError,
    read_delta,
    snapshot,
    write_delta,
)


@pytest.fixture()
def coord_table(spark):
    base = tempfile.mkdtemp(prefix="mm_co_")
    root = os.path.join(base, "t")
    cat = FileCommitCoordinator(os.path.join(base, "catalog"))
    df = spark.range(12).select("id", (F.col("id") % 3).alias("g"))
    create_catalog_owned(df, root, cat)
    return root, cat


def _g(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") % 3).alias("g"))


def test_upgrade_stamps_feature_and_restates_capabilities(spark, coord_table):
    root, cat = coord_table
    snap = snapshot_coordinated(spark, root, cat)
    proto = snap.protocol
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert CATALOG_OWNED_FEATURE in proto["readerFeatures"]
    assert CATALOG_OWNED_FEATURE in proto["writerFeatures"]
    assert "appendOnly" in proto["writerFeatures"]  # restated legacy
    with pytest.raises(DeltaProtocolError):
        upgrade_to_catalog_owned(spark, root, cat)  # already owned


def test_filesystem_readers_are_gated(spark, coord_table):
    root, _cat = coord_table
    with pytest.raises(DeltaProtocolError, match="catalogOwned"):
        snapshot(spark, root)
    with pytest.raises(DeltaProtocolError, match="catalogOwned"):
        read_delta(spark, root)
    # the python datasource is a filesystem reader too
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        register_delta_source,
    )

    register_delta_source(spark)
    with pytest.raises(Exception, match="catalogOwned"):
        spark.read.format("delta_pylog").option("path", root).load().count()


def test_coordinated_append_and_lazy_backfill(spark, coord_table):
    root, cat = coord_table
    v2 = append_coordinated(_g(spark, 12, 20), root, cat)
    v3 = append_coordinated(_g(spark, 20, 23), root, cat)
    assert (v2, v3) == (2, 3)
    # the LAST ratified commit stays staged until a read backfills it
    log = os.path.join(root, "_delta_log")
    assert not os.path.exists(os.path.join(log, f"{v3:020d}.json"))
    out = read_delta_coordinated(spark, root, cat)
    assert out.count() == 23
    assert out.agg(F.sum("id")).first()[0] == sum(range(23))
    assert os.path.exists(os.path.join(log, f"{v3:020d}.json"))


def test_never_ratified_staged_commits_are_invisible(spark, coord_table):
    root, cat = coord_table
    append_coordinated(_g(spark, 12, 15), root, cat)
    # forge a staged commit that never wins ratification
    _stage_commit(
        root,
        99,
        [{"commitInfo": {"timestamp": 1, "operation": "WRITE"}}],
    )
    snap = snapshot_coordinated(spark, root, cat)
    assert snap.version == 2
    assert read_delta_coordinated(spark, root, cat).count() == 15


class _RacingCoordinator(FileCommitCoordinator):
    """Ratifies one foreign commit at the contested version IN BETWEEN
    the victim's snapshot and its own ratify call — the deterministic
    reproduction of a real concurrent writer winning the race."""

    def __init__(self, root: str, table: str, foreign_actions) -> None:
        super().__init__(root)
        self._table = table
        self._foreign_actions = foreign_actions
        self.raced = False

    def ratify(self, table_id, version, staged_name):
        if not self.raced:
            self.raced = True
            foreign = _stage_commit(self._table, version, self._foreign_actions)
            assert super().ratify(table_id, version, foreign)
        return super().ratify(table_id, version, staged_name)


def test_ratification_race_loser_rebases(spark, coord_table):
    root, cat = coord_table
    racing = _RacingCoordinator(
        cat.root,
        root,
        [
            {
                "commitInfo": {
                    "timestamp": 1,
                    "operation": "WRITE",
                    "operationParameters": {"mode": "Append"},
                }
            }
        ],
    )
    snap = snapshot_coordinated(spark, root, cat)
    v = append_coordinated(_g(spark, 12, 16), root, racing)
    assert racing.raced
    assert v == snap.version + 2  # lost version+1, rebased onto +2
    assert read_delta_coordinated(spark, root, cat).count() == 16


def test_ratification_race_metadata_winner_aborts(spark, coord_table):
    root, cat = coord_table
    racing = _RacingCoordinator(
        cat.root,
        root,
        [
            {"commitInfo": {"timestamp": 1, "operation": "SET TBLPROPERTIES"}},
            {
                "metaData": {
                    "id": "someone-else",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(
                        {"type": "struct", "fields": []}
                    ),
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
        ],
    )
    with pytest.raises(ConcurrentModificationError, match="metadata"):
        append_coordinated(_g(spark, 12, 16), root, racing)


def test_backfill_is_idempotent_and_race_safe(spark, coord_table):
    root, cat = coord_table
    append_coordinated(_g(spark, 12, 15), root, cat)
    first = backfill(root, cat)
    assert backfill(root, cat) == []  # second pass: nothing left
    assert first  # the first materialized at least the newest commit
    assert read_delta_coordinated(spark, root, cat).count() == 15


def test_coordinated_time_travel(spark, coord_table):
    root, cat = coord_table
    append_coordinated(_g(spark, 12, 20), root, cat)
    append_coordinated(_g(spark, 20, 30), root, cat)
    assert read_delta_coordinated(spark, root, cat, version=1).count() == 12
    assert read_delta_coordinated(spark, root, cat, version=2).count() == 20
    assert read_delta_coordinated(spark, root, cat).count() == 30


def test_append_schema_mismatch_raises(spark, coord_table):
    root, cat = coord_table
    with pytest.raises(ValueError, match="schema"):
        append_coordinated(spark.range(3).select("id"), root, cat)


def test_upgrade_of_existing_plain_table(spark):
    base = tempfile.mkdtemp(prefix="mm_co_up_")
    root = os.path.join(base, "t")
    cat = FileCommitCoordinator(os.path.join(base, "catalog"))
    write_delta(_g(spark, 0, 5), root, mode="overwrite")
    write_delta(_g(spark, 5, 8), root, mode="append")
    v = upgrade_to_catalog_owned(spark, root, cat)
    assert v == 2
    append_coordinated(_g(spark, 8, 11), root, cat)
    assert read_delta_coordinated(spark, root, cat).count() == 11


def test_scoped_gate_restores_after_read(spark, coord_table):
    """The scoped reader-feature context must not leak: a plain
    filesystem read still raises right after a coordinated read."""
    root, cat = coord_table
    read_delta_coordinated(spark, root, cat).count()
    with pytest.raises(DeltaProtocolError, match="catalogOwned"):
        snapshot(spark, root)


def test_plain_writers_and_dml_are_gated(spark, coord_table):
    """Every filesystem-committing entry point refuses a catalog-owned
    table (they all snapshot first): split-brain is impossible."""
    root, _cat = coord_table
    with pytest.raises(DeltaProtocolError, match="catalogOwned"):
        write_delta(_g(spark, 0, 3), root, mode="append")
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        delete_delta,
    )

    with pytest.raises(DeltaProtocolError, match="catalogOwned"):
        delete_delta(spark, root, "id", 0, 3)


def test_stamped_feature_tables_refuse_coordinated_append(spark):
    """Preview scope gate: row-tracking tables need add-action stamping
    the coordinated path does not implement — refuse loudly."""
    base = tempfile.mkdtemp(prefix="mm_co_rt_")
    root = os.path.join(base, "t")
    cat = FileCommitCoordinator(os.path.join(base, "catalog"))
    write_delta(
        _g(spark, 0, 5),
        root,
        mode="overwrite",
        configuration={"delta.enableRowTracking": "true"},
    )
    upgrade_to_catalog_owned(spark, root, cat)
    with pytest.raises(DeltaProtocolError, match="row tracking"):
        append_coordinated(_g(spark, 5, 8), root, cat)


def test_coordinated_paths_refuse_plain_tables(spark):
    """The converse gate (round-11 review): coordinating commits on a
    filesystem-owned table would ratify versions concurrent plain
    writers legitimately win on disk — refuse before any
    ratification."""
    base = tempfile.mkdtemp(prefix="mm_co_plain_")
    root = os.path.join(base, "t")
    cat = FileCommitCoordinator(os.path.join(base, "catalog"))
    write_delta(_g(spark, 0, 6), root, mode="overwrite")
    with pytest.raises(DeltaProtocolError, match="not catalog-owned"):
        append_coordinated(_g(spark, 6, 9), root, cat)
    with pytest.raises(DeltaProtocolError, match="not catalog-owned"):
        read_delta_coordinated(spark, root, cat)
    # nothing was ratified and the table is untouched
    assert cat.ratified(_table_id(root)) == {}
    assert read_delta(spark, root).count() == 6


def test_backfill_detects_split_brain(spark, coord_table):
    """An existing <v>.json that differs from the ratified staged
    commit is a non-coordinated writer having won the same version —
    surfaced loudly, never skipped (round-11 review)."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        _commit_file,
    )

    root, cat = coord_table
    v = append_coordinated(_g(spark, 12, 15), root, cat)
    with open(_commit_file(root, v), "w", encoding="utf-8") as fh:
        fh.write(
            json.dumps({"commitInfo": {"operation": "ROGUE WRITE"}}) + "\n"
        )
    with pytest.raises(DeltaProtocolError, match="split-brain"):
        backfill(root, cat)


def test_scoped_gate_is_thread_local(spark, coord_table):
    """The reader-feature allowance is confined to the coordinated call
    stack: another driver thread's plain snapshot stays gated even
    while this thread holds the context open (round-11 review)."""
    import threading

    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        _allow_reader_features,
    )

    root, _cat = coord_table
    outcome: list[str] = []

    def probe() -> None:
        try:
            snapshot(spark, root)
            outcome.append("leaked")
        except DeltaProtocolError:
            outcome.append("gated")

    with _allow_reader_features({CATALOG_OWNED_FEATURE}):
        t = threading.Thread(target=probe)
        t.start()
        t.join()
    assert outcome == ["gated"]
