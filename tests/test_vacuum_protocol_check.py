"""vacuumProtocolCheck (reader-writer feature, delta.io PROTOCOL.md):
VACUUM must read and honor the table protocol BEFORE deleting files —
an engine that vacuums a table whose protocol it cannot read would
classify live files as unreferenced and destroy them."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    read_delta,
    snapshot,
    upgrade_protocol_vacuum_check,
    vacuum_delta,
    write_delta,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )


def test_upgrade_stamps_feature_and_vacuum_still_works(spark, tbl):
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    v = upgrade_protocol_vacuum_check(spark, tbl)
    proto = snapshot(spark, tbl).protocol
    assert proto["minReaderVersion"] == 3
    assert "vacuumProtocolCheck" in proto["readerFeatures"]
    assert "vacuumProtocolCheck" in proto["writerFeatures"]
    # idempotent
    assert upgrade_protocol_vacuum_check(spark, tbl) == v
    removed = vacuum_delta(spark, tbl)
    assert removed  # v0's overwritten files reclaimed
    assert sorted(r.k for r in read_delta(spark, tbl).collect()) == list(
        range(5)
    )


def test_vacuum_aborts_on_unreadable_protocol_without_deleting(spark, tbl):
    """The data-destruction guard: an unsupported reader feature at the
    head must abort the vacuum BEFORE any file is removed (previously a
    DeltaProtocolError snapshot was skipped, marking every file
    unreferenced)."""
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    with open(
        os.path.join(tbl, "_delta_log", f"{2:020d}.json"), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "readerFeatures": ["collations-preview"],
                    }
                }
            )
            + "\n"
        )
    n_files = len(glob.glob(os.path.join(tbl, "*.parquet")))
    with pytest.raises(DeltaProtocolError, match="collations"):
        vacuum_delta(spark, tbl)
    assert len(glob.glob(os.path.join(tbl, "*.parquet"))) == n_files


def test_vacuum_counts_compaction_head(spark, tbl):
    """A log whose head survives only in a compaction file must retain
    THAT snapshot's files (versions list includes compaction ends)."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        compact_log,
    )

    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    write_delta(_kv(spark, 10, 20), tbl, mode="append")
    write_delta(_kv(spark, 0, 3), tbl, mode="overwrite")  # v2: head
    compact_log(tbl, 1, 2)
    for v in (1, 2):
        os.remove(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
    removed = vacuum_delta(spark, tbl)
    assert removed  # v0/v1 files reclaimed
    assert sorted(r.k for r in read_delta(spark, tbl).collect()) == [0, 1, 2]
