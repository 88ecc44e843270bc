"""Version checksum files (``<v>.crc``, the delta-spark VersionChecksum
beside each commit): a state summary a reader validates its log replay
against — tampering or replay corruption must be LOUD."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    delete_delta_dv,
    delete_rows,
    verify_version_checksum,
    write_delta,
    write_version_checksum,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )


def test_write_and_verify_roundtrip(spark, tbl):
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    write_delta(_kv(spark, 10, 20), tbl, mode="append", txn=("app-1", 7))
    delete_rows(spark, tbl, "k < 3")
    path = write_version_checksum(spark, tbl)
    assert os.path.basename(path) == f"{2:020d}.crc"
    got = verify_version_checksum(spark, tbl)
    stored = json.loads(open(path, encoding="utf-8").read())
    assert stored["numFiles"] == got["numFiles"] >= 1
    assert got["setTransactions"] == [{"appId": "app-1", "version": 7}]
    assert got["tableSizeBytes"] > 0
    assert got["numMetadata"] == 1 and got["numProtocol"] == 1
    # per-version checksums coexist
    write_version_checksum(spark, tbl, version=0)
    assert verify_version_checksum(spark, tbl, version=0)["numFiles"] >= 1


def test_tampered_log_detected(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.registry_r10 import drop_first_add

    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    write_version_checksum(spark, tbl)
    drop_first_add(os.path.join(tbl, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(DeltaProtocolError, match="checksum mismatch"):
        verify_version_checksum(spark, tbl)


def test_truncated_checksum_detected(spark, tbl):
    """Review r10 pass-3 finding #1: a field-stripped .crc must NOT
    verify clean — missing MANDATORY fields are mismatches."""
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    path = write_version_checksum(spark, tbl)
    stored = json.loads(open(path, encoding="utf-8").read())
    del stored["metadata"]  # keep the format-identifying core fields
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(stored))
    with pytest.raises(DeltaProtocolError, match="checksum mismatch"):
        verify_version_checksum(spark, tbl)


def test_foreign_layout_is_distinct_error(spark, tbl):
    """r10 advice: a .crc that is not even VersionChecksum-shaped (no
    tableSizeBytes/numFiles core) must raise an 'incompatible format'
    error, NOT be reported as tampering."""
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    path = write_version_checksum(spark, tbl)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("{}")
    with pytest.raises(DeltaProtocolError, match="incompatible"):
        verify_version_checksum(spark, tbl)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write('["not-an-object"]')
    with pytest.raises(DeltaProtocolError, match="incompatible"):
        verify_version_checksum(spark, tbl)


def test_delta_spark_layout_extras_tolerated(spark, tbl):
    """A .crc written by delta-spark carries fields this engine does not
    derive (txnId, allFiles, histogramOpt; metaData.format/createdTime).
    When the derivable core matches, verification must pass — extras are
    layout, not divergence; delta-spark also omits empty optionals."""
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    path = write_version_checksum(spark, tbl)
    stored = json.loads(open(path, encoding="utf-8").read())
    assert "setTransactions" not in stored  # empty optional omitted
    assert "numDeletionVectorsOpt" not in stored
    stored["txnId"] = "11111111-2222-3333-4444-555555555555"
    stored["allFiles"] = []
    stored["histogramOpt"] = {"sortedBinBoundaries": [], "fileCounts": []}
    stored["metadata"] = dict(
        stored["metadata"],
        format={"provider": "parquet", "options": {}},
        createdTime=1700000000000,
        name=None,
        description=None,
    )
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(stored))
    got = verify_version_checksum(spark, tbl)
    assert got["numFiles"] >= 1


def test_missing_checksum_is_loud(spark, tbl):
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    with pytest.raises(DeltaProtocolError, match="no version checksum"):
        verify_version_checksum(spark, tbl)


def test_counts_deletion_vectors(spark, tbl):
    write_delta(_kv(spark, 0, 20), tbl, mode="overwrite")
    delete_delta_dv(spark, tbl, "k", 0, 4)  # range-predicate DV delete
    write_version_checksum(spark, tbl)
    got = verify_version_checksum(spark, tbl)
    assert got["numDeletionVectorsOpt"] >= 1


def test_crc_files_invisible_to_log_listing(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        _scan_log,
        read_delta,
    )

    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite")
    write_version_checksum(spark, tbl)
    commits, checkpoints, compactions = _scan_log(tbl)
    assert commits == [0] and not checkpoints and not compactions
    assert read_delta(spark, tbl).count() == 10
