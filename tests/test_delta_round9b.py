"""Round-9 second delta increment: formal in-commit timestamps
(writer-v7 feature inCommitTimestamp) and delta.appendOnly
enforcement."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    delete_delta_dv,
    delete_rows,
    merge_delta,
    optimize_delta,
    read_delta,
    restore_delta,
    snapshot,
    update_rows,
    vacuum_delta,
    version_at_timestamp,
    write_delta,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )


def _commit_info(tbl, v):
    with open(
        os.path.join(tbl, "_delta_log", f"{v:020d}.json"), encoding="utf-8"
    ) as fh:
        for line in fh:
            a = json.loads(line)
            if "commitInfo" in a:
                return a["commitInfo"]
    return None


_ICT_CONF = {"delta.enableInCommitTimestamps": "true"}


def test_ict_protocol_and_field(spark, tbl):
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite",
                configuration=_ICT_CONF)
    proto = snapshot(spark, tbl).protocol
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    ci = _commit_info(tbl, 0)
    assert ci["inCommitTimestamp"] == ci["timestamp"]


def test_ict_inherited_and_monotonic(spark, tbl):
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite",
                configuration=_ICT_CONF)
    write_delta(_kv(spark, 5, 10), tbl, mode="append")
    write_delta(_kv(spark, 10, 15), tbl, mode="append")
    infos = [_commit_info(tbl, v) for v in range(3)]
    # every later commit carries the field without being asked
    assert all(ci.get("inCommitTimestamp") is not None for ci in infos)
    ts = [ci["inCommitTimestamp"] for ci in infos]
    assert ts == sorted(set(ts)), f"not strictly monotonic: {ts}"


def test_ict_drives_timestamp_travel(spark, tbl):
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite",
                configuration=_ICT_CONF)
    write_delta(_kv(spark, 5, 10), tbl, mode="append")
    # doctor version 1's FILE timestamp backwards; the ict field is
    # authoritative, so resolution still lands on version 1
    t0 = _commit_info(tbl, 0)["inCommitTimestamp"]
    t1 = _commit_info(tbl, 1)["inCommitTimestamp"]
    assert version_at_timestamp(tbl, t0) == 0
    assert version_at_timestamp(tbl, t1) == 1
    assert read_delta(spark, tbl, version=version_at_timestamp(tbl, t0)).count() == 5


def test_plain_tables_do_not_carry_ict(spark, tbl):
    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    write_delta(_kv(spark, 5, 10), tbl, mode="append")
    for v in range(2):
        assert "inCommitTimestamp" not in _commit_info(tbl, v)


_AO_CONF = {"delta.appendOnly": "true"}


def test_append_only_accepts_appends(spark, tbl):
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite",
                configuration=_AO_CONF)
    write_delta(_kv(spark, 10, 20), tbl, mode="append")
    assert read_delta(spark, tbl).count() == 20


def test_append_only_rejects_row_removal(spark, tbl):
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite",
                configuration=_AO_CONF)
    with pytest.raises(DeltaProtocolError, match="append-only"):
        write_delta(_kv(spark, 0, 3), tbl, mode="overwrite")
    with pytest.raises(DeltaProtocolError, match="append-only"):
        delete_rows(spark, tbl, "k = 1")
    with pytest.raises(DeltaProtocolError, match="append-only"):
        update_rows(spark, tbl, "k = 1", {"g": "9"})
    with pytest.raises(DeltaProtocolError, match="append-only"):
        merge_delta(spark, tbl, _kv(spark, 0, 3), "k")
    with pytest.raises(DeltaProtocolError, match="append-only"):
        delete_delta_dv(spark, tbl, "k", 1, 3)
    with pytest.raises(DeltaProtocolError, match="append-only"):
        restore_delta(spark, tbl, 0)


def test_append_only_allows_optimize_and_vacuum(spark, tbl):
    write_delta(_kv(spark, 0, 10), tbl, mode="overwrite",
                configuration=_AO_CONF)
    write_delta(_kv(spark, 10, 20), tbl, mode="append")
    optimize_delta(spark, tbl, target_files=1)  # dataChange=false: legal
    assert read_delta(spark, tbl).count() == 20
    assert vacuum_delta(spark, tbl)  # reclaims the pre-compaction files
    assert read_delta(spark, tbl).count() == 20


# ---------------------------------------------------------------------------
# clustered tables (writer-v7 clusteredTable + delta.clustering domain)
# ---------------------------------------------------------------------------


def test_clustered_table_declaration(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        _clustering_columns,
    )

    df = spark.range(100).selectExpr("id AS a", "id % 10 AS b")
    write_delta(df, tbl, mode="overwrite", cluster_by=["a", "b"])
    snap = snapshot(spark, tbl)
    assert "clusteredTable" in snap.protocol["writerFeatures"]
    assert "domainMetadata" in snap.protocol["writerFeatures"]
    assert _clustering_columns(snap) == ["a", "b"]


def test_clustered_rejects_partitioning_and_unknown_cols(spark, tbl):
    df = spark.range(10).selectExpr("id AS a", "id % 2 AS b")
    with pytest.raises(DeltaProtocolError, match="mutually exclusive"):
        write_delta(df, tbl, mode="overwrite", cluster_by=["a"],
                    partition_by=["b"])
    with pytest.raises(DeltaProtocolError, match="not in the frame"):
        write_delta(df, tbl, mode="overwrite", cluster_by=["nope"])
    write_delta(df, tbl, mode="overwrite")
    with pytest.raises(DeltaProtocolError, match="creation"):
        write_delta(df, tbl, mode="append", cluster_by=["a"])


def test_optimize_autoclusters_two_columns(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        prune_files_by_stats,
    )

    df = spark.range(60000).selectExpr(
        "id AS a", "(id * 37) % 1000 AS b"
    ).repartition(8)
    write_delta(df, tbl, mode="overwrite", cluster_by=["a", "b"])
    optimize_delta(spark, tbl, target_files=8)
    snap = snapshot(spark, tbl)
    # a narrow band on a declared clustering column skips files — the
    # proof the optimize used the declared z-order, not a plain
    # coalesce (which dimension narrows more depends on the z-range
    # boundaries the session's file count produced)
    cand_b, total = prune_files_by_stats(snap, "b", 0, 120)
    cand_a, _ = prune_files_by_stats(snap, "a", 0, 7499)
    assert total >= 2
    assert len(cand_b) < total or len(cand_a) < total
    assert read_delta(spark, tbl).count() == 60000


def test_optimize_autoclusters_single_column(spark, tbl):
    import json as _json

    df = spark.range(60000).selectExpr(
        "id AS a", "(id * 37) % 1000 AS b"
    ).repartition(8)
    write_delta(df, tbl, mode="overwrite", cluster_by=["b"])
    optimize_delta(spark, tbl, target_files=8)
    snap = snapshot(spark, tbl)
    # the single-column auto-cluster property itself: each compacted
    # file covers a DISJOINT b-range (file counts vary with AQE state
    # under the shared test session, so assert the layout, not a count)
    ranges = sorted(
        (
            int(_json.loads(a["stats"])["minValues"]["b"]),
            int(_json.loads(a["stats"])["maxValues"]["b"]),
        )
        for a in snap.files.values()
    )
    assert len(ranges) >= 2
    assert all(
        ranges[i][1] <= ranges[i + 1][0] for i in range(len(ranges) - 1)
    ), f"overlapping b-ranges after range-cluster: {ranges}"
    assert read_delta(spark, tbl).count() == 60000


def test_clustering_survives_checkpoint(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        _clustering_columns,
        truncate_log,
        write_checkpoint,
    )

    df = spark.range(100).selectExpr("id AS a", "id % 10 AS b")
    write_delta(df, tbl, mode="overwrite", cluster_by=["a"])
    write_checkpoint(spark, tbl)
    truncate_log(tbl)
    assert _clustering_columns(snapshot(spark, tbl)) == ["a"]


# ---------------------------------------------------------------------------
# second-review regression tests
# ---------------------------------------------------------------------------


def test_append_only_blocks_stats_range_dml_and_partition_overwrite(spark, tmp_path):
    # review finding: delete_delta/update_delta (stats-pruned fronts)
    # and dynamic partition overwrite bypassed the append-only guard
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        delete_delta,
        overwrite_partitions_delta,
        update_delta,
    )

    tbl = str(tmp_path / "ao")
    df = spark.range(20).selectExpr("id AS k", "id % 3 AS part")
    write_delta(df, tbl, mode="overwrite", partition_by=["part"],
                configuration=_AO_CONF)
    with pytest.raises(DeltaProtocolError, match="append-only"):
        delete_delta(spark, tbl, "k", 0, 5)
    with pytest.raises(DeltaProtocolError, match="append-only"):
        update_delta(spark, tbl, "k", 0, 5, {"k": "k + 100"})
    with pytest.raises(DeltaProtocolError, match="append-only"):
        overwrite_partitions_delta(
            df.filter("part = 1"), tbl, partition_by=["part"]
        )


def test_row_tracking_blocks_stats_range_dml(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        delete_delta,
        update_delta,
    )

    write_delta(_kv(spark, 0, 20), tbl, mode="overwrite",
                configuration={"delta.enableRowTracking": "true"})
    with pytest.raises(DeltaProtocolError, match="row-tracking"):
        delete_delta(spark, tbl, "k", 0, 5)
    with pytest.raises(DeltaProtocolError, match="row-tracking"):
        update_delta(spark, tbl, "k", 0, 5, {"g": "9"})


def test_row_tracking_partition_overwrite_stamps(spark, tmp_path):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        overwrite_partitions_delta,
        read_delta_row_ids,
    )

    tbl = str(tmp_path / "rtpo")
    df = spark.range(30).selectExpr("id AS k", "id % 3 AS part")
    write_delta(df, tbl, mode="overwrite", partition_by=["part"],
                configuration={"delta.enableRowTracking": "true"})
    overwrite_partitions_delta(
        spark.range(100, 110).selectExpr("id AS k", "CAST(1 AS LONG) AS part"),
        tbl, partition_by=["part"],
    )
    d = read_delta_row_ids(spark, tbl)
    assert d.count() == 30  # 20 untouched + 10 replacement rows
    assert d.select("_row_id").distinct().count() == 30
    # replaced partition got FRESH ids above the original mark
    assert d.filter("k >= 100").agg(F.min("_row_id")).collect()[0][0] >= 30


def test_ict_survives_log_truncation(spark, tbl):
    # review finding: the field was inherited only from the predecessor
    # commit JSON, so truncation broke the chain
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        truncate_log,
        write_checkpoint,
    )

    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite",
                configuration=_ICT_CONF)
    write_checkpoint(spark, tbl)
    truncate_log(tbl)
    write_delta(_kv(spark, 5, 10), tbl, mode="append")
    ci = _commit_info(tbl, 1)
    assert ci.get("inCommitTimestamp") is not None


def test_ict_clone_carries_field(spark, tbl, tmp_path):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        clone_delta,
    )

    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite",
                configuration=_ICT_CONF)
    dst = str(tmp_path / "ictclone")
    clone_delta(spark, tbl, dst)
    ci = _commit_info(dst, 0)
    assert ci.get("inCommitTimestamp") is not None
    write_delta(_kv(spark, 5, 10), dst, mode="append")
    assert _commit_info(dst, 1).get("inCommitTimestamp") is not None


def test_clustered_min_file_size_compacts_without_zorder(spark, tbl):
    # review finding: min_file_size on a clustered table must not
    # z-order the selected subset with subset-local normalization
    df = spark.range(2000).selectExpr("id AS a", "(id * 37) % 100 AS b")
    write_delta(df.repartition(6), tbl, mode="overwrite",
                cluster_by=["a", "b"])
    v = optimize_delta(spark, tbl, min_file_size=10**9, target_files=2)
    assert read_delta(spark, tbl).count() == 2000
    assert v >= 1  # the compaction committed (did not raise)


def test_metadata_id_stable_across_metadata_commits(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        add_check_constraint,
    )

    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite")
    mid0 = snapshot(spark, tbl).metadata_id
    add_check_constraint(spark, tbl, "k_nonneg", "k >= 0")
    write_delta(_kv(spark, 5, 10).withColumn("extra", F.lit(1)), tbl,
                mode="append")  # schema evolution commit
    assert snapshot(spark, tbl).metadata_id == mid0


def test_nested_clustering_path_rejected(spark, tbl):
    import json as _json

    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        _clustering_columns,
    )

    write_delta(_kv(spark, 0, 5), tbl, mode="overwrite", cluster_by=["k"])
    snap = snapshot(spark, tbl)
    snap.domain_metadata["delta.clustering"] = {
        "domain": "delta.clustering",
        "configuration": _json.dumps({"clusteringColumns": [["info", "x"]]}),
        "removed": False,
    }
    with pytest.raises(DeltaProtocolError, match="nested clustering"):
        _clustering_columns(snap)


def test_pysource_reads_truncated_v2_checkpoint_table(spark, tbl):
    # the v2 manifest carries no add actions — the pysource planner
    # must fold the sidecars or it silently plans an EMPTY table
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        truncate_log,
        write_checkpoint_v2,
    )
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        register_delta_source,
    )

    write_delta(_kv(spark, 0, 40), tbl, mode="overwrite")
    write_delta(_kv(spark, 40, 60), tbl, mode="append")
    delete_rows(spark, tbl, "k >= 50")
    write_checkpoint_v2(spark, tbl, sidecar_parts=2)
    assert truncate_log(tbl)
    register_delta_source(spark)
    out = spark.read.format("delta_pylog").option("path", tbl).load()
    assert out.count() == 50
