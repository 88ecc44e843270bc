"""Round-7 delta surface: generated columns (compute/enforce on write,
recompute on UPDATE), shallow CLONE (zero-copy, independent evolution),
DESCRIBE HISTORY."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    DeltaProtocolError,
    clone_delta,
    delete_delta_dv,
    delete_rows,
    describe_history,
    merge_delta,
    read_delta,
    snapshot,
    update_rows,
    vacuum_delta,
    write_delta,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _kv(spark, n=20):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


# --------------------------------------------------------------------------
# generated columns
# --------------------------------------------------------------------------


def test_generated_column_computed_enforced_and_recomputed(spark, tbl):
    # creation: frame omits the generated column -> computed
    write_delta(
        _kv(spark, 10), tbl, generated={"v_bucket": "CAST(v / 50 AS BIGINT)"}
    )
    snap = snapshot(spark, tbl)
    assert snap.protocol["minWriterVersion"] >= 4
    f = {x.name: x for x in snap.schema.fields}["v_bucket"]
    assert f.metadata["delta.generationExpression"] == "CAST(v / 50 AS BIGINT)"
    got = {r["k"]: r["v_bucket"] for r in read_delta(spark, tbl).collect()}
    assert got == {k: (k * 10) // 50 for k in range(10)}

    # append omitting the column -> computed again
    write_delta(_kv(spark, 14).filter("k >= 10"), tbl, mode="append")
    assert read_delta(spark, tbl).filter("v_bucket = 2").count() == 4

    # append supplying a MATCHING value -> accepted
    ok = _kv(spark, 15).filter("k = 14").withColumn(
        "v_bucket", (F.col("v") / 50).cast("bigint")
    )
    write_delta(ok, tbl, mode="append")
    # append supplying a WRONG value -> rejected
    bad = _kv(spark, 16).filter("k = 15").withColumn(
        "v_bucket", F.lit(999).cast("bigint")
    )
    with pytest.raises(DeltaProtocolError, match="v_bucket"):
        write_delta(bad, tbl, mode="append")

    # UPDATE of the source column RECOMPUTES the generated column
    update_rows(spark, tbl, "k = 0", {"v": "400"})
    row = read_delta(spark, tbl).filter("k = 0").collect()[0]
    assert (row["v"], row["v_bucket"]) == (400, 8)
    # untouched rows keep their values
    row5 = read_delta(spark, tbl).filter("k = 5").collect()[0]
    assert (row5["v"], row5["v_bucket"]) == (50, 1)

    # explicit SET of a generated column: matching passes, wrong aborts
    update_rows(spark, tbl, "k = 1", {"v": "100", "v_bucket": "2"})
    with pytest.raises(Exception, match="v_bucket"):
        update_rows(spark, tbl, "k = 2", {"v": "100", "v_bucket": "7"})

    # MERGE enforces generation on its source
    src_bad = spark.createDataFrame(
        [(3, 30, 9)], "k long, v long, v_bucket long"
    )
    with pytest.raises(DeltaProtocolError, match="v_bucket"):
        merge_delta(spark, tbl, src_bad, "k")

    # declared at creation only
    with pytest.raises(DeltaProtocolError, match="creation"):
        write_delta(
            _kv(spark, 3), tbl, mode="append", generated={"z": "k"}
        )


def test_generated_partition_column(spark, tbl):
    """The headline use: a generated partition column (e.g. date from a
    timestamp) — hive dirs carry the computed values."""
    df = spark.range(12).select(F.col("id").alias("k"))
    write_delta(
        df, tbl, partition_by=["bucket"], generated={"bucket": "k % 3"}
    )
    assert sorted(
        d for d in os.listdir(tbl) if d.startswith("bucket=")
    ) == ["bucket=0", "bucket=1", "bucket=2"]
    assert _rows(read_delta(spark, tbl).filter("bucket = 1").select("k")) == {
        (k,) for k in range(12) if k % 3 == 1
    }


# --------------------------------------------------------------------------
# shallow clone
# --------------------------------------------------------------------------


def test_shallow_clone_zero_copy_and_independent_evolution(spark, tbl):
    src = tbl + "_src"
    dst = tbl + "_dst"
    df = _kv(spark, 20)
    write_delta(df.repartition(4), src)
    delete_delta_dv(spark, src, "k", 0, 2)  # DV rides into the clone

    v = clone_delta(spark, src, dst)
    assert v == 0
    # zero data files under the clone
    data_files = [
        n
        for root, dirs, names in os.walk(dst)
        if not os.path.basename(root).startswith("_")
        for n in names
        if n.endswith(".parquet")
    ]
    assert data_files == []
    want = _rows(df.filter("k > 2"))
    assert _rows(read_delta(spark, dst)) == want
    # DV descriptors converted to absolute storage
    dsnap = snapshot(spark, dst)
    dvs = [
        a["deletionVector"]
        for a in dsnap.files.values()
        if a.get("deletionVector")
    ]
    assert dvs and all(d["storageType"] in ("p", "i") for d in dvs)

    # clone evolves independently: DML on the clone...
    delete_rows(spark, dst, "k >= 18")
    assert _rows(read_delta(spark, dst).select("k")) == {
        (k,) for k in range(3, 18)
    }
    # ...leaves the SOURCE untouched
    assert _rows(read_delta(spark, src)) == want

    # vacuum on the clone must never delete source-owned files
    vacuum_delta(spark, dst, retain_last=1)
    assert _rows(read_delta(spark, src)) == want

    with pytest.raises(DeltaProtocolError, match="exists"):
        clone_delta(spark, src, dst)


def test_clone_preserves_column_mapping(spark, tbl):
    src, dst = tbl + "_s", tbl + "_d"
    write_delta(
        _kv(spark, 8), src,
        configuration={"delta.columnMapping.mode": "name"},
    )
    clone_delta(spark, src, dst)
    snap = snapshot(spark, dst)
    assert snap.column_mapping_mode == "name"
    assert _rows(read_delta(spark, dst)) == _rows(_kv(spark, 8))


# --------------------------------------------------------------------------
# describe history
# --------------------------------------------------------------------------


def test_describe_history_rows(spark, tbl):
    write_delta(_kv(spark, 10), tbl, mode="overwrite")
    write_delta(_kv(spark, 12).filter("k >= 10"), tbl, mode="append")
    delete_rows(spark, tbl, "k < 2")
    h = describe_history(spark, tbl).collect()
    assert [r["version"] for r in h] == [2, 1, 0]
    ops = [r["operation"] for r in h]
    assert ops[0] == "DELETE" and ops[2] == "WRITE"
    assert all(r["timestamp"] > 0 for r in h)
    # monotonic in-commit timestamps surface here too
    ts = [r["timestamp"] for r in h]
    assert ts[0] > ts[1] > ts[2]
    assert h[2]["num_added_files"] >= 1 and h[0]["num_removed_files"] >= 1


# --------------------------------------------------------------------------
# round-7 review regressions
# --------------------------------------------------------------------------


def test_generated_only_table_keeps_reader_v1(spark, tbl):
    """Review finding #1: generated columns without column mapping must
    NOT author the column-mapping protocol (2,5) — reader v1 / writer 4."""
    write_delta(_kv(spark, 5), tbl, generated={"b": "k % 3"})
    p = snapshot(spark, tbl).protocol
    assert (p["minReaderVersion"], p["minWriterVersion"]) == (1, 4)


def test_dv_upgrade_restates_legacy_writer_features(spark, tbl):
    """Review finding #2: the (3,7) upgrade must re-state EVERY
    capability implied by the old writer version, or a spec-following
    v7 writer would skip CDF capture / constraint enforcement."""
    write_delta(
        _kv(spark, 10), tbl,
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # writer v4
    delete_delta_dv(spark, tbl, "k", 0, 2)
    p = snapshot(spark, tbl).protocol
    assert set(p["writerFeatures"]) >= {
        "appendOnly", "invariants", "checkConstraints",
        "changeDataFeed", "generatedColumns", "deletionVectors",
    }


def test_shallow_clone_of_partitioned_table_reads(spark, tbl):
    """Review finding #3: clone add actions reference absolute source
    paths; partitioned scans need per-base basePath grouping."""
    src, dst = tbl + "_s", tbl + "_d"
    df = spark.range(18).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    write_delta(df, src, partition_by=["p"])
    clone_delta(spark, src, dst)
    assert _rows(read_delta(spark, dst)) == _rows(df)
    # divergence: append CLONE-local files -> mixed absolute + relative
    write_delta(
        spark.range(18, 24).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("p")
        ),
        dst,
        mode="append",
    )
    assert read_delta(spark, dst).count() == 24
    assert _rows(read_delta(spark, dst).filter("p = 1").select("k")) == {
        (k,) for k in range(24) if k % 3 == 1
    }
    assert read_delta(spark, src).count() == 18


def test_rename_referenced_by_generation_rejected(spark, tbl):
    """Review finding #6: a metadata-only rename/drop of a column a
    generation expression derives from would break every later write."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        drop_column,
        rename_column,
    )

    write_delta(
        _kv(spark, 6), tbl,
        configuration={"delta.columnMapping.mode": "name"},
        generated={"band": "v % 5"},
    )
    with pytest.raises(DeltaProtocolError, match="band"):
        rename_column(spark, tbl, "v", "value")
    with pytest.raises(DeltaProtocolError, match="band"):
        drop_column(spark, tbl, "v")
    # the generated column ITSELF renames/drops fine
    rename_column(spark, tbl, "band", "bucket")
    drop_column(spark, tbl, "bucket")
    assert read_delta(spark, tbl).columns == ["k", "v"]


# --------------------------------------------------------------------------
# selective OPTIMIZE (round 7): min_file_size + WHERE partition predicate
# --------------------------------------------------------------------------


def test_optimize_min_file_size_compacts_only_small_files(spark, tbl):
    """delta's optimize.minFileSize semantics: already-compacted large
    files keep their IDENTITY; only the small-file tail rewrites — a
    nightly OPTIMIZE on a 99%-compacted table touches 1% of it."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        optimize_delta,
    )

    big = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    write_delta(big.coalesce(1), tbl, mode="overwrite")  # one LARGE file
    for i in range(3):  # three tiny appended files
        write_delta(
            spark.range(50_000 + i * 5, 50_000 + i * 5 + 5).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            tbl,
            mode="append",
        )
    snap0 = snapshot(spark, tbl)
    sizes = {r: int(a["size"]) for r, a in snap0.files.items()}
    big_files = {r for r, s in sizes.items() if s >= 100_000}
    small_files = set(sizes) - big_files
    assert len(big_files) == 1 and len(small_files) >= 3

    optimize_delta(spark, tbl, target_files=1, min_file_size=100_000)
    snap1 = snapshot(spark, tbl)
    assert big_files <= set(snap1.files)  # large file kept its identity
    assert not (small_files & set(snap1.files))  # small files compacted
    assert len(snap1.files) == len(big_files) + 1
    assert read_delta(spark, tbl).count() == 50_015

    # fewer than two candidates: no-op, no new commit
    v_before = snapshot(spark, tbl).version
    assert optimize_delta(spark, tbl, min_file_size=100_000) == v_before


def test_optimize_where_partition_predicate(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        DeltaProtocolError,
        optimize_delta,
    )

    df = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    write_delta(df.filter("k < 15"), tbl, partition_by=["p"])
    write_delta(df.filter("k >= 15"), tbl, mode="append")
    snap0 = snapshot(spark, tbl)
    p2_files = {
        r
        for r, a in snap0.files.items()
        if a["partitionValues"].get("p") == "2"
    }
    other_files = set(snap0.files) - p2_files
    assert len(p2_files) >= 2

    optimize_delta(spark, tbl, target_files=1, where="p = 2")
    snap1 = snapshot(spark, tbl)
    assert other_files <= set(snap1.files)  # untouched partitions keep files
    assert not (p2_files & set(snap1.files))  # p=2 compacted
    assert _rows(read_delta(spark, tbl)) == _rows(df)

    with pytest.raises(DeltaProtocolError, match="partitioned"):
        t2 = tbl + "_u"
        write_delta(_kv(spark, 5), t2)
        optimize_delta(spark, t2, where="k = 1")


# --------------------------------------------------------------------------
# timestamp-parity batch (round 7): RESTORE/CDF/VACUUM/stream by time
# --------------------------------------------------------------------------


def _commit_ts(tbl, v):
    import json as _json

    with open(os.path.join(tbl, "_delta_log", f"{v:020d}.json")) as fh:
        for line in fh:
            a = _json.loads(line)
            if "commitInfo" in a:
                return int(a["commitInfo"]["timestamp"])
    raise AssertionError(f"no commitInfo at v{v}")


def test_restore_and_cdf_by_timestamp(spark, tbl):
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        read_cdf,
        restore_delta,
    )

    df = _kv(spark, 12)
    write_delta(
        df.filter("k < 4"), tbl,
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # v0
    write_delta(df.filter("k >= 4 and k < 8"), tbl, mode="append")  # v1
    write_delta(df.filter("k >= 8"), tbl, mode="append")  # v2
    ts1 = _commit_ts(tbl, 1)

    # CDF from_timestamp: changes strictly AFTER the anchor commit
    chg = read_cdf(spark, tbl, from_timestamp_ms=ts1)
    assert _rows(chg.select("k")) == {(k,) for k in range(8, 12)}
    # to_timestamp bound: only up to v1
    chg01 = read_cdf(spark, tbl, to_timestamp_ms=ts1)
    assert _rows(chg01.select("k")) == {(k,) for k in range(8)}
    # anchor predating the table: everything
    assert read_cdf(spark, tbl, from_timestamp_ms=ts1 - 10**6).count() == 12
    with pytest.raises(ValueError, match="from_version OR"):
        read_cdf(spark, tbl, from_version=1, from_timestamp_ms=ts1)

    # RESTORE TO TIMESTAMP AS OF v1
    restore_delta(spark, tbl, timestamp_ms=ts1)
    assert _rows(read_delta(spark, tbl).select("k")) == {
        (k,) for k in range(8)
    }
    with pytest.raises(ValueError, match="not both"):
        restore_delta(spark, tbl, 1, timestamp_ms=ts1)


def test_vacuum_retain_ms(spark, tbl):
    df = _kv(spark, 12)
    write_delta(df.filter("k < 6"), tbl, mode="overwrite")  # v0
    write_delta(df.filter("k >= 6"), tbl, mode="overwrite")  # v1 tombstones v0
    files_v0 = set(snapshot(spark, tbl, version=0).files)
    # a huge retention window keeps v0's files on disk
    removed = vacuum_delta(spark, tbl, retain_ms=10**9)
    assert not (files_v0 & set(removed))
    assert _rows(read_delta(spark, tbl, version=0)) == _rows(df.filter("k < 6"))
    # zero retention: only the head survives; v0's files go
    removed = vacuum_delta(spark, tbl, retain_ms=-1)
    assert files_v0 <= set(removed)
    assert _rows(read_delta(spark, tbl)) == _rows(df.filter("k >= 6"))


def test_pysource_starting_timestamp(spark, tbl, tmp_path):
    write_delta(_kv(spark, 6), tbl)  # v0
    write_delta(_kv(spark, 12).filter("k >= 6"), tbl, mode="append")  # v1
    write_delta(_kv(spark, 18).filter("k >= 12"), tbl, mode="append")  # v2
    ts1 = _commit_ts(tbl, 1)
    spark.dataSource.register(
        __import__(
            "mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource",
            fromlist=["DeltaLogDataSource"],
        ).DeltaLogDataSource
    )
    q = (
        spark.readStream.format("delta_pylog")
        .option("path", tbl)
        .option("startingtimestamp", str(ts1))
        .load()
        .writeStream.format("memory")
        .queryName("r7_ts_stream")
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["k"] for r in spark.table("r7_ts_stream").collect()}
    assert got == set(range(12, 18))  # only commits AFTER the anchor
