"""Row-level DML semantics (operators/dml.py): SQL DELETE/UPDATE NULL
handling, pass-through guarantees, and the staged table rewrite."""

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.dml import (
    delete_from_table,
    delete_where,
    update_table,
    update_where,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, None, "c"), (4, -1.0, None)],
        ["k", "bal", "tag"],
    )


def test_delete_where_null_predicate_keeps_row(df):
    # bal < 0 is NULL for k=3: SQL DELETE removes only TRUE rows
    out = delete_where(df, F.col("bal") < 0)
    assert sorted(r.k for r in out.collect()) == [1, 3]


def test_update_where_null_predicate_leaves_row(df):
    out = update_where(df, F.col("bal") < 0, {"bal": F.lit(0.0)})
    got = {r.k: r.bal for r in out.collect()}
    assert got == {1: 10.0, 2: 0.0, 3: None, 4: 0.0}


def test_update_where_untouched_columns_pass_through(df):
    out = update_where(df, F.col("k") == 2, {"bal": F.col("bal") * 2})
    got = {r.k: (r.bal, r.tag) for r in out.collect()}
    assert got[2] == (-10.0, "b")
    assert got[1] == (10.0, "a") and got[4] == (-1.0, None)


def test_update_where_unknown_column_raises(df):
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(df, F.col("k") == 1, {"nope": F.lit(1)})


def test_table_level_dml_roundtrip(spark, df, tmp_path):
    tbl = "t_dml_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    df.write.format("parquet").option("path", str(tmp_path / "t")).saveAsTable(tbl)
    delete_from_table(spark, tbl, "tag = 'c'")
    update_table(spark, tbl, "bal < 0", {"bal": "0.0", "tag": "upper(coalesce(tag, 'x'))"})
    got = {r.k: (r.bal, r.tag) for r in spark.table(tbl).collect()}
    assert got == {1: (10.0, "a"), 2: (0.0, "B"), 4: (0.0, "X")}
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
