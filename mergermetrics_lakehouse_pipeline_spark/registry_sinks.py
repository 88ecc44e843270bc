"""Driver-facing round-trip queries for the side-effect operators.

The sink/DDL surface (SURVEY §2.1 S3-S15) is exercised by pytest, but a
pytest-only check is a weaker signal than the driver's oracle gate. These
queries run a real write -> catalog -> read-back cycle inside a scratch
location and return a DataFrame whose values are derivable from the input
tables alone, so the standard DuckDB oracle can verify the round trip:
if any write mode, view definition, or CSV load corrupts rows, the final
aggregate hash diverges.

Parity targets: table sinks and modes (1_customer_data_processing.py:50-53,
253-257), CREATE VIEW (denormalise_table_query_fmcg.txt:1), COPY INTO
(incremental_data_parent_company_query.txt:1-11), landing->processed
archival (1_full_load_fact.py:72-78).

Each call uses a uuid-unique table/view name and a fresh temp directory,
so concurrent or repeated driver invocations never collide.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import uuid

from .scratch import scratch_dir
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline.customers import build_city_fixes
from .registry import T, dsum, events_table, register, sql_dsum
from .session import BRONZE, GOLD, SILVER, ensure_medallion_schemas
from .sources.catalog import (
    copy_into,
    create_view,
    drop_table,
    table_exists,
    write_table,
)
from .sources.csv import archive_landing_files, read_csv_with_lineage


@register(
    "sink_modes_roundtrip",
    """
    WITH per_region AS (
      SELECT n_regionkey,
             COUNT(*) AS n_nations,
             CAST(SUM(len(n_name)) AS BIGINT) AS sum_name_len
      FROM nation GROUP BY 1
    ), ms AS (
      SELECT COUNT(*) AS merged_rows,
             COUNT(CASE WHEN n_nationkey % 2 = 1 THEN 1 END) AS merged_with_region
      FROM nation
    )
    SELECT per_region.*, ms.* FROM per_region CROSS JOIN ms
    """,
    tags=["S3", "S4", "S5", "S9", "S11", "S15", "roundtrip"],
)
def q_sink_modes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write -> read-back over the table-sink surface in one query:
    overwrite (S3) + append (S4) into an external parquet table, read
    through a CREATE VIEW aggregate (S9), plus a mergeSchema read (S5) of
    a narrow+wide parquet pair surfaced via a temp view (S11); tableExists
    gates the create (S15). The oracle recomputes both halves from the
    pristine ``nation`` table, so a row lost or mangled by any write mode
    flips the hash."""
    tag = uuid.uuid4().hex[:8]
    root = scratch_dir(prefix="mm_sink_rt_")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")

    tbl = f"rt_sink_{tag}"
    assert not table_exists(spark, tbl)
    write_table(
        nation.filter(F.col("n_nationkey") < 13), tbl, "overwrite", path=f"{root}/tbl"
    )
    assert table_exists(spark, tbl)
    write_table(nation.filter(F.col("n_nationkey") >= 13), tbl, "append")

    # parquet mergeSchema semantics: a narrow batch (no n_regionkey) and a
    # wide batch land separately; the merged scan fills the gap with NULLs.
    nation.filter(F.col("n_nationkey") % 2 == 0).select(
        "n_nationkey", "n_name"
    ).write.parquet(f"{root}/ms/narrow")
    nation.filter(F.col("n_nationkey") % 2 == 1).write.parquet(f"{root}/ms/wide")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/ms/narrow", f"{root}/ms/wide"
    )

    view = f"rt_view_{tag}"
    create_view(
        spark,
        view,
        f"SELECT n_regionkey, COUNT(*) AS n_nations, "
        f"CAST(SUM(length(n_name)) AS BIGINT) AS sum_name_len "
        f"FROM {tbl} GROUP BY n_regionkey",
    )
    per_region = spark.table(view)

    ms_view = f"rt_ms_{tag}"
    merged.createOrReplaceTempView(ms_view)
    ms = spark.sql(
        f"SELECT COUNT(*) AS merged_rows, "
        f"COUNT(n_regionkey) AS merged_with_region FROM {ms_view}"
    )
    return per_region.crossJoin(ms)


@register(
    "copy_into_roundtrip",
    """
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM supplier GROUP BY 1
    """,
    tags=["S12", "S14", "S1", "roundtrip"],
)
def q_copy_into_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY INTO round-trip: supplier -> landing CSV files -> typed bulk
    load (read+cast+append, S12) into an external table -> landing files
    archived to processed/ (S14) -> read-back aggregate. The oracle
    recomputes from the pristine ``supplier`` table, so a row dropped or
    re-typed anywhere in the CSV->cast->append cycle flips the hash."""
    tag = uuid.uuid4().hex[:8]
    root = scratch_dir(prefix="mm_copy_rt_")
    landing, processed = f"{root}/landing", f"{root}/processed"
    cols = ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    supplier = T(spark, sf_dir, "supplier").select(*cols)
    supplier.write.option("header", True).csv(landing)

    tbl = f"rt_copy_{tag}"
    write_table(supplier.limit(0), tbl, "overwrite", path=f"{root}/tbl")
    copy_into(
        spark,
        tbl,
        landing,
        [
            "CAST(s_suppkey AS BIGINT) AS s_suppkey",
            "s_name",
            "CAST(s_nationkey AS INT) AS s_nationkey",
            "CAST(s_acctbal AS DOUBLE) AS s_acctbal",
        ],
        file_format="csv",
        header=True,
    )
    moved = archive_landing_files(landing, processed)
    assert moved, "landing dir unexpectedly empty after CSV write"

    return (
        spark.table(tbl)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "orc_roundtrip",
    """
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           MIN(s_name) AS first_name
    FROM supplier
    GROUP BY 1
    """,
    tags=["S1", "S3", "roundtrip", "format"],
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format breadth: write supplier to ORC (Spark's other built-in
    columnar format), read it back, aggregate per nation. The oracle
    recomputes from the pristine parquet, so any type coercion or row
    loss in the ORC write/read cycle flips the hash. ORC keeps the
    columnar pushdown properties of parquet (predicate pushdown +
    column pruning) so the engine's scan discipline carries over to
    ORC lakes unchanged."""
    root = scratch_dir(prefix="mm_orc_rt_")
    path = f"{root}/supplier_orc"
    T(spark, sf_dir, "supplier").write.mode("overwrite").orc(path)
    s = spark.read.orc(path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        F.min("s_name").alias("first_name"),
    )


@register(
    "ddl_lineage_roundtrip",
    """
    WITH lin AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(1 AS BIGINT) AS n_files,
             CAST(COUNT(*) AS BIGINT) AS rows_with_lineage
      FROM nation
    ), fx AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_fixed,
             CAST(SUM(len(f.fixed_city)) AS BIGINT) AS fix_len
      FROM customer c
      JOIN (VALUES (1, 'Pune'), (3, 'Berlin'), (7, 'Lyon'))
           AS f(customer_id, fixed_city)
        ON c.c_custkey = f.customer_id
    )
    SELECT lin.*, fx.* FROM lin CROSS JOIN fx
    """,
    tags=["S2", "S8", "S10", "S13", "roundtrip"],
)
def q_ddl_lineage_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip over the remaining side-effect surface in one query:

    - **S2 lineage**: nation -> single CSV landing file ->
      ``read_csv_with_lineage`` stamps ``file_name``/``file_size`` from
      the hidden ``_metadata`` struct (parity:
      1_customer_data_processing.py:36-37); the aggregate counts rows
      whose lineage columns are populated, so a NULL stamp drops
      ``rows_with_lineage`` and flips the hash.
    - **S8 DDL bootstrap**: ``ensure_medallion_schemas`` creates
      bronze/silver/gold databases (parity: setup_catalogs.py:4-13),
      asserted via ``spark.catalog.databaseExists``.
    - **S10 drop table**: a staging table is created, probed, dropped
      (parity: 2_incremental_load_fact.py:300-306), and asserted gone.
    - **S13 literal source**: ``build_city_fixes`` turns a dict into a
      rule DataFrame (parity: 1_customer_data_processing.py:181-191),
      broadcast-joined to customer; the oracle rebuilds it with VALUES.
    """
    tag = uuid.uuid4().hex[:8]
    root = scratch_dir(prefix="mm_ddl_rt_")

    nation = T(spark, sf_dir, "nation")
    nation.coalesce(1).write.option("header", True).csv(f"{root}/landing")
    lin_df = read_csv_with_lineage(spark, f"{root}/landing")
    lin = lin_df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("file_name").alias("n_files"),
        F.count(
            F.when(
                (F.col("file_size") > 0) & F.col("file_name").endswith(".csv"), 1
            )
        ).alias("rows_with_lineage"),
    )

    ensure_medallion_schemas(spark)
    for db in (BRONZE, SILVER, GOLD):
        assert spark.catalog.databaseExists(db), f"S8 DDL failed for {db}"

    staging = f"rt_stage_{tag}"
    write_table(nation.limit(5), staging, "overwrite", path=f"{root}/stage")
    assert table_exists(spark, staging)
    drop_table(spark, staging)
    assert not table_exists(spark, staging), "S10 drop left the table behind"

    fixes = build_city_fixes(spark, {1: "Pune", 3: "Berlin", 7: "Lyon"})
    customer = T(spark, sf_dir, "customer")
    fx = (
        customer.join(
            F.broadcast(fixes), customer.c_custkey == fixes.customer_id
        ).agg(
            F.count("*").alias("n_fixed"),
            F.sum(F.length("fixed_city")).cast("bigint").alias("fix_len"),
        )
    )
    return lin.crossJoin(fx)


@register(
    "dml_roundtrip",
    """
    WITH post AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal
      FROM customer
      WHERE NOT (c_mktsegment = 'MACHINERY' AND c_custkey % 3 = 0)
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           CAST(SUM(CASE WHEN c_acctbal = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zeroed
    FROM post GROUP BY 1
    """,
    tags=["DML", "roundtrip"],
)
def q_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML round-trip (operators/dml.py): copy customer into a
    scratch table, DELETE a slice (every third MACHINERY customer),
    UPDATE negative balances to zero, read back, aggregate per segment.
    The oracle applies the same DELETE/UPDATE declaratively to the
    pristine table, so a row wrongly kept/removed or a value wrongly
    (un)updated flips the hash.

    Scale notes in operators/dml.py: both ops are narrow single-pass
    plans; Delta executes them natively with file skipping, parquet
    pays the staged rewrite."""
    from .operators.dml import delete_from_table, update_table

    tag = uuid.uuid4().hex[:8]
    root = scratch_dir(prefix="mm_dml_rt_")
    tbl = f"rt_dml_{tag}"
    write_table(T(spark, sf_dir, "customer"), tbl, "overwrite", path=f"{root}/tbl")
    delete_from_table(spark, tbl, "c_mktsegment = 'MACHINERY' AND c_custkey % 3 = 0")
    update_table(spark, tbl, "c_acctbal < 0", {"c_acctbal": "0.0"})
    out = (
        spark.table(tbl)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
            F.sum(F.when(F.col("c_acctbal") == 0.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zeroed"),
        )
    )
    return out


@register(
    "dq_expectations",
    """
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_checked FROM lineitem)
    SELECT 'qty_in_range' AS rule,
           CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 30 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_violations, n.n_checked
    FROM lineitem CROSS JOIN n GROUP BY n.n_checked
    UNION ALL
    SELECT 'nonneg_price',
           CAST(SUM(CASE WHEN l_extendedprice >= 0 THEN 0 ELSE 1 END) AS BIGINT),
           n.n_checked
    FROM lineitem CROSS JOIN n GROUP BY n.n_checked
    UNION ALL
    SELECT 'discount_band',
           CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.08 THEN 0 ELSE 1 END) AS BIGINT),
           n.n_checked
    FROM lineitem CROSS JOIN n GROUP BY n.n_checked
    UNION ALL
    SELECT 'unique_l_orderkey_l_linenumber',
           CAST(COUNT(*) - COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '|'
                                          || CAST(l_linenumber AS VARCHAR)) AS BIGINT),
           n.n_checked
    FROM lineitem CROSS JOIN n GROUP BY n.n_checked
    UNION ALL
    SELECT 'fk_orderkey_in_orders',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL),
           n.n_checked
    FROM n
    """,
    tags=["quality", "pipeline-gate"],
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative quality gate (operators/quality.py): four row-local
    rules + a uniqueness rule compiled into ONE aggregation pass over
    lineitem, unioned with a referential-integrity LEFT ANTI join count
    against orders. The (rule, n_violations, n_checked) output is what a
    pipeline gates on before promoting a bronze batch."""
    from .operators.quality import Expectation, check_expectations, fk_violations

    li = T(spark, sf_dir, "lineitem")
    rules = check_expectations(
        li,
        [
            Expectation("qty_in_range", F.col("l_quantity").between(1, 30)),
            Expectation("nonneg_price", F.col("l_extendedprice") >= 0),
            Expectation("discount_band", F.col("l_discount").between(0, 0.08)),
        ],
        unique_keys=[["l_orderkey", "l_linenumber"]],
    )
    fk = fk_violations(
        li,
        T(spark, sf_dir, "orders"),
        {"l_orderkey": "o_orderkey"},
        rule="fk_orderkey_in_orders",
    )
    return rules.unionByName(fk)


@register(
    "cdc_snapshot_diff",
    """
    WITH old AS (SELECT o_orderkey, o_totalprice FROM orders),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_totalprice AS old_p, n.o_totalprice AS new_p,
             o.o_orderkey IS NULL AS ins, n.o_orderkey IS NULL AS del
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey, 'insert' AS change_type, new_p AS o_totalprice FROM j WHERE ins
    UNION ALL
    SELECT o_orderkey, 'delete', old_p FROM j WHERE del
    UNION ALL
    SELECT o_orderkey, 'update', new_p FROM j
    WHERE NOT ins AND NOT del AND old_p IS DISTINCT FROM new_p
    """,
    tags=["S6", "cdc", "incremental"],
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data feed from two snapshots (operators/cdc.py): today's
    orders is a deterministic mutation of yesterday's (keys %97 deleted,
    %11 repriced, %101 re-keyed inserts); the diff must emit exactly the
    insert/update/delete rows with postimage values (preimage for
    deletes) — the portable CDF the reference gets from Delta
    (3_pricing_data_processing.py:167-172)."""
    from .operators.cdc import snapshot_diff

    old = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = T(spark, sf_dir, "orders")
    new = (
        base.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    return snapshot_diff(old, new, keys=["o_orderkey"], compare_cols=["o_totalprice"])


@register(
    "orders_partition_checksums",
    """
    WITH r AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS part,
             CAST(CONCAT('0x', substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               o_orderstatus || '|' ||
               strftime(o_orderdate, '%Y-%m-%d') || '|' ||
               CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)
             ), 1, 15)) AS BIGINT) AS h
      FROM orders
    )
    SELECT part, bit_xor(h) AS checksum, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM r GROUP BY 1
    """,
    tags=["quality", "cdc", "maintenance"],
)
def q_orders_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month content checksums of orders
    (operators/quality.py:partition_checksums): XOR of 60-bit md5 row
    hashes + row counts. Two replicas of a 100 TB table compare in
    O(partitions) rows; a diverging month pinpoints where to re-sync.
    Row rendering uses only cross-engine-stable forms (ints, ISO date,
    decimal cents) — the oracle computes the identical checksum in
    DuckDB."""
    from .operators.quality import partition_checksums

    o = T(spark, sf_dir, "orders")
    row = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").cast("string"),
    )
    return partition_checksums(
        o,
        part=F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd"),
        row_repr=row,
    )


@register(
    "unpivot_lineitem_measures",
    """
    SELECT measure,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM (
      SELECT 'quantity' AS measure, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
      UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    ) GROUP BY 1
    """,
    tags=["P-unpivot", "A1"],
)
def q_unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-row measures to long (measure, value)
    via ``stack`` — the inverse of pivot_status_matrix, completing the
    reshape surface. One projection (no shuffle until the aggregate);
    the oracle states the same reshape as a UNION ALL."""
    li = T(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(4, 'quantity', CAST(l_quantity AS DOUBLE), "
            "'extendedprice', l_extendedprice, "
            "'discount', l_discount, 'tax', l_tax) AS (measure, v)"
        )
    )
    return long.groupBy("measure").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("total"),
    )


def _sql_morton(xcol: str, ycol: str) -> str:
    """DuckDB rendering of the same 16-bit interleave zorder_key uses."""
    terms = []
    for i in range(16):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "zorder_key_lineitem",
    f"""
    WITH stats AS (
      SELECT CAST(MIN(l_partkey) AS DOUBLE) AS xlo, CAST(MAX(l_partkey) AS DOUBLE) AS xhi,
             CAST(MIN(l_suppkey) AS DOUBLE) AS ylo, CAST(MAX(l_suppkey) AS DOUBLE) AS yhi
      FROM lineitem
    ), b AS (
      SELECT l_orderkey, l_linenumber,
             LEAST(65535, GREATEST(0, CAST(FLOOR(
               (CAST(l_partkey AS DOUBLE) - xlo)
               / (CASE WHEN xhi > xlo THEN xhi - xlo ELSE 1.0 END) * 65535) AS BIGINT))) AS bx,
             LEAST(65535, GREATEST(0, CAST(FLOOR(
               (CAST(l_suppkey AS DOUBLE) - ylo)
               / (CASE WHEN yhi > ylo THEN yhi - ylo ELSE 1.0 END) * 65535) AS BIGINT))) AS by
      FROM lineitem CROSS JOIN stats
    )
    SELECT l_orderkey, l_linenumber, {_sql_morton("bx", "by")} AS zkey
    FROM b
    """,
    tags=["layout", "maintenance"],
)
def q_zorder_key_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order (Morton) clustering key of operators/layout.py,
    exposed as a query so the bit-interleave and bucket math are
    oracle-checked (the layout rewrite itself is a side effect, verified
    by the footer-narrowing test in tests/test_layout.py). Bucket
    mapping: identical double-arithmetic order in both engines; the cast
    truncates and FLOOR floors — equal because the operand is clamped
    non-negative."""
    from .operators.layout import zorder_key

    li = T(spark, sf_dir, "lineitem")
    return zorder_key(li, "l_partkey", "l_suppkey").select(
        "l_orderkey", "l_linenumber", F.col("__zkey").alias("zkey")
    )


@register(
    "ivm_monthly_totals",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY 1
    """,
    tags=["A1", "incremental", "ivm"],
)
def q_ivm_monthly_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/ivm.py): 70% of orders
    stand in for the stored monthly rollup, the rest arrive as an
    append-only delta; the delta's partial aggregate folds into the base
    rollup. The oracle recomputes the rollup FROM SCRATCH over all
    orders — incremental and full computation must match bit-for-bit
    (DECIMAL sums are associative), which is the IVM correctness
    contract."""
    from .operators.ivm import aggregate_batch, merge_aggregates

    o = T(spark, sf_dir, "orders").withColumn(
        "month_start", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
    )
    base_rows = o.filter(F.col("o_orderkey") % 10 < 7)
    delta_rows = o.filter(F.col("o_orderkey") % 10 >= 7)
    sums = {"_sum_price": "o_totalprice"}
    base = aggregate_batch(base_rows, keys=["month_start"], sum_cols=sums)
    delta = aggregate_batch(delta_rows, keys=["month_start"], sum_cols=sums)
    merged = merge_aggregates(
        base, delta, keys=["month_start"], sum_names=["_sum_price"]
    )
    return merged.select(
        "month_start",
        "n_rows",
        F.col("_sum_price").cast("double").alias("total_price"),
    )


@register(
    "ivm_distinct_users",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY 1
    """,
    tags=["incremental", "ivm", "bitmap-table", "mergeable-exact"],
)
def q_ivm_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a NON-additive aggregate: exact
    per-type distinct users kept as mergeable bitmap state
    (operators/ivm.py:distinct_state). 70% of events stand in for the
    stored state, the rest arrive as a delta — AND the delta is folded
    TWICE, because bitmap OR is idempotent, so re-delivered batches
    cannot corrupt the count (the property additive IVM lacks). The
    oracle recomputes COUNT DISTINCT from scratch; incremental must
    match exactly.

    Scale: state is O(types x occupied 32k-bit buckets) — independent
    of event count; folding a delta touches delta-sized data only."""
    from .operators.ivm import distinct_from_state, distinct_state, merge_distinct_state

    e = events_table(spark, sf_dir)
    base_rows = e.filter(F.col("event_id") % 10 < 7)
    delta_rows = e.filter(F.col("event_id") % 10 >= 7)
    base = distinct_state(base_rows, keys=["event_type"], id_col="user_id")
    delta = distinct_state(delta_rows, keys=["event_type"], id_col="user_id")
    merged = merge_distinct_state(base, delta, keys=["event_type"])
    # idempotence: folding the SAME delta again must be a no-op
    merged = merge_distinct_state(merged, delta, keys=["event_type"])
    return distinct_from_state(merged, keys=["event_type"])


@register(
    "streaming_distinct_fold_roundtrip",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY 1
    """,
    tags=["streaming", "ivm", "bitmap-table", "roundtrip", "redelivery"],
)
def q_streaming_distinct_fold_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming run of the redelivery-safe distinct
    fold (streaming/jobs.py foreach_batch_distinct_fold): a file-source
    stream over events feeds an availableNow foreachBatch job that
    OR-folds per-micro-batch bitmap state into a catalog state table —
    then the ENTIRE stream is replayed with a fresh checkpoint (the
    worst-case at-least-once redelivery), folding every event a second
    time. The final counts are read off the state table, never from the
    raw events, and the oracle recomputes COUNT(DISTINCT) from scratch:
    a hash match proves the streaming sink's idempotence claim (double
    delivery cannot corrupt bitmap state) with driver evidence, not
    just a pytest.

    Scale: state is O(groups x occupied 32k-bit buckets) regardless of
    stream length; each micro-batch shuffles only its own delta, and the
    fold rewrites state-sized (not stream-sized) data."""
    from .operators.ivm import distinct_from_state
    from .streaming.jobs import foreach_batch_distinct_fold, read_events_stream

    state = f"stream_distinct_state_{uuid.uuid4().hex[:8]}"
    # file streams need a landing DIRECTORY; stage events as 4 files so
    # maxFilesPerTrigger=1 forces multiple micro-batches (per-batch
    # folding, not one big fold)
    landing = scratch_dir(prefix="mm_events_landing_")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(landing)
    for _ in range(2):  # pass 2 = full redelivery (fresh checkpoint)
        foreach_batch_distinct_fold(
            read_events_stream(spark, landing, max_files_per_trigger=1),
            state_table=state,
            keys=["event_type"],
            id_col="user_id",
            checkpoint_dir=scratch_dir(prefix="mm_ckpt_distinct_"),
        )
    return distinct_from_state(spark.table(state), keys=["event_type"])


@register(
    "streaming_heavy_hitters_exact",
    """
    WITH counts AS (
      SELECT event_type, user_id, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT event_type, user_id, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, user_id) AS rnk
      FROM counts
    )
    SELECT event_type, user_id, CAST(n AS BIGINT) AS est_count,
           CAST(0 AS BIGINT) AS max_overestimate,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=["streaming", "stateful", "heavy-hitters", "roundtrip"],
)
def q_streaming_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The space-saving heavy-hitter operator
    (streaming/stateful.py:streaming_heavy_hitters) run in its EXACT
    regime: capacity >= distinct users per type, so no eviction ever
    fires, every counter is the true count and every overestimate bound
    is 0 — the degenerate setting that lets a hash oracle verify the
    sketch's counting/state machinery end-to-end (the k=8 approximate
    setting is property-tested instead). Top-5 users per type by exact
    count, hash-matched against a plain groupBy + row_number."""
    from pyspark.sql import Window

    from .streaming.jobs import read_events_stream
    from .streaming.stateful import streaming_heavy_hitters

    landing = scratch_dir(prefix="mm_hh_landing_")
    events_table(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(landing)
    out = scratch_dir(prefix="mm_hh_out_")
    q = (
        streaming_heavy_hitters(read_events_stream(spark, landing), k=1 << 15)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", scratch_dir(prefix="mm_hh_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("streaming heavy hitters did not drain in 120s")
    back = spark.read.parquet(out)
    w = Window.partitionBy("event_type").orderBy(
        F.col("est_count").desc(), F.col("item")
    )
    return (
        back.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "event_type",
            F.col("item").alias("user_id"),
            "est_count",
            "max_overestimate",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@register(
    "bucketed_join_roundtrip",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    tags=["bucketing", "join", "roundtrip"],
)
def q_bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join, driver-checked: lineitem and orders
    land as 8-bucket sorted tables on the order key; with broadcast
    disabled (scoped) the join is a bucket-aligned SortMergeJoin with NO
    Exchange on either side — the write-time shuffle amortized across
    every later join, the physical design that makes repeated fact-fact
    joins affordable at 100 TB. The plan property is asserted in
    tests/test_plan_invariants.py (test_bucketed_join_no_shuffle); this
    round trip hash-checks that the bucketed path returns exactly the
    plain join's rows."""
    suffix = uuid.uuid4().hex[:8]
    tl, to = f"bkt_li_{suffix}", f"bkt_o_{suffix}"
    T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
    T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(tl).join(
            spark.table(to),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        agg = j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        ).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        drop_table(spark, tl)
        drop_table(spark, to)
    return agg


@register(
    "streaming_dedup_roundtrip",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           value
    FROM events
    """,
    tags=["streaming", "dedup", "exactly-once", "roundtrip"],
)
def q_streaming_dedup_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest dedup, driver-checked: the landing dir holds
    the events file TWICE (an at-least-once source re-delivering every
    record), the stream passes through
    ``dropDuplicatesWithinWatermark(event_id)``
    (streaming/jobs.py:streaming_dedup — watermarked, so key state
    EVICTS past the horizon instead of growing forever), and the sink
    must contain each event exactly once. The oracle is simply the
    pristine events table: any duplicate that survives, or any record
    the dedup wrongly drops, flips the hash."""
    from .streaming.jobs import read_events_stream, run_available_now, streaming_dedup

    landing = scratch_dir(prefix="mm_dedup_landing_")
    e = events_table(spark, sf_dir).coalesce(1)
    e.write.mode("overwrite").parquet(landing)
    e.write.mode("append").parquet(landing)  # the re-delivery
    out = scratch_dir(prefix="mm_dedup_out_")
    q = (
        streaming_dedup(read_events_stream(spark, landing))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", scratch_dir(prefix="mm_dedup_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("streaming dedup did not drain in 120s")
    back = spark.read.parquet(out)
    return back.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        "value",
    )


@register(
    "streaming_attribution_roundtrip",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0 AS seconds_to_convert,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '60 minutes'
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=["streaming", "stream-stream-join", "roundtrip"],
)
def q_streaming_attribution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream join run (streaming/jobs.py
    streaming_attribution_join): the watermarked self-join of the event
    stream — the state-evicting shape whose join condition bounds both
    event-time columns — executes under availableNow into a parquet
    sink, and the emitted matches are hash-checked against the batch
    attribution oracle. Over a bounded replay nothing is late, so the
    streaming result must equal the batch join EXACTLY; a state-eviction
    bug that drops a buffered row flips the hash."""
    from .streaming.jobs import read_events_stream, streaming_attribution_join

    landing = scratch_dir(prefix="mm_attr_landing_")
    events_table(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(landing)
    out = scratch_dir(prefix="mm_attr_out_")
    q = (
        streaming_attribution_join(read_events_stream(spark, landing))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", scratch_dir(prefix="mm_attr_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("streaming attribution join did not drain in 120s")
    return spark.read.parquet(out)


@register(
    "vacuum_versions_roundtrip",
    """
    SELECT n_nationkey,
           CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_v3' ELSE n_name END
             AS n_name
    FROM nation
    """,
    tags=["time-travel", "maintenance", "vacuum", "roundtrip"],
)
def q_vacuum_versions_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM on a versioned table, driver-checked: three snapshots are
    committed, ``vacuum_versions(keep_last=2)`` must reclaim exactly v1
    while v2 stays pinned-readable and the latest pointer still serves
    v3 — whose content the oracle recomputes from the pristine table, so
    a vacuum that deletes the wrong directory (or a pointer left dangling)
    flips the hash or errors. Completes the in-band maintenance pair
    with compaction_roundtrip: OPTIMIZE + VACUUM, the two jobs a real
    lakehouse schedules nightly.

    Scale: vacuum is driver-side filesystem metadata work — one listdir
    plus per-directory removes, O(versions), no Spark job, no data read."""
    from .sources.catalog import read_version, vacuum_versions, write_version

    root = scratch_dir(prefix="mm_vacuum_rt_") + "/nation_versions"
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    write_version(nation, root)  # v1
    write_version(
        nation.withColumn(
            "n_name",
            F.when(
                F.col("n_nationkey") % 2 == 0, F.concat("n_name", F.lit("_v2"))
            ).otherwise(F.col("n_name")),
        ),
        root,
    )  # v2
    v3 = nation.withColumn(
        "n_name",
        F.when(
            F.col("n_nationkey") % 3 == 0, F.concat("n_name", F.lit("_v3"))
        ).otherwise(F.col("n_name")),
    )
    write_version(v3, root)  # v3
    removed = vacuum_versions(root, keep_last=2)
    if removed != [1]:
        raise RuntimeError(f"vacuum removed {removed}, expected exactly [1]")
    if read_version(spark, root, 2).count() != nation.count():
        raise RuntimeError("retained snapshot v2 unreadable after vacuum")
    return read_version(spark, root)  # latest == v3


@register(
    "streaming_sessionization_roundtrip",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    ), s AS (
      SELECT user_id, session_no,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS duration_s
      FROM sessions GROUP BY 1, 2
    ), m AS (
      SELECT user_id, MAX(session_no) AS last_no FROM s GROUP BY 1
    )
    SELECT s.user_id, s.n_events, s.session_start, s.duration_s
    FROM s JOIN m ON s.user_id = m.user_id
    WHERE s.session_no < m.last_no
    """,
    tags=["streaming", "stateful", "sessionization", "roundtrip"],
)
def q_streaming_sessionization_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL run of the custom stateful streaming operator
    (streaming/stateful.py streaming_sessionize,
    ``applyInPandasWithState``): the events stream feeds an availableNow
    query whose per-user O(1) state folds events into open sessions and
    emits each session the moment a gap closes it; emitted rows land in
    a parquet sink and are read back. The oracle is the BATCH
    sessionizer's SQL restricted to closed sessions (every session
    except each user's last — exactly what the stateful operator emits
    with no idle flush), so the state-machine semantics get a
    hash-checked driver row, not just the pytest parity test.

    total_value is computed in-state but projected away here: its
    float64 accumulation order (event-time) differs from a SQL
    decimal SUM by final-ulp amounts — counts/timestamps are the
    deterministic comparison surface."""
    from .streaming.jobs import read_events_stream
    from .streaming.stateful import streaming_sessionize

    landing = scratch_dir(prefix="mm_sess_landing_")
    # single landing file => one micro-batch: the cross-batch ordering
    # contract (time-ordered landing files) is the multi-batch pytest's
    # job; the driver row checks the state-machine semantics end-to-end
    events_table(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(landing)
    out = scratch_dir(prefix="mm_sess_out_")
    q = (
        streaming_sessionize(read_events_stream(spark, landing))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", scratch_dir(prefix="mm_sess_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("streaming sessionization did not drain in 120s")
    back = spark.read.parquet(out)
    return back.select(
        "user_id",
        "n_events",
        F.date_format(F.timestamp_micros("start_us"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        ((F.col("end_us") - F.col("start_us")) / F.lit(1_000_000.0)).alias(
            "duration_s"
        ),
    )


@register(
    "compaction_roundtrip",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY 1
    """,
    tags=["sink", "maintenance", "compaction", "roundtrip"],
)
def q_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as a driver-checked round trip
    (sources/catalog.py compact_table — the parquet OPTIMIZE analogue):
    lineitem lands as a 16-file table (a streaming-ingest footprint),
    compact_table rewrites it into target-sized files via the staged
    overwrite, and the final aggregate is hash-checked against the
    pristine table — a row lost, duplicated or corrupted by the rewrite
    flips the hash. The file census must strictly shrink or the query
    raises (an err row in CORRECTNESS, not a silent no-op)."""
    name = f"compact_rt_{uuid.uuid4().hex[:8]}"
    from .sources.catalog import compact_table, drop_table

    T(spark, sf_dir, "lineitem").repartition(16).write.format("parquet").saveAsTable(
        name
    )
    try:
        stats = compact_table(spark, name, target_file_bytes=256 * 1024 * 1024)
        if stats["after"]["n_files"] >= stats["before"]["n_files"]:
            raise RuntimeError(f"compaction did not shrink files: {stats}")
        return spark.table(name).groupBy("l_returnflag").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        ).localCheckpoint()
    finally:
        drop_table(spark, name)


@register(
    "time_travel_diff_roundtrip",
    """
    WITH v1 AS (SELECT n_nationkey, n_name FROM nation),
    v2 AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 5 = 0 THEN n_name || '_renamed'
                  ELSE n_name END AS n_name
      FROM nation WHERE n_nationkey % 7 <> 3
    ),
    j AS (
      SELECT COALESCE(a.n_nationkey, b.n_nationkey) AS n_nationkey,
             a.n_name AS old_n, b.n_name AS new_n,
             a.n_nationkey IS NULL AS ins, b.n_nationkey IS NULL AS del
      FROM v1 a FULL OUTER JOIN v2 b ON a.n_nationkey = b.n_nationkey
    )
    SELECT n_nationkey, 'delete' AS change_type, old_n AS n_name FROM j WHERE del
    UNION ALL
    SELECT n_nationkey, 'update', new_n FROM j
    WHERE NOT ins AND NOT del AND old_n IS DISTINCT FROM new_n
    """,
    tags=["S6", "time-travel", "cdc", "roundtrip"],
)
def q_time_travel_diff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-table time travel composed with the CDC diff
    (sources/catalog.py write_version/read_version + operators/cdc.py):
    nation is committed as v1, a deterministic mutation as v2, both are
    read BACK from their immutable snapshot directories, and
    snapshot_diff derives the change feed. The oracle recomputes the
    diff from the pristine table, so a version pointer pointing at the
    wrong snapshot, a partial write, or a diff bug all flip the hash."""
    from .operators.cdc import snapshot_diff
    from .sources.catalog import read_version, write_version

    root = scratch_dir(prefix="mm_tt_rt_") + "/nation_versions"
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    write_version(nation, root)
    v2 = nation.filter(F.col("n_nationkey") % 7 != 3).select(
        "n_nationkey",
        F.when(
            F.col("n_nationkey") % 5 == 0, F.concat(F.col("n_name"), F.lit("_renamed"))
        ).otherwise(F.col("n_name")).alias("n_name"),
    )
    write_version(v2, root)
    old = read_version(spark, root, 1)
    new = read_version(spark, root, 2)
    return snapshot_diff(old, new, keys=["n_nationkey"], compare_cols=["n_name"])


@register(
    "synth_source_rollup",
    """
    WITH g AS (
      SELECT unnest(generate_series(0, 9999)) AS i
    ), r AS (
      SELECT i,
             CAST(CONCAT('0x', substr(md5('synth|' || i), 1, 15)) AS BIGINT) AS h,
             CAST(CONCAT('0x', substr(md5('synth|' || i), 16, 2)) AS BIGINT) AS he,
             CAST(CONCAT('0x', substr(md5('synth|' || i), 18, 4)) AS BIGINT) AS hv
      FROM g
    ), rows_ AS (
      SELECT i AS event_id,
             TIMESTAMP '2024-01-01' + (h % 86400) * INTERVAL 1 SECOND AS ts,
             h % 1000 AS user_id,
             ['click','view','purchase','signup','error'][(he % 5) + 1] AS event_type,
             CAST(hv % 10000 AS DOUBLE) / 100.0 AS value
      FROM r
    )
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM rows_
    GROUP BY 1, 2
    """,
    tags=["python-datasource", "connector"],
)
def q_synth_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-connector verification: read 10k rows through the Python
    DataSource API (sources/pydatasource.py — partition-planned reads,
    md5-closed-form rows) and roll them up; the oracle REPLAYS the
    generator arithmetic in DuckDB via generate_series + identical md5
    slices, so the connector's row content is hash-verified cross-engine
    — a correctness bar file-based sources get from shared bytes, and a
    custom source must earn arithmetically.

    Scale: reads are partitioned (4 here; a parallelism knob only — row
    content derives from the global index); the rollup is one shuffled
    aggregation. ``ignore sf_dir``: the connector is its own data."""
    from .sources.pydatasource import register_synth_source

    register_synth_source(spark)
    df = (
        spark.read.format("synth_events")
        .option("numPartitions", 4)
        .option("rowsPerPartition", 2500)
        .load()
    )
    return df.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register(
    "delta_log_read_roundtrip",
    """
    WITH final AS (
      SELECT n_regionkey,
             CAST(COUNT(*) AS BIGINT) AS n_nations,
             CAST(SUM(n_nationkey) AS BIGINT) AS sum_keys
      FROM nation GROUP BY 1
    ), v0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v0_rows
      FROM nation WHERE n_nationkey < 15
    )
    SELECT final.*, v0.v0_rows FROM final CROSS JOIN v0
    """,
    tags=["S6", "delta", "time-travel", "roundtrip"],
)
def q_delta_log_read_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta transaction-log READ parity without delta-spark (S6): write
    a protocol-valid Delta table (parquet data files + authored JSON
    commits, sources/delta_log.py) in three commits — v0 overwrite of
    the low-key nation slice, v1 append of the rest (hive-partitioned by
    n_regionkey), v2 checkpoint — then reconstruct the snapshot from the
    checkpoint + log, scan it distributed, and aggregate per region.
    Time travel supplies v0's row count as a cross-joined scalar. The
    oracle recomputes both from the pristine nation table, so a reader
    that drops/double-counts a file, misses a remove action, or loses
    partition-column values on the hive read flips the hash.

    Parity: every reference write is Delta
    (1_customer_data_processing.py:50-53); time travel = S6's CDF-era
    read (VERDICT r4 next-step #2).

    Scale: log parsing is O(files) driver-side metadata (the canonical
    Delta reader shape); the data scan is one distributed parquet read
    with basePath partition recovery, and the aggregate is a single
    partial-agg shuffle on n_regionkey."""
    from .sources.delta_log import read_delta, write_checkpoint, write_delta

    root = scratch_dir(prefix="mm_delta_rt_") + "/nation_delta"
    nation = T(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_delta(
        nation.filter("n_nationkey < 15"),
        root,
        mode="overwrite",
        partition_by=["n_regionkey"],
    )
    write_delta(
        nation.filter("n_nationkey >= 15"),
        root,
        mode="append",
        partition_by=["n_regionkey"],
    )
    write_checkpoint(spark, root)

    final = (
        read_delta(spark, root)
        .groupBy("n_regionkey")
        .agg(
            F.count("*").cast("bigint").alias("n_nations"),
            F.sum("n_nationkey").cast("bigint").alias("sum_keys"),
        )
    )
    v0 = read_delta(spark, root, version=0).agg(
        F.count("*").cast("bigint").alias("v0_rows")
    )
    return final.crossJoin(F.broadcast(v0))


@register(
    "delta_cdf_diff",
    """
    WITH v0 AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal FROM customer
    ), v1 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 1 THEN CAST(c_acctbal AS DOUBLE) + 100.0
                  ELSE CAST(c_acctbal AS DOUBLE) END AS bal
      FROM customer WHERE c_custkey % 10 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, CAST(c_acctbal AS DOUBLE) + 7.0
      FROM customer WHERE c_custkey % 10 = 2
    )
    SELECT COALESCE(v1.c_custkey, v0.c_custkey) AS c_custkey,
           CASE WHEN v0.c_custkey IS NULL THEN 'insert'
                WHEN v1.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           v0.bal AS old_bal, v1.bal AS new_bal
    FROM v0 FULL OUTER JOIN v1 ON v0.c_custkey = v1.c_custkey
    WHERE v0.c_custkey IS NULL OR v1.c_custkey IS NULL
          OR v0.bal <> v1.bal
    """,
    tags=["S6", "delta", "cdc", "roundtrip"],
)
def q_delta_cdf_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-Data-Feed-equivalent read over the REAL Delta protocol
    (S6's remaining story, VERDICT r4 'What's missing' #1): commit v0 of
    a customer balance table, commit v1 with row deletes (custkey%10=0),
    updates (+100 on %10=1) and inserts (+1e6-offset keys), both through
    the protocol writer (sources/delta_log.py), then reconstruct BOTH
    versions from the transaction log and emit the row-level change set
    — insert/delete/update with old/new values — exactly what
    ``table_changes`` yields from Delta's CDF files, derived here from
    the log's version history instead of _change_data parquet (which the
    public protocol makes optional: readers may always fall back to
    version diffing).

    Scale: the two snapshot scans are distributed parquet reads over
    the live-file lists; the diff is ONE full-outer shuffle join on the
    table key — no driver-side data movement beyond the metadata-sized
    log."""
    from .sources.delta_log import read_delta, write_delta

    root = scratch_dir(prefix="mm_cdf_rt_") + "/cust_delta"
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("bal")
    )
    write_delta(cust, root, mode="overwrite")  # v0
    v1_content = (
        cust.filter(F.col("c_custkey") % 10 != 0)
        .withColumn(
            "bal",
            F.when(F.col("c_custkey") % 10 == 1, F.col("bal") + 100.0).otherwise(
                F.col("bal")
            ),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 10 == 2).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                (F.col("bal") + 7.0).alias("bal"),
            )
        )
    )
    write_delta(v1_content, root, mode="overwrite")  # v1

    v0 = read_delta(spark, root, version=0).select(
        F.col("c_custkey").alias("k0"), F.col("bal").alias("old_bal")
    )
    v1 = read_delta(spark, root, version=1).select(
        F.col("c_custkey").alias("k1"), F.col("bal").alias("new_bal")
    )
    return (
        v0.join(v1, v0["k0"] == v1["k1"], "full_outer")
        .filter(
            F.col("k0").isNull()
            | F.col("k1").isNull()
            | (F.col("old_bal") != F.col("new_bal"))
        )
        .select(
            F.coalesce(F.col("k1"), F.col("k0")).alias("c_custkey"),
            F.when(F.col("k0").isNull(), F.lit("insert"))
            .when(F.col("k1").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            "old_bal",
            "new_bal",
        )
    )


@register(
    "ivm_join_view_maintenance",
    """
    SELECT c.c_mktsegment,
           strftime(date_trunc('month', o.o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=["ivm", "incremental", "join"],
)
def q_ivm_join_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized JOIN view maintained under two-sided append deltas
    (operators/ivm.py:maintain_join_view): 80% of orders ⋈ 90% of
    customers stand in for the stored view; the remaining slices arrive
    as ΔA and ΔB and fold in via the delta-join rule
    V ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — every maintenance join is
    delta-bounded, the full recompute never runs. The oracle IS the
    from-scratch join over all rows aggregated to (segment, month), so
    a missed or double-counted delta term flips the hash (DECIMAL sums
    keep the aggregation associative)."""
    from .operators.ivm import maintain_join_view

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a_old = o.filter(F.col("o_orderkey") % 5 != 0)
    delta_a = o.filter(F.col("o_orderkey") % 5 == 0)
    b_old = c.filter(F.col("c_custkey") % 10 != 0)
    delta_b = c.filter(F.col("c_custkey") % 10 == 0)

    keys = ["o_custkey"]
    view = a_old.join(
        b_old.withColumnRenamed("c_custkey", "o_custkey"), keys
    )
    maintained = maintain_join_view(
        view,
        a_old,
        b_old.withColumnRenamed("c_custkey", "o_custkey"),
        delta_a,
        delta_b.withColumnRenamed("c_custkey", "o_custkey"),
        keys,
    )
    return (
        maintained.groupBy(
            "c_mktsegment",
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "delta_merge_roundtrip",
    """
    WITH src AS (
      SELECT n_nationkey, 'UPD_' || n_name AS n_name, n_regionkey
      FROM nation WHERE n_nationkey % 2 = 0
      UNION ALL
      SELECT n_nationkey + 100, 'NEW_' || n_name, n_regionkey FROM nation
    ), merged AS (
      SELECT s.n_nationkey, s.n_name, s.n_regionkey FROM src s
      UNION ALL
      SELECT n.n_nationkey, n.n_name, n.n_regionkey
      FROM nation n
      WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.n_nationkey = n.n_nationkey)
    )
    SELECT n_nationkey, n_name, n_regionkey FROM merged
    """,
    tags=["S6", "J5", "delta", "merge", "roundtrip"],
)
def q_delta_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE update-all/insert-all executed against a REAL Delta table
    (J5 ⨯ S6): nation committed through the protocol writer, a source of
    updates (even keys) + inserts (+100 keys) merged via the engine's
    MERGE semantics, the result committed as the next Delta version, and
    the final state read back from the transaction log. The oracle is
    the textbook MERGE expansion (source rows ∪ unmatched target rows),
    so a wrong update, lost insert, or stale snapshot flips the hash;
    v0 remains time-travel-readable after the merge commit (asserted
    in-query).

    Scale: the merge itself is the documented one-join rewrite
    (operators/merge.py); the Delta commit adds O(files) metadata."""
    from .operators.merge import merge_dataframes
    from .sources.delta_log import read_delta, write_delta

    root = scratch_dir(prefix="mm_dmerge_rt_") + "/nation_delta"
    nation = T(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_delta(nation, root, mode="overwrite")  # v0

    src = nation.filter(F.col("n_nationkey") % 2 == 0).select(
        "n_nationkey",
        F.concat(F.lit("UPD_"), F.col("n_name")).alias("n_name"),
        "n_regionkey",
    ).unionByName(
        nation.select(
            (F.col("n_nationkey") + 100).alias("n_nationkey"),
            F.concat(F.lit("NEW_"), F.col("n_name")).alias("n_name"),
            "n_regionkey",
        )
    )
    merged = merge_dataframes(read_delta(spark, root), src, ["n_nationkey"])
    write_delta(merged, root, mode="overwrite")  # v1

    if read_delta(spark, root, version=0).count() != nation.count():
        raise RuntimeError("pre-merge version no longer time-travel-readable")
    return read_delta(spark, root)


@register(
    "delta_skipping_roundtrip",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 5000
    GROUP BY 1
    """,
    tags=["S6", "delta", "data-skipping", "roundtrip"],
)
def q_delta_skipping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-based data skipping over the protocol log: lineitem written
    range-partitioned into 16 files (disjoint l_orderkey intervals),
    each add action stamped with parquet-footer min/max stats; the
    range probe plans ONLY the files whose interval intersects — the
    query raises unless skipping actually eliminated files — and the
    exact residual filter + aggregate run on the pruned scan. The
    oracle computes the same aggregate from the pristine table, so a
    wrongly-skipped file (lost rows) or a stats bug flips the hash.

    Scale: file elimination is O(files) driver metadata; the scan reads
    only surviving files — the mechanism that turns a 100 TB table into
    a GB-scale read for range-bounded queries without a partition
    scheme."""
    from .sources.delta_log import read_delta_pruned, write_delta

    root = scratch_dir(prefix="mm_skip_rt_") + "/li_delta"
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    write_delta(li.repartitionByRange(16, "l_orderkey"), root, mode="overwrite")

    lo, hi = 1000, 5000
    pruned, skipped = read_delta_pruned(spark, root, "l_orderkey", lo, hi)
    if skipped == 0:
        raise RuntimeError("stats skipping eliminated no files")
    return (
        pruned.filter(F.col("l_orderkey").between(lo, hi))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@register(
    "delta_lifecycle_roundtrip",
    """
    WITH b AS (
      SELECT MAX(l_orderkey) // 16 AS lo, MAX(l_orderkey) // 8 AS hi,
             (MAX(l_orderkey) * 3) // 4 AS ulo, (MAX(l_orderkey) * 7) // 8 AS uhi
      FROM lineitem
    ), survivors AS (
      SELECT l_returnflag,
             CASE WHEN l_orderkey BETWEEN b.ulo AND b.uhi
                  THEN CAST(l_quantity AS DECIMAL(18,2)) * 2
                  ELSE CAST(l_quantity AS DECIMAL(18,2)) END AS qty
      FROM lineitem CROSS JOIN b
      WHERE l_orderkey NOT BETWEEN b.lo AND b.hi
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(qty) AS DOUBLE) AS sum_qty
    FROM survivors
    GROUP BY 1
    """,
    tags=["S6", "delta", "optimize", "dml", "vacuum", "roundtrip"],
)
def q_delta_lifecycle_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Delta maintenance + DML lifecycle under the hash gate: 24
    small-file commits -> OPTIMIZE ZORDER BY (dataChange=false
    compaction) -> copy-on-write DELETE of a low l_orderkey range ->
    copy-on-write UPDATE doubling quantities in a high range (both
    stats-pruned file surgery; the query raises unless each left some
    files untouched) -> retention-0 VACUUM -> final scan+aggregate.
    The oracle recomputes the post-delete post-update aggregate from
    the pristine table, so a compaction that loses rows, DML that
    rewrites the wrong files or values, or a vacuum that reclaims a
    live file flips the hash or errors."""
    from .sources.delta_log import (
        delete_delta,
        optimize_delta,
        read_delta,
        snapshot,
        vacuum_delta,
        write_delta,
    )

    root = scratch_dir(prefix="mm_dlc_rt_") + "/li_delta"
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    write_delta(li.repartition(24), root, mode="overwrite")
    optimize_delta(spark, root, target_files=8, zorder_by=("l_orderkey", "l_quantity"))
    n_before = len(snapshot(spark, root).files)
    # scale-relative low-quadrant delete range (integer-exact in both
    # engines: floor division of the max key); narrow enough that the
    # z-clustered files mostly fall outside it
    mx = li.agg(F.max("l_orderkey")).first()[0]
    lo, hi = mx // 16, mx // 8
    _, rewritten = delete_delta(spark, root, "l_orderkey", lo, hi)
    if not (0 < rewritten < n_before):
        raise RuntimeError(
            f"delete rewrote {rewritten}/{n_before} files — expected surgical"
        )
    from .sources.delta_log import snapshot as _snap, update_delta

    n_mid = len(_snap(spark, root).files)
    ulo, uhi = (mx * 3) // 4, (mx * 7) // 8
    _, u_rewritten = update_delta(
        spark, root, "l_orderkey", ulo, uhi,
        {"l_quantity": "l_quantity * 2"},
    )
    if not (0 < u_rewritten < n_mid):
        raise RuntimeError(
            f"update rewrote {u_rewritten}/{n_mid} files — expected surgical"
        )
    vacuum_delta(spark, root)
    return (
        read_delta(spark, root)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@register(
    "delta_stream_fold_roundtrip",
    """
    WITH tagged AS (
      SELECT n_regionkey,
             CASE WHEN n_nationkey < 8 THEN 0
                  WHEN n_nationkey < 16 THEN 1
                  ELSE 2 END AS batch_version
      FROM nation
    )
    SELECT n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(SUM(batch_version) AS BIGINT) AS version_mass,
           CAST(MIN(batch_version) AS BIGINT) AS first_seen_batch
    FROM tagged GROUP BY 1
    """,
    tags=["S6", "delta", "streaming-source", "roundtrip"],
)
def q_delta_stream_fold_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-as-streaming-source round trip: three append commits over
    the protocol log, replayed with ``stream_commit_batches`` (an
    OPTIMIZE in the middle must yield NOTHING — dataChange=false), each
    batch tagged with its commit index and folded into per-region
    counts + the version mass + first-seen batch. The oracle recomputes
    all three from the pristine table via the same key-slice CASE, so a
    source that drops a commit, re-emits compacted bytes, or misorders
    versions flips the hash. Commit indexes are normalized to
    0/1/2 (the optimize commit shifts raw version numbers).

    Scale: each batch is a bounded scan of that commit's added files;
    the fold is one aggregation per batch at region grain."""
    from .sources.delta_log import optimize_delta, stream_commit_batches, write_delta

    root = scratch_dir(prefix="mm_dstream_rt_") + "/nation_delta"
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    write_delta(nation.filter("n_nationkey < 8"), root, mode="overwrite")
    write_delta(
        nation.filter("n_nationkey >= 8 and n_nationkey < 16"), root, mode="append"
    )
    optimize_delta(spark, root, target_files=2)
    write_delta(nation.filter("n_nationkey >= 16"), root, mode="append")

    folded = None
    for i, (_, batch) in enumerate(stream_commit_batches(spark, root)):
        agg = batch.groupBy("n_regionkey").agg(
            F.count("*").cast("bigint").alias("n_nations"),
            F.sum(F.lit(i)).cast("bigint").alias("version_mass"),
            F.min(F.lit(i)).cast("bigint").alias("first_seen_batch"),
        )
        if folded is None:
            folded = agg
        else:
            prev = folded.select(
                "n_regionkey",
                F.col("n_nations").alias("p_n"),
                F.col("version_mass").alias("p_vm"),
                F.col("first_seen_batch").alias("p_fs"),
            )
            folded = (
                agg.join(prev, "n_regionkey", "full_outer")
                .select(
                    "n_regionkey",
                    (F.coalesce("n_nations", F.lit(0)) + F.coalesce("p_n", F.lit(0)))
                    .cast("bigint")
                    .alias("n_nations"),
                    (
                        F.coalesce("version_mass", F.lit(0))
                        + F.coalesce("p_vm", F.lit(0))
                    )
                    .cast("bigint")
                    .alias("version_mass"),
                    F.least(
                        F.coalesce("first_seen_batch", F.lit(99)),
                        F.coalesce("p_fs", F.lit(99)),
                    )
                    .cast("bigint")
                    .alias("first_seen_batch"),
                )
            )
    if folded is None:
        raise RuntimeError("streaming source yielded no batches")
    return folded


@register(
    "streaming_threshold_alerts_roundtrip",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'
    ), a AS (
      SELECT x.user_id, x.event_id, x.ts_us,
             (SELECT COUNT(*) FROM e y
              WHERE y.user_id = x.user_id
                AND y.ts_us >= x.ts_us - 86400000000
                AND (y.ts_us < x.ts_us
                     OR (y.ts_us = x.ts_us AND y.event_id <= x.event_id)))
               AS n_in_window
      FROM e x
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_alerts,
           CAST(MAX(n_in_window) AS BIGINT) AS peak_rate,
           CAST(MIN(ts_us) AS BIGINT) AS first_alert_us
    FROM a WHERE n_in_window >= 3
    GROUP BY 1
    """,
    tags=["streaming", "stateful", "cep", "alerts", "roundtrip"],
)
def q_streaming_threshold_alerts_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CEP rate detector round trip (streaming/stateful.py:
    streaming_threshold_alerts): the click stream replayed through the
    applyInPandasWithState sliding-window operator — alert on every
    click that is the 3rd+ for its user within a trailing 24h — then
    alerts aggregated per user. The oracle recomputes the exact
    trailing-window counts with a (ts, event_id)-tie-exact self-join,
    so an eviction bug (window boundary off by one microsecond), a
    dropped alert, or a state row lost across micro-batches flips the
    hash. State per user = stamps inside the window, evicted as event
    time advances."""
    from .streaming.jobs import read_events_stream
    from .streaming.stateful import streaming_threshold_alerts

    landing = scratch_dir(prefix="mm_alert_landing_")
    events_table(spark, sf_dir).orderBy("ts", "event_id").coalesce(
        1
    ).write.mode("overwrite").parquet(landing)
    out = scratch_dir(prefix="mm_alert_out_")
    q = (
        streaming_threshold_alerts(
            read_events_stream(spark, landing),
            event_type="click",
            k=3,
            window_s=86400,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", scratch_dir(prefix="mm_alert_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("streaming threshold alerts did not drain in 120s")
    back = spark.read.parquet(out)
    return back.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_alerts"),
        F.max("n_in_window").cast("bigint").alias("peak_rate"),
        F.min("ts_us").cast("bigint").alias("first_alert_us"),
    )


# --------------------------------------------------------------------------
# round 6: optimistic concurrency, CDF, column mapping, deletion vectors,
# checkpoint retention
# --------------------------------------------------------------------------


@register(
    "delta_concurrent_writers_roundtrip",
    f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_dsum("c_acctbal", "bal_mass")}
    FROM customer GROUP BY 1
    """,
    tags=["S6", "delta", "concurrency", "roundtrip"],
)
def q_delta_concurrent_writers_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Concurrent Delta writers (VERDICT r5 next-step #1): three threads
    append disjoint customer slices to the same table AT THE SAME TIME.
    Commits land via atomic put-if-absent (hard-link) and blind appends
    REBASE over each other (sources/delta_log.py:_commit), so all three
    must land, versions must be dense 0..3 (a clobbered commit JSON
    would leave a gap or lose a slice), and the final snapshot must hold
    the exact union — which the oracle recomputes from the pristine
    customer table. The reference gets this from Delta's
    OptimisticTransaction on every MERGE
    (1_customer_data_processing.py:311-318).

    Scale: conflict handling is O(retries) driver-side metadata; each
    writer's data path is an independent distributed parquet write."""
    from .sources.delta_log import read_delta, snapshot, write_delta

    root = scratch_dir(prefix="mm_dconc_rt_") + "/cust_delta"
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    write_delta(cust.filter("c_custkey % 4 = 0"), root, mode="overwrite")  # v0

    errors: list[Exception] = []

    def appender(i: int) -> None:
        try:
            write_delta(cust.filter(f"c_custkey % 4 = {i}"), root, mode="append")
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(e)

    threads = [
        threading.Thread(target=appender, args=(i,)) for i in (1, 2, 3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    snap = snapshot(spark, root)
    if snap.version != 3:
        raise RuntimeError(
            f"expected dense versions 0..3, got latest {snap.version}"
        )
    return (
        read_delta(spark, root)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum("c_acctbal", "bal_mass"),
        )
    )


@register(
    "delta_cdf_stream_roundtrip",
    """
    WITH allr AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal FROM customer
    ), final AS (
      SELECT c_custkey,
             CASE WHEN c_custkey BETWEEN 500 AND 800 THEN bal + 100.0
                  ELSE bal END AS bal
      FROM allr WHERE c_custkey NOT BETWEEN 100 AND 400
    ), buckets AS (
      SELECT c_custkey % 7 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_mass
      FROM final GROUP BY 1
    ), chg AS (
      SELECT CAST((SELECT COUNT(*) FROM allr) AS BIGINT) AS n_inserts,
             CAST((SELECT COUNT(*) FROM allr
                   WHERE c_custkey BETWEEN 100 AND 400) AS BIGINT) AS n_deletes,
             CAST((SELECT COUNT(*) FROM final
                   WHERE c_custkey BETWEEN 500 AND 800) AS BIGINT) AS n_updates
    )
    SELECT buckets.*, chg.* FROM buckets CROSS JOIN chg
    """,
    tags=["S6", "delta", "cdf", "streaming-source", "roundtrip"],
)
def q_delta_cdf_stream_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF write path + streaming over a DML'd table (VERDICT r5
    next-step #2): a CDF-enabled table takes two appends, a
    copy-on-write DELETE and an UPDATE — the DML commits emit
    _change_data parquet (delete rows, update pre/postimages) referenced
    by cdc actions, exactly what the reference turns on for every write
    (3_pricing_data_processing.py:167-172). ``stream_cdf_batches``
    replays all four commits (the r5 append-only source REJECTED this
    history); the change stream is folded back into table state via
    per-batch key anti-join + union, and the fold must reproduce the
    final snapshot the oracle recomputes from scratch. Change-type
    counts ride along as cross-joined scalars, so a missed preimage or
    double-fed postimage flips the hash.

    Scale: each batch reads only that commit's cdc/add files; the fold
    joins are delta-bounded; nothing collects row data."""
    from .sources.delta_log import (
        delete_delta,
        stream_cdf_batches,
        update_delta,
        write_delta,
    )

    root = scratch_dir(prefix="mm_dcdfs_rt_") + "/cust_delta"
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("bal")
    )
    write_delta(
        cust.filter("c_custkey % 10 < 8"),
        root,
        mode="overwrite",
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # v0
    write_delta(cust.filter("c_custkey % 10 >= 8"), root, mode="append")  # v1
    delete_delta(spark, root, "c_custkey", 100, 400)  # v2
    update_delta(spark, root, "c_custkey", 500, 800, {"bal": "bal + 100.0"})  # v3

    state: DataFrame | None = None
    all_types: DataFrame | None = None
    for _v, batch in stream_cdf_batches(spark, root):
        ins = batch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select("c_custkey", "bal")
        rem = batch.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select("c_custkey")
        state = (
            ins
            if state is None
            else state.join(rem, "c_custkey", "left_anti").unionByName(ins)
        )
        types = batch.select("_change_type")
        all_types = types if all_types is None else all_types.unionByName(types)
    if state is None or all_types is None:
        raise RuntimeError("CDF stream yielded no batches")

    chg = all_types.agg(
        F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserts"),
        F.sum(F.when(F.col("_change_type") == "delete", 1).otherwise(0))
        .cast("bigint")
        .alias("n_deletes"),
        F.sum(
            F.when(F.col("_change_type") == "update_postimage", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_updates"),
    )
    return (
        state.groupBy((F.col("c_custkey") % 7).alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum("bal", "bal_mass"),
        )
        .crossJoin(F.broadcast(chg))
    )


@register(
    "delta_column_mapping_read",
    """
    WITH pruned AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS pruned_rows
      FROM nation WHERE n_regionkey = 2
    )
    SELECT n.n_regionkey AS region_key,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(SUM(n.n_nationkey) AS BIGINT) AS key_mass,
           p.pruned_rows
    FROM nation n CROSS JOIN pruned p
    GROUP BY 1, p.pruned_rows
    """,
    tags=["S6", "delta", "column-mapping", "roundtrip"],
)
def q_delta_column_mapping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-mapping (name mode) read interop (VERDICT r5 next-step
    #3): the fixture is authored the way a modern engine with
    delta.columnMapping.mode=name writes — parquet files and hive
    partition dirs carry PHYSICAL names (col-xxx), the committed schema
    carries logical names with delta.columnMapping.physicalName
    metadata, add.partitionValues are keyed by physical name. The reader
    must resolve physical->logical at scan time (read_delta), and stats
    pruning must translate the LOGICAL probe column to its physical
    stats/partitionValues key (read_delta_pruned) — the pruned count
    rides along as a cross-joined scalar. Without this, tables written
    by current Databricks defaults are unreadable.

    Scale: mapping is pure metadata; the scan/prune path is unchanged."""
    from .sources.delta_log import read_delta, read_delta_pruned

    root = scratch_dir(prefix="mm_dcm_rt_") + "/nation_cm"
    nation = T(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    phys = nation.select(
        F.col("n_nationkey").alias("col-a1"),
        F.col("n_name").alias("col-b2"),
        F.col("n_regionkey").alias("col-c3"),
    )
    os.makedirs(os.path.join(root, "_delta_log"))
    phys.write.mode("append").format("parquet").partitionBy("col-c3").save(root)
    adds = []
    for walk_root, dirs, names in os.walk(root):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for n in names:
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                rel = os.path.relpath(os.path.join(walk_root, n), root)
                adds.append(
                    {
                        "add": {
                            "path": rel,
                            "partitionValues": {
                                "col-c3": rel.split("=")[1].split("/")[0]
                            },
                            "size": os.path.getsize(os.path.join(root, rel)),
                            "dataChange": True,
                        }
                    }
                )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    logical = StructType(
        [
            StructField(
                "nation_key", LongType(), True,
                {"delta.columnMapping.id": 1,
                 "delta.columnMapping.physicalName": "col-a1"},
            ),
            StructField(
                "nation_name", StringType(), True,
                {"delta.columnMapping.id": 2,
                 "delta.columnMapping.physicalName": "col-b2"},
            ),
            StructField(
                "region_key", LongType(), True,
                {"delta.columnMapping.id": 3,
                 "delta.columnMapping.physicalName": "col-c3"},
            ),
        ]
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": logical.json(),
                "partitionColumns": ["region_key"],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
            }
        },
    ] + adds
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w", encoding="utf-8"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")

    out = read_delta(spark, root)
    pruned, skipped = read_delta_pruned(spark, root, "region_key", 2, 2)
    if skipped == 0:
        raise RuntimeError("column-mapped pruning eliminated no files")
    pr = pruned.filter("region_key = 2").agg(
        F.count("*").cast("bigint").alias("pruned_rows")
    )
    return (
        out.groupBy("region_key")
        .agg(
            F.count("*").cast("bigint").alias("n_nations"),
            F.sum("nation_key").cast("bigint").alias("key_mass"),
        )
        .crossJoin(F.broadcast(pr))
    )


@register(
    "delta_deletion_vectors_roundtrip",
    f"""
    WITH kept AS (
      SELECT * FROM orders
      WHERE NOT (o_orderkey BETWEEN 1000 AND 5000)
        AND NOT (o_orderkey BETWEEN 4000 AND 8000)
    ), tt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_at_v0 FROM orders
    )
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum("o_totalprice", "price_mass")},
           tt.rows_at_v0
    FROM kept CROSS JOIN tt GROUP BY 1, tt.rows_at_v0
    """,
    tags=["S6", "delta", "deletion-vectors", "dml", "roundtrip"],
)
def q_delta_deletion_vectors_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors (VERDICT r5 next-step
    #4): two overlapping range deletes on an orders table write ONLY
    row-index bitmaps (z85 + RoaringBitmapArray, sources/delta_dv.py) —
    the snapshot must keep the IDENTICAL data-file set (asserted; a
    rewrite would be copy-on-write, not merge-on-read), the second
    delete must MERGE bitmaps on files both ranges touch, reads must
    subtract the union, and time travel to v0 must still see every row
    (cross-joined rows_at_v0 scalar). This is the protocol's answer to
    small deletes on huge tables: O(deleted rows) of metadata, zero
    data bytes rewritten.

    Scale: the bitmap is driver-side metadata bounded by delete
    selectivity; the read-side subtraction is one broadcast anti-join
    on (file, row_index)."""
    from .sources.delta_log import delete_delta_dv, read_delta, snapshot, write_delta

    root = scratch_dir(prefix="mm_ddv_rt_") + "/orders_delta"
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    write_delta(o.repartitionByRange(8, "o_orderkey"), root, mode="overwrite")
    files_v0 = set(snapshot(spark, root).files)

    delete_delta_dv(spark, root, "o_orderkey", 1000, 5000)
    delete_delta_dv(spark, root, "o_orderkey", 4000, 8000)

    snap = snapshot(spark, root)
    if set(snap.files) != files_v0:
        raise RuntimeError("DV delete rewrote data files (expected none)")
    if not any(a.get("deletionVector") for a in snap.files.values()):
        raise RuntimeError("no deletionVector descriptors were written")

    v0_count = read_delta(spark, root, version=0).agg(
        F.count("*").cast("bigint").alias("rows_at_v0")
    )
    return (
        read_delta(spark, root)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            dsum("o_totalprice", "price_mass"),
        )
        .crossJoin(F.broadcast(v0_count))
    )


@register(
    "delta_checkpoint_truncate_replay",
    """
    WITH final AS (
      SELECT s_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(s_suppkey) AS BIGINT) AS key_mass
      FROM supplier GROUP BY 1
    ), extra AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS low_rows
      FROM supplier WHERE s_suppkey % 3 = 0
    )
    SELECT final.*, extra.low_rows FROM final CROSS JOIN extra
    """,
    tags=["S6", "delta", "checkpoint", "retention", "roundtrip"],
)
def q_delta_checkpoint_truncate_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-part checkpoint WRITE + log retention (VERDICT r5 next-step
    #6): three supplier commits, then a 2-part
    ``<v>.checkpoint.<i>.<n>.parquet`` set is authored and every JSON
    commit at or before it deleted (truncate_log — the
    delta.logRetentionDuration story). The snapshot must rebuild from
    the checkpoint parts alone, a NEW append must land on top, and a
    time-travel read pinned at the checkpoint version supplies the
    cross-joined low_rows scalar. The oracle recomputes both from the
    pristine supplier table, so a half-read checkpoint part or a replay
    that loses the post-truncation commit flips the hash.

    Scale: checkpoint size is O(live files); truncation is O(commits)
    unlink metadata."""
    from .sources.delta_log import (
        read_delta,
        truncate_log,
        write_checkpoint,
        write_delta,
    )

    root = scratch_dir(prefix="mm_dckpt_rt_") + "/supp_delta"
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    write_delta(s.filter("s_suppkey % 3 = 0"), root, mode="overwrite")  # v0
    write_delta(s.filter("s_suppkey % 3 = 1"), root, mode="append")  # v1
    ckpt_v = write_checkpoint(spark, root, parts=2)  # checkpoint at v1
    removed = truncate_log(root)
    if removed != list(range(ckpt_v + 1)):
        raise RuntimeError(f"truncate_log removed {removed}, wanted 0..{ckpt_v}")
    write_delta(s.filter("s_suppkey % 3 = 2"), root, mode="append")  # v2

    low = read_delta(spark, root, version=ckpt_v).filter("s_suppkey % 3 = 0").agg(
        F.count("*").cast("bigint").alias("low_rows")
    )
    return (
        read_delta(spark, root)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum("s_suppkey").cast("bigint").alias("key_mass"),
        )
        .crossJoin(F.broadcast(low))
    )


@register(
    "delta_cdf_bloom_dim_join",
    f"""
    WITH changed AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_custkey % 5 = 4 OR o_orderkey BETWEEN 2000 AND 6000
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_affected,
           {sql_dsum("c.c_acctbal", "bal_mass")}
    FROM customer c
    WHERE c.c_custkey IN (SELECT o_custkey FROM changed)
    GROUP BY 1
    """,
    tags=["S6", "delta", "cdf", "bloom", "join"],
)
def q_delta_cdf_bloom_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filtered CDF dimension join (VERDICT r5 next-step #6): the
    change feed of a CDF-enabled orders table (append commit + DELETE
    commit) yields the changed order keys; the affected CUSTOMERS are
    found with ``bloom_semi_join`` — the bitmap digest of the changed
    custkeys prefilters the customer probe before the exact semi-join,
    the incremental-refresh pattern where a 100 TB dim is filtered by a
    delta-sized bloom bitmap instead of shuffling whole. The oracle
    recomputes the affected set relationally (IN subquery), so a bloom
    false NEGATIVE (the one failure a bloom must never have) or a
    missed/spurious change row flips the hash.

    Scale: changes are delta-bounded scans of cdc/add files; the bloom
    bitmap is <=8 MB; the residual semi-join shuffles only prefilter
    survivors."""
    from .operators.bloomjoin import bloom_semi_join
    from .sources.delta_log import delete_delta, read_cdf, write_delta

    root = scratch_dir(prefix="mm_dcbj_rt_") + "/orders_delta"
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    write_delta(
        o.filter("o_custkey % 5 < 4"),
        root,
        mode="overwrite",
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # v0
    write_delta(o.filter("o_custkey % 5 = 4"), root, mode="append")  # v1
    delete_delta(spark, root, "o_orderkey", 2000, 6000)  # v2

    changed_keys = (
        read_cdf(spark, root, from_version=1)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    affected = bloom_semi_join(cust, changed_keys, "c_custkey")
    return affected.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_affected"),
        dsum("c_acctbal", "bal_mass"),
    )


@register(
    "delta_restore_roundtrip",
    """
    WITH v0 AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(p_size) AS BIGINT) AS size_mass
      FROM part WHERE p_partkey % 10 < 6 GROUP BY 1
    ), pre AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_before_restore
      FROM part
      WHERE (p_partkey % 10 < 6 OR p_partkey % 10 >= 6)
        AND NOT (p_partkey BETWEEN 100 AND 900)
    )
    SELECT v0.*, pre.rows_before_restore FROM v0 CROSS JOIN pre
    """,
    tags=["S6", "delta", "restore", "time-travel", "roundtrip"],
)
def q_delta_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE TO VERSION AS OF over the protocol log: a part
    table takes an append and a copy-on-write DELETE, then is RESTORED
    to v0 — a new commit that re-adds v0's files and removes everything
    since, zero data movement (sources/delta_log.py:restore_delta). The
    final read must equal v0 exactly (per-brand aggregate), while the
    pre-restore state remains time-travel-readable and supplies the
    cross-joined rows_before_restore scalar. The oracle recomputes both
    from the pristine part table, so a restore that loses a v0 file,
    keeps a deleted one, or clobbers history flips the hash.

    Scale: restore is an O(files) metadata diff; both reads are plain
    distributed scans."""
    from .sources.delta_log import delete_delta, read_delta, restore_delta, write_delta

    root = scratch_dir(prefix="mm_drestore_rt_") + "/part_delta"
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    write_delta(
        p.filter("p_partkey % 10 < 6").repartitionByRange(4, "p_partkey"),
        root,
        mode="overwrite",
    )  # v0
    write_delta(p.filter("p_partkey % 10 >= 6"), root, mode="append")  # v1
    delete_delta(spark, root, "p_partkey", 100, 900)  # v2
    v = restore_delta(spark, root, 0)  # v3

    pre = read_delta(spark, root, version=v - 1).agg(
        F.count("*").cast("bigint").alias("rows_before_restore")
    )
    return (
        read_delta(spark, root)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("p_size").cast("bigint").alias("size_mass"),
        )
        .crossJoin(F.broadcast(pre))
    )


@register(
    "ivm_cdf_retraction_fold",
    """
    WITH allr AS (
      SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders
    ), final AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey BETWEEN 9000 AND 12000 THEN price + 50.0
                  ELSE price END AS price
      FROM allr WHERE o_orderkey NOT BETWEEN 2000 AND 6000
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_mass
    FROM final GROUP BY 1
    """,
    tags=["ivm", "cdf", "incremental", "retraction"],
)
def q_ivm_cdf_retraction_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete/update-aware incremental view maintenance driven by the
    Change Data Feed: a SUM/COUNT view over a CDF-enabled orders table
    is maintained purely from ``stream_cdf_batches`` — inserts and
    update_postimages contribute +1/+price, deletes and
    update_preimages contribute -1/-price (retractions), each batch
    folds as a signed partial aggregate at view grain and the running
    state re-aggregates. The full recompute never runs; the oracle IS
    the full recompute, so a missed retraction (the classic IVM bug
    class appends-only systems hit when DML arrives) flips the hash.

    Scale: every fold touches one commit's change rows aggregated to
    priority grain — maintenance cost tracks the delta, not the table;
    exact DECIMAL masses keep the fold order-insensitive."""
    from .sources.delta_log import (
        delete_delta,
        stream_cdf_batches,
        update_delta,
        write_delta,
    )

    root = scratch_dir(prefix="mm_ivmcdf_rt_") + "/orders_delta"
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    write_delta(
        o.filter("o_orderkey % 5 < 4"),
        root,
        mode="overwrite",
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # v0
    write_delta(o.filter("o_orderkey % 5 = 4"), root, mode="append")  # v1
    delete_delta(spark, root, "o_orderkey", 2000, 6000)  # v2
    update_delta(
        spark, root, "o_orderkey", 9000, 12000, {"price": "price + 50.0"}
    )  # v3

    state: DataFrame | None = None
    for _v, batch in stream_cdf_batches(spark, root):
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        signed = batch.groupBy("o_orderpriority").agg(
            F.sum(sign).cast("bigint").alias("n_orders"),
            F.sum(
                sign.cast("decimal(18,2)") * F.col("price").cast("decimal(18,2)")
            )
            .cast("decimal(28,2)")
            .alias("mass"),
        )
        state = signed if state is None else (
            state.unionByName(signed)
            .groupBy("o_orderpriority")
            .agg(
                F.sum("n_orders").cast("bigint").alias("n_orders"),
                F.sum("mass").cast("decimal(28,2)").alias("mass"),
            )
        )
    if state is None:
        raise RuntimeError("CDF stream yielded no batches")
    return state.filter(F.col("n_orders") > 0).select(
        "o_orderpriority",
        "n_orders",
        F.col("mass").cast("double").alias("price_mass"),
    )


@register(
    "delta_pysource_stream_roundtrip",
    """
    WITH tagged AS (
      SELECT c_mktsegment,
             CASE WHEN c_custkey % 3 = 0 THEN 0
                  WHEN c_custkey % 3 = 1 THEN 1
                  ELSE 2 END AS commit_v,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(commit_v) AS BIGINT) AS version_mass,
           CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_mass
    FROM tagged GROUP BY 1
    """,
    tags=["S6", "delta", "streaming-source", "pydatasource", "roundtrip"],
)
def q_delta_pysource_stream_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Delta commit log as a REAL Structured Streaming source
    (sources/delta_pysource.py, Spark 4 Python DataSource API): three
    customer commits stream through
    ``spark.readStream.format("delta_pylog")`` in CDF mode — offsets
    are commit versions, each input partition decodes one parquet file
    executor-side into Arrow batches — into a memory sink under
    Trigger.AvailableNow. The sink is aggregated per segment with the
    commit-version mass riding along, so a source that drops a commit,
    re-emits one, misorders versions, or mangles a value in the Arrow
    path flips the hash against the oracle's recomputation from the
    pristine table. This closes the loop the generator-based
    stream_cdf_batches cannot: checkpointed, engine-scheduled streaming
    over the engine's own tables.

    Scale: planning is O(files-per-commit) driver metadata; all row
    decoding is executor-side Arrow; the sink aggregate is one
    partial-agg shuffle at segment grain."""
    from .sources.delta_pysource import register_delta_source
    from .sources.delta_log import write_delta

    register_delta_source(spark)
    root = scratch_dir(prefix="mm_dpys_rt_") + "/cust_delta"
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    for i in range(3):
        write_delta(
            cust.filter(f"c_custkey % 3 = {i}"),
            root,
            mode="overwrite" if i == 0 else "append",
        )

    qname = f"dpys_rt_{uuid.uuid4().hex[:12]}"
    q = (
        spark.readStream.format("delta_pylog")
        .option("path", root)
        .option("mode", "cdf")
        .load()
        .writeStream.format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(qname)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("_commit_version").cast("bigint").alias("version_mass"),
            dsum("bal", "bal_mass"),
        )
    )


@register(
    "delta_merge_cdf_roundtrip",
    """
    WITH src AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) + 10.0 AS price
      FROM orders WHERE o_orderkey BETWEEN 300 AND 700
      UNION ALL
      SELECT o_orderkey + 1000000, CAST(o_totalprice AS DOUBLE)
      FROM orders WHERE o_orderkey % 100 = 7
    ), merged AS (
      SELECT o_orderkey, price FROM src
      UNION ALL
      SELECT o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS price
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.o_orderkey = o.o_orderkey)
    ), chg AS (
      SELECT CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderkey BETWEEN 300 AND 700) AS BIGINT)
               AS n_updates,
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderkey % 100 = 7) AS BIGINT) AS n_inserts
    )
    SELECT CAST(o_orderkey % 10 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_mass,
           chg.n_updates, chg.n_inserts
    FROM merged CROSS JOIN chg
    GROUP BY 1, chg.n_updates, chg.n_inserts
    """,
    tags=["S6", "J5", "delta", "merge", "cdf", "roundtrip"],
)
def q_delta_merge_cdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-surgery MERGE with CDF capture (the reference's core write
    pattern, 1_customer_data_processing.py:311-318 + its CDF table
    property): a CDF-enabled orders table takes merge_delta with
    updates on keys [3000,4000] and brand-new +1e6 keys — only
    stats-intersecting files rewrite (asserted), unmatched files keep
    identity, and the commit's _change_data carries
    update_preimage/update_postimage/insert rows whose counts ride
    along as cross-joined scalars. The oracle is the textbook MERGE
    expansion + independent change counts, so a lost insert, a
    double-applied update, or a miscaptured change row flips the hash.

    Scale: candidate selection is stats pruning on the source key
    interval; the matched/unmatched split is one join at candidate
    grain; CDF adds one delta-bounded write."""
    from .sources.delta_log import merge_delta, read_cdf, read_delta, snapshot, write_delta

    root = scratch_dir(prefix="mm_dmcdf_rt_") + "/orders_delta"
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    write_delta(
        o.repartitionByRange(8, "o_orderkey"),
        root,
        mode="overwrite",
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # v0
    n_files_v0 = len(snapshot(spark, root).files)

    source = (
        o.filter("o_orderkey BETWEEN 300 AND 700")
        .withColumn("price", F.col("price") + 10.0)
        .unionByName(
            o.filter("o_orderkey % 100 = 7").select(
                (F.col("o_orderkey") + 1000000).alias("o_orderkey"), "price"
            )
        )
    )
    _v, rewritten = merge_delta(spark, root, source, "o_orderkey")
    if not 0 < rewritten < n_files_v0:
        raise RuntimeError(
            f"MERGE rewrote {rewritten}/{n_files_v0} files — expected "
            "surgical stats-bounded rewrite"
        )

    chg = read_cdf(spark, root, from_version=1).agg(
        F.sum(
            F.when(F.col("_change_type") == "update_postimage", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_updates"),
        F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserts"),
    )
    return (
        read_delta(spark, root)
        .groupBy((F.col("o_orderkey") % 10).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum("price", "price_mass"),
        )
        .crossJoin(F.broadcast(chg))
    )


@register(
    "delta_where_dml_roundtrip",
    """
    WITH after_delete AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_orderpriority = '5-LOW')
    ), after_update AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CASE WHEN o_orderstatus = 'P' AND o_orderkey % 2 = 0
                  THEN price + 25.0 ELSE price END AS price
      FROM after_delete
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS price_mass
    FROM after_update GROUP BY 1
    """,
    tags=["S6", "delta", "dml", "predicate", "roundtrip"],
)
def q_delta_where_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-predicate DML over the protocol log (round-6 general
    front ends): ``delete_rows`` with a compound non-range predicate
    (status='F' AND priority='5-LOW' — the first DELETE a real user
    writes, inexpressible as a single-column interval) followed by
    ``update_rows`` with a modular predicate. Both run touched-file
    discovery (one scan finds the files with >= 1 matching row; only
    those are rewritten), and the final per-status aggregate must match
    the oracle's relational recomputation — a missed touched file, a
    NULL-predicate mishandling, or an over-rewrite flips the hash.

    Scale: discovery is one projected scan per statement; rewrite cost
    is bounded by files actually containing matches."""
    from .sources.delta_log import delete_rows, read_delta, update_rows, write_delta

    root = scratch_dir(prefix="mm_dwdml_rt_") + "/orders_delta"
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    write_delta(o.repartition(6), root, mode="overwrite")  # v0
    delete_rows(
        spark, root, "o_orderstatus = 'F' AND o_orderpriority = '5-LOW'"
    )  # v1
    update_rows(
        spark,
        root,
        "o_orderstatus = 'P' AND o_orderkey % 2 = 0",
        {"price": "price + 25.0"},
    )  # v2
    return (
        read_delta(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            dsum("price", "price_mass"),
        )
    )
