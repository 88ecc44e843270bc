"""Golden end-to-end pipeline test (SURVEY §5 strategy #2-#4).

Synthesizes child CSVs carrying every anomaly class from FIXTURES.md §A,
runs bronze -> silver -> gold -> consolidation, and asserts the
reference's invariants: key uniqueness, sum invariance, join coverage,
idempotent incremental re-runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.pipeline.customers import (
    build_city_fixes,
    clean_customers,
    customers_gold,
)
from mergermetrics_lakehouse_pipeline_spark.pipeline.fact import (
    clean_orders,
    daily_fact,
    incremental_fact_load,
    monthly_rollup,
)
from mergermetrics_lakehouse_pipeline_spark.pipeline.pricing import (
    clean_prices,
    pricing_gold,
)
from mergermetrics_lakehouse_pipeline_spark.pipeline.products import (
    clean_products,
    products_gold,
)
from mergermetrics_lakehouse_pipeline_spark.plans.star import (
    denormalized_view,
    kpi_pack,
    top_n_by_revenue,
)
from mergermetrics_lakehouse_pipeline_spark.functions.dates import build_dim_date
from mergermetrics_lakehouse_pipeline_spark.sources.csv import (
    archive_landing_files,
    read_csv_with_lineage,
)

CUSTOMERS_CSV = """customer_id,customer_name,city
101, SprintX nutrition ,Austn
101, SprintX nutrition ,Austn
102,MacroBite superfoods,Chciago
103,PowerFuel Foods,Newyork
104,VitaBoost Labs,
105,PeakForm Nutrition,Boston
"""

PRODUCTS_CSV = """product_name,product_id,category
Protein Bar (60g),1001,protien bars
Energy Bar (45g),1002,energy bars
Hydration Mix (500ml),1003,hydration drinks
Recovery Shake,XYZ123,protein shakes
Energy Bar (45g),1002,energy bars
"""

GROSS_PRICE_CSV = """product_id,month,gross_price
1001,7/1/25,12.5
1001,1/8/25,-8.4
1002,10/1/25,unknown
1002,3/1/25,7.25
1003,2025-07-01,not_available
1003,6/1/25,5
88888888,7/1/25,9.99
"""

ORDERS_DAY1_CSV = """order_id,order_placement_date,customer_id,product_id,order_qty
O-1,"Monday, December 01, 2025",101,1001,10
O-1,"Monday, December 01, 2025",101,1002,4
O-2,01-12-2025,102,1001,6.0
O-3,01/12/2025,INVALID,1003,3
O-4,01-12-2025,103,1002,
O-1,"Monday, December 01, 2025",101,1001,10
"""

ORDERS_DAY2_CSV = """order_id,order_placement_date,customer_id,product_id,order_qty
O-5,02-12-2025,101,1001,7
O-6,2025/12/02,104,1003,2
O-7,02/12/2025,ABC987,1002,5
"""

ORDERS_JAN_CSV = """order_id,order_placement_date,customer_id,product_id,order_qty
O-8,05-01-2026,102,1001,9
O-9,05/01/2026,103,1003,1
"""


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("child_csvs")
    (d / "customers.csv").write_text(CUSTOMERS_CSV)
    (d / "products.csv").write_text(PRODUCTS_CSV)
    (d / "gross_price.csv").write_text(GROSS_PRICE_CSV)
    landing = d / "orders" / "landing"
    landing.mkdir(parents=True)
    (landing / "orders_2025_12_01.csv").write_text(ORDERS_DAY1_CSV)
    (landing / "orders_2025_12_02.csv").write_text(ORDERS_DAY2_CSV)
    inc = d / "orders" / "incremental"
    inc.mkdir(parents=True)
    (inc / "orders_2026_01_05.csv").write_text(ORDERS_JAN_CSV)
    return d


@pytest.fixture(scope="module")
def silver_customers(spark, fixture_dir):
    raw = read_csv_with_lineage(spark, str(fixture_dir / "customers.csv"))
    fixes = build_city_fixes(spark, {104: "Seattle"})
    return clean_customers(raw, city_fixes=fixes).cache()


@pytest.fixture(scope="module")
def silver_products(spark, fixture_dir):
    raw = read_csv_with_lineage(spark, str(fixture_dir / "products.csv"))
    return clean_products(raw).cache()


@pytest.fixture(scope="module")
def daily(spark, fixture_dir, silver_products):
    raw = read_csv_with_lineage(
        spark, str(fixture_dir / "orders" / "landing" / "*.csv")
    )
    return daily_fact(clean_orders(raw), silver_products).cache()


def test_lineage_columns_present(spark, fixture_dir):
    df = read_csv_with_lineage(spark, str(fixture_dir / "customers.csv"))
    for col in ("read_timestamp", "file_name", "file_size"):
        assert col in df.columns
    assert df.select("file_name").first()[0].endswith("customers.csv")


def test_customers_clean(silver_customers):
    rows = {r.customer_id: r for r in silver_customers.collect()}
    # dedupe: 6 raw rows -> 5 unique ids (A6 key uniqueness)
    assert sorted(rows) == ["101", "102", "103", "104", "105"]
    assert rows["101"].customer_name == "Sprintx Nutrition"  # trim+initcap
    assert rows["101"].city == "Austin"  # map standardization
    assert rows["102"].city == "Chicago"
    assert rows["103"].city == "New York"
    assert rows["104"].city == "Seattle"  # per-id rule repair
    assert rows["101"].market == "South" and rows["102"].market == "Midwest"
    assert rows["101"].customer == "Sprintx Nutrition-Austin"


def test_products_clean(silver_products):
    rows = {r.product_id: r for r in silver_products.collect()}
    # dedupe 5 -> 4; XYZ123 -> sentinel
    assert len(rows) == 4 and "999999" in rows
    assert rows["1001"].category == "Protein Bars"  # typo + initcap
    assert rows["1001"].variant == "60g"
    assert rows["1001"].division == "Nutrition"
    assert len(rows["1001"].product_code) == 64
    codes = [r.product_code for r in rows.values()]
    assert len(set(codes)) == len(codes)  # surrogate keys unique


def test_pricing_gold(spark, fixture_dir, silver_products):
    raw = read_csv_with_lineage(spark, str(fixture_dir / "gross_price.csv"))
    gold = pricing_gold(clean_prices(raw), silver_products)
    rows = gold.collect()
    # unknown product 88888888 dropped by inner join (A3)
    assert all(len(r.product_code) == 64 for r in rows)
    # one price per (product_code, year); latest non-zero wins
    assert len(rows) == len({(r.product_code, r.year) for r in rows})
    by_pid = {
        r.product_code: r.price_usd
        for r in rows
    }
    p1001 = silver_products.filter(F.col("product_id") == "1001").first().product_code
    # 1001: 7/1/25 -> 12.5; 1/8/25 -> -8.4 -> abs 8.4 (Aug via d/M precedence is
    # Jan-8 under M/d first => month=Jan; latest month July) => price 12.5
    assert by_pid[p1001] == 12.5
    p1002 = silver_products.filter(F.col("product_id") == "1002").first().product_code
    # 1002: Oct 'unknown'->0 (zero ranked last), Mar 7.25 => 7.25
    assert by_pid[p1002] == 7.25


def test_daily_fact_clean(daily):
    rows = daily.collect()
    # null-qty row dropped; exact dup (O-1 line) dropped; junk ids -> sentinel
    assert all(r.sold_quantity is not None for r in rows)
    keys = [(r.date, r.order_id, r.product_code, r.customer_code) for r in rows]
    assert len(keys) == len(set(keys))  # A6 daily grain uniqueness
    sentinels = [r for r in rows if r.customer_code == "999999"]
    assert len(sentinels) == 2  # INVALID + ABC987
    # all three date formats parsed to 2025-12-01/02
    assert {str(r.date) for r in rows} == {"2025-12-01", "2025-12-02"}


def test_monthly_rollup_sum_invariance(daily):
    monthly = monthly_rollup(daily)
    total_daily = daily.agg(F.sum("sold_quantity")).first()[0]
    total_monthly = monthly.agg(F.sum("sold_quantity")).first()[0]
    assert float(total_daily) == float(total_monthly)  # A6 sum invariance
    assert {str(r.date) for r in monthly.collect()} == {"2025-12-01"}
    k = [(r.date, r.product_code, r.customer_code) for r in monthly.collect()]
    assert len(k) == len(set(k))


def test_incremental_idempotent_and_affected_months(spark, fixture_dir, daily, silver_products):
    monthly = monthly_rollup(daily)
    raw_inc = read_csv_with_lineage(
        spark, str(fixture_dir / "orders" / "incremental" / "*.csv")
    )
    batch = daily_fact(clean_orders(raw_inc), silver_products)

    d1, m1 = incremental_fact_load(daily, monthly, batch)
    d1, m1 = d1.cache(), m1.cache()
    # batch (Jan 2026) adds its month; Dec 2025 rows unchanged
    assert {str(r.date) for r in m1.select("date").distinct().collect()} == {
        "2025-12-01",
        "2026-01-01",
    }
    dec_before = monthly.agg(F.sum("sold_quantity")).first()[0]
    dec_after = (
        m1.filter(F.col("date") == "2025-12-01").agg(F.sum("sold_quantity")).first()[0]
    )
    assert dec_before == dec_after

    # idempotency (A6): re-applying the same batch changes nothing
    d2, m2 = incremental_fact_load(d1, m1, batch)
    assert d2.count() == d1.count()
    assert sorted(map(tuple, m2.collect())) == sorted(map(tuple, m1.collect()))


def test_join_coverage_anti_joins_empty(daily, silver_customers, silver_products):
    """README.md:257-266 checks: every fact key resolves against its dim
    (sentinel 999999 rows excepted)."""
    missing_products = daily.join(
        silver_products.select("product_code"), "product_code", "left_anti"
    )
    assert missing_products.count() == 0
    missing_customers = (
        daily.filter(F.col("customer_code") != "999999")
        .join(
            customers_gold(silver_customers).select("customer_code"),
            "customer_code",
            "left_anti",
        )
    )
    assert missing_customers.count() == 0


def test_denormalized_view_and_kpis(spark, fixture_dir, daily, silver_customers, silver_products):
    monthly = monthly_rollup(daily)
    raw_prices = read_csv_with_lineage(spark, str(fixture_dir / "gross_price.csv"))
    prices = pricing_gold(clean_prices(raw_prices), silver_products)
    dim_date = build_dim_date(spark, "2025-01-01", "2026-01-01")

    view = denormalized_view(
        monthly,
        dim_date,
        customers_gold(silver_customers),
        products_gold(silver_products),
        prices,
    ).cache()
    assert view.count() == monthly.count()  # left joins never drop fact rows
    r = view.filter(F.col("customer_code") == "101").first()
    assert r.market == "South" and r.year == 2025 and r.quarter == "Q4"
    priced = view.filter(F.col("price_usd").isNotNull()).first()
    assert priced.total_amount == priced.sold_quantity * priced.price_usd

    kpis = kpi_pack(view, "market").collect()
    assert {k.market for k in kpis} >= {"South", "Midwest"}
    top = top_n_by_revenue(view.filter(F.col("total_amount").isNotNull()), "product", 2)
    assert top.count() <= 2


def test_archive_landing_files(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.csv").write_text("x\n1")
    (landing / "b.csv").write_text("x\n2")
    moved = archive_landing_files(str(landing), str(tmp_path / "processed"))
    assert moved == ["a.csv", "b.csv"]
    assert not any(landing.iterdir())
    assert (tmp_path / "processed" / "a.csv").exists()
