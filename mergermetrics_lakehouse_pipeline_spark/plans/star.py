"""Serving layer: the denormalized BI view + dashboard query pack (EP3).

Reference semantics (Tableu dashboard/denormalise_table_query_fmcg.txt:
1-51): fact LEFT JOIN dim_date / dim_customers / dim_products /
dim_gross_price (compound key product_code AND YEAR(date) = year) with
derived total_amount = sold_quantity * price.

Documented deviation (SURVEY §3 EP3): the reference view selects
``gp.price_inr`` although its own pipeline produces ``price_usd``; this
engine uses ``price_usd`` consistently.

Scale: every dim side is broadcast (dims are orders of magnitude smaller
than the fact); the view itself is logical — queries over it inherit the
fact table's partitioning and prune by month.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def denormalized_view(
    fact: DataFrame,
    dim_date: DataFrame,
    dim_customers: DataFrame,
    dim_products: DataFrame,
    dim_gross_price: DataFrame,
) -> DataFrame:
    """vw_fact_orders_enriched: the 4-way star LEFT JOIN (J4)."""
    f = fact.alias("fo")
    return (
        f.join(
            F.broadcast(dim_date.alias("dd")),
            F.col("fo.date") == F.col("dd.month_start_date"),
            "left",
        )
        .join(F.broadcast(dim_customers.alias("dc")), "customer_code", "left")
        .join(F.broadcast(dim_products.alias("dp")), "product_code", "left")
        .join(
            F.broadcast(dim_gross_price.alias("gp")),
            (F.col("dp.product_code") == F.col("gp.product_code"))
            & (F.year(F.col("fo.date")).cast("string") == F.col("gp.year")),
            "left",
        )
        .select(
            F.col("fo.date").alias("date"),
            F.col("dd.year").alias("year"),
            F.col("dd.quarter").alias("quarter"),
            F.col("dd.year_quarter").alias("year_quarter"),
            F.col("dd.month_name").alias("month_name"),
            F.col("fo.customer_code").alias("customer_code"),
            F.col("dc.customer").alias("customer"),
            F.col("dc.market").alias("market"),
            F.col("dc.platform").alias("platform"),
            F.col("dc.channel").alias("channel"),
            F.col("fo.product_code").alias("product_code"),
            F.col("dp.division").alias("division"),
            F.col("dp.category").alias("category"),
            F.col("dp.product").alias("product"),
            F.col("dp.variant").alias("variant"),
            F.col("fo.sold_quantity").alias("sold_quantity"),
            F.col("gp.price_usd").alias("price_usd"),
            (F.col("fo.sold_quantity") * F.col("gp.price_usd")).alias("total_amount"),
        )
    )


def kpi_pack(view: DataFrame, *group_cols: str) -> DataFrame:
    """Dashboard KPIs (README.md:196-200): revenue, quantity, unique
    customers, average selling price — optionally sliced."""
    grouped = view.groupBy(*[F.col(c) for c in group_cols]) if group_cols else view.groupBy()
    return grouped.agg(
        F.sum("total_amount").alias("revenue"),
        F.sum("sold_quantity").alias("quantity"),
        F.countDistinct("customer_code").alias("unique_customers"),
        (F.sum("total_amount") / F.sum("sold_quantity")).alias("avg_selling_price"),
    )


def top_n_by_revenue(view: DataFrame, key: str, n: int = 5) -> DataFrame:
    """Top-N entities by revenue (README.md:198,204-208) — aggregate then
    TakeOrderedAndProject; deterministic via key tie-break."""
    return (
        view.groupBy(key)
        .agg(F.sum("total_amount").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col(key))
        .limit(n)
    )
