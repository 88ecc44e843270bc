"""The remaining classic TPC-H query shapes (Q1/3/4/5/6/9/10/12/14/16/
19/20), adapted to the driver schema — no partsupp table (part↔supplier
linkage goes through ``lineitem``), no commit/receipt dates or ship modes
(lateness is derived from ``l_shipdate - o_orderdate``; ``l_linestatus``
stands in for ship mode), supply cost proxied from ``p_retailprice``.

Together with registry_tpch.py's "hard" set (Q2/7/8/11/13/15/17/18/21/22
shapes) this completes full TPC-H-shape coverage: a user of any classic
warehouse benchmark query finds its planner pattern here, oracle-checked.

These exist to pin the optimizer behaviors the 100 TB bar demands:

- Q1: the canonical one-pass wide aggregation — 8 aggregates, one
  shuffle, map-side partials carrying the whole reduction;
- Q3/Q10: selective dim broadcast into the fact, then distributed
  top-k (TakeOrderedAndProject — never a global sort);
- Q4: EXISTS as LEFT SEMI with a non-equi residual condition;
- Q5: the cyclic join graph (customer.nation == supplier.nation)
  closed AFTER the fact joins, as an equi condition, not a filter scan;
- Q6: pure scan-aggregate — every predicate must reach the parquet
  reader (plan-asserted pushdown);
- Q9/Q12/Q14: arithmetic/CASE conditional aggregation in one pass;
- Q16: anti-join blacklist + COUNT DISTINCT over a pre-shrunk join;
- Q19: OR-of-ANDs disjunction — partial pushdown of the common
  p_partkey equi key plus per-branch residuals;
- Q20: correlated "more than half of the part's volume" decorrelated
  into a window over the (part, supplier) aggregate.

Output discipline: decimal casts before SUM, doubles only at the output
boundary, ROUND on ratios, ISO-string dates, BIGINT counts — bitwise
reproducible against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import REVENUE, SQL_REVENUE, T, iso_date, register, sql_dsum


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY 1, 2
    """,
    tags=["tpch-q1", "wide-agg"],
)
def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the pricing summary report — 8 aggregates per
    (returnflag, linestatus) over almost all of lineitem.

    Scale: ONE shuffled aggregation over a 6-value group domain;
    map-side partial aggregation means each task ships at most 6 rows
    per aggregate regardless of input size, so the shuffle is O(tasks),
    not O(rows). Averages are decimal-sum / count (order-insensitive),
    never float accumulation."""
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    n = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_base_price"),
        F.sum(REVENUE()).cast("double").alias("sum_disc_price"),
        F.sum(
            (
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax"))
            ).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("sum_charge"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / n, 6
        ).alias("avg_qty"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / n, 6
        ).alias("avg_price"),
        F.round(
            F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double") / n, 6
        ).alias("avg_disc"),
        n.cast("bigint").alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {sql_dsum(SQL_REVENUE, "revenue", 4)},
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=["tpch-q3", "topk-join"],
)
def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one market
    segment.

    Scale: the BUILDING customer filter shrinks the dim before its
    broadcast into orders; lineitem joins on the shuffled orderkey; the
    final top-10 is sort+limit, which Spark plans as
    TakeOrderedAndProject — per-partition heaps, never a global sort.
    Deterministic under revenue ties via the orderkey tie-break."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        li.join(
            o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", iso_date("o_orderdate", "order_date"), "o_orderpriority")
        .agg(F.sum(REVENUE()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q4_late_order_priority",
    """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY 1
    """,
    tags=["tpch-q4", "exists-semi"],
)
def q_tpch_q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority with at least one line shipped
    more than 90 days after the order date (the schema has no
    commit/receipt dates; ship-lag is the lateness signal).

    Scale: EXISTS is a LEFT SEMI join on the orderkey equi key with the
    date comparison as a residual condition — one shuffle, at most one
    surviving row per order regardless of how many lines are late, so
    the aggregation input is bounded by |orders|."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )


@register(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n.n_name, {sql_dsum(SQL_REVENUE, "revenue", 4)}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    tags=["tpch-q5", "cyclic-join"],
)
def q_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue where the customer and supplier share an ASIA
    nation — the classic CYCLIC join graph (the c_nationkey ==
    s_nationkey edge closes the cycle).

    Scale: the cycle edge rides the supplier equi join as a compound
    key (suppkey AND nationkey), never as a post-join filter over the
    full cross-nation volume; orders⨝lineitem is the one fact-fact
    shuffle; supplier and the ASIA nation list are broadcasts."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_n = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    return (
        li.join(
            # customer is scale-proportional (not a filtered dim) — no
            # broadcast hint; the 1997-filtered orders side shrinks the
            # join and AQE picks the strategy. Only the genuinely small
            # sides (supplier, the ASIA nation list) are hinted below.
            o.join(c, o.o_custkey == c.c_custkey).select(
                "o_orderkey", "c_nationkey"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(asia_n), s.s_nationkey == asia_n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(REVENUE()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS forecast_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=["tpch-q6", "scan-agg-pushdown"],
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-and-aggregate — the query whose entire cost
    is the scan, so every predicate MUST reach the parquet reader.

    Scale: all four predicates are pushable comparisons on scanned
    columns (PushedFilters in the plan); the projection prunes to the
    two priced columns; the aggregate is a 1-row global reduction with
    map-side partials. No shuffle beyond the final 1-row exchange."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.04, 0.06))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
        .cast("double")
        .alias("forecast_revenue"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


@register(
    "tpch_q9_product_type_profit",
    """
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                         - 0.6 * p.p_retailprice * l.l_quantity
                    AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
    tags=["tpch-q9", "profit-agg"],
)
def q_tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation and order year for one
    product line. The schema has no partsupp.ps_supplycost; cost is
    proxied as 60% of the part's retail price per unit — same plan
    shape, different constant.

    Scale: part (filtered), supplier, and nation broadcast; the only
    fact-fact shuffle is lineitem⨝orders on orderkey. The profit
    expression folds into the scan projection; the aggregation domain
    is |nations| x |years|."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name, {sql_dsum(SQL_REVENUE, "revenue", 4)}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=["tpch-q10", "topk-join"],
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter.

    Scale: the quarter filter shrinks orders before the fact-fact
    shuffle with (returnflag-filtered) lineitem; customer and nation
    broadcast onto the aggregate, not the raw fact; final top-20 is
    TakeOrderedAndProject with a custkey tie-break."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(REVENUE()).alias("rev"))
    )
    return (
        per_cust.join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey", "c_name", "n_name", F.col("rev").cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q12_late_priority_lines",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    tags=["tpch-q12", "conditional-agg"],
)
def q_tpch_q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late lines (shipped 60+ days after ordering) per
    line status, split into high/low order priority — both counts in ONE
    conditional-aggregation pass (l_linestatus stands in for the absent
    l_shipmode).

    Scale: one orderkey shuffle; the lateness comparison is a residual
    on the joined row; the two CASE sums share the single aggregation
    (never two passes or a self-join)."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_effect",
    f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {SQL_REVENUE}
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({SQL_REVENUE}) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=["tpch-q14", "conditional-ratio"],
)
def q_tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from promotional
    parts — numerator and denominator in ONE aggregation pass
    (conditional decimal sum), one join, one output row.

    Scale: part broadcasts; the month filter pushes to the scan; the
    ratio divides two exact decimal sums once, at the output boundary."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", REVENUE()).otherwise(zero))
                .cast("double")
                / F.sum(REVENUE()).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_size, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'ECONOMY'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    """,
    tags=["tpch-q16", "anti-join", "count-distinct"],
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, size) for
    selected parts, excluding a supplier blacklist (negative balance
    stands in for the absent complaints comment).

    Scale: the blacklist is a LEFT ANTI broadcast (s_suppkey is
    non-null, so NOT IN == anti join); the part filter broadcasts;
    COUNT DISTINCT shuffles the already part-and-supplier-shrunk
    pairs, partial-deduplicated map-side."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_type") != "ECONOMY")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q19_disjunctive_revenue",
    f"""
    SELECT {sql_dsum(SQL_REVENUE, "revenue", 4)},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=["tpch-q19", "disjunctive-pushdown"],
)
def q_tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three AND-branches mixing
    part and lineitem predicates — the classic disjunctive-predicate
    planning test.

    Scale: Catalyst extracts the branch-local conjuncts each side can
    evaluate alone (brand/size prune the broadcast part build; the
    quantity bounds' OR-envelope pushes to the lineitem scan) and
    evaluates the full disjunction as the join residual — the join
    stays a single broadcast hash join on p_partkey, never a nested
    loop over the cross product."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(branch).agg(
        F.sum(REVENUE()).cast("double").alias("revenue"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


@register(
    "tpch_q20_part_share_suppliers",
    """
    WITH shipped AS (
      SELECT l.l_partkey AS pk, l.l_suppkey AS sk,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ), share AS (
      SELECT *, SUM(qty) OVER (PARTITION BY pk) AS part_qty FROM shipped
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM share
    JOIN supplier s ON share.sk = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE CAST(share.qty AS DOUBLE) > 0.5 * CAST(share.part_qty AS DOUBLE)
    """,
    tags=["tpch-q20", "correlated-share", "window-decorrelation"],
)
def q_tpch_q20_part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of some
    PROMO part's 1997 volume (the schema has no partsupp.ps_availqty;
    the dominant-share predicate keeps the correlated-aggregate plan
    shape).

    Scale: the correlated "half of the part's total" decorrelates into
    a window SUM over the (part, supplier) AGGREGATE — |distinct pairs|
    rows, never a lineitem self-join; supplier/nation broadcast onto
    the few qualifying pairs; DISTINCT collapses multi-part qualifiers."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    w = Window.partitionBy("pk")
    dominant = shipped.withColumn("part_qty", F.sum("qty").over(w)).filter(
        F.col("qty").cast("double") > F.lit(0.5) * F.col("part_qty").cast("double")
    )
    return (
        dominant.join(F.broadcast(s), F.col("sk") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )
