"""Registry entries for decorrelated-subquery analytics (TPC-H-hard
shapes adapted to the driver schema, which has no partsupp table —
part↔supplier linkage goes through ``lineitem.l_partkey/l_suppkey``).

These stress the planner patterns a warehouse engine must get right at
100 TB, beyond the reference's star-join surface (SURVEY §2.3/§2.4):

- scalar-subquery decorrelation as a 1-row broadcast cross join (never a
  correlated re-scan per row): Q11/Q15/Q22 shapes,
- per-group correlated MIN/MAX as a window over the *aggregated* (much
  smaller) relation, not a self-join of the fact: Q2/Q15 shapes,
- multi-EXISTS / NOT-EXISTS collapsed into ONE aggregation pass with
  window counts over the group key — zero self-joins where the textbook
  formulation has two: Q21 shape,
- anti-join against a projected fact + conditional-aggregation ratios:
  Q22/Q8 shapes.

Every aggregate follows the registry output discipline: decimal-cast
before SUM (bitwise-stable across engines), doubles only at the output
boundary, ISO-string dates.

Scale notes per query live in the docstrings; the sweeping plan audit
(tests/test_plan_audit.py) and tests/test_plan_invariants.py reject
nested-loop regressions here like everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .parallel import fan_out
from .registry import REVENUE, SQL_REVENUE, T, iso_date, register, sql_dsum


def _eligible_suppliers(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """supplier ⨝ nation ⨝ region, filtered to one region — a dim-sized
    relation (|supplier| rows max) meant to be broadcast by the caller."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "min_cost_supplier_per_part",
    """
    WITH cost AS (
      SELECT l.l_partkey AS p_key, l.l_suppkey AS s_key,
             CAST((CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   * 1000000)
                  // CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
                  AS BIGINT)
               AS unit_cost_micro
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, MIN(unit_cost_micro) OVER (PARTITION BY p_key) AS min_cost
      FROM cost
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, ranked.unit_cost_micro
    FROM ranked
    JOIN part p ON ranked.p_key = p.p_partkey
     AND p.p_type = 'STANDARD' AND p.p_size <= 10
    JOIN supplier s ON ranked.s_key = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE ranked.unit_cost_micro = ranked.min_cost
    """,
    tags=["tpch-q2", "correlated-min", "window-decorrelation"],
)
def q_min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the EUROPE supplier(s) with the lowest
    observed unit cost (ties kept — deterministic set semantics). Unit
    cost is exact integer micro-units — floor(1e6 * price_cents /
    qty_cents) in BIGINT arithmetic — because a double quotient rounded
    to 4dp hit an engine-divergent rounding tie at sf0.1 (954.29875).

    Scale: the correlated ``MIN per part`` runs as a window over the
    (partkey, suppkey) aggregate — |distinct pairs| rows, ~30× smaller
    than lineitem here and fact-compressed in general — never as a
    lineitem self-join. Suppliers/nation/region and part are dim-sized
    broadcasts; the one big shuffle is the initial groupBy.
    """
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    elig = _eligible_suppliers(spark, sf_dir, "EUROPE")
    cost = (
        li.join(F.broadcast(elig.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("l_partkey").alias("p_key"), F.col("l_suppkey").alias("s_key")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("__num_cents"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("__den_cents"),
        )
        # integer `div`, not `/`: double division then cast loses
        # exactness once num*1e6 exceeds 2^53
        .select(
            "p_key",
            "s_key",
            F.expr("(__num_cents * 1000000L) div __den_cents").alias(
                "unit_cost_micro"
            ),
        )
    )
    w = Window.partitionBy("p_key")
    best = cost.withColumn("min_cost", F.min("unit_cost_micro").over(w)).filter(
        F.col("unit_cost_micro") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), best.p_key == p.p_partkey)
        .join(F.broadcast(elig), best.s_key == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost_micro")
    )


@register(
    "top_revenue_suppliers",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS s_key, SUM({SQL_REVENUE}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(rev.total_rev AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier s ON rev.s_key = s.s_suppkey
    WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    tags=["tpch-q15", "scalar-subquery", "argmax"],
)
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter of ship dates (ties kept).

    Scale: revenue-per-supplier is one shuffled aggregation with
    map-side partials; the scalar MAX decorrelates into a 1-row
    broadcast cross join against the same aggregate (computed once —
    Spark reuses the exchange), never a per-row subquery.
    """
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_key")).agg(
        F.sum(REVENUE()).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    s = T(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.total_rev == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_key") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@register(
    "nation_pair_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           {sql_dsum(SQL_REVENUE, "revenue", 4)}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey AND cr.r_name = 'ASIA'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey AND sr.r_name = 'EUROPE'
    GROUP BY 1, 2, 3
    """,
    tags=["tpch-q7", "multi-join", "conditional-filter"],
)
def q_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume from EUROPE suppliers into ASIA
    customers, per nation pair and ship year.

    Scale: ONE fact-fact shuffle (lineitem ⨝ orders on orderkey) — the
    irreducible cost of this query; customer joins on the shuffled side
    (AQE picks broadcast when it fits), supplier and both nation⨝region
    copies are explicit broadcasts. The region filters land on dim
    columns pre-join, so only matching suppliers/customers survive into
    the probe side.
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")

    def region_nations(region: str, alias: str, key_alias: str) -> DataFrame:
        return (
            n.join(
                F.broadcast(r.filter(F.col("r_name") == region)),
                n.n_regionkey == r.r_regionkey,
            )
            .select(
                F.col("n_nationkey").alias(key_alias), F.col("n_name").alias(alias)
            )
        )

    sn = region_nations("EUROPE", "supp_nation", "sn_nationkey")
    cn = region_nations("ASIA", "cust_nation", "cn_nationkey")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_nationkey"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).agg(F.sum(REVENUE()).cast("double").alias("revenue"))


@register(
    "nation_market_share",
    f"""
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_9' THEN {SQL_REVENUE}
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({SQL_REVENUE}) AS DOUBLE), 6) AS market_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY 1
    """,
    tags=["tpch-q8", "conditional-agg", "ratio"],
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of revenue sold into
    ASIA customers, per order year — numerator and denominator in a
    SINGLE aggregation pass via conditional SUM (no second scan, no
    join of two aggregates).

    Scale: same one-fact-fact-shuffle profile as nation_pair_volume;
    both decimal sums ride the same map-side partials.
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_nationkey"))
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = n.select(F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation"))
    target = F.when(F.col("supp_nation") == "NATION_9", REVENUE()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_nationkey"))
    )
    return joined.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        F.round(
            F.sum(target).cast("double") / F.sum(REVENUE()).cast("double"), 6
        ).alias("market_share")
    )


@register(
    "important_parts_value",
    f"""
    WITH pv AS (
      SELECT l_partkey, SUM({SQL_REVENUE}) AS val FROM lineitem GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(val AS DOUBLE) *
          (SELECT CAST(COUNT(*) AS DOUBLE) FROM pv) >
          1.5 * (SELECT CAST(SUM(val) AS DOUBLE) FROM pv)
    """,
    tags=["tpch-q11", "scalar-subquery", "having-fraction"],
)
def q_important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total revenue exceeds 1.5× the MEAN
    per-part value — the HAVING-against-a-scalar-subquery pattern, with
    a scale-invariant cutoff (a fixed fraction of the global total
    returns nothing once |parts| grows past 1/fraction).

    Scale: one shuffled aggregation builds the per-part values; the
    global total and part count re-aggregate THAT result (|parts| rows,
    exchange reuse) into one row, broadcast back as a cross join. Sums
    stay exact decimal; the 1.5× compare is double-on-both-engines from
    identical decimal inputs, multiplied as ``val*n > 1.5*total`` to
    avoid a division's rounding at the boundary.
    """
    li = T(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(REVENUE()).alias("val"))
    total = pv.agg(
        (F.lit(1.5) * F.sum("val").cast("double")).alias("threshold"),
        F.count("*").cast("double").alias("n_parts"),
    )
    return (
        pv.join(
            F.broadcast(total),
            pv.val.cast("double") * F.col("n_parts") > F.col("threshold"),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


@register(
    "large_volume_orders",
    """
    SELECT c.c_name, o.o_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(q.sum_qty AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    ) q
    JOIN orders o ON q.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=["tpch-q18", "having-in", "broadcast-filtered-agg"],
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, enriched with customer detail.

    Scale: the HAVING output is a tiny fraction of orders (~1% at the
    250 cutoff). The join back to orders is left declarative — AQE
    converts it to a broadcast at runtime when the filtered aggregate
    fits (it does at every test SF), and falls back to a shuffle join
    when 1% of orders is still too big to ship, which is the correct
    call at 100 TB. Customer is a dim broadcast.
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    q = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(q, o.o_orderkey == q.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            iso_date("o_orderdate", "order_date"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


@register(
    "lone_returner_suppliers",
    """
    WITH per_pair AS (
      SELECT l_orderkey, l_suppkey,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_ret
      FROM lineitem GROUP BY 1, 2
    ), flagged AS (
      SELECT *,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             SUM(CASE WHEN n_ret > 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_orderkey) AS n_ret_supp
      FROM per_pair
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM flagged f JOIN supplier s ON f.l_suppkey = s.s_suppkey
    WHERE f.n_ret > 0 AND f.n_supp > 1 AND f.n_ret_supp = 1
    GROUP BY 1
    """,
    tags=["tpch-q21", "exists-not-exists", "window-collapse"],
)
def q_lone_returner_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY supplier with
    returned lines on multi-supplier orders.

    Scale: the textbook EXISTS + NOT-EXISTS is two lineitem self-joins;
    here both collapse into window counts over the (orderkey, suppkey)
    aggregate — 2 shuffles total (pair agg, then orderkey window), zero
    self-joins, state bounded by suppliers-per-order.
    """
    li = T(spark, sf_dir, "lineitem")
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_ret")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_pair.withColumn("n_supp", F.count("*").over(w)).withColumn(
        "n_ret_supp",
        F.sum(F.when(F.col("n_ret") > 0, 1).otherwise(0)).over(w),
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.filter(
            (F.col("n_ret") > 0) & (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "idle_rich_customers",
    """
    WITH cutoff AS (
      SELECT CAST(AVG(c_acctbal) AS DOUBLE) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    ), recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-09-01'
    )
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY 1
    """,
    tags=["tpch-q22", "anti-join", "scalar-subquery"],
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with NO orders
    in the trailing year of data, rolled up by market segment.

    Scale: the scalar AVG broadcasts as a 1-row cross join; the NOT-IN
    decorrelates to a left-anti hash join against the projected
    recent-buyer keys — declarative, so AQE broadcasts the key set when
    it fits and shuffles both sides on custkey when a year of orders is
    fact-sized (the 100 TB case) — never a per-customer probe. AVG of
    doubles is ok here because the compare is strict inequality against
    data bounded away from the cutoff; the output SUM still goes
    through decimal.
    """
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    cutoff = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").cast("double").alias("avg_bal")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-09-01").cast("timestamp")
    ).select("o_custkey")
    rich = c.join(F.broadcast(cutoff), c.c_acctbal > F.col("avg_bal"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias(
            "total_balance"
        ),
    )


@register(
    "returnflag_price_qty_corr",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_lines,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS price_qty_corr
    FROM s
    """,
    tags=["closed-form-stats", "correlation"],
)
def q_returnflag_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Pearson correlation from closed-form co-moment sums —
    NOT the built-in corr() aggregate, whose incremental co-moment
    updates are partial-aggregation-order-dependent and therefore not
    bit-reproducible across partitionings or engines. Exact decimal sums
    shuffle associatively; the final arithmetic is a fixed sequence of
    IEEE double ops (sqrt is correctly rounded in both JVM and C), so
    the result hashes identically everywhere.

    Scale: one aggregation pass, map-side combinable, five extra decimal
    sums per group — the same pattern as the closed-form OLS operator."""
    li = fan_out(
        T(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        )
    )
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((q * q).cast("decimal(18,4)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(28,4)")).cast("double").alias("syy"),
        F.sum((q * p).cast("decimal(28,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = F.round(
        (n * sxy - sx * sy)
        / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
        6,
    )
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_lines"),
        corr.alias("price_qty_corr"),
    )


@register(
    "lineitem_price_deciles",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             NTILE(10) OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS decile
      FROM lineitem
    )
    SELECT l_returnflag, decile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
    FROM ranked GROUP BY 1, 2
    """,
    tags=["window", "equi-depth-histogram"],
)
def q_lineitem_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of prices per return flag: NTILE
    over a deterministic composite order (price, orderkey, linenumber —
    ties would otherwise make bucket assignment engine-dependent), then
    one aggregation for bucket bounds. The equi-depth complement of the
    fixed-width docs_length_histogram.

    Scale: one shuffle on the partition key; the in-partition sort is
    the cost of any exact quantile method, and NTILE emits bucket ids
    streaming — no second pass."""
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag", "l_extendedprice", F.ntile(10).over(w).alias("decile")
    )
    return ranked.groupBy("l_returnflag", "decile").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("l_extendedprice").cast("double").alias("lo"),
        F.max("l_extendedprice").cast("double").alias("hi"),
    )


@register(
    "supplier_nation_revenue_share",
    f"""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             SUM({SQL_REVENUE}) AS supp_rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )
    SELECT n.n_name AS nation, rev.l_suppkey AS s_suppkey,
           CAST(supp_rev AS DOUBLE) AS supplier_revenue,
           ROUND(CAST(supp_rev AS DOUBLE)
                 / CAST(SUM(supp_rev) OVER (PARTITION BY rev.s_nationkey) AS DOUBLE),
                 6) AS nation_share
    FROM rev JOIN nation n ON rev.s_nationkey = n.n_nationkey
    """,
    tags=["window", "ratio-to-report"],
)
def q_supplier_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each supplier's share of its nation's revenue —
    an unbounded window SUM over the per-supplier aggregate, never over
    raw lineitem. Decimal sums make numerator and denominator exact;
    the single rounded IEEE divide is engine-stable.

    Scale: the window input is |suppliers| rows (fact-compressed by the
    first aggregation); the nation name is a dim broadcast."""
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(REVENUE()).alias("supp_rev"))
    )
    w = Window.partitionBy("s_nationkey")
    return (
        rev.join(F.broadcast(n), rev.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("l_suppkey").alias("s_suppkey"),
            F.col("supp_rev").cast("double").alias("supplier_revenue"),
            F.round(
                F.col("supp_rev").cast("double")
                / F.sum("supp_rev").over(w).cast("double"),
                6,
            ).alias("nation_share"),
        )
    )


@register(
    "orders_calendar_features",
    """
    SELECT DISTINCT
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(QUARTER(o_orderdate) AS INT) AS q,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(week(o_orderdate) AS INT) AS iso_week,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INT) AS days_in_month,
           CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
             AS is_month_end
    FROM orders
    """,
    tags=["date-functions", "calendar"],
)
def q_orders_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature extraction over the order-date domain: quarter,
    ISO week, day-of-week (Sunday=1 in both engines after DuckDB's
    dow+1 shift), month end, days-in-month — the derived-date surface a
    dim_date build needs beyond the month spine (functions/dates.py).

    Scale: DISTINCT over the (tiny) date domain after a pure projection
    — the dedup shuffle carries |distinct dates| rows, not orders."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        iso_date("o_orderdate", "order_date"),
        F.year(d).cast("int").alias("y"),
        F.quarter(d).cast("int").alias("q"),
        F.month(d).cast("int").alias("m"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofmonth(F.last_day(d)).cast("int").alias("days_in_month"),
        (d == F.last_day(d)).alias("is_month_end"),
    ).distinct()
