"""Round-3 scale-pattern registry entries.

Three patterns a 100 TB deployment leans on daily, each expressed so the
oracle is *exact* (the scale machinery tunes cost, never results):

- ``lineitem_bloom_semi_revenue`` — the runtime-filter join: a Bloom
  bitmap of the build side prunes the probe side before any shuffle
  (operators/bloomjoin.py). Oracle = the plain semi-join, because the
  bloom has no false negatives and the exact confirm removes false
  positives.
- ``docs_source_tv_drift`` — corpus drift monitoring: total-variation
  distance between each source's unigram distribution and the whole
  corpus. TV is chosen over KL precisely because it needs no logarithm:
  every term's contribution is an exact BIGINT cross-product, so the
  statistic is bit-reproducible across engines (log/libm rounding would
  not be).
- ``docs_chunk_dedup`` — exact substring-level dedup: non-overlapping
  64-token chunks hashed and globally deduped keep-first, reported as a
  per-document retention ratio — the chunk-granularity analogue of
  document-level exact dedup used to strip repeated boilerplate spans
  from pre-training corpora.
"""

from __future__ import annotations

from .scratch import scratch_dir
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import text as tx
from .registry import REVENUE, SQL_REVENUE, T, events_table, register
from .registry_llm import SQL_TOKS_SAFE

# ---------------------------------------------------------------------------
# bloom-prefiltered semi join
# ---------------------------------------------------------------------------

_BLOOM_NATIONS = (0, 1, 2)


@register(
    "lineitem_bloom_semi_revenue",
    f"""
    SELECT l_returnflag,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_suppkey IN (
      SELECT s_suppkey FROM supplier WHERE s_nationkey IN (0, 1, 2)
    )
    GROUP BY l_returnflag
    """,
    tags=["join", "bloom-filter", "runtime-filter", "scale"],
)
def q_lineitem_bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by returnflag over lineitems supplied from three nations,
    with the supplier set applied as a Bloom prefilter + exact semi-join
    (operators/bloomjoin.py:bloom_semi_join).

    Scale: when the supplier set is too big to broadcast raw, its
    ~256 KB bitmap still broadcasts; ~97% of non-matching lineitem rows
    are dropped map-side before the semi-join shuffle. Result is
    EXACTLY the plain semi-join for any bloom sizing (no false
    negatives; the confirm join removes false positives)."""
    from .operators.bloomjoin import bloom_semi_join

    li = T(spark, sf_dir, "lineitem")
    supp = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(*_BLOOM_NATIONS))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    kept = bloom_semi_join(li, supp, "l_suppkey", n_bits=1 << 16, n_hashes=3)
    return kept.groupBy("l_returnflag").agg(
        F.sum(REVENUE()).cast("double").alias("revenue"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# corpus drift: total-variation distance per source
# ---------------------------------------------------------------------------


@register(
    "docs_source_tv_drift",
    f"""
    WITH tok AS (
      SELECT source, unnest({SQL_TOKS_SAFE}) AS term FROM documents
    ), tf_s AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM tok GROUP BY 1, 2
    ), tf_all AS (
      SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t FROM tf_s GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(c_t) AS BIGINT) AS big_t FROM tf_all
    ), totals AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM tf_s GROUP BY 1
    ), j AS (
      SELECT tf_s.source, tf_s.c_st, tf_all.c_t, totals.t_s, tot.big_t
      FROM tf_s JOIN tf_all USING (term) JOIN totals USING (source) CROSS JOIN tot
    ), num AS (
      SELECT source, COUNT(*) AS n_terms, MAX(t_s) AS t_s, MAX(big_t) AS big_t,
             SUM(ABS(CAST(c_st AS DECIMAL(38,0)) * big_t
                     - CAST(c_t AS DECIMAL(38,0)) * t_s)) AS num1,
             CAST(SUM(c_t) AS BIGINT) AS cov
      FROM j GROUP BY 1
    )
    SELECT source, n_terms,
           ROUND(0.5 * (CAST(num1 AS DOUBLE) / (CAST(t_s AS DOUBLE) * CAST(big_t AS DOUBLE))
                        + CAST(big_t - cov AS DOUBLE) / CAST(big_t AS DOUBLE)), 6) AS tv_drift
    FROM num
    ORDER BY source
    """,
    tags=["LLM-text", "corpus", "drift", "quality"],
)
def q_docs_source_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source domain drift: total-variation distance between the
    source's unigram distribution and the corpus-wide distribution.

    TV(s) = 0.5 * sum_t |p_s(t) - q(t)| decomposes over terms PRESENT in
    the source plus the mass of corpus terms absent from it:
    0.5 * (sum_{t in s} |c_st*T - c_t*T_s| / (T_s*T) + (T - cov_s)/T),
    where cov_s = sum of corpus counts of the source's terms. Every
    numerator is an exact integer (DECIMAL(38,0) cross-products), so the
    statistic is bit-reproducible — the reason TV is used here instead
    of KL (log rounding differs across libm implementations).

    Scale: two hash aggregations (source×term, term) + one equi-join on
    term; the scalar corpus total broadcasts. Vocabulary never collects
    to the driver."""
    docs = T(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tx.tokens("text")).alias("term"))
    tf_s = tok.groupBy("source", "term").agg(F.count("*").cast("bigint").alias("c_st"))
    tf_all = tf_s.groupBy("term").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    big_t = tf_all.agg(F.sum("c_t").cast("bigint").alias("big_t"))

    j = tf_s.join(tf_all, "term").crossJoin(F.broadcast(big_t))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    # The |c_st*T - c_t*T_s| cross-product needs T_s, which is itself a
    # per-source aggregate — two passes: first the per-source totals
    # (tiny: one row per source, broadcast back), then the exact
    # numerator over the term-level join.
    totals = tf_s.groupBy("source").agg(F.sum("c_st").cast("bigint").alias("t_s"))
    j2 = j.join(F.broadcast(totals), "source")
    num = j2.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.max("t_s").alias("t_s"),
        F.max("big_t").alias("big_t"),
        F.sum(F.abs(dec("c_st") * F.col("big_t") - dec("c_t") * F.col("t_s"))).alias(
            "num1"
        ),
        F.sum("c_t").cast("bigint").alias("cov"),
    )
    return num.select(
        "source",
        "n_terms",
        F.round(
            F.lit(0.5)
            * (
                F.col("num1").cast("double")
                / (F.col("t_s").cast("double") * F.col("big_t").cast("double"))
                + (F.col("big_t") - F.col("cov")).cast("double")
                / F.col("big_t").cast("double")
            ),
            6,
        ).alias("tv_drift"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# chunk-level exact dedup
# ---------------------------------------------------------------------------

_DCHUNK = 64


@register(
    "docs_chunk_dedup",
    f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKS_SAFE} AS toks FROM documents
      WHERE len(trim(text)) > 0
    ), c AS (
      SELECT doc_id,
             unnest(generate_series(0, (len(toks) - 1) // {_DCHUNK})) AS chunk_id,
             toks
      FROM t
    ), h AS (
      SELECT doc_id, chunk_id,
             md5(array_to_string(toks[chunk_id*{_DCHUNK}+1 : (chunk_id+1)*{_DCHUNK}], ' ')) AS chunk_hash
      FROM c
    ), r AS (
      SELECT doc_id, chunk_id,
             ROW_NUMBER() OVER (PARTITION BY chunk_hash
                                ORDER BY doc_id, chunk_id) AS occ
      FROM h
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) / COUNT(*), 6) AS kept_ratio
    FROM r
    GROUP BY doc_id
    """,
    tags=["LLM-text", "dedup", "chunk"],
)
def q_docs_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup: split every document into
    NON-overlapping 64-token chunks, hash each, keep only the globally
    first occurrence of each distinct chunk (ordered by doc_id then
    chunk position), and report per-document retention — the repeated-
    span/boilerplate removal step of a pre-training pipeline, one level
    finer than document-level exact dedup.

    Scale: explode is bounded (n_tokens/64 rows per doc); the keep-first
    decision is a row_number window partitioned BY THE HASH — i.e. a
    single shuffle on a uniformly distributed 128-bit key with tiny
    groups (duplicate count), immune to skew; then one groupBy doc_id.
    Nothing global, no driver state."""
    from .operators.dedup import chunk_dedup_stats

    return chunk_dedup_stats(
        T(spark, sf_dir, "documents"), "text", "doc_id", chunk_tokens=_DCHUNK
    )


# ---------------------------------------------------------------------------
# AQE skew-join (the salted join's automatic twin)
# ---------------------------------------------------------------------------


@register(
    "skew_aqe_join",
    """
    WITH l AS (
      SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0 ELSE l_orderkey END AS sk,
             l_quantity,
             md5(CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR)) AS line_tag
      FROM lineitem
    ),
    d AS (
      SELECT o_orderkey AS sk, o_orderpriority AS priority
      FROM orders WHERE o_orderkey % 10 >= 8
      UNION ALL
      SELECT 0, '0-HOT'
    )
    SELECT d.priority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           MIN(l.line_tag) AS first_tag
    FROM l JOIN d ON l.sk = d.sk
    GROUP BY 1
    """,
    tags=["skew", "aqe"],
)
def q_skew_aqe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join handling — the AUTOMATIC twin of skew_salted_join:
    a deliberately skewed key (80% of lineitem rows collapse onto sk=0,
    matched by a single hot dim row) joined un-salted as a shuffle
    sort-merge join; Spark's adaptive OptimizeSkewedJoin splits the
    oversized partition into per-mapper chunks at runtime, replicating
    the matching build rows — the same replicate-the-build-side trick
    salted_join hand-rolls, but chosen from runtime shuffle statistics
    instead of a hand-tuned salt constant.

    Three test-scale accommodations, each standing in for a property a
    real cluster has natively (documented in SCALE.md):
    - the probe is ``repartition(32)``'d first: a skewed REDUCE
      partition can only be split at MAP-output boundaries, and the
      single-file test parquet yields one map task (a 100 TB scan has
      thousands);
    - each probe row carries a high-entropy md5 ``line_tag``: AQE skew
      stats are COMPRESSED byte sizes, and 48k identical ``(0, qty)``
      rows LZ4-compress to less than 2x the median partition — real
      wide rows don't;
    - the skew thresholds are lowered (scoped: set, execute to scratch
      parquet, restore) since the 256 MB defaults are right at cluster
      scale, not at sf0.01.

    The oracle is the plain join — AQE must never change results, only
    partitioning. The skew=true marker on the executed SortMergeJoin is
    asserted in tests/test_plan_invariants.py::test_aqe_skew_join_splits.
    """
    import tempfile

    agg = build_aqe_skew_join(spark, sf_dir)
    keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        tmp = scratch_dir(prefix="mm_aqe_skew_")
        agg.write.mode("overwrite").parquet(tmp)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.read.parquet(tmp)


def build_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-executed skewed-join plan behind ``skew_aqe_join`` (shared
    with the plan-assertion test)."""
    sk_l = F.when(F.col("l_orderkey") % 10 < 8, F.lit(0).cast("bigint")).otherwise(
        F.col("l_orderkey")
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .select(
            sk_l.alias("sk"),
            "l_quantity",
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ).alias("line_tag"),
        )
        .repartition(32)
    )
    tail = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 >= 8)
        .select(F.col("o_orderkey").alias("sk"), F.col("o_orderpriority").alias("priority"))
    )
    hot = spark.range(1).select(
        F.lit(0).cast("bigint").alias("sk"), F.lit("0-HOT").alias("priority")
    )
    dim = tail.unionByName(hot)
    return (
        li.join(dim.hint("merge"), "sk")
        .groupBy("priority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.min("line_tag").alias("first_tag"),
        )
    )


# ---------------------------------------------------------------------------
# multi-dimensional aggregation API surface: pivot / rollup / unpivot
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "orders_priority_pivot",
    f"""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           {", ".join(
               'CAST(COUNT(*) FILTER (o_orderpriority = ' + repr(p) + ') AS BIGINT)'
               ' AS "' + p + '"' for p in _PRIORITIES
           )}
    FROM orders GROUP BY 1
    """,
    tags=["pivot", "wide-agg"],
)
def q_orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: month x order-priority count matrix via
    ``groupBy().pivot(values).count()``. The pivot VALUES are passed
    explicitly — without them Spark runs an extra distinct-collect job
    to discover the domain, a driver roundtrip a 100 TB job shouldn't
    pay for a known dimension; with them the pivot is a single
    conditional aggregation (one shuffle, map-side partials), exactly
    the FILTER-per-column formulation the oracle runs."""
    o = T(spark, sf_dir, "orders").withColumn(
        "month_start",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd"),
    )
    out = o.groupBy("month_start").pivot("o_orderpriority", _PRIORITIES).count()
    # pivot leaves absent cells null; the oracle's FILTER counts yield 0
    return out.select(
        "month_start",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(p) for p in _PRIORITIES],
    )


@register(
    "lineitem_rollup_totals",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=["rollup", "wide-agg"],
)
def q_lineitem_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals: (flag, status) -> (flag) -> grand total
    in ONE aggregation pass (`df.rollup`) — the BI-subtotal shape.
    Spark expands grouping sets map-side, so the shuffle still carries
    partial aggregates only; NULL grouping markers are canonicalized to
    'ALL' for the cross-engine compare (both engines mark super-rows
    with NULL)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n_rows",
            "sum_price",
        )
    )


@register(
    "part_measures_unpivot",
    """
    SELECT p_partkey, measure, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT p_partkey,
             unnest(['retail_price', 'size']) AS measure,
             unnest([CAST(p_retailprice AS DOUBLE), CAST(p_size AS DOUBLE)]) AS value
      FROM part
    )
    WHERE p_partkey % 5 = 0
    """,
    tags=["unpivot", "melt"],
)
def q_part_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide part measures -> long (key, measure, value)
    rows via ``unpivot`` (the stack() shape) — zero shuffle, a pure
    projection+generate, the standard feature-table melt before ML
    feature stores. Filtered to every 5th part to keep the driver row
    bounded."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    return p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retail_price"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot("p_partkey", ["retail_price", "size"], "measure", "value")


@register(
    "orders_pareto_share",
    """
    WITH per_cust AS (
      SELECT o_custkey AS c_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT SUM(revenue) AS total FROM per_cust
    ), ranked AS (
      SELECT c_custkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, c_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum_revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rnk
      FROM per_cust
    )
    SELECT rnk, c_custkey,
           CAST(revenue AS DOUBLE) AS revenue,
           ROUND(CAST(cum_revenue AS DOUBLE) / CAST(tot.total AS DOUBLE), 6)
             AS cum_share
    FROM ranked CROSS JOIN tot
    WHERE rnk <= 100
    """,
    tags=["pareto", "bi", "window"],
)
def q_orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / Lorenz curve: top-100 customers by revenue with their
    CUMULATIVE share of total revenue (the 80/20 chart every revenue
    dashboard opens with). Exact decimal sums; the running total is a
    rows-frame window over the revenue-desc order.

    Scale note: like RFM, the global window runs at the CUSTOMER grain
    (orders of magnitude below fact scale) and the output is capped at
    the top 100; the per-customer rollup below it is a partial-aggregated
    fact-grain shuffle."""
    o = T(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
    )
    tot = per_cust.agg(F.sum("revenue").alias("total"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("revenue").desc(), "c_custkey")
    ranked = per_cust.select(
        "c_custkey",
        "revenue",
        F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_revenue"
        ),
        F.row_number().over(w).alias("rnk"),
    )
    return (
        ranked.filter(F.col("rnk") <= 100)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rnk").cast("bigint").alias("rnk"),
            "c_custkey",
            F.col("revenue").cast("double").alias("revenue"),
            F.round(
                F.col("cum_revenue").cast("double") / F.col("total").cast("double"), 6
            ).alias("cum_share"),
        )
    )


@register(
    "events_dau_stickiness",
    """
    WITH daily AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS week_start,
             CAST(ts AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ), weekly AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS week_start,
             COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    )
    SELECT strftime(d.week_start, '%Y-%m-%d') AS week_start,
           CAST(w.wau AS BIGINT) AS wau,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(d.dau) AS BIGINT) AS sum_dau,
           ROUND(SUM(d.dau) / (COUNT(*) * w.wau), 6) AS stickiness
    FROM daily d JOIN weekly w ON d.week_start = w.week_start
    GROUP BY 1, w.wau
    """,
    tags=["events", "product-analytics", "distinct"],
)
def q_events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per week — the product-analytics ratio of
    average daily active users to weekly active users. Two exact
    distinct-count aggregations (daily and weekly grain) joined on the
    week; stickiness = avg(DAU)/WAU as one fixed-order division.

    Scale: both distincts shuffle on (period, user) with partial
    aggregation; at 100 TB swap COUNT(DISTINCT) for the bitmap state
    tables (operators/ivm.py) the engine already maintains — same
    outputs, mergeable across days."""
    e = events_table(spark, sf_dir)
    day = F.col("ts").cast("date")
    week = F.date_trunc("week", day)
    daily = e.groupBy(
        week.alias("week_start"), day.alias("day")
    ).agg(F.countDistinct("user_id").alias("dau"))
    weekly = e.groupBy(week.alias("week_start")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        daily.join(weekly, "week_start")
        .groupBy(
            F.date_format("week_start", "yyyy-MM-dd").alias("week_start"), "wau"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("dau").cast("bigint").alias("sum_dau"),
        )
        .select(
            "week_start",
            F.col("wau").cast("bigint").alias("wau"),
            "n_days",
            "sum_dau",
            F.round(F.col("sum_dau") / (F.col("n_days") * F.col("wau")), 6).alias(
                "stickiness"
            ),
        )
    )


@register(
    "dpp_partition_prune_roundtrip",
    """
    WITH f AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             o_totalprice
      FROM orders
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM f
    WHERE month IN ('1995-01-01', '1995-02-01')
    GROUP BY 1
    """,
    tags=["dpp", "partition-pruning", "roundtrip"],
)
def q_dpp_partition_prune_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, driver-checked: orders land as a
    month-partitioned table, then join a 2-row month dimension — at
    plan time the fact's partition filter is UNKNOWN (it comes from the
    dim), so Spark injects a dynamicpruning subquery that evaluates the
    dim first and scans ONLY the two matching partitions. At 100 TB
    this is the difference between reading 2 months and reading the
    decade; the oracle recomputes the filtered aggregate from the
    pristine table, so wrong pruning (missing or extra partitions)
    flips the hash. The dynamicpruningexpression's presence in the plan
    is asserted in tests/test_plan_invariants.py::test_dpp_triggers."""
    agg = build_dpp_join(spark, sf_dir)
    return agg


def build_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partitioned-write + dim-filtered join behind
    dpp_partition_prune_roundtrip (shared with the plan test)."""
    import tempfile

    base = scratch_dir(prefix="mm_dpp_")
    root, dim_root = f"{base}/orders_by_month", f"{base}/month_dim"
    o = T(spark, sf_dir, "orders").withColumn(
        "month", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
    )
    o.write.partitionBy("month").mode("overwrite").parquet(root)
    # a real month-dimension table: DPP requires a SELECTIVE PREDICATE on
    # the dim side of the join (a bare literal relation is folded away
    # and never generates the pruning subquery)
    o.select("month").distinct().write.mode("overwrite").parquet(dim_root)
    fact = spark.read.parquet(root)
    dim = spark.read.parquet(dim_root).filter(
        F.col("month").isin("1995-01-01", "1995-02-01")
    )
    return (
        fact.join(dim, "month")
        # partition-directory values type-infer as DATE on read; restore
        # the registry's ISO-string date discipline at the output
        .groupBy(F.date_format("month", "yyyy-MM-dd").alias("month"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
