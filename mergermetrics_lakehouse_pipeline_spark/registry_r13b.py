"""Round-13 continuation surface: the mergeable-sketch toolbox
(HyperLogLog with in-query merge / sliding windows / Delta-persisted
state, KMV with Theta-style set algebra and a shard-overlap matrix,
Bloom, count-min frequencies + join-size dot product, AMS F2,
HDR-histogram medians — each hash-replayable EXACTLY in the DuckDB
oracle, because every register/counter is integer arithmetic over
md5-derived hashes with at most one trailing IEEE division),
Hilbert-curve clustering (the locality-preserving twin of
operators/layout.py zorder_key), scale diagnostics (exact
range-partition planning, partition-key uniformity, calibrated hash
sampling), and SQL-surface census rows (nth_value/cume_dist,
grouping_id, type co-occurrence).

Why sketches as first-class oracle rows: at 100 TB the ONLY honest
shapes for distinct-count / membership / frequency questions are
mergeable sketches — fixed-size partials that combine map-side and
merge across partitions, days, and tables without rescanning. The
usual objection to testing them is nondeterminism; these rows remove
it by construction (deterministic md5 register math), so the driver
hash-checks the sketch OBJECT itself, not a tolerance band.

Parity note: the reference pipelines (consolidated_pipeline/
2_incremental_load_fact.py, 3_pricing_data_processing.py) count
distincts exactly at notebook scale; this module is engine-extension
surface for the scales where exact countDistinct stops being a plan.
"""

from __future__ import annotations

from .scratch import scratch_dir
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.text import tokens
from .operators.layout import hilbert_col
from .parallel import fan_out
from .registry import T, events_table, register


# ---------------------------------------------------------------------------
# shared hash plumbing: 60-bit salted md5 (the repo-wide cross-engine recipe)
# ---------------------------------------------------------------------------


def _h60_spark(inner_sql: str) -> str:
    """Spark SQL text for the 60-bit md5 hash of an expression."""
    return f"CAST(conv(substring(md5({inner_sql}), 1, 15), 16, 10) AS BIGINT)"


def _h60_duck(inner_sql: str) -> str:
    """DuckDB twin of :func:`_h60_spark` (verified bit-identical)."""
    return f"CAST(CONCAT('0x', substr(md5({inner_sql}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (m=256 registers, rho from the top 52 bits)
# ---------------------------------------------------------------------------

#: register count (p=8) and the max register value: the hash is 60
#: bits, the low 8 pick the register, so the remaining 52-bit field's
#: "position of the leading 1" statistic is 53 - bit_length(rest),
#: saturating at 53 when the field is all zeros.
_HLL_M = 256
_HLL_RMAX = 53
#: alpha_m * m^2 * 2^53 as ONE double literal shared by both engines —
#: the estimate is this divided by the exact integer register sum
#: (a single IEEE division, bit-identical everywhere).
_HLL_NUM = 0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * float(2**_HLL_RMAX)


def _sql_hll_lineitem() -> str:
    h = _h60_duck("'hll|' || CAST(l_partkey AS VARCHAR)")
    return f"""
    WITH h AS (SELECT {h} AS h FROM lineitem),
    r AS (
      SELECT h & 255 AS register,
             CASE WHEN (h >> 8) = 0 THEN {_HLL_RMAX}
                  ELSE {_HLL_RMAX} - length(bin(h >> 8)) END AS rho
      FROM h
    ),
    regs AS (SELECT register, MAX(rho) AS m_val FROM r GROUP BY 1),
    filled AS (
      SELECT g.register, CAST(COALESCE(regs.m_val, 0) AS INT) AS m_val
      FROM (SELECT CAST(range AS BIGINT) AS register FROM range({_HLL_M})) g
      LEFT JOIN regs ON g.register = regs.register
    ),
    census AS (
      SELECT m_val AS register_value, CAST(COUNT(*) AS BIGINT) AS n_registers
      FROM filled GROUP BY 1
    ),
    summ AS (
      SELECT ROUND({_HLL_NUM!r}
                   / CAST(SUM(1::BIGINT << ({_HLL_RMAX} - m_val)) AS DOUBLE),
                   4) AS hll_estimate,
             CAST(SUM(CASE WHEN m_val = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS empty_registers
      FROM filled
    ),
    ex AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
           FROM lineitem)
    SELECT census.*, summ.*, ex.* FROM census, summ, ex
    """


def _hll_rows(df: DataFrame, key_sql: str, salt: str):
    """(register, rho) per input row for the given key expression."""
    h = F.expr(_h60_spark(f"concat('{salt}', CAST({key_sql} AS STRING))"))
    rest = F.shiftright(h, 8)
    rho = (
        F.when(rest == 0, F.lit(_HLL_RMAX))
        .otherwise(F.lit(_HLL_RMAX) - F.length(F.conv(rest, 10, 2)))
        .cast("int")
    )
    return df.select(h.bitwiseAND(F.lit(255)).alias("register"), rho.alias("rho"))


@register(
    "lineitem_hll_distinct_sketch",
    _sql_hll_lineitem(),
    tags=["A4", "A7", "scale", "sketch"],
)
def q_lineitem_hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch over l_partkey, hash-checked as
    an OBJECT: the full register census (register_value -> how many of
    the 256 registers hold it), the empty-register count, the raw HLL
    estimate (one IEEE division of two exact numbers), and the exact
    distinct for honesty. No small/large-range correction: the
    correction branch is driver-side cosmetics over the same register
    table, and it would drag ln() cross-libm risk into the hash gate.

    Scale: THE distinct-count shape for 100 TB — per-row register math
    is codegen projection, the groupBy collapses to <=256 rows with
    map-side partial MAX (perfectly combinable: MAX is the HLL merge
    operator), and everything after is constant-size. Registers from
    disjoint partitions/days/tables merge by the same MAX without
    rescanning — see orders_hll_monthly_union for the merge proven
    in-query. Parity: engine extension (reference counts distincts
    exactly at notebook scale)."""
    li = fan_out(T(spark, sf_dir, "lineitem").select("l_partkey"))
    regs = (
        _hll_rows(li, "l_partkey", "hll|")
        .groupBy("register")
        .agg(F.max("rho").alias("m_val"))
    )
    full = (
        spark.range(_HLL_M)
        .select(F.col("id").alias("register"))
        .join(F.broadcast(regs), "register", "left")
        .select(
            "register", F.coalesce(F.col("m_val"), F.lit(0)).cast("int").alias("m_val")
        )
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - m_val)")
    summary = full.agg(
        F.round(F.lit(_HLL_NUM) / F.sum(term).cast("double"), 4).alias(
            "hll_estimate"
        ),
        F.sum(F.when(F.col("m_val") == 0, 1).otherwise(0))
        .cast("long")
        .alias("empty_registers"),
    )
    exact = li.agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_distinct")
    )
    census = (
        full.groupBy("m_val")
        .agg(F.count("*").alias("n_registers"))
        .withColumnRenamed("m_val", "register_value")
    )
    return census.crossJoin(F.broadcast(summary)).crossJoin(F.broadcast(exact))


def _sql_hll_monthly_union() -> str:
    h = _h60_duck("'hllm|' || CAST(o_custkey AS VARCHAR)")
    two53 = 2**_HLL_RMAX
    return f"""
    WITH r AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS scope,
             {h} & 255 AS register,
             CASE WHEN ({h} >> 8) = 0 THEN {_HLL_RMAX}
                  ELSE {_HLL_RMAX} - length(bin({h} >> 8)) END AS rho,
             o_custkey
      FROM orders
    ),
    by_scope AS (
      SELECT scope, register, MAX(rho) AS m_val FROM r GROUP BY 1, 2
    ),
    merged AS (
      SELECT 'ALL:merged' AS scope, register, MAX(m_val) AS m_val
      FROM by_scope GROUP BY 2
    ),
    allregs AS (SELECT * FROM by_scope UNION ALL SELECT * FROM merged),
    est AS (
      SELECT scope,
             ROUND({_HLL_NUM!r}
                   / CAST(SUM(1::BIGINT << ({_HLL_RMAX} - m_val))
                          + ({_HLL_M} - COUNT(*)) * {two53}::BIGINT AS DOUBLE),
                   4) AS hll_estimate
      FROM allregs GROUP BY 1
    ),
    ex AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS scope,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders GROUP BY 1
      UNION ALL
      SELECT 'ALL:merged', CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
    )
    SELECT est.scope, est.hll_estimate, ex.exact_distinct
    FROM est JOIN ex ON est.scope = ex.scope
    """


@register(
    "orders_hll_monthly_union",
    _sql_hll_monthly_union(),
    tags=["A4", "A7", "scale", "sketch"],
)
def q_orders_hll_monthly_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability proven in-query: per-month register tables over
    o_custkey, plus an 'ALL:merged' row built ONLY by MAX-merging the
    monthly registers — never rescanning the data. That is the whole
    100 TB point of the sketch: daily partials persist at 256 numbers
    per scope, and any rollup (month -> quarter -> lifetime) is a MAX
    over registers. Each scope row carries its exact distinct alongside
    the estimate, so the record honestly shows the sketch's error.

    Empty registers are folded arithmetically — a scope's register sum
    is SUM(2^(53-m)) over present registers plus (256 - present)*2^53 —
    so no 256-row spine join per scope is needed. One shuffle to
    (scope, register), constant-size after."""
    o = T(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("scope"), "o_custkey"
    )
    h = F.expr(_h60_spark("concat('hllm|', CAST(o_custkey AS STRING))"))
    rest = F.shiftright(h, 8)
    rho = (
        F.when(rest == 0, F.lit(_HLL_RMAX))
        .otherwise(F.lit(_HLL_RMAX) - F.length(F.conv(rest, 10, 2)))
        .cast("int")
    )
    rows = o.select(
        "scope", h.bitwiseAND(F.lit(255)).alias("register"), rho.alias("rho")
    )
    by_scope = rows.groupBy("scope", "register").agg(F.max("rho").alias("m_val"))
    merged = (
        by_scope.groupBy("register")
        .agg(F.max("m_val").alias("m_val"))
        .select(F.lit("ALL:merged").alias("scope"), "register", "m_val")
    )
    allregs = by_scope.unionByName(merged)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - m_val)")
    est = allregs.groupBy("scope").agg(
        F.round(
            F.lit(_HLL_NUM)
            / (
                F.sum(term)
                + (F.lit(_HLL_M) - F.count("*")) * F.lit(2**_HLL_RMAX)
            ).cast("double"),
            4,
        ).alias("hll_estimate")
    )
    exact = (
        o.groupBy("scope")
        .agg(F.countDistinct("o_custkey").cast("long").alias("exact_distinct"))
        .unionByName(
            o.agg(
                F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
            ).select(F.lit("ALL:merged").alias("scope"), "exact_distinct")
        )
    )
    return est.join(exact, "scope").select("scope", "hll_estimate", "exact_distinct")


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch
# ---------------------------------------------------------------------------

_KMV_K = 64
#: (k-1) * 2^60 as one exact double literal (63 * 2^60 has a 6-bit
#: mantissa — exactly representable); estimate = this / k-th hash.
_KMV_NUM = float((_KMV_K - 1) * 2**60)


def _sql_kmv_lineitem() -> str:
    h = _h60_duck("'kmv|' || CAST(l_partkey AS VARCHAR)")
    return f"""
    WITH dh AS (SELECT DISTINCT {h} AS h FROM lineitem),
    bottom AS (SELECT h FROM dh ORDER BY h LIMIT {_KMV_K}),
    ranked AS (
      SELECT h AS hash_value,
             CAST(row_number() OVER (ORDER BY h) AS INT) AS rank
      FROM bottom
    ),
    summ AS (
      SELECT ROUND({_KMV_NUM!r} / CAST(MAX(h) AS DOUBLE), 4) AS kmv_estimate
      FROM bottom
    ),
    ex AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
           FROM lineitem)
    SELECT ranked.*, summ.*, ex.* FROM ranked, summ, ex
    """


@register(
    "lineitem_kmv_distinct_sketch",
    _sql_kmv_lineitem(),
    tags=["A4", "O4", "scale", "sketch"],
)
def q_lineitem_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct sketch over l_partkey: the 64 smallest
    distinct 60-bit hashes ARE the sketch, returned as ranked rows with
    the (k-1)*2^60 / h_k estimate and the exact distinct beside them.
    KMV is the sketch whose merge is a set-union-then-truncate — and
    whose intersection support (Theta sketches) HLL lacks.

    Scale: hash projection -> hash-distinct (shuffle collapses to
    distinct hashes with map-side partials) -> TakeOrderedAndProject 64
    (per-partition top-k, driver merges 64 x partitions values, no
    global sort). The 64-row rank window is bounded by construction."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey")
    h = F.expr(_h60_spark("concat('kmv|', CAST(l_partkey AS STRING))"))
    bottom = li.select(h.alias("h")).distinct().orderBy("h").limit(_KMV_K)
    ranked = bottom.select(
        F.col("h").alias("hash_value"),
        F.row_number().over(Window.orderBy("h")).alias("rank"),
    )
    summary = bottom.agg(
        F.round(F.lit(_KMV_NUM) / F.max("h").cast("double"), 4).alias(
            "kmv_estimate"
        )
    )
    exact = li.agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_distinct")
    )
    return ranked.crossJoin(F.broadcast(summary)).crossJoin(F.broadcast(exact))


# ---------------------------------------------------------------------------
# Bloom filter build + probe census
# ---------------------------------------------------------------------------

#: 64 words x 62 usable bits (bit 62/63 never set: keeps every word
#: positive, so the two engines' signed-BIGINT bit_or/AND agree without
#: two's-complement edge cases) x 3 salted hash functions.
_BL_WORDS, _BL_BITS, _BL_J = 64, 62, 3
_BL_M = _BL_WORDS * _BL_BITS


def _bl_duck_pos(j_sql: str, key_sql: str) -> str:
    h = _h60_duck(f"'bloom' || CAST({j_sql} AS VARCHAR) || '|' || CAST({key_sql} AS VARCHAR)")
    return f"({h} % {_BL_M})"


def _sql_bloom_probe() -> str:
    probes = ", ".join(
        f"{_bl_duck_pos(str(j), 'l_orderkey')} AS p{j}" for j in range(_BL_J)
    )
    hits = " AND ".join(
        f"(COALESCE(w{j}.w, 0) & (1::BIGINT << CAST(pr.p{j} % {_BL_BITS} AS INT)))"
        f" <> 0"
        for j in range(_BL_J)
    )
    joins = " ".join(
        f"LEFT JOIN words w{j} ON pr.p{j} // {_BL_BITS} = w{j}.wi"
        for j in range(_BL_J)
    )
    return f"""
    WITH b AS (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995
    ),
    ex AS (SELECT o_orderkey, CAST(range AS INT) AS j FROM b, range({_BL_J})),
    bits AS (SELECT {_bl_duck_pos('j', 'o_orderkey')} AS p FROM ex),
    words AS (
      SELECT p // {_BL_BITS} AS wi,
             bit_or(1::BIGINT << CAST(p % {_BL_BITS} AS INT)) AS w
      FROM bits GROUP BY 1
    ),
    probe AS (SELECT l_orderkey, {probes} FROM lineitem),
    flagged AS (
      SELECT pr.l_orderkey, CASE WHEN {hits} THEN 1 ELSE 0 END AS bloom_positive
      FROM probe pr {joins}
    ),
    truth AS (
      SELECT f.l_orderkey, f.bloom_positive,
             CASE WHEN m.o_orderkey IS NULL THEN 0 ELSE 1 END AS member_truth
      FROM flagged f
      LEFT JOIN (SELECT DISTINCT o_orderkey FROM b) m
        ON f.l_orderkey = m.o_orderkey
    )
    SELECT member_truth, bloom_positive, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM truth GROUP BY 1, 2
    """


@register(
    "orders_bloom_probe_census",
    _sql_bloom_probe(),
    tags=["J2", "P10", "scale", "sketch"],
)
def q_orders_bloom_probe_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter semi-join: build a 3968-bit filter (64
    words x 62 bits x 3 salted hashes) over 1995's urgent orderkeys,
    ship it to the probe side as a 64-long ARRAY LITERAL, and census
    lineitem probes against ground truth. The census proves the Bloom
    contract in-data: the (truth=1, bloom=0) cell is structurally empty
    (no false negatives), and the (0,1) cell measures the real FP rate
    at this density.

    Scale: this is how runtime filter pushdown actually works — the
    filter is words-count-sized regardless of data, built by a
    bit_or groupBy with map-side combine (bit_or IS the Bloom merge),
    collected ONLY at filter size (<=64 rows, bounded by geometry, the
    codebook-collect precedent), and probed as pure codegen projection:
    zero join, zero shuffle on the probe path. The truth column's
    broadcast semi-join exists only to grade the filter.

    Relation to operators/bloomjoin.py: that module USES a bitmap as a
    join prefilter whose oracle is the plain semi-join (the filter is
    invisible by construction); this row hash-checks the filter OBJECT
    and its FP census, pinning the bit layout itself cross-engine."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    build = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") == 1995)
    ).select("o_orderkey")
    ex = build.select(
        "o_orderkey", F.explode(F.array(*[F.lit(j) for j in range(_BL_J)])).alias("j")
    )
    pos = F.expr(
        _h60_spark("concat('bloom', CAST(j AS STRING), '|', CAST(o_orderkey AS STRING))")
        + f" % {_BL_M}"
    )
    words_df = (
        ex.select(pos.alias("p"))
        .groupBy(F.expr(f"p div {_BL_BITS}").alias("wi"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % {_BL_BITS} AS INT)))"
            ).alias("w")
        )
    )
    # Bounded by construction: <= _BL_WORDS rows whatever the data size
    # (the filter IS a fixed-size object — collecting it is the point).
    words = {int(r["wi"]): int(r["w"]) for r in words_df.collect()}
    arr = F.array(
        *[F.lit(words.get(i, 0)).cast("long") for i in range(_BL_WORDS)]
    )
    # round 14: the probe side computes 3 md5s per lineitem row — fan
    # out so it doesn't run on the single task a one-row-group scan
    # plans as (guide §2.2; no-op on split inputs)
    probe = fan_out(li.select("l_orderkey")).withColumn("_words", arr)
    hit_cols = []
    for j in range(_BL_J):
        p = F.expr(
            _h60_spark(f"concat('bloom{j}|', CAST(l_orderkey AS STRING))")
            + f" % {_BL_M}"
        )
        probe = probe.withColumn(f"_p{j}", p)
        hit_cols.append(
            F.expr(
                f"(element_at(_words, CAST(_p{j} div {_BL_BITS} AS INT) + 1)"
                f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{j} % {_BL_BITS} AS INT)))"
                f" <> CAST(0 AS BIGINT)"
            )
        )
    bloom = F.when(hit_cols[0] & hit_cols[1] & hit_cols[2], 1).otherwise(0)
    flagged = probe.select("l_orderkey", bloom.alias("bloom_positive"))
    members = build.distinct().withColumn("_m", F.lit(1))
    truth = flagged.join(
        F.broadcast(members), flagged.l_orderkey == members.o_orderkey, "left"
    ).select(
        "bloom_positive", F.coalesce(F.col("_m"), F.lit(0)).alias("member_truth")
    )
    return truth.groupBy("member_truth", "bloom_positive").agg(
        F.count("*").alias("n_rows")
    )


# ---------------------------------------------------------------------------
# Count-min frequency sketch
# ---------------------------------------------------------------------------

#: depth 3 x width 8: deliberately NARROW so the synthetic 5-type
#: events table collides and the min-of-rows property is exercised for
#: real (a 2048-wide sketch would make every estimate trivially exact
#: here and the row would prove nothing).
_CM_D, _CM_W = 3, 8


def _sql_countmin_events() -> str:
    cell = _h60_duck("'cm' || CAST(j AS VARCHAR) || '|' || event_type")
    return f"""
    WITH ex AS (
      SELECT event_type, CAST(range AS INT) AS j FROM events, range({_CM_D})
    ),
    cells AS (
      SELECT j, {cell} % {_CM_W} AS c, CAST(COUNT(*) AS BIGINT) AS n
      FROM ex GROUP BY 1, 2
    ),
    types AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY 1
    ),
    coords AS (
      SELECT t.event_type, t.exact_n, CAST(range AS INT) AS j,
             {cell} % {_CM_W} AS c
      FROM types t, range({_CM_D})
    ),
    est AS (
      SELECT event_type, exact_n, MIN(n) AS cm_estimate
      FROM coords JOIN cells USING (j, c)
      GROUP BY 1, 2
    )
    SELECT event_type, exact_n, cm_estimate,
           cm_estimate - exact_n AS overcount
    FROM est
    """


@register(
    "events_countmin_type_census",
    _sql_countmin_events(),
    tags=["A1", "A7", "scale", "sketch"],
)
def q_events_countmin_type_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch over event_type (depth 3 x width 8 —
    narrow on purpose, so collisions happen and min-of-depth does real
    work), graded in-query: each type's estimate vs its exact count and
    the overcount (structurally >= 0: count-min never undercounts; the
    census proves it on this data).

    Scale: the sketch is d*w integers built by ONE groupBy with
    map-side combine (cell-wise + is the count-min merge); estimates
    join the type census against the 24-cell table broadcast. Heavy
    hitters at 100 TB = this exact shape with w sized to memory, never
    a per-key exact count."""
    e = fan_out(T(spark, sf_dir, "events").select("event_type"))
    js = F.explode(F.array(*[F.lit(j) for j in range(_CM_D)])).alias("j")
    cell = F.expr(
        _h60_spark("concat('cm', CAST(j AS STRING), '|', event_type)") + f" % {_CM_W}"
    )
    cells = (
        e.select("event_type", js)
        .select("j", cell.alias("c"))
        .groupBy("j", "c")
        .agg(F.count("*").alias("n"))
    )
    types = e.groupBy("event_type").agg(F.count("*").alias("exact_n"))
    coords = types.select("event_type", "exact_n", js).select(
        "event_type", "exact_n", "j", cell.alias("c")
    )
    est = (
        coords.join(F.broadcast(cells), ["j", "c"])
        .groupBy("event_type", "exact_n")
        .agg(F.min("n").alias("cm_estimate"))
    )
    return est.select(
        "event_type",
        "exact_n",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_n")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering key (cross-engine bit math)
# ---------------------------------------------------------------------------


def _sql_hilbert_lineitem() -> str:
    """Chained one-CTE-per-level replay of the Hilbert FSM in
    operators/layout.py (same packed QUAD/NEXT digit strings). CTE
    chaining keeps the SQL linear in curve order — the rotate-and-swap
    formulation would not be expressible without quadratic text."""
    from .operators.layout import _HILBERT_NEXTS, _HILBERT_QUADS

    steps = []
    prev = "base"
    for i, k in enumerate(range(7, -1, -1)):
        code = f"(st * 4 + ((x >> {k}) & 1) * 2 + ((y >> {k}) & 1))"
        d_expr = (
            f"d * 4 + CAST(substr('{_HILBERT_QUADS}', CAST({code} AS INT) + 1, 1)"
            f" AS BIGINT)"
        )
        st_expr = (
            f"CAST(substr('{_HILBERT_NEXTS}', CAST({code} AS INT) + 1, 1) AS BIGINT)"
        )
        steps.append(
            f"l{i} AS (SELECT l_orderkey, l_linenumber, x, y,"
            f" {d_expr} AS d, {st_expr} AS st FROM {prev})"
        )
        prev = f"l{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_partkey % 256 AS BIGINT) AS x,
             CAST(l_suppkey % 256 AS BIGINT) AS y,
             0::BIGINT AS d, 0::BIGINT AS st
      FROM lineitem
    ),
    {chain}
    SELECT l_orderkey, l_linenumber, x AS cell_x, y AS cell_y, d AS hilbert_key
    FROM {prev}
    ORDER BY d, l_orderkey, l_linenumber LIMIT 100
    """


@register(
    "lineitem_hilbert_cluster_key",
    _sql_hilbert_lineitem(),
    tags=["O4", "scale", "layout"],
)
def q_lineitem_hilbert_cluster_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (l_partkey, l_suppkey) cells —
    the locality-preserving alternative to zorder_key_lineitem's Morton
    interleave (a Hilbert walk never jumps at quadrant seams, so
    per-file bounding boxes from range-partitioning the key are tighter
    at the same file count; this is the curve behind liquid
    clustering). The oracle replays the SAME orientation-FSM bit math
    level by level in chained CTEs, pinning the curve cross-engine;
    exhaustive bijectivity + unit-step adjacency is pinned in
    tests/test_layout.py.

    Scale: the key is pure codegen bit arithmetic (the FSM keeps the
    unrolled expression linear in curve order — see
    operators/layout.py hilbert_col), and the query's only non-scan
    work is TakeOrderedAndProject 100."""
    li = (T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 256).cast("long").alias("cell_x"),
        (F.col("l_suppkey") % 256).cast("long").alias("cell_y"),
    ))
    keyed = li.withColumn(
        "hilbert_key", hilbert_col(F.col("cell_x"), F.col("cell_y"), 8)
    )
    return keyed.orderBy("hilbert_key", "l_orderkey", "l_linenumber").limit(100)


# ---------------------------------------------------------------------------
# census rotation
# ---------------------------------------------------------------------------


@register(
    "events_type_cooccurrence",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    per_type AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users FROM ut GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_total FROM events),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both, pa.n_users AS n_users_a,
           pb.n_users AS n_users_b,
           ROUND(CAST(p.n_both * t.n_total AS DOUBLE)
                 / CAST(pa.n_users * pb.n_users AS DOUBLE), 6) AS lift
    FROM pairs p
    JOIN per_type pa ON p.type_a = pa.event_type
    JOIN per_type pb ON p.type_b = pb.event_type
    CROSS JOIN tot t
    """,
    tags=["A7", "J2"],
)
def q_events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence census over event types: for every
    type pair, how many users touched both, with the lift vs
    independence (one IEEE division of two exact BIGINT products).

    Scale: the (user, type) DISTINCT collapse comes FIRST, so the
    self-join's per-user fan-out is bounded by the type cardinality
    squared (a fixed catalog, not a data-sized set) — the classic way
    basket analysis survives power-law users. One shuffle for the
    collapse, one user-keyed join, then a catalog-sized aggregate."""
    e = T(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    per_type = ut.groupBy("event_type").agg(F.count("*").alias("n_users"))
    tot = e.agg(F.countDistinct("user_id").alias("n_total"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    pa = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_users_a")
    )
    pb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_users_b")
    )
    return (
        pairs.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_users_a",
            "n_users_b",
            F.round(
                (F.col("n_both") * F.col("n_total")).cast("double")
                / (F.col("n_users_a") * F.col("n_users_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Theta-style KMV set algebra: cross-shard overlap without a join
# ---------------------------------------------------------------------------

#: Sketch capacity. The estimators derive k_eff = COUNT(*) of the union
#: sample at runtime (ADVICE r13: hardcoding (k-1)=63 and /64 is
#: mathematically invalid when a side has fewer than 64 distinct keys);
#: when k_eff < K the sample IS the union, so the estimates collapse to
#: the exact sample counts — the standard KMV small-set branch.
_THETA_K = 64
_THETA_H60 = float(2**60)


def _sql_theta_overlap() -> str:
    h = _h60_duck("'kmvc|' || CAST(o_custkey AS VARCHAR)")
    return f"""
    WITH hs AS (
      SELECT DISTINCT year(o_orderdate) AS y, {h} AS h
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    ),
    a64 AS (SELECT h FROM hs WHERE y = 1995 ORDER BY h LIMIT {_THETA_K}),
    b64 AS (SELECT h FROM hs WHERE y = 1996 ORDER BY h LIMIT {_THETA_K}),
    u64 AS (
      SELECT h FROM (SELECT h FROM a64 UNION SELECT h FROM b64)
      ORDER BY h LIMIT {_THETA_K}
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS matches
      FROM u64
      WHERE h IN (SELECT h FROM a64) AND h IN (SELECT h FROM b64)
    ),
    uk AS (
      SELECT MAX(h) AS union_kth, CAST(COUNT(*) AS BIGINT) AS k_eff
      FROM u64
    ),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
             CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS exact_inter
      FROM (
        SELECT o_custkey,
               MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
                 AS in_a,
               MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
                 AS in_b
        FROM orders WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY 1
      )
    )
    SELECT m.matches,
           uk.union_kth,
           uk.k_eff,
           (m.matches * 1000000) // uk.k_eff AS jaccard_ppm,
           CASE WHEN uk.k_eff < {_THETA_K}
                THEN CAST(uk.k_eff AS DOUBLE)
                ELSE ROUND(CAST(uk.k_eff - 1 AS DOUBLE) * {_THETA_H60!r}
                           / CAST(uk.union_kth AS DOUBLE), 4)
           END AS union_est,
           CASE WHEN uk.k_eff < {_THETA_K}
                THEN CAST(m.matches AS DOUBLE)
                ELSE ROUND(CAST(m.matches AS DOUBLE)
                           * CAST(uk.k_eff - 1 AS DOUBLE) * {_THETA_H60!r}
                           / (CAST(uk.k_eff AS DOUBLE)
                              * CAST(uk.union_kth AS DOUBLE)), 4)
           END AS inter_est,
           ex.exact_union, ex.exact_inter
    FROM m, uk, ex
    """


@register(
    "orders_theta_sketch_overlap",
    _sql_theta_overlap(),
    tags=["A4", "A7", "scale", "sketch"],
)
def q_orders_theta_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-style KMV set algebra: estimate the overlap between 1995's
    and 1996's customer populations FROM THE SKETCHES ALONE — union =
    bottom-k of the two sketches' union (valid because bottom-k(A ∪ B)
    = bottom-k(bottom-k(A) ∪ bottom-k(B))), intersection = the
    union-sample members found in both sketches (exact membership: any
    union-sample hash is <= both sets' k-th minimum, so sketch
    membership equals set membership). k_eff = |union sample| is
    derived at runtime (ADVICE r13 #2 — hardcoded 63//64 was invalid
    for degenerate inputs); when k_eff < K the sample IS the union and
    the estimates collapse to the exact sample counts, the standard KMV
    small-set branch. Jaccard is integer ppm; exact union/intersection
    ride along for honesty.

    Scale: THE cross-shard dedup-planning primitive — "how much do
    corpus shards A and B overlap?" answered from two 64-number
    sketches instead of a distinct-join across shards. Each sketch is a
    distinct-collapse + TakeOrderedAndProject; everything downstream is
    64-row arithmetic."""
    o = T(spark, sf_dir, "orders")
    h = F.expr(_h60_spark("concat('kmvc|', CAST(o_custkey AS STRING))"))
    hs = (
        o.filter(F.year("o_orderdate").isin(1995, 1996))
        .select(F.year("o_orderdate").alias("y"), h.alias("h"))
        .distinct()
    )
    a64 = hs.filter(F.col("y") == 1995).select("h").orderBy("h").limit(_THETA_K)
    b64 = hs.filter(F.col("y") == 1996).select("h").orderBy("h").limit(_THETA_K)
    u64 = a64.union(b64).distinct().orderBy("h").limit(_THETA_K)
    matches = (
        u64.join(F.broadcast(a64.withColumnRenamed("h", "ha")), F.col("h") == F.col("ha"), "left_semi")
        .join(F.broadcast(b64.withColumnRenamed("h", "hb")), F.col("h") == F.col("hb"), "left_semi")
        .agg(F.count("*").cast("long").alias("matches"))
    )
    uk = u64.agg(
        F.max("h").alias("union_kth"),
        F.count("*").cast("long").alias("k_eff"),
    )
    keys = o.filter(F.year("o_orderdate").isin(1995, 1996)).select(
        "o_custkey", F.year("o_orderdate").alias("y")
    )
    per_key = keys.groupBy("o_custkey").agg(
        F.max(F.when(F.col("y") == 1995, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("y") == 1996, 1).otherwise(0)).alias("in_b"),
    )
    ex = per_key.agg(
        F.count("*").cast("long").alias("exact_union"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("exact_inter"),
    )
    return (
        matches.crossJoin(F.broadcast(uk))
        .crossJoin(F.broadcast(ex))
        .select(
            "matches",
            "union_kth",
            "k_eff",
            F.expr("(matches * 1000000) div k_eff").alias("jaccard_ppm"),
            F.when(
                F.col("k_eff") < _THETA_K, F.col("k_eff").cast("double")
            )
            .otherwise(
                F.round(
                    (F.col("k_eff") - 1).cast("double")
                    * F.lit(_THETA_H60)
                    / F.col("union_kth").cast("double"),
                    4,
                )
            )
            .alias("union_est"),
            F.when(
                F.col("k_eff") < _THETA_K, F.col("matches").cast("double")
            )
            .otherwise(
                F.round(
                    F.col("matches").cast("double")
                    * (F.col("k_eff") - 1).cast("double")
                    * F.lit(_THETA_H60)
                    / (
                        F.col("k_eff").cast("double")
                        * F.col("union_kth").cast("double")
                    ),
                    4,
                )
            )
            .alias("inter_est"),
            "exact_union",
            "exact_inter",
        )
    )


# ---------------------------------------------------------------------------
# nth_value / cume_dist window-surface census
# ---------------------------------------------------------------------------


@register(
    "customer_order_extremes_census",
    """
    WITH c AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    w AS (
      SELECT o_custkey,
             first_value(cents) OVER win AS best,
             nth_value(cents, 2) OVER win AS second,
             CASE WHEN cume_dist() OVER
                    (PARTITION BY o_custkey ORDER BY cents, o_orderkey)
                  <= 0.5 THEN 1 ELSE 0 END AS in_lower_half
      FROM c
      WINDOW win AS (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    ),
    per_cust AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             MAX(best) AS best,
             MAX(COALESCE(second, 0)) AS second,
             CAST(SUM(in_lower_half) AS BIGINT) AS lower_half
      FROM w GROUP BY 1
    )
    SELECT n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(best AS DECIMAL(19,0))) AS BIGINT)
             AS sum_best_cents,
           CAST(SUM(CAST(second AS DECIMAL(19,0))) AS BIGINT)
             AS sum_second_cents,
           CAST(SUM(lower_half) AS BIGINT) AS sum_lower_half
    FROM per_cust GROUP BY 1
    """,
    tags=["W1", "W2", "A7"],
)
def q_customer_order_extremes_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / cume_dist window-surface coverage over HIGH
    cardinality partitions (one per customer — the honest window shape;
    the low-cardinality variants in this repo carry count-collapse
    twins): per customer, the best and second-best order value
    (nth_value over the full frame — the default running frame would
    blind row 1 to its own second) and how many orders sit in the
    customer's lower half by cume_dist (tie-broken totally, so the
    rank/n rational is deterministic; |r/n - 1/2| >= 1/(2n) keeps the
    0.5 comparison away from IEEE rounding). Census by order count,
    sums in exact DECIMAL cents."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    win = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("cents").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cdwin = Window.partitionBy("o_custkey").orderBy("cents", "o_orderkey")
    w = o.select(
        "o_custkey",
        F.first("cents").over(win).alias("best"),
        F.nth_value("cents", 2).over(win).alias("second"),
        F.when(F.cume_dist().over(cdwin) <= 0.5, 1)
        .otherwise(0)
        .alias("in_lower_half"),
    )
    per_cust = w.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.max("best").alias("best"),
        F.max(F.coalesce(F.col("second"), F.lit(0))).alias("second"),
        F.sum("in_lower_half").cast("long").alias("lower_half"),
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("best").cast("decimal(19,0)"))
        .cast("long")
        .alias("sum_best_cents"),
        F.sum(F.col("second").cast("decimal(19,0)"))
        .cast("long")
        .alias("sum_second_cents"),
        F.sum("lower_half").cast("long").alias("sum_lower_half"),
    )


#: hash buckets for the partition-key uniformity screen.
_PK_B = 64
#: candidate keys graded in one pass: (label, Spark SQL value expr,
#: DuckDB value expr). o_totalprice goes through the repo's exact
#: integer-cent recovery so both engines hash the same string.
_PK_KEYS = [
    ("o_custkey", "CAST(o_custkey AS STRING)", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderkey", "CAST(o_orderkey AS STRING)", "CAST(o_orderkey AS VARCHAR)"),
    (
        "o_price_cents",
        "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING)",
        "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)",
    ),
]


def _sql_pk_uniformity() -> str:
    parts = []
    for label, _sexpr, dexpr in _PK_KEYS:
        h = _h60_duck(f"'pk|{label}|' || {dexpr}")
        parts.append(
            f"      SELECT '{label}' AS key_name, "
            f"{h} % {_PK_B} AS bucket FROM orders"
        )
    branches = "\n      UNION ALL\n".join(parts)
    return f"""
    WITH buckets AS (
{branches}
    ),
    census AS (
      SELECT key_name, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM buckets GROUP BY 1, 2
    ),
    withtot AS (
      SELECT key_name, n,
             SUM(n) OVER (PARTITION BY key_name) AS total_rows
      FROM census
    ),
    graded AS (
      SELECT key_name,
             CAST(COUNT(*) AS BIGINT) AS nonempty_buckets,
             CAST(MAX(total_rows) AS BIGINT) AS total_rows,
             SUM(CAST({_PK_B} * n - total_rows AS DECIMAL(19,0))
                 * CAST({_PK_B} * n - total_rows AS DECIMAL(19,0)))
               AS chi2_num,
             MAX(n) AS max_bucket
      FROM withtot GROUP BY 1
    )
    SELECT key_name, nonempty_buckets, total_rows,
           ROUND(CAST(chi2_num AS DOUBLE)
                 / CAST({_PK_B} * total_rows AS DOUBLE), 4) AS chi2,
           ROUND(CAST({_PK_B} * max_bucket AS DOUBLE)
                 / CAST(total_rows AS DOUBLE), 4) AS max_skew
    FROM graded
    """


@register(
    "orders_partition_key_uniformity",
    _sql_pk_uniformity(),
    tags=["A1", "A7", "scale"],
)
def q_orders_partition_key_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key uniformity screen — the pre-flight check before
    choosing a 100 TB shuffle/bucketing key: for each candidate key,
    hash rows into 64 buckets and grade the placement with a scaled
    chi-square against uniform (sum of (B*n_b - N)^2 in exact DECIMAL,
    ONE trailing division by B*N) and the max-bucket skew factor
    (worst bucket / ideal bucket — the straggler multiplier a shuffle
    on this key would suffer). All three candidates are graded in one
    scan via an exploded (key_name, bucket) projection.

    Scale: per-row work is codegen hash math; the census collapses to
    keys x 64 rows with map-side partials; the grade is a window-free
    second collapse (the oracle uses a window for the same sum — the
    engine side keeps the two-aggregate shape). The DECIMAL(19,0)
    squares keep (B*n - N)^2 exact past bigint range (N ~ 1e10 at
    100 TB would wrap a BIGINT square)."""
    o = T(spark, sf_dir, "orders")
    structs = [
        F.struct(
            F.lit(label).alias("key_name"),
            F.expr(
                _h60_spark(f"concat('pk|{label}|', {sexpr})") + f" % {_PK_B}"
            ).alias("bucket"),
        )
        for label, sexpr, _dexpr in _PK_KEYS
    ]
    buckets = o.select(
        F.explode(F.array(*structs)).alias("kb")
    ).select("kb.key_name", "kb.bucket")
    census = buckets.groupBy("key_name", "bucket").agg(F.count("*").alias("n"))
    totals = census.groupBy("key_name").agg(
        F.count("*").alias("nonempty_buckets"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_bucket"),
    )
    graded = census.join(F.broadcast(totals), "key_name")
    dev = F.expr(
        f"CAST({_PK_B} * n - total_rows AS DECIMAL(19,0))"
    )
    return (
        graded.groupBy(
            "key_name", "nonempty_buckets", "total_rows", "max_bucket"
        )
        .agg(F.sum(dev * dev).alias("chi2_num"))
        .select(
            "key_name",
            "nonempty_buckets",
            F.col("total_rows").cast("long").alias("total_rows"),
            F.round(
                F.col("chi2_num").cast("double")
                / (F.lit(_PK_B) * F.col("total_rows")).cast("double"),
                4,
            ).alias("chi2"),
            F.round(
                (F.lit(_PK_B) * F.col("max_bucket")).cast("double")
                / F.col("total_rows").cast("double"),
                4,
            ).alias("max_skew"),
        )
    )


# ---------------------------------------------------------------------------
# KMV shard-overlap matrix (vocabulary Jaccard between sources)
# ---------------------------------------------------------------------------

_VOC_K = 32
_TWO60 = float(2**60)


def _sql_vocab_overlap() -> str:
    h = _h60_duck("'vocab|' || tok")
    return f"""
    WITH toks AS (
      SELECT DISTINCT source, UNNEST(regexp_split_to_array(trim(text), '\\s+'))
               AS tok
      FROM documents
    ),
    skf AS (SELECT DISTINCT source, {h} AS h FROM toks),
    sk AS (
      SELECT source, h FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        FROM skf
      ) WHERE rk <= {_VOC_K}
    ),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb
      FROM (SELECT DISTINCT source FROM sk) a
      JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
    ),
    urows AS (
      SELECT DISTINCT sa, sb, h FROM (
        SELECT p.sa, p.sb, k.h FROM pairs p JOIN sk k ON k.source = p.sa
        UNION ALL
        SELECT p.sa, p.sb, k.h FROM pairs p JOIN sk k ON k.source = p.sb
      )
    ),
    u32 AS (
      SELECT sa, sb, h FROM (
        SELECT sa, sb, h,
               row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
        FROM urows
      ) WHERE rk <= {_VOC_K}
    ),
    graded AS (
      SELECT u.sa, u.sb,
             CAST(COUNT(*) AS BIGINT) AS k_eff,
             MAX(u.h) AS union_kth,
             CAST(SUM(CASE WHEN ia.h IS NOT NULL AND ib.h IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS matches
      FROM u32 u
      LEFT JOIN sk ia ON ia.source = u.sa AND ia.h = u.h
      LEFT JOIN sk ib ON ib.source = u.sb AND ib.h = u.h
      GROUP BY 1, 2
    ),
    per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM skf GROUP BY 1),
    exact_i AS (
      SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS inter
      FROM skf a JOIN skf b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT g.sa AS source_a, g.sb AS source_b, g.k_eff, g.union_kth, g.matches,
           (g.matches * 1000000) // g.k_eff AS jaccard_ppm,
           ROUND(CAST(g.k_eff - 1 AS DOUBLE) * {_TWO60!r}
                 / CAST(g.union_kth AS DOUBLE), 4) AS union_est,
           ROUND(CAST(g.matches * (g.k_eff - 1) AS DOUBLE) * {_TWO60!r}
                 / (CAST(g.k_eff AS DOUBLE) * CAST(g.union_kth AS DOUBLE)),
                 4) AS inter_est,
           COALESCE(ei.inter, 0) AS exact_inter,
           pa.n + pb.n - COALESCE(ei.inter, 0) AS exact_union,
           (COALESCE(ei.inter, 0) * 1000000)
             // (pa.n + pb.n - COALESCE(ei.inter, 0)) AS exact_jaccard_ppm
    FROM graded g
    JOIN per_src pa ON pa.source = g.sa
    JOIN per_src pb ON pb.source = g.sb
    LEFT JOIN exact_i ei ON ei.sa = g.sa AND ei.sb = g.sb
    """


@register(
    "docs_vocab_overlap_matrix",
    _sql_vocab_overlap(),
    tags=["A7", "scale", "sketch", "llm"],
)
def q_docs_vocab_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shard-similarity matrix from KMV sketches: each source's
    vocabulary collapses to its bottom-32 token hashes, and every pair's
    union/intersection/Jaccard is estimated from the two 32-number
    sketches alone — the shard-planning primitive ("which corpus shards
    are near-copies / which are disjoint?") answered WITHOUT the
    all-pairs token join. Exact per-pair overlap rides along (the h-key
    equi-join fans out at most |sources| per hash — catalog-bounded).

    Scale: the per-source bottom-k runs as a rank window whose filter
    Spark pushes below the exchange (WindowGroupLimit — map tasks ship
    <= k rows per source, the docs_stratified_sample pattern); the
    per-pair union re-rank windows are 2k-row partitions by
    construction. Estimates: exact-int arithmetic scaled by 2^60
    (a pure exponent shift — exact in IEEE), one rounded product, one
    division."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(tokens("text")).alias("tok")
    ).distinct()
    h = F.expr(_h60_spark("concat('vocab|', tok)"))
    skf = toks.select("source", h.alias("h")).distinct()
    rk = F.row_number().over(Window.partitionBy("source").orderBy("h"))
    sk = skf.withColumn("rk", rk).filter(F.col("rk") <= _VOC_K).drop("rk")
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .crossJoin(srcs.select(F.col("source").alias("sb")))
        .filter(F.col("sa") < F.col("sb"))
    )
    ska = sk.select(F.col("source").alias("sa"), "h")
    skb = sk.select(F.col("source").alias("sb"), "h")
    urows = (
        pairs.join(F.broadcast(ska), "sa")
        .select("sa", "sb", "h")
        .unionByName(pairs.join(F.broadcast(skb), "sb").select("sa", "sb", "h"))
        .distinct()
    )
    urk = F.row_number().over(Window.partitionBy("sa", "sb").orderBy("h"))
    u32 = urows.withColumn("rk", urk).filter(F.col("rk") <= _VOC_K).drop("rk")
    ia = ska.withColumn("in_a", F.lit(1))
    ib = skb.withColumn("in_b", F.lit(1))
    flagged = (
        u32.join(F.broadcast(ia), ["sa", "h"], "left")
        .join(F.broadcast(ib), ["sb", "h"], "left")
        .select(
            "sa",
            "sb",
            "h",
            F.when(
                F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1
            )
            .otherwise(0)
            .alias("both"),
        )
    )
    g = flagged.groupBy("sa", "sb").agg(
        F.count("*").cast("long").alias("k_eff"),
        F.max("h").alias("union_kth"),
        F.sum("both").cast("long").alias("matches"),
    )
    per_src = skf.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    exact_i = (
        skf.select(F.col("source").alias("sa"), "h")
        .join(skf.select(F.col("source").alias("sb"), "h"), "h")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    pa = per_src.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    pb = per_src.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    out = (
        g.join(F.broadcast(pa), "sa")
        .join(F.broadcast(pb), "sb")
        .join(F.broadcast(exact_i), ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "k_eff",
            "union_kth",
            "matches",
            F.expr("(matches * 1000000) div k_eff").alias("jaccard_ppm"),
            F.round(
                (F.col("k_eff") - 1).cast("double")
                * F.lit(_TWO60)
                / F.col("union_kth").cast("double"),
                4,
            ).alias("union_est"),
            F.round(
                (F.col("matches") * (F.col("k_eff") - 1)).cast("double")
                * F.lit(_TWO60)
                / (
                    F.col("k_eff").cast("double")
                    * F.col("union_kth").cast("double")
                ),
                4,
            ).alias("inter_est"),
            F.coalesce(F.col("inter"), F.lit(0)).cast("long").alias("exact_inter"),
            (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0)))
            .cast("long")
            .alias("exact_union"),
            F.expr(
                "(coalesce(inter, 0) * 1000000)"
                " div (na + nb - coalesce(inter, 0))"
            ).alias("exact_jaccard_ppm"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# sliding-window HLL: 7-day distinct users by register merge
# ---------------------------------------------------------------------------


def _sql_sliding_hll() -> str:
    h = _h60_duck("'hlld|' || CAST(user_id AS VARCHAR)")
    two53 = 2**_HLL_RMAX
    return f"""
    WITH r AS (
      SELECT CAST(ts AS DATE) AS day,
             {h} & 255 AS register,
             CASE WHEN ({h} >> 8) = 0 THEN {_HLL_RMAX}
                  ELSE {_HLL_RMAX} - length(bin({h} >> 8)) END AS rho,
             user_id
      FROM events
    ),
    day_regs AS (
      SELECT day, register, MAX(rho) AS m_val FROM r GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM r),
    spread AS (
      SELECT day + CAST(off AS INT) AS window_day, register, m_val
      FROM day_regs, (SELECT CAST(range AS INT) AS off FROM range(7))
    ),
    merged AS (
      SELECT s.window_day, s.register, MAX(s.m_val) AS m_val
      FROM spread s JOIN days d ON s.window_day = d.day
      GROUP BY 1, 2
    ),
    est AS (
      SELECT window_day,
             ROUND({_HLL_NUM!r}
                   / CAST(SUM(1::BIGINT << ({_HLL_RMAX} - m_val))
                          + ({_HLL_M} - COUNT(*)) * {two53}::BIGINT AS DOUBLE),
                   4) AS hll_estimate
      FROM merged GROUP BY 1
    ),
    du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    exact AS (
      SELECT s.window_day, CAST(COUNT(DISTINCT s.user_id) AS BIGINT)
               AS exact_distinct
      FROM (
        SELECT day + CAST(off AS INT) AS window_day, user_id
        FROM du, (SELECT CAST(range AS INT) AS off FROM range(7))
      ) s JOIN days d ON s.window_day = d.day
      GROUP BY 1
    )
    SELECT strftime(est.window_day, '%Y-%m-%d') AS window_day,
           est.hll_estimate, exact.exact_distinct
    FROM est JOIN exact ON est.window_day = exact.window_day
    """


@register(
    "events_sliding_hll_distinct_users",
    _sql_sliding_hll(),
    tags=["A4", "W1", "scale", "sketch", "streaming-twin"],
)
def q_events_sliding_hll_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing-7-day distinct users per day, computed by HLL register
    MERGE instead of re-deduplicating each window: one register table
    per day (<=256 rows/day forever), each day's table spread to the 7
    window-days it serves, MAX-merged per (window_day, register). The
    exact windowed distinct rides along for honesty.

    Scale: THE sliding-distinct shape — the naive form re-shuffles 7
    days of raw user ids per window-day (7x the corpus through every
    window); this form shuffles days x 256 registers, full stop. The
    same register tables serve 30-day windows, month rollups, and the
    lifetime count without touching raw data again (mergeability,
    proven in orders_hll_monthly_union and the streaming foreachBatch
    parity test)."""
    e = events_table(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    h = F.expr(_h60_spark("concat('hlld|', CAST(user_id AS STRING))"))
    rest = F.shiftright(h, 8)
    rho = (
        F.when(rest == 0, F.lit(_HLL_RMAX))
        .otherwise(F.lit(_HLL_RMAX) - F.length(F.conv(rest, 10, 2)))
        .cast("int")
    )
    rows = e.select(
        "day", h.bitwiseAND(F.lit(255)).alias("register"), rho.alias("rho")
    )
    day_regs = rows.groupBy("day", "register").agg(F.max("rho").alias("m_val"))
    days = rows.select("day").distinct()
    off = F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    spread = day_regs.select("day", "register", "m_val", off).select(
        F.date_add("day", F.col("off")).alias("window_day"),
        "register",
        "m_val",
    )
    merged = (
        spread.join(
            F.broadcast(days.withColumnRenamed("day", "window_day")),
            "window_day",
        )
        .groupBy("window_day", "register")
        .agg(F.max("m_val").alias("m_val"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - m_val)")
    est = merged.groupBy("window_day").agg(
        F.round(
            F.lit(_HLL_NUM)
            / (
                F.sum(term)
                + (F.lit(_HLL_M) - F.count("*")) * F.lit(2**_HLL_RMAX)
            ).cast("double"),
            4,
        ).alias("hll_estimate")
    )
    du = e.distinct()
    exact = (
        du.select("day", "user_id", off)
        .select(F.date_add("day", F.col("off")).alias("window_day"), "user_id")
        .join(
            F.broadcast(days.withColumnRenamed("day", "window_day")),
            "window_day",
        )
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return est.join(exact, "window_day").select(
        F.date_format("window_day", "yyyy-MM-dd").alias("window_day"),
        "hll_estimate",
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# HDR histogram: log2 buckets x 8 linear sub-buckets, pure integer
# ---------------------------------------------------------------------------

#: shift making every balance-cents value >= 1 (c_acctbal >= -999.99 by
#: TPC-H spec; the shift is part of the bucket definition, removed on
#: output).
_HDR_SHIFT = 100_000


def _sql_hdr_histogram() -> str:
    return f"""
    WITH v AS (
      SELECT c_mktsegment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_HDR_SHIFT} AS v,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    b AS (
      SELECT c_mktsegment, cents, v,
             length(bin(v)) AS e,
             (1::BIGINT << (length(bin(v)) - 1)) AS base
      FROM v
    ),
    bk AS (
      SELECT c_mktsegment, cents,
             e, ((v - base) * 8) // base AS sub, base
      FROM b
    ),
    census AS (
      SELECT c_mktsegment, e, sub, base,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM bk GROUP BY 1, 2, 3, 4
    ),
    cum AS (
      SELECT c_mktsegment, e, sub, base, n,
             SUM(n) OVER (PARTITION BY c_mktsegment ORDER BY e, sub
                          ROWS UNBOUNDED PRECEDING) AS cum_n,
             SUM(n) OVER (PARTITION BY c_mktsegment) AS total_n
      FROM census
    ),
    med AS (
      SELECT c_mktsegment,
             CAST(MAX(total_n) AS BIGINT) AS n_customers,
             CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
             MIN(CASE WHEN cum_n >= (total_n + 1) // 2
                      THEN base + (sub * base) // 8 END) AS med_lo_v,
             MIN(CASE WHEN cum_n >= (total_n + 1) // 2
                      THEN base + ((sub + 1) * base) // 8 END) AS med_hi_v
      FROM cum GROUP BY 1
    ),
    exact AS (
      SELECT c_mktsegment,
             MIN(CASE WHEN cum_c >= (total_c + 1) // 2 THEN cents END)
               AS exact_median_cents
      FROM (
        SELECT c_mktsegment, cents,
               SUM(cnt) OVER (PARTITION BY c_mktsegment ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum_c,
               SUM(cnt) OVER (PARTITION BY c_mktsegment) AS total_c
        FROM (SELECT c_mktsegment, cents, COUNT(*) AS cnt
              FROM v GROUP BY 1, 2)
      ) GROUP BY 1
    )
    SELECT med.c_mktsegment, med.n_customers, med.n_buckets_used,
           med.med_lo_v - {_HDR_SHIFT} AS median_lo_cents,
           med.med_hi_v - {_HDR_SHIFT} AS median_hi_cents,
           exact.exact_median_cents
    FROM med JOIN exact USING (c_mktsegment)
    """


@register(
    "customer_hdr_balance_histogram",
    _sql_hdr_histogram(),
    tags=["A7", "W2", "scale", "sketch"],
)
def q_customer_hdr_balance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram quantiles: balances bucket into log2 exponent x 8
    linear sub-buckets (pure integer bit math — the DETERMINISTIC
    quantile sketch, unlike t-digest/KLL whose merge order leaks into
    the result), and the per-segment median is read off the cumulative
    bucket census. The hash-checked row carries the bucket's [lo, hi)
    bounds AND the exact lower median, so the sketch's containment
    guarantee (lo <= exact < hi, relative error <= 1/8) is visible in
    the verified data.

    Scale: the histogram is <= 64*8 counters per group regardless of
    rows (map-side combinable +). The cumulative windows run over the
    BUCKET domain (<=168 rows/segment) and, for the exact twin, over
    the collapsed cents domain (bounded by the 1.1M-value balance
    range, not row count — the count-collapse discipline)."""
    c = T(spark, sf_dir, "customer").select(
        "c_mktsegment",
        (F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("cents"),
    )
    v = c.withColumn("v", F.col("cents") + _HDR_SHIFT)
    e = F.length(F.conv(F.col("v"), 10, 2))
    b = v.withColumn("e", e).withColumn(
        "base", F.expr("shiftleft(CAST(1 AS BIGINT), e - 1)")
    )
    bk = b.withColumn("sub", F.expr("((v - base) * 8) div base"))
    census = bk.groupBy("c_mktsegment", "e", "sub", "base").agg(
        F.count("*").alias("n")
    )
    wcum = (
        Window.partitionBy("c_mktsegment")
        .orderBy("e", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("c_mktsegment")
    cum = census.select(
        "c_mktsegment",
        "e",
        "sub",
        "base",
        "n",
        F.sum("n").over(wcum).alias("cum_n"),
        F.sum("n").over(wtot).alias("total_n"),
    )
    target = F.expr("(total_n + 1) div 2")
    med = cum.groupBy("c_mktsegment").agg(
        F.max("total_n").cast("long").alias("n_customers"),
        F.count("*").cast("long").alias("n_buckets_used"),
        F.min(
            F.when(
                F.col("cum_n") >= target,
                F.expr("base + (sub * base) div 8"),
            )
        ).alias("med_lo_v"),
        F.min(
            F.when(
                F.col("cum_n") >= target,
                F.expr("base + ((sub + 1) * base) div 8"),
            )
        ).alias("med_hi_v"),
    )
    collapsed = c.groupBy("c_mktsegment", "cents").agg(F.count("*").alias("cnt"))
    wc = (
        Window.partitionBy("c_mktsegment")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ecum = collapsed.select(
        "c_mktsegment",
        "cents",
        F.sum("cnt").over(wc).alias("cum_c"),
        F.sum("cnt").over(wtot).alias("total_c"),
    )
    exact = ecum.groupBy("c_mktsegment").agg(
        F.min(
            F.when(
                F.col("cum_c") >= F.expr("(total_c + 1) div 2"), F.col("cents")
            )
        ).alias("exact_median_cents")
    )
    return med.join(exact, "c_mktsegment").select(
        "c_mktsegment",
        "n_customers",
        "n_buckets_used",
        (F.col("med_lo_v") - _HDR_SHIFT).alias("median_lo_cents"),
        (F.col("med_hi_v") - _HDR_SHIFT).alias("median_hi_cents"),
        "exact_median_cents",
    )


# ---------------------------------------------------------------------------
# range-partition planner: repartitionByRange boundaries, exactly
# ---------------------------------------------------------------------------

_RP_B = 8


def _sql_range_plan() -> str:
    return f"""
    WITH collapsed AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT cents, cnt,
             SUM(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS c,
             SUM(cnt) OVER () AS n
      FROM collapsed
    ),
    bounds AS (
      SELECT i, MIN(cents) AS boundary
      FROM cum, (SELECT CAST(range AS BIGINT) + 1 AS i FROM range({_RP_B - 1}))
      WHERE c >= (i * n + {_RP_B - 1}) // {_RP_B}
      GROUP BY i
    ),
    barr AS (SELECT list(boundary ORDER BY boundary) AS bl FROM bounds),
    assigned AS (
      SELECT 1 + len(list_filter(bl, x -> cents > x)) AS partition_idx,
             cents, cnt
      FROM collapsed, barr
    )
    SELECT partition_idx,
           CAST(SUM(cnt) AS BIGINT) AS n_rows_load,
           MIN(cents) AS lo_cents,
           MAX(cents) AS hi_cents,
           CAST((SUM(cnt) * {_RP_B} * 1000000)
                // (SELECT SUM(cnt) FROM collapsed) AS BIGINT)
             AS load_ppm_of_ideal
    FROM assigned GROUP BY 1
    """


@register(
    "lineitem_range_partition_plan",
    _sql_range_plan(),
    tags=["O1", "scale", "layout"],
)
def q_lineitem_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartitionByRange's planning step made explicit and EXACT: the
    7 boundaries that split lineitem prices into 8 balanced ranges,
    derived from the count-collapsed value domain by cumulative-count
    rank selection (Spark's RangePartitioner SAMPLES to approximate
    this; at 100 TB a skewed sample misplaces boundaries and a 2x-hot
    partition follows — this operator computes the true boundaries and
    grades the resulting loads in ppm of ideal). Each output row is one
    target partition with its exact load and range.

    Scale: the only single-partition window runs AFTER the collapse,
    over distinct price values (bounded by the cents DOMAIN, ~11M
    possible values, not by row count — the
    events_dwell_deciles_distributed discipline). Boundary selection
    is a 7-row spine against the collapsed table; assignment is a
    7-element broadcast array filter in codegen."""
    li = T(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    collapsed = li.groupBy("cents").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = collapsed.select(
        "cents",
        "cnt",
        F.sum("cnt").over(wcum).alias("c"),
    ).crossJoin(
        F.broadcast(collapsed.agg(F.sum("cnt").alias("n")))
    )
    spine = spark.range(1, _RP_B).select(F.col("id").alias("i"))
    bounds = (
        cum.crossJoin(F.broadcast(spine))
        .filter(F.col("c") >= F.expr(f"(i * n + {_RP_B - 1}) div {_RP_B}"))
        .groupBy("i")
        .agg(F.min("cents").alias("boundary"))
    )
    barr = bounds.agg(
        F.sort_array(F.collect_list("boundary")).alias("bl")
    )
    assigned = collapsed.crossJoin(F.broadcast(barr)).select(
        F.expr("1 + size(filter(bl, x -> cents > x))").alias("partition_idx"),
        "cents",
        "cnt",
    )
    total = collapsed.agg(F.sum("cnt").alias("n_total"))
    return (
        assigned.groupBy("partition_idx")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows_load"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "partition_idx",
            "n_rows_load",
            "lo_cents",
            "hi_cents",
            F.expr(
                f"(n_rows_load * {_RP_B} * 1000000) div n_total"
            ).alias("load_ppm_of_ideal"),
        )
    )


# ---------------------------------------------------------------------------
# AMS (F2) sketch: self-join size, the join planner's statistic
# ---------------------------------------------------------------------------

#: 9 independent +/-1 sign hashes; the F2 estimate is the MEDIAN of the
#: squared counters (median beats mean for the standard AMS variance
#: bound, and "5th smallest of 9 integers" is exactly computable).
_AMS_D = 9


def _sql_ams_f2() -> str:
    h = _h60_duck("'ams' || CAST(j AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR)")
    return f"""
    WITH ex AS (
      SELECT l_partkey, CAST(range AS INT) AS j FROM lineitem, range({_AMS_D})
    ),
    counters AS (
      SELECT j, CAST(SUM(CASE WHEN ({h} & 1) = 1 THEN 1 ELSE -1 END)
                     AS BIGINT) AS counter
      FROM ex GROUP BY 1
    ),
    ests AS (
      SELECT j, counter,
             CAST(counter AS DECIMAL(19,0)) * CAST(counter AS DECIMAL(19,0))
               AS est
      FROM counters
    ),
    med AS (
      SELECT CAST(est AS DOUBLE) AS f2_estimate FROM (
        SELECT est, row_number() OVER (ORDER BY est, j) AS rk FROM ests
      ) WHERE rk = {(_AMS_D + 1) // 2}
    ),
    exact AS (
      SELECT CAST(CAST(SUM(CAST(cnt AS DECIMAL(19,0))
                           * CAST(cnt AS DECIMAL(19,0)))
                       AS DECIMAL(38,0)) AS DOUBLE)
               AS f2_exact
      FROM (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY 1)
    )
    SELECT e.j, e.counter, CAST(e.est AS DOUBLE) AS est_j,
           med.f2_estimate, exact.f2_exact,
           CAST(FLOOR(ABS(med.f2_estimate - exact.f2_exact) * 1000000.0
                      / exact.f2_exact) AS BIGINT) AS err_ppm
    FROM ests e, med, exact
    """


@register(
    "lineitem_ams_f2_sketch",
    _sql_ams_f2(),
    tags=["A4", "A7", "scale", "sketch"],
)
def q_lineitem_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment sketch: F2 = sum of squared key frequencies of
    l_partkey — the SELF-JOIN SIZE, the statistic a join planner needs
    before committing to a shuffle strategy. Nine +/-1 sign-hash
    counters (each a plain conditional SUM — map-side combinable: + is
    the AMS merge), estimate = median of the squared counters (the 5th
    smallest of 9 integers — exactly computable, no expectation math),
    exact F2 and the integer-ppm error beside it.

    Scale: per-row work is one hash bit per sign function; the sketch
    is 9 integers regardless of data; squares and the exact F2 go
    through DECIMAL(19,0)^2 -> DECIMAL(38,0) (counters reach 1e12 at
    100 TB and their squares wrap any BIGINT). Completes the moment
    family: F0 = HLL/KMV, F1 = COUNT, F2 = AMS."""
    li = fan_out(T(spark, sf_dir, "lineitem").select("l_partkey"))
    # round 14 (guide §2.3/§2.4): the 9 sign counters come from ONE
    # conditional-sum pass — the previous explode(array(0..8)) pushed
    # 9x the rows through a hashpartitioning exchange to compute the
    # same 9 md5s per input row; here each row evaluates its 9 sign
    # hashes in a single codegen projection and the global aggregate
    # ships 9 longs per task. Identical grouping, identical md5 inputs
    # (j is a literal in the concat), bit-identical counters.
    def sign(j: int) -> F.Column:
        h = F.expr(
            _h60_spark(f"concat('ams', '{j}', '|', CAST(l_partkey AS STRING))")
        )
        return F.when(h.bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    wide = li.agg(
        *[F.sum(sign(j)).cast("long").alias(f"c{j}") for j in range(_AMS_D)]
    )
    counters = wide.select(
        F.expr(
            "stack("
            + str(_AMS_D)
            + ", "
            + ", ".join(f"{j}, c{j}" for j in range(_AMS_D))
            + ") AS (j, counter)"
        )
    ).select(F.col("j").cast("int").alias("j"), "counter").where(
        # empty-input shape parity (ADVICE r14 #4): a global agg over
        # zero rows yields one all-NULL row, so stack() would emit 9
        # NULL counters where the old groupBy formulation emitted zero
        # rows; on any non-empty input every counter is non-NULL, so
        # this filter is a no-op there.
        F.col("counter").isNotNull()
    )
    ests = counters.select(
        "j",
        "counter",
        (
            F.col("counter").cast("decimal(19,0)")
            * F.col("counter").cast("decimal(19,0)")
        ).alias("est"),
    )
    rk = F.row_number().over(Window.orderBy("est", "j"))
    med = (
        ests.withColumn("rk", rk)
        .filter(F.col("rk") == (_AMS_D + 1) // 2)
        .select(F.col("est").cast("double").alias("f2_estimate"))
    )
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.sum(
                F.col("cnt").cast("decimal(19,0)")
                * F.col("cnt").cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .cast("double")
            .alias("f2_exact")
        )
    )
    # ACCUMULATION is exact DECIMAL(38,0) (counters reach 1e12 at
    # 100 TB and their squares wrap any BIGINT); the OUTPUT renders the
    # exact accumulator as DOUBLE (ADVICE r13 #1: the former BIGINT
    # output cast would itself wrap to null at that scale — a double
    # loses ulps past 2^53 but never nulls, and both engines render the
    # same round-to-nearest value). err_ppm is pure IEEE arithmetic.
    return (
        ests.select(
            "j", "counter", F.col("est").cast("double").alias("est_j")
        )
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(exact))
        .withColumn(
            "err_ppm",
            F.expr(
                "CAST(FLOOR(ABS(f2_estimate - f2_exact) * 1000000.0"
                " / f2_exact) AS BIGINT)"
            ),
        )
    )


# ---------------------------------------------------------------------------
# count-min dot product: two-sided join-size estimation
# ---------------------------------------------------------------------------

_JS_D, _JS_W = 3, 64


def _sql_join_size_sketch() -> str:
    def cell(key: str) -> str:
        h = _h60_duck(f"'js' || CAST(j AS VARCHAR) || '|' || CAST({key} AS VARCHAR)")
        return f"{h} % {_JS_W}"

    return f"""
    WITH a AS (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    b AS (
      SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.05
    ),
    ca AS (
      SELECT j, {cell('o_orderkey')} AS c, CAST(COUNT(*) AS BIGINT) AS n
      FROM a, (SELECT CAST(range AS INT) AS j FROM range({_JS_D}))
      GROUP BY 1, 2
    ),
    cb AS (
      SELECT j, {cell('l_orderkey')} AS c, CAST(COUNT(*) AS BIGINT) AS n
      FROM b, (SELECT CAST(range AS INT) AS j FROM range({_JS_D}))
      GROUP BY 1, 2
    ),
    dots AS (
      SELECT ca.j,
             CAST(SUM(CAST(ca.n AS DECIMAL(19,0)) * CAST(cb.n AS DECIMAL(19,0)))
                  AS BIGINT) AS est_j
      FROM ca JOIN cb ON ca.j = cb.j AND ca.c = cb.c
      GROUP BY 1
    ),
    best AS (SELECT MIN(est_j) AS join_size_est FROM dots),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS join_size_exact
      FROM a JOIN b ON a.o_orderkey = b.l_orderkey
    )
    SELECT d.j, d.est_j, best.join_size_est, exact.join_size_exact,
           ((best.join_size_est - exact.join_size_exact) * 1000000)
             // exact.join_size_exact AS overcount_ppm
    FROM dots d, best, exact
    """


@register(
    "orders_lineitem_join_size_sketch",
    _sql_join_size_sketch(),
    tags=["J2", "A7", "scale", "sketch"],
)
def q_orders_lineitem_join_size_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-sided join-size estimation by count-min dot product: sketch
    urgent orders and discounted lineitems separately (3x64 counters
    each), estimate |A JOIN B| as the per-row dot product minimized
    over depth, and grade against the exact join count. The estimate is
    structurally an overcount (collisions only add), so overcount_ppm
    >= 0 is part of the verified data.

    Scale: THE pre-shuffle cardinality question ("can the join output
    fit / which side to broadcast") answered from two fixed-size
    sketches built in one groupBy each — the sides never meet until the
    planner has the number. Products in DECIMAL (counts reach 1e12 at
    100 TB; their products wrap BIGINT). The exact join rides along
    only to grade the sketch."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    a = fan_out(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    )
    b = fan_out(
        li.filter(F.col("l_discount") >= 0.05).select("l_orderkey")
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(_JS_D)])).alias("j")

    def cells(df: DataFrame, key: str) -> DataFrame:
        c = F.expr(
            _h60_spark(f"concat('js', CAST(j AS STRING), '|', CAST({key} AS STRING))")
            + f" % {_JS_W}"
        )
        return (
            df.select(key, js)
            .select("j", c.alias("c"))
            .groupBy("j", "c")
            .agg(F.count("*").alias("n"))
        )

    ca, cb = cells(a, "o_orderkey"), cells(b, "l_orderkey")
    dots = (
        ca.join(cb.withColumnsRenamed({"n": "nb"}), ["j", "c"])
        .groupBy("j")
        .agg(
            F.sum(
                F.col("n").cast("decimal(19,0)") * F.col("nb").cast("decimal(19,0)")
            )
            .cast("long")
            .alias("est_j")
        )
    )
    best = dots.agg(F.min("est_j").alias("join_size_est"))
    exact = a.join(b, a.o_orderkey == b.l_orderkey).agg(
        F.count("*").cast("long").alias("join_size_exact")
    )
    return (
        dots.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(exact))
        .withColumn(
            "overcount_ppm",
            F.expr(
                "((join_size_est - join_size_exact) * 1000000)"
                " div join_size_exact"
            ),
        )
    )


# ---------------------------------------------------------------------------
# deterministic hash-sample calibration (approximate query processing)
# ---------------------------------------------------------------------------

_SMP_MOD = 64


def _sql_sample_calibration() -> str:
    h = _h60_duck(
        "'smp|' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
    )
    return f"""
        WITH flagged AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
             (CAST(CONCAT('0x', substr(md5('smp|' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT) % 64 = 0) AS picked
      FROM lineitem
    ),
    g AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS exact_rows,
             CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
             CAST(SUM(qty_c) AS BIGINT) AS exact_qty_cents,
             CAST(SUM(CASE WHEN picked THEN qty_c ELSE 0 END) AS BIGINT)
               AS sampled_qty_cents
      FROM flagged GROUP BY 1
    )
    SELECT l_returnflag, n_sampled, exact_rows,
           n_sampled * 64 AS est_rows,
           (ABS(n_sampled * 64 - exact_rows) * 1000000)
             // exact_rows AS row_err_ppm,
           sampled_qty_cents * 64 AS est_qty_cents,
           exact_qty_cents,
           (ABS(sampled_qty_cents * 64 - exact_qty_cents) * 1000000)
             // exact_qty_cents AS qty_err_ppm
    FROM g
    """


@register(
    "lineitem_hash_sample_calibration",
    _sql_sample_calibration(),
    tags=["A1", "A7", "scale", "sketch"],
)
def q_lineitem_hash_sample_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate query processing, calibrated: a deterministic 1/64
    hash sample (salted md5 of the row key — stable under re-runs and
    re-partitioning, unlike TABLESAMPLE/rand()) scaled up against the
    exact per-flag row counts and quantity masses, with integer-ppm
    errors IN the hash-checked result. This is the honest form of
    sample-accelerated dashboards: the sample definition is part of the
    data contract, and its calibration is regression-tested like any
    operator.

    Scale: the sample predicate is a codegen hash test in the scan
    projection; one aggregation computes sampled and exact sides
    together (conditional aggregates, no second scan). Quantities recover to
    exact integer cents (the repo-wide float discipline); every number
    in the row is BIGINT arithmetic — zero float anywhere."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_c"),
        (
            F.expr(
                _h60_spark(
                    "concat('smp|', CAST(l_orderkey AS STRING), ':',"
                    " CAST(l_linenumber AS STRING))"
                )
                + f" % {_SMP_MOD}"
            )
            == 0
        ).alias("picked"),
    )
    g = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("exact_rows"),
        F.sum(F.when(F.col("picked"), 1).otherwise(0))
        .cast("long")
        .alias("n_sampled"),
        F.sum("qty_c").cast("long").alias("exact_qty_cents"),
        F.sum(F.when(F.col("picked"), F.col("qty_c")).otherwise(0))
        .cast("long")
        .alias("sampled_qty_cents"),
    )
    return g.select(
        "l_returnflag",
        "n_sampled",
        "exact_rows",
        (F.col("n_sampled") * _SMP_MOD).alias("est_rows"),
        F.expr(
            f"(ABS(n_sampled * {_SMP_MOD} - exact_rows) * 1000000)"
            " div exact_rows"
        ).alias("row_err_ppm"),
        (F.col("sampled_qty_cents") * _SMP_MOD).alias("est_qty_cents"),
        "exact_qty_cents",
        F.expr(
            f"(ABS(sampled_qty_cents * {_SMP_MOD} - exact_qty_cents)"
            " * 1000000) div exact_qty_cents"
        ).alias("qty_err_ppm"),
    )


# ---------------------------------------------------------------------------
# grouping_id / GROUPING() surface (CUBE with a genuinely-NULL dimension)
# ---------------------------------------------------------------------------


@register(
    "orders_grouping_id_matrix",
    """
    WITH o AS (
      SELECT o_orderpriority,
             CASE WHEN o_totalprice >= 200000 THEN 'JUMBO'
                  WHEN o_totalprice >= 100000 THEN 'LARGE'
                  ELSE NULL END AS band,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderpriority, band,
           CAST(GROUPING(o_orderpriority, band) AS BIGINT) AS gid,
           CAST(GROUPING(band) AS BIGINT) AS band_is_subtotal,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS price_cents
    FROM o GROUP BY CUBE (o_orderpriority, band)
    """,
    tags=["A1", "A7", "cube"],
)
def q_orders_grouping_id_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id()/GROUPING() surface coverage — the one CUBE
    mechanism the earlier cube/rollup rows never exercised: the band
    dimension is GENUINELY NULL for small orders, so a plain CUBE
    output cannot distinguish "subtotal over all bands" from "the NULL
    band's own group". grouping_id (bitmask over both dimensions, MSB =
    leftmost, pinned cross-engine by the oracle) and GROUPING(band)
    disambiguate; masses in exact integer cents.

    Scale: CUBE expands grouping sets map-side before ONE exchange —
    same shape as cube_segment_priority; the gid columns are free
    metadata on the aggregation."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.when(F.col("o_totalprice") >= 200000, "JUMBO")
        .when(F.col("o_totalprice") >= 100000, "LARGE")
        .otherwise(F.lit(None))
        .alias("band"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return (
        o.cube("o_orderpriority", "band")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.grouping("band").cast("long").alias("band_is_subtotal"),
            F.count("*").alias("n_orders"),
            F.sum("cents").cast("long").alias("price_cents"),
        )
        .select(
            "o_orderpriority",
            "band",
            "gid",
            "band_is_subtotal",
            "n_orders",
            "price_cents",
        )
    )


# ---------------------------------------------------------------------------
# Delta-persisted sketch state: HLL registers as a MERGE-maintained table
# ---------------------------------------------------------------------------


def _sql_delta_sketch_state() -> str:
    h = _h60_duck("'hlls|' || CAST(o_custkey AS VARCHAR)")
    return f"""
    WITH r AS (
      SELECT year(o_orderdate) AS y,
             {h} & 255 AS register,
             CASE WHEN ({h} >> 8) = 0 THEN {_HLL_RMAX}
                  ELSE {_HLL_RMAX} - length(bin({h} >> 8)) END AS rho,
             o_custkey
      FROM orders
    ),
    final_regs AS (
      SELECT register, MAX(rho) AS m_val FROM r GROUP BY 1
    ),
    v0_regs AS (
      SELECT register FROM r WHERE y <= 1994 GROUP BY 1
    ),
    est AS (
      SELECT ROUND({_HLL_NUM!r}
                   / CAST(SUM(1::BIGINT << ({_HLL_RMAX} - m_val))
                          + ({_HLL_M} - COUNT(*))
                            * {2**_HLL_RMAX}::BIGINT AS DOUBLE),
                   4) AS hll_estimate,
             CAST(COUNT(*) AS BIGINT) AS final_registers
      FROM final_regs
    )
    SELECT CAST(2 AS BIGINT) AS final_version,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v0_regs) AS v0_registers,
           est.final_registers, est.hll_estimate,
           (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
             AS exact_distinct
    FROM est
    """


@register(
    "delta_hll_sketch_state_roundtrip",
    _sql_delta_sketch_state(),
    tags=["S6", "J5", "delta", "sketch", "roundtrip"],
)
def q_delta_hll_sketch_state_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketches as LAKEHOUSE STATE: HLL registers for o_custkey live in
    a Delta table and are maintained by MERGE as order-year batches
    arrive — the incremental-analytics shape where daily distinct
    counts update a 256-row table instead of rescanning history. Three
    commits (create + two MERGEs whose sources are pre-resolved to
    greatest(state, batch) — update-all MERGE then lands the max);
    the row returns the final log version, the register count TIME
    TRAVELLED back to v0 (proving the state history is queryable), the
    final register count, the estimate, and the exact distinct. The
    oracle replays everything from the pristine table: MAX is
    associative, so merged-state-over-batches == one-pass registers —
    any MERGE that drops or double-applies a batch flips the hash.

    Scale: each maintenance commit touches a <=256-row state table
    (file-count bounded); the raw scan happens once per batch, exactly
    as a streaming foreachBatch would (parity pinned in
    tests/test_sketches.py). Composes the two round-13 families:
    the sketch toolbox and the Delta protocol engine."""
    import tempfile

    from .sources.delta_log import merge_delta, read_delta, write_delta

    root = scratch_dir(prefix="mm_hll_state_") + "/sketch_delta"
    o = T(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"), "o_custkey"
    )
    h = F.expr(_h60_spark("concat('hlls|', CAST(o_custkey AS STRING))"))
    rest = F.shiftright(h, 8)
    rho = (
        F.when(rest == 0, F.lit(_HLL_RMAX))
        .otherwise(F.lit(_HLL_RMAX) - F.length(F.conv(rest, 10, 2)))
        .cast("int")
    )
    rows = o.select(
        "y", h.bitwiseAND(F.lit(255)).alias("register"), rho.alias("rho")
    )

    def regs(pred: str) -> DataFrame:
        return (
            rows.filter(pred)
            .groupBy("register")
            .agg(F.max("rho").alias("m_val"))
        )

    write_delta(regs("y <= 1994"), root, mode="overwrite")
    for pred in ("y >= 1995 and y <= 1996", "y >= 1997"):
        batch = regs(pred)
        cur = read_delta(spark, root).select(
            F.col("register").alias("c_register"), F.col("m_val").alias("c_m")
        )
        resolved = (
            batch.join(cur, batch.register == cur.c_register, "left")
            .select(
                "register",
                F.greatest(
                    F.col("m_val"), F.coalesce(F.col("c_m"), F.lit(0))
                ).alias("m_val"),
            )
        )
        merge_delta(spark, root, resolved, "register")

    final = read_delta(spark, root)
    v0 = read_delta(spark, root, version=0)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - m_val)")
    est = final.agg(
        F.round(
            F.lit(_HLL_NUM)
            / (
                F.sum(term)
                + (F.lit(_HLL_M) - F.count("*")) * F.lit(2**_HLL_RMAX)
            ).cast("double"),
            4,
        ).alias("hll_estimate"),
        F.count("*").cast("long").alias("final_registers"),
    )
    v0n = v0.agg(F.count("*").cast("long").alias("v0_registers"))
    exact = o.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    from .sources.delta_log import snapshot

    ver = snapshot(spark, root).version
    return (
        est.crossJoin(F.broadcast(v0n))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(int(ver)).cast("long").alias("final_version"),
            "v0_registers",
            "final_registers",
            "hll_estimate",
            "exact_distinct",
        )
    )


# ---------------------------------------------------------------------------
# bitmap-index intersections: bit_and/bit_or/bit_count set algebra
# ---------------------------------------------------------------------------

#: same 64-word x 62-usable-bit geometry as the Bloom row (bits 62/63
#: never set, so signed-BIGINT bitwise ops agree cross-engine).
_BIX_WORDS, _BIX_BITS = 64, 62
_BIX_M = _BIX_WORDS * _BIX_BITS


def _sql_bitmap_index() -> str:
    h = _h60_duck("'bix|' || CAST(o_orderkey AS VARCHAR)")
    return f"""
    WITH b AS (
      SELECT o_orderpriority AS pri, {h} % {_BIX_M} AS p FROM orders
    ),
    sparse AS (
      SELECT pri, p // {_BIX_BITS} AS wi,
             bit_or(1::BIGINT << CAST(p % {_BIX_BITS} AS INT)) AS w
      FROM b GROUP BY 1, 2
    ),
    words AS (
      -- densify to the full word domain: a word held by only one side
      -- must still contribute its bits to the pair's union
      SELECT s.pri, g.wi, COALESCE(sp.w, 0) AS w
      FROM (SELECT DISTINCT pri FROM b) s
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS wi
                  FROM range({_BIX_WORDS})) g
      LEFT JOIN sparse sp ON sp.pri = s.pri AND sp.wi = g.wi
    ),
    pop AS (
      SELECT pri, CAST(SUM(bit_count(w)) AS BIGINT) AS buckets FROM words
      GROUP BY 1
    ),
    pairs AS (
      SELECT a.pri AS pri_a, b.pri AS pri_b,
             CAST(SUM(bit_count(a.w & b.w)) AS BIGINT) AS buckets_both,
             CAST(SUM(bit_count(a.w | b.w)) AS BIGINT) AS buckets_either
      FROM words a JOIN words b ON a.wi = b.wi AND a.pri < b.pri
      GROUP BY 1, 2
    )
    SELECT p.pri_a, p.pri_b, pa.buckets AS buckets_a, pb.buckets AS buckets_b,
           p.buckets_both, p.buckets_either,
           (p.buckets_both * 1000000) // p.buckets_either AS overlap_ppm
    FROM pairs p
    JOIN pop pa ON pa.pri = p.pri_a
    JOIN pop pb ON pb.pri = p.pri_b
    """


@register(
    "orders_priority_bitmap_index",
    _sql_bitmap_index(),
    tags=["A7", "P10", "scale", "sketch"],
)
def q_orders_priority_bitmap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set algebra — the OLAP accelerator made explicit:
    each priority's orderkey population compresses to a 64-word bucket
    bitmap (bit_or groupBy — bit_or IS the bitmap merge), and every
    pairwise co-occupancy / union question is answered by
    bit_count(a & b) / bit_count(a | b) over co-located words, never by
    touching rows again. This is how bitmap indexes serve multi-predicate
    COUNT queries at 100 TB: fixed-size per predicate value, CPU-cheap
    word-wise AND/OR, results exact at bucket grain.

    Scale: bitmap build is one groupBy with map-side combine; the
    pairwise pass joins two 64-row-per-value tables on the word index
    (priority-pair fan-out bounded by the 5-value catalog). Bits 62/63
    stay clear so signed-BIGINT semantics agree cross-engine; the
    overlap ratio is integer ppm — zero float in the row."""
    o = T(spark, sf_dir, "orders")
    p = F.expr(
        _h60_spark("concat('bix|', CAST(o_orderkey AS STRING))") + f" % {_BIX_M}"
    )
    b = o.select(F.col("o_orderpriority").alias("pri"), p.alias("p"))
    sparse = b.groupBy(
        "pri", F.expr(f"p div {_BIX_BITS}").alias("wi")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % {_BIX_BITS} AS INT)))"
        ).alias("w")
    )
    # densify to the full word domain (|priorities| x 64 rows, bounded):
    # a word held by only one side must still contribute to the union
    spine = b.select("pri").distinct().crossJoin(
        F.broadcast(spark.range(_BIX_WORDS).select(F.col("id").alias("wi")))
    )
    words = spine.join(F.broadcast(sparse), ["pri", "wi"], "left").select(
        "pri", "wi", F.coalesce(F.col("w"), F.lit(0)).cast("long").alias("w")
    )
    pop = words.groupBy("pri").agg(
        F.sum(F.bit_count("w")).cast("long").alias("buckets")
    )
    wa = words.select(
        F.col("pri").alias("pri_a"), "wi", F.col("w").alias("wa")
    )
    wb = words.select(
        F.col("pri").alias("pri_b"), "wi", F.col("w").alias("wb")
    )
    pairs = (
        # wb is |priorities| x 64 rows by construction — pin the
        # broadcast so AQE stats at different SFs can't flip the
        # strategy (observed: a 10x run re-planned this join)
        wa.join(F.broadcast(wb), "wi")
        .filter(F.col("pri_a") < F.col("pri_b"))
        .groupBy("pri_a", "pri_b")
        .agg(
            F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb"))))
            .cast("long")
            .alias("buckets_both"),
            F.sum(F.bit_count(F.col("wa").bitwiseOR(F.col("wb"))))
            .cast("long")
            .alias("buckets_either"),
        )
    )
    pa = pop.select(F.col("pri").alias("pri_a"), F.col("buckets").alias("buckets_a"))
    pb = pop.select(F.col("pri").alias("pri_b"), F.col("buckets").alias("buckets_b"))
    return (
        pairs.join(F.broadcast(pa), "pri_a")
        .join(F.broadcast(pb), "pri_b")
        .select(
            "pri_a",
            "pri_b",
            "buckets_a",
            "buckets_b",
            "buckets_both",
            "buckets_either",
            F.expr("(buckets_both * 1000000) div buckets_either").alias(
                "overlap_ppm"
            ),
        )
    )
