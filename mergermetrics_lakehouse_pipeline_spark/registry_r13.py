"""Round-13 surface: the occupancy-safe embedding near-dup twin
(VERDICT r12 next-step #1 — clears the repo's only perf-weak row),
coordinated-commit streaming/checkpointing, the count-collapse Gini
twin, and this round's exact-arithmetic analytics batch.

Determinism discipline (project-wide): every aggregate is exact BIGINT
or DECIMAL arithmetic with at most one trailing double division; ranks
and top-k carry full tie-breakers; float payloads quantize through
FLOOR(x*1000) or integer-cent recovery before any SUM.

Parity note: the reference's pipelines run MinHash-free (its dedup is
``dropDuplicates`` on business keys, reference:
consolidated_pipeline/1_customer_data_processing.py); the embedding
near-dup family is engine-extension surface for LLM training-data
pipelines, and this round gives it the same degenerate-bucket guard
the text-LSH path earned in round 12.
"""

from __future__ import annotations

import os
import tempfile

from .scratch import scratch_dir
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import T, register


# ---------------------------------------------------------------------------
# embedding near-dup, occupancy-guarded (round-13, VERDICT r12 next-step #1)
# ---------------------------------------------------------------------------

#: sign-LSH geometry shared by the Spark row and its DuckDB twin. 4
#: bands x 6 planes: expected bucket occupancy N/64 per band, so at
#: sf0.01 (500 vecs) most buckets sit under the cap (complete pairs)
#: while a few divert to hub-star — both guard paths hash-checked; at
#: sf0.1+ the big-bucket path dominates and candidate volume is
#: O(bands x N), which is the whole point.
_EMB_BANDS, _EMB_BITS, _EMB_CAP = 4, 6, 20
_EMB_SEED, _EMB_DIM, _EMB_THR = 42, 64, 0.30


def _emb_planes():
    import numpy as np

    return np.random.default_rng(_EMB_SEED).standard_normal(
        (_EMB_DIM, _EMB_BANDS * _EMB_BITS)
    )


def _sql_emb_capped() -> str:
    """DuckDB twin of the capped sign-LSH embedding pipeline: the SAME
    hyperplane literals (default_rng(42), emitted at full repr
    precision — both engines parse the decimal string to the nearest
    double), sign bits via in-order ``list_inner_product`` (matching
    the Spark ``dot`` fold bit-for-bit), then the identical
    census/small/big/hub split as ``docs_lsh_capped_pairs``
    (registry_r12.py) and an exact cosine confirm on the surviving
    edges.

    NOTE (review round 13): the sized/small/big/hubs/cand skeleton
    deliberately mirrors registry_r12._sql_lsh_capped — both are
    FROZEN oracle texts for already-hash-verified rows, kept as
    independent literals rather than a shared builder; any future
    change to the guard's split semantics (the <= cap boundary, the
    hub exclusion) must be applied to BOTH and re-hash-checked."""
    planes = _emb_planes()

    def plane_lit(j: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]::DOUBLE[]"

    def band_key(b: int) -> str:
        return " || ".join(
            f"(CASE WHEN list_inner_product(v, {plane_lit(b * _EMB_BITS + r)})"
            " >= 0 THEN '1' ELSE '0' END)"
            for r in range(_EMB_BITS)
        )

    band_rows = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, {b} AS band, {band_key(b)} AS band_key FROM e"
        for b in range(_EMB_BANDS)
    )
    cos = (
        "list_inner_product(a.v, b.v) / (sqrt(list_inner_product(a.v, a.v))"
        " * sqrt(list_inner_product(b.v, b.v)))"
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    bands AS (
{band_rows}
    ), sized AS (
      SELECT band, band_key, COUNT(*) AS n FROM bands GROUP BY 1, 2
    ), small AS (
      SELECT b.* FROM bands b JOIN sized s
        ON b.band = s.band AND b.band_key = s.band_key
      WHERE s.n <= {_EMB_CAP}
    ), big AS (
      SELECT b.* FROM bands b JOIN sized s
        ON b.band = s.band AND b.band_key = s.band_key
      WHERE s.n > {_EMB_CAP}
    ), hubs AS (
      SELECT band, band_key, MIN(vec_id) AS id_a FROM big GROUP BY 1, 2
    ), cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM small a JOIN small b
          ON a.band = b.band AND a.band_key = b.band_key
             AND a.vec_id < b.vec_id
        UNION ALL
        SELECT h.id_a, b.vec_id AS id_b
        FROM big b JOIN hubs h
          ON b.band = h.band AND b.band_key = h.band_key
        WHERE b.vec_id <> h.id_a
      )
    )
    SELECT c.id_a, c.id_b, ROUND({cos}, 6) AS cosine_sim
    FROM cand c JOIN e a ON c.id_a = a.vec_id JOIN e b ON c.id_b = b.vec_id
    WHERE ROUND({cos}, 6) >= {_EMB_THR}
    """


@register(
    "emb_neardup_capped_pairs",
    _sql_emb_capped(),
    tags=["LLM-dedup", "LLM-sim", "lsh", "occupancy-guard", "scale"],
)
def q_emb_neardup_capped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-safe embedding near-dup twin (VERDICT r12 "what's
    wrong" #1): `emb_neardup_pairs` buckets by `label`, whose fixed
    cardinality makes per-bucket population linear in the corpus and
    the all-pairs join quadratic (SF1 measured 15.8x at 10x data).
    This row rebuckets by multi-band random-hyperplane sign-LSH
    (operators/similarity.py sign_lsh_band_keys — plane literals baked
    into the plan, signs via the in-order JVM dot fold so DuckDB
    replays the exact bucketing) and routes the buckets through the
    round-12 occupancy guard (operators/dedup.py capped_bucket_pairs):
    buckets <= 20 keep complete in-bucket pairs, oversized buckets
    divert to the distributed hub-star expansion — O(k) edges, no task
    ever buffers more than the cap. Surviving candidate edges are
    exact-cosine-confirmed at >= 0.30.

    The DuckDB twin replays the identical plane literals, census and
    split, so the guard's SEMANTICS — which edges survive — are
    hash-verified, not just that something completes. Scale: bucket
    count grows as 2^bits (the knob that keeps expected occupancy
    constant as the corpus grows); the cap bounds the degenerate tail;
    candidate volume is O(bands x N) once buckets exceed the cap."""
    from .operators import similarity as sim
    from .parallel import fan_out

    e = fan_out(T(spark, sf_dir, "embeddings"))
    return sim.embedding_capped_neardup_pairs(
        e,
        dim=_EMB_DIM,
        bands=_EMB_BANDS,
        bits=_EMB_BITS,
        seed=_EMB_SEED,
        threshold=_EMB_THR,
        max_bucket=_EMB_CAP,
    )


# ---------------------------------------------------------------------------
# Delta: coordinated-commit streaming + retention (round-13, VERDICT
# r12 next-step #2)
# ---------------------------------------------------------------------------


@register(
    "delta_catalog_owned_stream_roundtrip",
    """
    WITH tagged AS (
      SELECT n_regionkey,
             CASE WHEN n_nationkey < 8 THEN 0
                  WHEN n_nationkey < 16 THEN 1
                  ELSE 2 END AS b
      FROM nation WHERE n_nationkey < 20
    ),
    s AS (
      SELECT n_regionkey,
             CAST(COUNT(*) AS BIGINT) AS n_nations_streamed,
             CAST(SUM(b) AS BIGINT) AS version_mass,
             CAST(MIN(b) AS BIGINT) AS first_seen_batch
      FROM tagged GROUP BY 1
    ),
    a AS (
      SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_after_retention
      FROM nation GROUP BY 1
    )
    SELECT s.n_regionkey, s.n_nations_streamed, s.version_mass,
           s.first_seen_batch, a.n_after_retention
    FROM s JOIN a ON s.n_regionkey = a.n_regionkey
    """,
    tags=["S6", "delta", "streaming-source", "catalog-owned", "roundtrip"],
)
def q_delta_catalog_owned_stream_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming + retention over a CATALOG-OWNED table, end to end
    (sources/delta_coordinated.py round 13): create through the
    coordinator, two coordinated appends (the last ratified commit
    stays STAGED — a filesystem LIST cannot see it), replay with
    ``stream_commit_batches_coordinated`` (must consult the catalog
    and backfill, so all three batches arrive; the protocol-only
    upgrade commit yields nothing), fold per-region counts + version
    mass + first-seen batch, then run the retention pipeline —
    ``write_checkpoint_coordinated`` at the ratified frontier,
    ``truncate_log_coordinated`` (numbered JSONs removed AND the
    catalog forgets them, staged copies dropped) — append one more
    slice PAST the truncation horizon and read the final table back.
    A source that drops the staged tail, re-emits reorganized bytes,
    misses a version, or a retention that loses rows or resurrects
    truncated commits all flip the hash.

    Scale: each batch is a bounded scan of that commit's added files;
    checkpoint/truncate are O(log) driver metadata; the final read
    replays checkpoint + post-horizon tail only."""
    from .sources.delta_coordinated import (
        FileCommitCoordinator,
        append_coordinated,
        create_catalog_owned,
        read_delta_coordinated,
        stream_commit_batches_coordinated,
        truncate_log_coordinated,
        write_checkpoint_coordinated,
    )

    base = scratch_dir(prefix="mm_co_stream_rt_")
    root = os.path.join(base, "nation_co")
    cat = FileCommitCoordinator(os.path.join(base, "catalog"))
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    create_catalog_owned(nation.filter("n_nationkey < 8"), root, cat)
    append_coordinated(
        nation.filter("n_nationkey >= 8 and n_nationkey < 16"), root, cat
    )
    append_coordinated(
        nation.filter("n_nationkey >= 16 and n_nationkey < 20"), root, cat
    )
    # the last ratified commit must still be staged-only: the stream
    # consulting the catalog (not a LIST) is the property under test
    log = os.path.join(root, "_delta_log")
    if os.path.exists(os.path.join(log, f"{3:020d}.json")):
        raise RuntimeError("v3 backfilled early — lazy backfill broken")

    folded = None
    batches = stream_commit_batches_coordinated(spark, root, cat)
    if [v for v, _ in batches] != [0, 2, 3]:
        raise RuntimeError(
            f"expected batches at versions [0, 2, 3], got "
            f"{[v for v, _ in batches]}"
        )
    for i, (_, batch) in enumerate(batches):
        agg = batch.groupBy("n_regionkey").agg(
            F.count("*").cast("bigint").alias("n_nations_streamed"),
            F.sum(F.lit(i)).cast("bigint").alias("version_mass"),
            F.min(F.lit(i)).cast("bigint").alias("first_seen_batch"),
        )
        if folded is None:
            folded = agg
        else:
            prev = folded.select(
                "n_regionkey",
                F.col("n_nations_streamed").alias("p_n"),
                F.col("version_mass").alias("p_vm"),
                F.col("first_seen_batch").alias("p_fs"),
            )
            folded = agg.join(prev, "n_regionkey", "full_outer").select(
                "n_regionkey",
                (
                    F.coalesce("n_nations_streamed", F.lit(0))
                    + F.coalesce("p_n", F.lit(0))
                )
                .cast("bigint")
                .alias("n_nations_streamed"),
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

    # retention: checkpoint at the ratified frontier, truncate, and the
    # catalog must FORGET — then commit past the horizon and read back
    write_checkpoint_coordinated(spark, root, cat)
    removed = truncate_log_coordinated(root, cat)
    if removed != [0, 1, 2, 3]:
        raise RuntimeError(f"truncate removed {removed}, expected [0..3]")
    if cat.ratified(_tid(root)) != {}:
        raise RuntimeError("catalog still remembers truncated commits")
    append_coordinated(nation.filter("n_nationkey >= 20"), root, cat)
    after = (
        read_delta_coordinated(spark, root, cat)
        .groupBy("n_regionkey")
        .agg(F.count("*").cast("bigint").alias("n_after_retention"))
    )
    return folded.join(after, "n_regionkey")


def _tid(root: str) -> str:
    from .sources.delta_coordinated import _table_id

    return _table_id(root)


# ---------------------------------------------------------------------------
# count-collapse twins for the low-cardinality rank windows (round-13,
# VERDICT r12 next-step #3)
# ---------------------------------------------------------------------------

#: identical oracle text as orders_value_gini_by_priority
#: (registry_r12.py) — the twin must reproduce the per-row rank
#: formula bit-for-bit from collapsed (value, count) arithmetic.
_GINI_ORACLE = """
    WITH ranked AS (
      SELECT o_orderpriority AS priority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                        o_orderkey
             ) AS r
      FROM orders
    ), agg AS (
      SELECT priority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(v) AS DECIMAL(38,0)) AS s_v,
             CAST(SUM(CAST(r AS DECIMAL(19,0)) * v) AS DECIMAL(38,0)) AS s_rv
      FROM ranked GROUP BY 1
    )
    SELECT priority, n_orders,
           CAST(s_v AS BIGINT) AS value_mass_c,
           (2 * CAST(s_rv AS DOUBLE)
             - CAST(n_orders + 1 AS DOUBLE) * CAST(s_v AS DOUBLE))
           / (CAST(n_orders AS DOUBLE) * CAST(s_v AS DOUBLE)) AS gini
    FROM agg ORDER BY priority
    """


@register(
    "orders_value_gini_by_priority_distributed",
    _GINI_ORACLE,
    tags=["inequality", "gini", "distributed-rank", "count-collapse", "scale"],
)
def q_orders_value_gini_by_priority_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The count-collapse twin of `orders_value_gini_by_priority`
    (registry_r12.py) — SAME oracle, no per-row rank window. The rank
    formula needs Sigma r*v; ranks inside a tie block (equal cent
    value) are consecutive and all tied rows share v, so the block
    contributes v*(cum_lo+cum_hi)*c/2 — Sigma 2rv is exact cum-count
    arithmetic over the collapsed (priority, value, count) table, and
    doubling commutes with the final double cast bit-for-bit (scaling
    by 2 is exact in binary floating point), so the gini double
    matches the per-row formula exactly.

    Distribution (the r12 decile-twin pattern, two-level): values band
    into $1000 buckets (band = v DIV 100000 — BOUNDED by the value
    domain, never by row count), the tiny per-(priority, band) census
    takes the only coarse prefix window, and the fine prefix window
    partitions by (priority, band) — thousands of partitions instead
    of the original row's 5, each collapsed to distinct values. The
    band census rides a broadcast (value-domain-sized, like the decile
    spine); band width is the parallelism knob at 100 TB."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    counts = (
        o.groupBy("priority", "v")
        .agg(F.count("*").alias("c"))
        .withColumn("band", F.expr("v DIV 100000"))
    )
    band_census = counts.groupBy("priority", "band").agg(
        F.sum("c").alias("n_band")
    )
    wb = Window.partitionBy("priority").orderBy("band")
    band_off = band_census.select(
        "priority",
        "band",
        (F.sum("n_band").over(wb) - F.col("n_band")).alias("offset"),
    )
    wv = Window.partitionBy("priority", "band").orderBy("v")
    cum = (
        counts.withColumn("hi_in", F.sum("c").over(wv))
        .withColumn("lo_in", F.col("hi_in") - F.col("c") + 1)
        .join(F.broadcast(band_off), ["priority", "band"])
        .select(
            "priority",
            "v",
            "c",
            (F.col("offset") + F.col("lo_in")).alias("cum_lo"),
            (F.col("offset") + F.col("hi_in")).alias("cum_hi"),
        )
    )
    agg = cum.groupBy("priority").agg(
        F.sum("c").cast("bigint").alias("n_orders"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("s_v"),
        # (cum_lo + cum_hi) widens to DECIMAL BEFORE the multiply by c:
        # at degenerate tie scales (n ~ 1e10 rows, c ~ 5e8 ties) the
        # bigint product would wrap silently under non-ANSI Spark
        # (review round 13) — the oracle's DECIMAL product cannot
        F.sum(
            F.col("v").cast("decimal(19,0)")
            * (
                (F.col("cum_lo") + F.col("cum_hi")).cast("decimal(19,0)")
                * F.col("c")
            )
        )
        .cast("decimal(38,0)")
        .alias("s_2rv"),
    )
    return agg.select(
        "priority",
        "n_orders",
        F.col("s_v").cast("bigint").alias("value_mass_c"),
        (
            (
                F.col("s_2rv").cast("double")
                - (F.col("n_orders") + 1).cast("double")
                * F.col("s_v").cast("double")
            )
            / (
                F.col("n_orders").cast("double")
                * F.col("s_v").cast("double")
            )
        ).alias("gini"),
    ).orderBy("priority")


#: identical oracle text as customer_percentile_bridge
#: (registry_r11.py) — the twin derives every output from counts alone.
_BRIDGE_ORACLE = """
    WITH ranked AS (
      SELECT c_mktsegment AS segment,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
             CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n,
             CAST(NTILE(4) OVER w AS BIGINT) AS q4
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT), c_custkey)
    ), bridged AS (
      SELECT segment, q4,
             CASE WHEN n = 1 THEN CAST(1 AS BIGINT)
                  ELSE ((rnk - 1) * 4) // (n - 1) + 1 END AS iq
      FROM ranked
    ), capped AS (
      SELECT segment, q4,
             CASE WHEN iq > 4 THEN 4 ELSE iq END AS iq
      FROM bridged
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN q4 = iq THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           CAST(SUM(q4) AS BIGINT) AS ntile_mass,
           CAST(SUM(iq) AS BIGINT) AS rank_quartile_mass
    FROM capped GROUP BY segment ORDER BY segment
    """


@register(
    "customer_percentile_bridge_distributed",
    _BRIDGE_ORACLE,
    tags=["analytics", "ntile", "distributed-rank", "count-collapse", "scale"],
)
def q_customer_percentile_bridge_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The count-collapse twin of `customer_percentile_bridge`
    (registry_r11.py) — SAME oracle, and the window DISAPPEARS
    entirely: every output is a pure function of each segment's row
    count. Both quartile definitions assign by RANK POSITION alone,
    and ranks 1..n are each taken exactly once, so the masses and the
    agreement count are rank-interval arithmetic:

    - NTILE(4) tile t covers ranks [(t-1)q + min(t-1, rem) + 1,
      tq + min(t, rem)] (q = n DIV 4, rem = n % 4) — the r12 decile
      spine formula;
    - the rank-derived quartile iq = ((r-1)*4) DIV (n-1) + 1 equals t
      exactly on ranks [ceil((t-1)(n-1)/4) + 1,
      (t(n-1)-1) DIV 4 + 1], with the t=4 interval extended to n for
      the cap (iq=5 occurs only at r=n);
    - n_agree(t) = the overlap of the two intervals.

    The only shuffle left is a map-side-combinable COUNT per segment;
    the 4-row tile spine rides a bounded broadcast (bnlj_ok). This is
    the escape hatch the r12 verdict asked to prove for the
    low-cardinality-partition window family: at 100 TB the original
    row's 5-partition rank window disappears into a count."""
    n_seg = (
        T(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    spine = spark.range(1, 5).select(F.col("id").alias("t"))
    n, t = F.col("n"), F.col("t")
    rem = n % 4
    qd = F.expr("n DIV 4")
    lo_t = (t - 1) * qd + F.least(t - 1, rem) + 1
    hi_t = t * qd + F.least(t, rem)
    # iq interval (n > 1): A_t..B_t in rank terms, t=4 capped to n;
    # ceil(x/4) = (x+3) DIV 4 for x >= 0 under truncating DIV
    a_t = F.expr("((t - 1) * (n - 1) + 3) DIV 4") + 1
    b_t = F.expr("(t * (n - 1) - 1) DIV 4") + 1
    b_t = F.when(t == 4, n).otherwise(F.least(b_t, n))
    cells = (
        n_seg.crossJoin(F.broadcast(spine))
        .withColumn("tile_n", F.greatest(hi_t - lo_t + 1, F.lit(0)))
        .withColumn("iq_n", F.greatest(b_t - a_t + 1, F.lit(0)))
        .withColumn(
            "agree_n",
            F.greatest(
                F.least(hi_t, b_t) - F.greatest(lo_t, a_t) + 1, F.lit(0)
            ),
        )
    )
    folded = cells.groupBy("segment", "n").agg(
        F.sum(t * F.col("tile_n")).cast("bigint").alias("ntile_mass"),
        F.sum(t * F.col("iq_n")).cast("bigint").alias("rank_quartile_mass"),
        F.sum("agree_n").cast("bigint").alias("n_agree"),
    )
    one = F.lit(1).cast("bigint")
    return folded.select(
        "segment",
        F.col("n").alias("n_customers"),
        F.when(F.col("n") == 1, one).otherwise(F.col("n_agree")).alias(
            "n_agree"
        ),
        F.when(F.col("n") == 1, one).otherwise(F.col("ntile_mass")).alias(
            "ntile_mass"
        ),
        F.when(F.col("n") == 1, one)
        .otherwise(F.col("rank_quartile_mass"))
        .alias("rank_quartile_mass"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Round-13 analytics batch (VERDICT r12 next-step #4): concentration,
# conformance, drift, and correlation censuses — exact-arithmetic
# discipline throughout (integer cents, DECIMAL evidence masses, at
# most one trailing double step per output column)
# ---------------------------------------------------------------------------


@register(
    "orders_custkey_concentration_by_priority",
    """
    WITH per_cust AS (
      SELECT o_orderpriority AS priority, o_custkey,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    )
    SELECT priority,
           CAST(SUM(cnt) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MAX(cnt) AS BIGINT) AS top_customer_orders,
           CAST(SUM(cnt * cnt) AS BIGINT) AS hhi_mass,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_share
    FROM per_cust GROUP BY priority ORDER BY priority
    """,
    tags=["analytics", "concentration", "census"],
)
def q_orders_custkey_concentration_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer-concentration census per priority class (the per-clerk
    concentration shape from the verdict's list, on this schema's
    customer key): order counts, distinct customers, the largest
    single-customer order count, the raw HHI evidence mass (sum of
    squared counts — exact BIGINT; the normalizing division belongs to
    the reader), and the top-customer share as the one trailing double
    division.

    Scale: two map-side-combinable aggregations, both keyed by hash —
    (priority, custkey) then priority; no window, no skew pivot."""
    per_cust = (
        T(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"), F.col("o_custkey")
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return (
        per_cust.groupBy("priority")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_orders"),
            F.count("*").cast("bigint").alias("n_customers"),
            F.max("cnt").cast("bigint").alias("top_customer_orders"),
            F.sum(F.col("cnt") * F.col("cnt"))
            .cast("bigint")
            .alias("hhi_mass"),
            (
                F.max("cnt").cast("double")
                / F.sum("cnt").cast("double")
            ).alias("top_share"),
        )
        .orderBy("priority")
    )


@register(
    "lineitem_flag_status_conformance",
    """
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_c,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS gross_c,
           CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(19,0))
                         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                     AS DECIMAL(38,0)) AS BIGINT) AS eff_mass,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "conformance", "census"],
)
def q_lineitem_flag_status_conformance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Returnflag x linestatus conformance census — the TPC-H Q1 grain
    re-audited with integer-exact evidence: quantity and gross price
    as cents, the discount-effective mass as cents x (100 - discount
    points) in DECIMAL(38,0) (no float multiply anywhere), plus the
    distinct-order reach of each cell.

    Scale: one hash aggregation at a 6-cell grain; the countDistinct
    expands to a two-level aggregate Spark plans map-side first."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_c"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_c"),
        "l_orderkey",
    )
    return (
        li.groupBy("returnflag", "linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("qty_c").cast("bigint").alias("qty_c"),
            F.sum("price_c").cast("bigint").alias("gross_c"),
            F.sum(
                F.col("price_c").cast("decimal(19,0)")
                * (F.lit(100) - F.col("disc_c"))
            )
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("eff_mass"),
            F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "orders_status_priority_matrix",
    """
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_mass_c,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS last_key
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "matrix", "census"],
)
def q_orders_status_priority_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Status x priority occupancy matrix with integer-cent price mass,
    distinct-customer reach, and keyspace extremes per cell — the
    orders-side conformance twin of the flag x status census.

    Scale: one 15-cell hash aggregation, map-side combinable."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("price_mass_c"),
            F.min("o_orderkey").cast("bigint").alias("first_key"),
            F.max("o_orderkey").cast("bigint").alias("last_key"),
        )
        .orderBy("status", "priority")
    )


@register(
    "orders_yearly_priority_drift",
    """
    WITH cell AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             o_orderpriority AS priority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS price_mass_c
      FROM orders GROUP BY 1, 2
    ), yr AS (
      SELECT order_year, CAST(SUM(n_orders) AS BIGINT) AS year_total
      FROM cell GROUP BY 1
    )
    SELECT c.order_year, c.priority, c.n_orders, c.price_mass_c,
           y.year_total,
           CAST(c.n_orders AS DOUBLE) / CAST(y.year_total AS DOUBLE)
             AS year_share
    FROM cell c JOIN yr y ON c.order_year = y.order_year
    ORDER BY c.order_year, c.priority
    """,
    tags=["analytics", "drift", "census"],
)
def q_orders_yearly_priority_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Priority-mix drift by order year: per (year, priority) counts and
    integer-cent mass, stitched with the year totals so the share is
    one trailing double division. The totals table is YEAR-bounded, so
    it rides a broadcast instead of a low-cardinality rank window —
    the same escape hatch the count-collapse twins prove.

    Scale: two hash aggregations + a broadcast join on a spine bounded
    by the calendar, not the data."""
    o = T(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    cell = o.groupBy("order_year", "priority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("price_c").cast("bigint").alias("price_mass_c"),
    )
    yr = cell.groupBy("order_year").agg(
        F.sum("n_orders").cast("bigint").alias("year_total")
    )
    return (
        cell.join(F.broadcast(yr), "order_year")
        .select(
            "order_year",
            "priority",
            "n_orders",
            "price_mass_c",
            "year_total",
            (
                F.col("n_orders").cast("double")
                / F.col("year_total").cast("double")
            ).alias("year_share"),
        )
        .orderBy("order_year", "priority")
    )


@register(
    "lineitem_qty_discount_correlation_by_flag",
    """
    WITH x AS (
      SELECT l_returnflag AS returnflag,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS qx,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS dy
      FROM lineitem
    ), m AS (
      SELECT returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qx) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(dy) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(qx AS DECIMAL(19,0)) * dy) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(qx AS DECIMAL(19,0)) * qx) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(dy AS DECIMAL(19,0)) * dy) AS DECIMAL(38,0)) AS syy
      FROM x GROUP BY 1
    )
    SELECT returnflag, n,
           CAST(sx AS BIGINT) AS qty_mass_c,
           CAST(sy AS BIGINT) AS disc_mass_c,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS qty_disc_corr
    FROM m ORDER BY returnflag
    """,
    tags=["analytics", "correlation", "exact-arithmetic"],
)
def q_lineitem_qty_discount_correlation_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson correlation of quantity vs discount per returnflag with
    ALL five evidence masses exact DECIMAL(38,0) over integer cents
    (the r12 OLS discipline): the correlation itself is the single
    trailing double expression, evaluated in the same operation order
    on both engines — no corr() builtin, whose streaming accumulation
    is engine-specific.

    Scale: one map-side-combinable aggregation at 3-cell grain."""
    x = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("returnflag"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qx"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("dy"),
    )
    m = x.groupBy("returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("qx").cast("decimal(38,0)").alias("sx"),
        F.sum("dy").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("qx").cast("decimal(19,0)") * F.col("dy"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("qx").cast("decimal(19,0)") * F.col("qx"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("dy").cast("decimal(19,0)") * F.col("dy"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    nd = F.col("n").cast("double")
    corr = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.sqrt(
            nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * F.sqrt(
            nd * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return m.select(
        "returnflag",
        "n",
        F.col("sx").cast("bigint").alias("qty_mass_c"),
        F.col("sy").cast("bigint").alias("disc_mass_c"),
        corr.alias("qty_disc_corr"),
    ).orderBy("returnflag")


@register(
    "customer_nation_segment_skew",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_automobile,
           CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_building,
           CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_furniture,
           CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_household,
           CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_machinery,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS balance_mass_c
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    tags=["analytics", "pivot", "census"],
)
def q_customer_nation_segment_skew(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-nation market-segment occupancy as an explicit-values pivot
    (conditional sums over the five known segments — the plan stays
    ONE aggregation pass, no two-phase pivot distinct scan) plus the
    integer-cent balance mass.

    Scale: single hash aggregation at nation grain (25 cells)."""
    c = T(spark, sf_dir, "customer")
    segs = {
        "n_automobile": "AUTOMOBILE",
        "n_building": "BUILDING",
        "n_furniture": "FURNITURE",
        "n_household": "HOUSEHOLD",
        "n_machinery": "MACHINERY",
    }
    return (
        c.groupBy(F.col("c_nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            *[
                F.sum(
                    F.when(F.col("c_mktsegment") == v, 1).otherwise(0)
                )
                .cast("bigint")
                .alias(k)
                for k, v in segs.items()
            ],
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
            .cast("bigint")
            .alias("balance_mass_c"),
        )
        .orderBy("nationkey")
    )


@register(
    "events_burst_run_length_census",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) // 1000000 AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id,
             SUM(CASE WHEN gap_s IS NULL OR gap_s > 3600 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM gaps
    ), runs AS (
      SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM islands GROUP BY 1, 2
    )
    SELECT CASE WHEN run_len >= 10 THEN 10 ELSE run_len END AS run_band,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(SUM(run_len) AS BIGINT) AS n_events,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM runs GROUP BY 1 ORDER BY 1
    """,
    tags=["analytics", "events", "burst", "gaps-and-islands"],
)
def q_events_burst_run_length_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Burst-decay profile via gaps-and-islands: consecutive events at
    most one hour apart form one burst (the testdata's session scale) (the island id is the running count
    of burst BREAKS per user), bursts collapse to run lengths, and the
    census reports how run frequency decays with length (capped at
    10+) — all integer arithmetic on whole-second gaps.

    Scale: both windows partition by user_id (the natural
    high-cardinality key; no low-cardinality rank partition anywhere),
    and the two groupBys are map-side combinable."""
    from .functions.dates import epoch_us
    from .registry import events_table

    e = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        "event_id",
        "ts",
        ((epoch_us("ts") - epoch_us(F.lag("ts").over(w))) / F.lit(1000000))
        .cast("bigint")
        .alias("gap_s"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = gaps.select(
        "user_id",
        F.sum(
            F.when(
                F.col("gap_s").isNull() | (F.col("gap_s") > 3600), 1
            ).otherwise(0)
        )
        .over(cum)
        .alias("island"),
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("bigint").alias("run_len")
    )
    return (
        runs.groupBy(
            F.when(F.col("run_len") >= 10, F.lit(10))
            .otherwise(F.col("run_len"))
            .cast("bigint")
            .alias("run_band")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_runs"),
            F.sum("run_len").cast("bigint").alias("n_events"),
            F.max("run_len").cast("bigint").alias("longest_run"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("run_band")
    )


@register(
    "emb_norm_band_census",
    """
    WITH e AS (
      SELECT vec_id, label,
             list_inner_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS nsq
      FROM embeddings
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(FLOOR(nsq / 8) AS BIGINT) AS norm_band,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(vec_id) AS BIGINT) AS first_vec,
           CAST(MAX(vec_id) AS BIGINT) AS last_vec,
           CAST(SUM(CAST(FLOOR(nsq * 1000) AS BIGINT)) AS BIGINT)
             AS nsq_mass_k
    FROM e GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "embeddings", "census", "LLM-sim"],
)
def q_emb_norm_band_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding norm-band census per label (the verdict's suggested
    batch item): SQUARED norms — the in-index-order JVM dot fold, so
    both engines produce bit-identical doubles — banded by FLOOR(nsq/8)
    and massed through the FLOOR(x*1000) quantizer before any SUM
    (project float discipline: never sum raw doubles).

    Scale: one scan projection (the fold is per-row, embarrassingly
    parallel) + one map-side-combinable aggregation at (label, band)
    grain."""
    from .operators.similarity import dot

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        dot(F.col("embedding"), F.col("embedding")).alias("nsq"),
    )
    return (
        e.groupBy(
            "label",
            F.floor(F.col("nsq") / 8).cast("bigint").alias("norm_band"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.min("vec_id").cast("bigint").alias("first_vec"),
            F.max("vec_id").cast("bigint").alias("last_vec"),
            F.sum(F.floor(F.col("nsq") * 1000).cast("bigint"))
            .cast("bigint")
            .alias("nsq_mass_k"),
        )
        .orderBy("label", "norm_band")
    )


@register(
    "events_value_round_number_bias",
    """
    WITH x AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_whole,
           CAST(SUM(CASE WHEN cents % 100 = 99 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_psych_99,
           CAST(SUM(CASE WHEN cents % 1000 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_round_10,
           CAST(SUM(cents) AS BIGINT) AS cents_mass,
           CAST(SUM(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS whole_share
    FROM x GROUP BY 1 ORDER BY 1
    """,
    tags=["analytics", "events", "census"],
)
def q_events_value_round_number_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round-number bias census per event type: whole-unit values,
    .99 psychological endings, and $10 multiples as integer-cent
    remainder classes (both engines use truncated modulo, and values
    here are non-negative, so remainders agree), one trailing double
    for the whole-unit share.

    Scale: one scan projection + a 5-cell hash aggregation."""
    x = T(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("cents") % 100 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_whole"),
            F.sum(F.when(F.col("cents") % 100 == 99, 1).otherwise(0))
            .cast("bigint")
            .alias("n_psych_99"),
            F.sum(F.when(F.col("cents") % 1000 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_round_10"),
            F.sum("cents").cast("bigint").alias("cents_mass"),
            (
                F.sum(
                    F.when(F.col("cents") % 100 == 0, 1).otherwise(0)
                ).cast("double")
                / F.count("*").cast("double")
            ).alias("whole_share"),
        )
        .orderBy("event_type")
    )


@register(
    "docs_source_lang_purity",
    """
    WITH cl AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1, 2
    ), tot AS (
      SELECT source,
             CAST(SUM(cnt) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_langs,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM cl GROUP BY 1
    ), dom AS (
      SELECT cl.source, MIN(cl.lang) AS dominant_lang
      FROM cl JOIN tot ON cl.source = tot.source AND cl.cnt = tot.max_cnt
      GROUP BY 1
    )
    SELECT t.source, t.n_docs, t.n_langs, d.dominant_lang,
           t.max_cnt AS dominant_n,
           CAST(t.max_cnt AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
             AS dominant_share
    FROM tot t JOIN dom d ON t.source = d.source
    ORDER BY t.source
    """,
    tags=["analytics", "LLM-text", "census"],
)
def q_docs_source_lang_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language purity per document source: dominant language chosen
    by highest count with a deterministic lexicographic-lowest
    tie-break (a join against the max count + MIN(lang), not an
    unordered argmax), share as the single trailing division.

    Scale: the (source, lang) census is one map-side-combinable
    aggregation; the stitches join source-grain aggregates (bounded by
    the source catalog, broadcastable)."""
    d = T(spark, sf_dir, "documents")
    cl = d.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tot = cl.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_langs"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    dom = (
        cl.join(
            F.broadcast(tot.select("source", "max_cnt")),
            ["source"],
        )
        .filter(F.col("cnt") == F.col("max_cnt"))
        .groupBy("source")
        .agg(F.min("lang").alias("dominant_lang"))
    )
    return (
        tot.join(F.broadcast(dom), "source")
        .select(
            "source",
            "n_docs",
            "n_langs",
            "dominant_lang",
            F.col("max_cnt").alias("dominant_n"),
            (
                F.col("max_cnt").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dominant_share"),
        )
        .orderBy("source")
    )


@register(
    "customer_balance_parity_bands",
    """
    WITH x AS (
      SELECT c_mktsegment AS segment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative,
           CAST(SUM(CASE WHEN cents = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero,
           CAST(SUM(CASE WHEN cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive,
           CAST(SUM(CASE WHEN cents % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_even_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(SUM(cents) AS BIGINT) AS balance_mass_c
    FROM x GROUP BY 1 ORDER BY 1
    """,
    tags=["analytics", "census", "exact-arithmetic"],
)
def q_customer_balance_parity_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Balance sign/parity census per market segment over integer
    cents. Parity of negative cents: both engines keep the dividend's
    sign under %, and -1 % 2 is -1 in both — only EXACT zero remainder
    counts as even, which is the same predicate either way.

    Scale: one scan projection + a 5-cell hash aggregation."""
    x = T(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    return (
        x.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.when(F.col("cents") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
            F.sum(F.when(F.col("cents") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero"),
            F.sum(F.when(F.col("cents") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_positive"),
            F.sum(F.when(F.col("cents") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_even_cents"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
            F.sum("cents").cast("bigint").alias("balance_mass_c"),
        )
        .orderBy("segment")
    )


@register(
    "part_size_price_band_matrix",
    """
    WITH x AS (
      SELECT p_partkey, p_brand,
             CAST(p_size // 10 AS BIGINT) AS size_band,
             CAST(CAST(ROUND(p_retailprice * 100) AS BIGINT) // 1000
                  AS BIGINT) AS price_band,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
      FROM part
    )
    SELECT size_band, price_band,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
           CAST(SUM(price_c) AS BIGINT) AS retail_mass_c,
           CAST(MIN(p_partkey) AS BIGINT) AS first_key,
           CAST(MAX(p_partkey) AS BIGINT) AS last_key
    FROM x GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "matrix", "census"],
)
def q_part_size_price_band_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Size-band x price-band occupancy matrix for parts ($10 price
    bands on integer cents, size decades), with brand diversity and
    keyspace extremes per cell — all exact integer arithmetic.

    Scale: one hash aggregation over a value-domain-bounded grid."""
    x = T(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.expr("CAST(p_size DIV 10 AS BIGINT)").alias("size_band"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_c"),
    ).withColumn(
        "price_band",
        F.expr("CAST(price_c DIV 1000 AS BIGINT)"),
    )
    return (
        x.groupBy("size_band", "price_band")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.countDistinct("p_brand").cast("bigint").alias("n_brands"),
            F.sum("price_c").cast("bigint").alias("retail_mass_c"),
            F.min("p_partkey").cast("bigint").alias("first_key"),
            F.max("p_partkey").cast("bigint").alias("last_key"),
        )
        .orderBy("size_band", "price_band")
    )


@register(
    "supplier_nation_coverage_census",
    """
    SELECT CAST(s.s_nationkey AS BIGINT) AS nationkey,
           ANY_VALUE(n.n_name) AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CASE WHEN s.s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative,
           CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS balance_mass_c,
           CAST(MIN(s.s_suppkey) AS BIGINT) AS first_key,
           CAST(SUM(CASE WHEN s.s_acctbal < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS negative_share
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=["analytics", "census", "broadcast-dim"],
)
def q_supplier_nation_coverage_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier coverage census per nation, enriched with the nation
    name through the classic broadcast-dim join (ANY_VALUE is safe —
    the name is functionally determined by the group key); integer-cent
    balance mass and one trailing division for the negative share.

    Scale: fact-side hash aggregation; the 25-row dim broadcasts."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("s_nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.any_value("n_name").alias("nation_name"),
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum(F.when(F.col("s_acctbal") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
            F.sum(F.round(F.col("s_acctbal") * 100).cast("bigint"))
            .cast("bigint")
            .alias("balance_mass_c"),
            F.min("s_suppkey").cast("bigint").alias("first_key"),
            (
                F.sum(
                    F.when(F.col("s_acctbal") < 0, 1).otherwise(0)
                ).cast("double")
                / F.count("*").cast("double")
            ).alias("negative_share"),
        )
        .orderBy("nationkey")
    )


@register(
    "docs_length_band_lang_matrix",
    """
    SELECT lang,
           CAST(n_chars // 500 AS BIGINT) AS len_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS char_mass,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "LLM-text", "census"],
)
def q_docs_length_band_lang_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Document-length band x language occupancy matrix (500-char
    bands on the stored n_chars column — scan-only arithmetic, no text
    touched) with char mass and keyspace extremes per cell.

    Scale: one hash aggregation over a value-domain-bounded grid; the
    text column is pruned at the parquet scan."""
    d = T(spark, sf_dir, "documents").select(
        "lang",
        F.expr("CAST(n_chars DIV 500 AS BIGINT)").alias("len_band"),
        "n_chars",
        "doc_id",
    )
    return (
        d.groupBy("lang", "len_band")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("char_mass"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("lang", "len_band")
    )


@register(
    "lineitem_qty_quartiles_by_flag_distributed",
    """
    WITH counts AS (
      SELECT l_returnflag AS returnflag,
             CAST(ROUND(l_quantity) AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT returnflag, q, c,
             SUM(c) OVER (PARTITION BY returnflag ORDER BY q
                          ROWS UNBOUNDED PRECEDING) AS cum_hi,
             SUM(c) OVER (PARTITION BY returnflag) AS n
      FROM counts
    )
    SELECT returnflag,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(MIN(CASE WHEN cum_hi >= (n + 3) // 4 THEN q END) AS BIGINT)
             AS q1_qty,
           CAST(MIN(CASE WHEN cum_hi >= (n + 1) // 2 THEN q END) AS BIGINT)
             AS median_qty,
           CAST(MIN(CASE WHEN cum_hi >= (3 * n + 3) // 4 THEN q END)
                AS BIGINT) AS q3_qty,
           CAST(MIN(q) AS BIGINT) AS min_qty,
           CAST(MAX(q) AS BIGINT) AS max_qty
    FROM cum GROUP BY returnflag ORDER BY returnflag
    """,
    tags=["analytics", "quantiles", "count-collapse", "scale"],
)
def q_lineitem_qty_quartiles_by_flag_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact type-1 quartiles of line quantity per returnflag via
    count-collapse rank selection — quantity's value domain is ~50
    integers, so the cumulative window runs over AT MOST 50 rows per
    flag regardless of corpus size (the purest case for the
    distributed-quantile pattern of events_dwell_deciles_distributed:
    quantile rank k = ceil(p*n) computed on cum counts, value = the
    smallest q whose cumulative count reaches k). Both engines run the
    SAME collapsed construction — the definition is the semantics; no
    engine quantile builtin with its own interpolation is involved.

    Scale: one map-side-combinable (flag, qty) census, then windows
    over a value-domain-bounded table; nothing grows with row count."""
    counts = (
        T(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.round("l_quantity").cast("bigint").alias("q"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wc = Window.partitionBy("returnflag").orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy("returnflag")
    cum = counts.select(
        "returnflag",
        "q",
        F.sum("c").over(wc).alias("cum_hi"),
        F.sum("c").over(wn).alias("n"),
    )
    def at_rank(rank_expr: str, alias: str):
        return F.min(
            F.when(F.col("cum_hi") >= F.expr(rank_expr), F.col("q"))
        ).cast("bigint").alias(alias)

    return (
        cum.groupBy("returnflag")
        .agg(
            F.max("n").cast("bigint").alias("n_lines"),
            at_rank("(n + 3) DIV 4", "q1_qty"),
            at_rank("(n + 1) DIV 2", "median_qty"),
            at_rank("(3 * n + 3) DIV 4", "q3_qty"),
            F.min("q").cast("bigint").alias("min_qty"),
            F.max("q").cast("bigint").alias("max_qty"),
        )
        .orderBy("returnflag")
    )


@register(
    "events_type_hour_matrix",
    """
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_utc,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS cents_mass
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "events", "matrix", "census"],
)
def q_events_type_hour_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event type x UTC hour occupancy matrix with distinct-user reach
    and integer-cent value mass — the intra-day load shape per type
    (the hour-grain complement of events_weekday_type_mix).

    Scale: one hash aggregation at a 120-cell grain; countDistinct
    expands to the standard two-level aggregate."""
    from .registry import events_table

    e = events_table(spark, sf_dir)
    return (
        e.groupBy(
            "event_type",
            F.hour("ts").cast("bigint").alias("hour_utc"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents_mass"),
        )
        .orderBy("event_type", "hour_utc")
    )


@register(
    "delta_catalog_owned_maintenance_roundtrip",
    """
    WITH s AS (
      SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS nationkey,
             CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal_c
      FROM supplier
    ),
    deleted AS (SELECT * FROM s WHERE s_suppkey BETWEEN 2 AND 37),
    final AS (SELECT * FROM s WHERE s_suppkey NOT BETWEEN 2 AND 37)
    SELECT i.nationkey,
           i.n_inserts,
           COALESCE(d.n_deletes, 0) AS n_deletes,
           COALESCE(f.n_final, 0) AS n_final,
           COALESCE(f.balance_mass_c, 0) AS balance_mass_c
    FROM (SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_inserts
          FROM s GROUP BY 1) i
    LEFT JOIN (SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_deletes
               FROM deleted GROUP BY 1) d ON i.nationkey = d.nationkey
    LEFT JOIN (SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_final,
                      CAST(SUM(bal_c) AS BIGINT) AS balance_mass_c
               FROM final GROUP BY 1) f ON i.nationkey = f.nationkey
    ORDER BY i.nationkey
    """,
    tags=["S6", "delta", "catalog-owned", "maintenance", "roundtrip"],
)
def q_delta_catalog_owned_maintenance_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full MAINTENANCE lifecycle on a catalog-owned table
    (sources/delta_coordinated.py round 13): create with CDF enabled,
    two coordinated appends (three file generations), OPTIMIZE through
    the coordinator (must compact — guard — and commit
    dataChange:false), a coordinated copy-on-write DELETE (CDF delete
    rows), then VACUUM through the coordinator — which must backfill
    first: a filesystem-LIST vacuum would reclaim the staged tail's
    data files as unreferenced (the catalog-clothing variant of the
    vacuumProtocolCheck data-destruction mode). The CDF stream replays
    the whole history (insert + delete change rows; the optimize
    commit contributes NOTHING), folded per nation and stitched with
    the post-vacuum final read — counts and integer-cent balance mass.
    A maintenance step that loses staged files, resurrects deleted
    rows, or re-emits compacted bytes flips the hash.

    Scale: optimize/vacuum are O(log + selected files) metadata plus
    one bounded rewrite; each CDF batch is a bounded parquet read."""
    from .sources.delta_coordinated import (
        FileCommitCoordinator,
        append_coordinated,
        create_catalog_owned,
        delete_coordinated,
        optimize_coordinated,
        read_delta_coordinated,
        snapshot_coordinated,
        stream_cdf_batches_coordinated,
        vacuum_coordinated,
    )

    base = scratch_dir(prefix="mm_co_maint_rt_")
    root = os.path.join(base, "supplier_co")
    cat = FileCommitCoordinator(os.path.join(base, "catalog"))
    s = T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").cast("bigint").alias("nationkey"),
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("bal_c"),
    )
    third = F.col("s_suppkey") % 3
    create_catalog_owned(
        s.filter(third == 0),
        root,
        cat,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    append_coordinated(s.filter(third == 1), root, cat)
    append_coordinated(s.filter(third == 2), root, cat)

    n_before = len(snapshot_coordinated(spark, root, cat).files)
    optimize_coordinated(spark, root, cat, target_files=1)
    n_after = len(snapshot_coordinated(spark, root, cat).files)
    if not n_after < n_before:
        raise RuntimeError(
            f"optimize did not compact ({n_before} -> {n_after} files)"
        )
    delete_coordinated(spark, root, cat, "s_suppkey", 2, 37)

    changes = None
    for _v, batch in stream_cdf_batches_coordinated(spark, root, cat):
        agg = batch.groupBy("nationkey").agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_inserts"),
            F.sum(
                F.when(F.col("_change_type") == "delete", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_deletes"),
        )
        if changes is None:
            changes = agg
        else:
            prev = changes.select(
                "nationkey",
                F.col("n_inserts").alias("p_i"),
                F.col("n_deletes").alias("p_d"),
            )
            changes = agg.join(prev, "nationkey", "full_outer").select(
                "nationkey",
                (
                    F.coalesce("n_inserts", F.lit(0))
                    + F.coalesce("p_i", F.lit(0))
                )
                .cast("bigint")
                .alias("n_inserts"),
                (
                    F.coalesce("n_deletes", F.lit(0))
                    + F.coalesce("p_d", F.lit(0))
                )
                .cast("bigint")
                .alias("n_deletes"),
            )

    # materialize the fold BEFORE vacuum: the CDF batches lazily read
    # the historical data files vacuum is about to reclaim (replaying
    # CDF past the vacuum horizon fails loudly by design — the row
    # consumes the feed first, exactly as a real pipeline would).
    # localCheckpoint truncates lineage to the nation-grain aggregate,
    # so nothing downstream re-reads the vacuumed generations.
    changes = changes.localCheckpoint(eager=True)
    removed = vacuum_coordinated(spark, root, cat, retain_last=1)
    if not removed:
        raise RuntimeError("vacuum reclaimed nothing after optimize+delete")

    final = (
        read_delta_coordinated(spark, root, cat)
        .groupBy("nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_final"),
            F.sum("bal_c").cast("bigint").alias("balance_mass_c"),
        )
    )
    return (
        changes.join(final, "nationkey", "left")
        .select(
            "nationkey",
            "n_inserts",
            "n_deletes",
            F.coalesce("n_final", F.lit(0)).cast("bigint").alias("n_final"),
            F.coalesce("balance_mass_c", F.lit(0))
            .cast("bigint")
            .alias("balance_mass_c"),
        )
        .orderBy("nationkey")
    )
