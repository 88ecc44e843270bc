"""Round-11 surface: column DEFAULT values (writer-v7 feature
allowColumnDefaults — CURRENT_DEFAULT fills omitted columns at write,
EXISTS_DEFAULT fills pre-ALTER files at read, on both the JVM scan and
the Spark-free python source), checkpoint protection interplay, plus
this round's exact-arithmetic analytics batch.

Determinism discipline (project-wide): every aggregate is exact BIGINT
or DECIMAL arithmetic with at most one trailing double division; ranks
and top-k carry full tie-breakers; float payloads quantize through
FLOOR(x*1000) or integer-cent recovery before any SUM.

Parity note: the reference writes managed Delta tables on a platform
where column defaults are a standard writer surface (reference:
consolidated_pipeline/1_customer_data_processing.py:50-53); the
reference itself never declares one, so these rows are extension
surface proving the protocol feature on this engine's own log.
"""

from __future__ import annotations

import glob
import os
import tempfile

from .scratch import scratch_dir
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .parallel import fan_out
from .registry import T, register


# ---------------------------------------------------------------------------
# Delta: column DEFAULT values (round-11, VERDICT r10 next-step #1)
# ---------------------------------------------------------------------------


def _build_defaults_table(spark: SparkSession, sf_dir: str, limit: int) -> str:
    """Shared construction for the defaultColumns rows: customers write
    in three batches — (1) BEFORE the column exists, (2) explicit values
    including real NULLs, (3) omitting the column under a changed
    CURRENT_DEFAULT — so one table exercises EXISTS_DEFAULT fill,
    supplied-wins, NULL-vs-missing distinction, and the live default."""
    from .sources.delta_log import (
        add_column,
        set_column_default,
        write_delta,
    )

    root = scratch_dir(prefix="mm_cd_rt_") + "/cust_defaults"
    c = (
        T(spark, sf_dir, "customer")
        .filter(f"c_custkey <= {limit}")
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_acctbal").alias("bal"),
        )
    )
    # batch 1: the column does not exist yet
    write_delta(c.filter("k % 2 = 0"), root, mode="overwrite")
    # ALTER ADD COLUMN ... DEFAULT: metadata-only; batch-1 files must
    # read back as the FOLDED constant ('STD'), never NULL
    add_column(spark, root, "tier", "string", default_sql="upper('std')")
    # batch 2: explicit values, including genuine NULLs (k % 5 = 0) —
    # the per-file distinction EXISTS_DEFAULT exists for
    write_delta(
        c.filter("k % 2 = 1 AND k % 11 != 0").withColumn(
            "tier", F.when(F.col("k") % 5 != 0, F.lit("gold"))
        ),
        root,
        mode="append",
    )
    # change the live INSERT default, then omit the column entirely
    set_column_default(spark, root, "tier", "'silver'")
    write_delta(c.filter("k % 2 = 1 AND k % 11 = 0"), root, mode="append")
    return root


@register(
    "delta_default_columns_roundtrip",
    """
    WITH src AS (
      SELECT c_custkey AS k, c_acctbal AS bal
      FROM customer WHERE c_custkey <= 2400
    ),
    tiers AS (
      SELECT k, bal,
             CASE WHEN k % 2 = 0 THEN 'STD'
                  WHEN k % 11 = 0 THEN 'silver'
                  WHEN k % 5 = 0 THEN NULL
                  ELSE 'gold' END AS tier
      FROM src
    )
    SELECT COALESCE(tier, 'none') AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
    FROM tiers GROUP BY 1 ORDER BY 1
    """,
    tags=["S6", "delta", "allowColumnDefaults", "writer-v7", "roundtrip"],
)
def q_delta_default_columns_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COLUMN DEFAULT VALUES (writer-v7 feature allowColumnDefaults,
    VERDICT r10 next-step #1): add_column(default) on a populated table
    is ONE metaData commit — pre-ALTER files read back as the folded
    EXISTS_DEFAULT constant while explicit NULLs in post-ALTER files
    stay NULL (a coalesce-based fill would conflate the two); a later
    set_column_default changes what OMITTING writes fill without
    touching history. In-query guards pin the protocol stamp
    (writer-only: minWriterVersion 7 + feature listed, reader version
    untouched), the physical absence of the column from pre-ALTER
    footers, and both metadata keys.

    Scale: the ALTER is O(1) metadata — a 100 TB table gains a
    non-NULL-backfilled column with zero data rewrite; the read-side
    footer probe is gated to tables carrying an EXISTS_DEFAULT and
    runs distributed (one KB-sized footer read per file)."""
    import pyarrow.parquet as pq

    from .sources.delta_log import read_delta, snapshot

    root = _build_defaults_table(spark, sf_dir, 2400)
    snap = snapshot(spark, root)
    proto = snap.protocol
    if proto.get("minWriterVersion") != 7 or "allowColumnDefaults" not in (
        proto.get("writerFeatures") or []
    ):
        raise RuntimeError("allowColumnDefaults writer feature not stamped")
    if proto.get("minReaderVersion") != 1 or "readerFeatures" in proto:
        raise RuntimeError(
            "writer-only feature must leave the reader version untouched"
        )
    md = {f.name: dict(f.metadata or {}) for f in snap.schema.fields}["tier"]
    if md.get("CURRENT_DEFAULT") != "'silver'":
        raise RuntimeError("live CURRENT_DEFAULT not updated by SET DEFAULT")
    if md.get("EXISTS_DEFAULT") != "'STD'":
        raise RuntimeError("EXISTS_DEFAULT not the folded ADD-time constant")
    for rel in snapshot(spark, root, 0).files:
        sch = pq.read_schema(glob.glob(os.path.join(root, rel))[0])
        if "tier" in sch.names:
            raise RuntimeError("pre-ALTER file was rewritten (has tier)")

    return (
        read_delta(spark, root)
        .groupBy(F.coalesce(F.col("tier"), F.lit("none")).alias("tier"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("bal") * 100).cast("bigint"))
            .cast("bigint")
            .alias("bal_c"),
        )
        .orderBy("tier")
    )


@register(
    "delta_default_columns_pysource",
    """
    WITH src AS (
      SELECT c_custkey AS k, c_acctbal AS bal
      FROM customer WHERE c_custkey <= 1200
    ),
    tiers AS (
      SELECT k, bal,
             CASE WHEN k % 2 = 0 THEN 'STD'
                  WHEN k % 11 = 0 THEN 'silver'
                  WHEN k % 5 = 0 THEN NULL
                  ELSE 'gold' END AS tier
      FROM src
    )
    SELECT COALESCE(tier, 'none') AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(bal * 100) AS BIGINT)) AS BIGINT) AS bal_c
    FROM tiers GROUP BY 1 ORDER BY 1
    """,
    tags=["S6", "delta", "allowColumnDefaults", "pysource"],
)
def q_delta_default_columns_pysource(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PYTHON DATASOURCE over a defaulted table: EXISTS_DEFAULT is
    parsed executor-side from the field metadata riding inside the
    schema (no JVM, no SparkSession on the worker) and filled per file
    — only files physically lacking the column get the constant, so
    explicit NULLs written after the ALTER survive. Proves the fill
    logic in BOTH readers from one construction."""
    from .sources.delta_pysource import register_delta_source

    # register_delta_source, NOT the raw dataSource.register: the reader
    # implements pushFilters, which FAILS planning on a foreign session
    # unless the runtime-settable filterPushdown conf is pinned too
    # (vanilla-gate catch, round 11)
    register_delta_source(spark)
    root = _build_defaults_table(spark, sf_dir, 1200)
    out = spark.read.format("delta_pylog").option("path", root).load()
    return (
        out.groupBy(F.coalesce(F.col("tier"), F.lit("none")).alias("tier"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("bal") * 100).cast("bigint"))
            .cast("bigint")
            .alias("bal_c"),
        )
        .orderBy("tier")
    )


# ---------------------------------------------------------------------------
# Delta: checkpoint protection (round-11, VERDICT r10 next-step #2)
# ---------------------------------------------------------------------------


@register(
    "delta_checkpoint_protection_roundtrip",
    """
    WITH src AS (
      SELECT o_orderstatus AS status, o_totalprice AS price
      FROM orders WHERE o_orderkey <= 20000
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(price * 100) AS BIGINT)) AS BIGINT)
             AS price_c
    FROM src GROUP BY 1 ORDER BY 1
    """,
    tags=["S6", "delta", "checkpointProtection", "writer-v7", "roundtrip"],
)
def q_delta_checkpoint_protection_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHECKPOINT PROTECTION (writer-v7 feature checkpointProtection,
    VERDICT r10 next-step #2) — the interplay of truncate_log (r6),
    checkpoints, and log compaction (r10): with
    delta.requireCheckpointProtectionBeforeVersion set, (a) compact_log
    REFUSES a range straddling a protected checkpoint, (b) truncate_log
    REFUSES a partial cleanup whose boundary checkpoint sits below the
    protection version, (c) replay IGNORES a pre-existing straddling
    compaction — a tampered log-only clone with deleted commits raises
    loudly instead of folding across the protected boundary — and
    (d) a one-sweep cleanup up to a checkpoint AT OR PAST the
    protection version is allowed, after which the protected checkpoint
    file still exists and the table reads correctly.

    Scale: every guard is O(log listing) driver metadata; protection
    changes WHICH cleanups are legal, never what data moves."""
    import shutil

    from .sources.delta_log import (
        DeltaProtocolError,
        compact_log,
        read_delta,
        snapshot,
        truncate_log,
        upgrade_protocol_checkpoint_protection,
        write_checkpoint,
        write_delta,
    )

    root = scratch_dir(prefix="mm_cp_rt_") + "/orders_cp"
    o = (
        T(spark, sf_dir, "orders")
        .filter("o_orderkey <= 20000")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        )
    )
    for b in range(4):  # v0..v3
        write_delta(
            o.filter(F.col("k") % 4 == b),
            root,
            mode="overwrite" if b == 0 else "append",
        )
        if b == 2:
            write_checkpoint(spark, root)  # checkpoint at v2
    compact_log(root, 1, 3)  # straddles ckpt 2 — legal pre-protection
    upgrade_protocol_checkpoint_protection(spark, root)  # v4, protects <5

    try:
        compact_log(root, 2, 4)
        raise RuntimeError("straddling compaction authored under protection")
    except DeltaProtocolError:
        pass
    try:
        truncate_log(root)
        raise RuntimeError("partial truncation below protection allowed")
    except DeltaProtocolError:
        pass

    # tamper clone (LOG ONLY — replay never touches data files): delete
    # the commits the straddling compaction covers; protected replay
    # must raise, not fold across the boundary
    tampered = root + "_tampered"
    os.makedirs(tampered)
    shutil.copytree(
        os.path.join(root, "_delta_log"),
        os.path.join(tampered, "_delta_log"),
    )
    os.remove(
        os.path.join(tampered, "_delta_log", f"{3:020d}.json")
    )
    try:
        snapshot(spark, tampered)
        raise RuntimeError("replay folded across a protected checkpoint")
    except FileNotFoundError:
        pass

    # the sanctioned one-sweep cleanup: boundary checkpoint >= 5
    write_delta(o.filter("k % 4 = 3 AND k < 0"), root, mode="append")  # v5
    write_checkpoint(spark, root)  # at v5 >= 5
    removed = truncate_log(root)
    if not removed or max(removed) != 5:
        raise RuntimeError(f"one-sweep cleanup removed {removed}")
    ckpt2 = os.path.join(root, "_delta_log", f"{2:020d}.checkpoint.parquet")
    if not os.path.exists(ckpt2):
        raise RuntimeError("protected checkpoint did not survive cleanup")
    snap = snapshot(spark, root)
    if "checkpointProtection" not in (
        snap.protocol.get("writerFeatures") or []
    ):
        raise RuntimeError("checkpointProtection feature not stamped")

    return (
        read_delta(spark, root)
        .groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("price") * 100).cast("bigint"))
            .cast("bigint")
            .alias("price_c"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Round-11 analytics batch (VERDICT r10 next-step #3): exact-arithmetic
# distribution bridges, conformance censuses, and corpus rate tables.
# Reference parity: the reference's dashboard layer aggregates the star
# schema with groupBy/window/rank (reference: Tableu dashboard/
# denormalise_table_query_fmcg.txt:1-51, 3_pricing_data_processing.py
# window top-1); these rows widen the same operator family over the
# richer synthetic tables with DuckDB oracles.
# ---------------------------------------------------------------------------


@register(
    "customer_percentile_bridge",
    """
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
    """,
    tags=["analytics", "window", "ntile", "percentile", "bridge"],
)
def q_customer_percentile_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile bridge: NTILE(4) vs the rank-derived quartile
    floor(4*(rank-1)/(n-1))+1 over the same total order — the two
    standard quartile definitions agree except at NTILE's remainder
    boundaries, and this row pins the exact equality classes per
    segment. Integer arithmetic end to end (no percent_rank float).

    Scale: one shuffle on segment for the window; segment cardinality
    is tiny so the count rollup is map-side combinable."""
    c = T(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
        "c_custkey",
    )
    w = Window.partitionBy("segment").orderBy("bal_c", "c_custkey")
    ranked = c.select(
        "segment",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.count("*")
        .over(Window.partitionBy("segment"))
        .cast("bigint")
        .alias("n"),
        F.ntile(4).over(w).cast("bigint").alias("q4"),
    )
    iq = F.when(F.col("n") == 1, F.lit(1).cast("bigint")).otherwise(
        F.expr("((rnk - 1) * 4) div (n - 1) + 1")
    )
    bridged = ranked.withColumn(
        "iq", F.when(iq > 4, F.lit(4).cast("bigint")).otherwise(iq)
    )
    return (
        bridged.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.when(F.col("q4") == F.col("iq"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_agree"),
            F.sum("q4").cast("bigint").alias("ntile_mass"),
            F.sum("iq").cast("bigint").alias("rank_quartile_mass"),
        )
        .orderBy("segment")
    )


@register(
    "order_lineitem_conformance",
    """
    WITH lc AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem GROUP BY 1
    ), joined AS (
      SELECT CASE WHEN o.o_orderkey IS NULL THEN CAST(-1 AS BIGINT)
                  WHEN lc.l_orderkey IS NULL THEN CAST(0 AS BIGINT)
                  WHEN lc.n_lines >= 7 THEN CAST(7 AS BIGINT)
                  ELSE lc.n_lines END AS lines_bucket,
             COALESCE(lc.n_lines, 0) AS n_lines,
             COALESCE(lc.qty, 0) AS qty
      FROM orders o FULL OUTER JOIN lc ON o.o_orderkey = lc.l_orderkey
    )
    SELECT lines_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines_total,
           CAST(SUM(qty) AS DOUBLE) AS qty_mass
    FROM joined GROUP BY lines_bucket ORDER BY lines_bucket
    """,
    tags=["analytics", "conformance", "full-outer-join", "census"],
)
def q_order_lineitem_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order/lineitem conformance census: full-outer join of the order
    heads against per-order line rollups, bucketed by lines-per-order
    (-1 = orphan lines, 0 = headless orders, 7 = 7-or-more). The fact
    side collapses to (orderkey) grain BEFORE the join, so the wide
    table never crosses the shuffle twice.

    Scale: groupBy(orderkey) then a same-key full join — AQE coalesces
    both sides onto one orderkey exchange."""
    li = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey")
    joined = o.join(li, o.o_orderkey == li.l_orderkey, "full_outer").select(
        F.when(F.col("o_orderkey").isNull(), F.lit(-1).cast("bigint"))
        .when(F.col("l_orderkey").isNull(), F.lit(0).cast("bigint"))
        .when(F.col("n_lines") >= 7, F.lit(7).cast("bigint"))
        .otherwise(F.col("n_lines"))
        .alias("lines_bucket"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("qty"), F.lit(0).cast("decimal(18,2)")).alias("qty"),
    )
    return (
        joined.groupBy("lines_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("n_lines").cast("bigint").alias("n_lines_total"),
            F.sum("qty").cast("double").alias("qty_mass"),
        )
        .orderBy("lines_bucket")
    )


@register(
    "supplier_flag_mix",
    """
    SELECT CAST(s.s_nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l_returnflag='A' AND l_linestatus='F'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_af,
           CAST(SUM(CASE WHEN l_returnflag='N' AND l_linestatus='F'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nf,
           CAST(SUM(CASE WHEN l_returnflag='N' AND l_linestatus='O'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_no,
           CAST(SUM(CASE WHEN l_returnflag='R' AND l_linestatus='F'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rf,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_mass
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=["analytics", "pivot", "broadcast-join", "mix"],
)
def q_supplier_flag_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier-nation returnflag x linestatus mix, pivoted to one
    row per nation (the reduced schema's stand-in for TPC-H ship-mode
    mix). Conditional-count pivot stays in one aggregation pass.

    Scale: supplier dim is broadcast; the fact aggregates map-side on
    nationkey (25 groups) so the exchange is trivially small."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag", "l_linestatus", "l_quantity"
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    def flag(rf: str, ls: str, alias: str) -> F.Column:
        return (
            F.sum(
                F.when(
                    (F.col("l_returnflag") == rf)
                    & (F.col("l_linestatus") == ls),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(alias)
        )

    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            flag("A", "F", "n_af"),
            flag("N", "F", "n_nf"),
            flag("N", "O", "n_no"),
            flag("R", "F", "n_rf"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty_mass"),
        )
        .orderBy("nationkey")
    )


@register(
    "events_dwell_deciles",
    """
    WITH gaps AS (
      SELECT user_id, event_id,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) // 1000000 AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), dec AS (
      SELECT gap_s,
             CAST(NTILE(10) OVER (ORDER BY gap_s, user_id, event_id)
                  AS BIGINT) AS decile
      FROM gaps WHERE gap_s IS NOT NULL
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
           CAST(SUM(gap_s) AS BIGINT) AS gap_mass_s
    FROM dec GROUP BY decile ORDER BY decile
    """,
    tags=["analytics", "window", "lag", "deciles", "sessionization"],
)
def q_events_dwell_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time deciles: per-user inter-event gaps (whole seconds,
    BIGINT) ranked into global NTILE(10) classes with full (gap, user,
    event) tie-breakers, then per-decile extremes and mass.

    Scale: pass one is the per-user lag window (shuffle on user_id —
    the natural key); the global decile is a single total order, which
    at 100 TB would swap to a distributed quantile sketch — this row
    exists to pin the EXACT decile semantics the sketch approximates."""
    from .functions.dates import epoch_us

    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        "event_id",
        ((epoch_us("ts") - epoch_us(F.lag("ts").over(w))) / F.lit(1000000))
        .cast("bigint")
        .alias("gap_s"),
    ).filter("gap_s IS NOT NULL")
    dec = gaps.select(
        "gap_s",
        F.ntile(10)
        .over(Window.orderBy("gap_s", "user_id", "event_id"))
        .cast("bigint")
        .alias("decile"),
    )
    return (
        dec.groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.min("gap_s").cast("bigint").alias("min_gap_s"),
            F.max("gap_s").cast("bigint").alias("max_gap_s"),
            F.sum("gap_s").cast("bigint").alias("gap_mass_s"),
        )
        .orderBy("decile")
    )


@register(
    "docs_source_contamination_rates",
    """
    WITH flagged AS (
      SELECT source,
             CASE WHEN text LIKE '%batch batch%' THEN 1 ELSE 0 END AS h1,
             CASE WHEN text LIKE '%spark window%' THEN 1 ELSE 0 END AS h2,
             CASE WHEN text LIKE '%hash scan%' THEN 1 ELSE 0 END AS h3
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN h1 + h2 + h3 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(h1) AS BIGINT) AS n_probe1,
           CAST(SUM(h2) AS BIGINT) AS n_probe2,
           CAST(SUM(h3) AS BIGINT) AS n_probe3,
           CAST((1000 * SUM(CASE WHEN h1 + h2 + h3 > 0 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS rate_pm
    FROM flagged GROUP BY source ORDER BY source
    """,
    tags=["LLM-text", "contamination", "per-source", "rates"],
)
def q_docs_source_contamination_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source contamination rates against a fixed benchmark-probe
    set (three bigram probes), reported as exact per-mille via integer
    division — the per-source drill-down of the corpus-wide
    contamination row (operators/corpus.py). A training pipeline gates
    *sources*, not the pooled corpus, so the rate table is the
    actionable artifact.

    Scale: substring probes are a JVM-side LIKE scan (no UDF, no
    tokenize); one map-side-combinable groupBy(source)."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("text").contains("batch batch"), 1)
        .otherwise(0)
        .alias("h1"),
        F.when(F.col("text").contains("spark window"), 1)
        .otherwise(0)
        .alias("h2"),
        F.when(F.col("text").contains("hash scan"), 1)
        .otherwise(0)
        .alias("h3"),
    )
    hit = (F.col("h1") + F.col("h2") + F.col("h3")) > 0
    agg = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(
            "n_contaminated"
        ),
        F.sum("h1").cast("bigint").alias("n_probe1"),
        F.sum("h2").cast("bigint").alias("n_probe2"),
        F.sum("h3").cast("bigint").alias("n_probe3"),
    )
    return agg.withColumn(
        "rate_pm", F.expr("(1000 * n_contaminated) div n_docs")
    ).orderBy("source")


@register(
    "orders_customer_cohorts",
    """
    WITH om AS (
      SELECT o_custkey,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
      FROM orders
    ), first_m AS (
      SELECT o_custkey, MIN(month_start) AS first_month FROM om GROUP BY 1
    )
    SELECT om.month_start,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT om.o_custkey) AS BIGINT) AS n_active,
           CAST(COUNT(DISTINCT CASE WHEN om.month_start = f.first_month
                                    THEN om.o_custkey END) AS BIGINT) AS n_new,
           CAST(COUNT(DISTINCT om.o_custkey)
                - COUNT(DISTINCT CASE WHEN om.month_start = f.first_month
                                      THEN om.o_custkey END)
                AS BIGINT) AS n_returning
    FROM om JOIN first_m f ON om.o_custkey = f.o_custkey
    GROUP BY om.month_start ORDER BY om.month_start
    """,
    tags=["analytics", "cohorts", "count-distinct", "monthly"],
)
def q_orders_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly new-vs-returning customer cohorts: each order month
    reports active customers, customers whose FIRST-ever order lands in
    it, and the returning remainder. Exact distinct counts.

    Scale: both the first-month rollup and the join shuffle on
    o_custkey — one reusable exchange; the month aggregation itself is
    low-cardinality."""
    om = T(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )
    first_m = om.groupBy("o_custkey").agg(
        F.min("month_start").alias("first_month")
    )
    new_flag = F.when(
        F.col("month_start") == F.col("first_month"), F.col("o_custkey")
    )
    return (
        om.join(first_m, "o_custkey")
        .groupBy("month_start")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
            F.countDistinct(new_flag).cast("bigint").alias("n_new"),
            (F.countDistinct("o_custkey") - F.countDistinct(new_flag))
            .cast("bigint")
            .alias("n_returning"),
        )
        .orderBy("month_start")
    )


@register(
    "segment_balance_median_disc",
    """
    WITH ranked AS (
      SELECT c_mktsegment AS segment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT),
                                         c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN bal_c END)
                AS BIGINT) AS median_c,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN bal_c END)
                AS BIGINT) AS p90_c
    FROM ranked GROUP BY segment ORDER BY segment
    """,
    tags=["analytics", "percentile-disc", "median", "window"],
)
def q_segment_balance_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (PERCENTILE_DISC semantics: the value
    at sorted position ceil(p*n)) per market segment, computed with the
    row_number/count window pair so both engines share one definition
    by construction — no approx-percentile, no interpolation floats.

    Scale: one shuffle on segment; the positional pick is a conditional
    MAX, map-side combinable after the window."""
    c = T(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
        "c_custkey",
    )
    wseg = Window.partitionBy("segment")
    ranked = c.select(
        "segment",
        "bal_c",
        F.row_number()
        .over(wseg.orderBy("bal_c", "c_custkey"))
        .alias("rn"),
        F.count("*").over(wseg).alias("n"),
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("bal_c"))
            )
            .cast("bigint")
            .alias("median_c"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("bal_c")
                )
            )
            .cast("bigint")
            .alias("p90_c"),
        )
        .orderBy("segment")
    )


@register(
    "events_hourly_load_profile",
    """
    SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
             AS value_mass_k
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "time", "profile", "count-distinct"],
)
def q_events_hourly_load_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x event-type load profile: counts, distinct users,
    and milli-quantized value mass — the capacity-planning rollup.
    FLOOR(value*1000) quantizes the double payload BEFORE the sum so
    the aggregate is exact BIGINT.

    Scale: 24 x |types| groups; map-side combine does nearly all the
    work, the exchange is constant-size."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.hour("ts").cast("int").alias("hour_of_day"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
            .cast("bigint")
            .alias("value_mass_k"),
        )
        .orderBy("hour_of_day", "event_type")
    )


@register(
    "lineitem_discount_effect_bridge",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS gross,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS net,
           CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS discount_given,
           ROUND(CAST(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS DOUBLE), 6) AS discount_share
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "decimal", "bridge", "rollup"],
)
def q_lineitem_discount_effect_bridge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discount-effect bridge per (returnflag, linestatus): gross
    revenue, net after discount, the discount mass itself, and the
    discount share — all sums in exact DECIMAL with the single trailing
    double division the project's determinism discipline allows.

    Scale: 4 groups, fully map-side combinable; no joins."""
    li = T(spark, sf_dir, "lineitem")
    gross = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    net = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
            "decimal(18,4)"
        )
    )
    disc = F.sum(
        (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        gross.cast("double").alias("gross"),
        net.cast("double").alias("net"),
        disc.cast("double").alias("discount_given"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "n_lines",
        "gross",
        "net",
        "discount_given",
        F.round(F.col("discount_given") / F.col("gross"), 6).alias(
            "discount_share"
        ),
    ).orderBy("l_returnflag", "l_linestatus")


@register(
    "supplier_top2_parts_by_volume",
    """
    WITH vol AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1, 2
    ), ranked AS (
      SELECT l_suppkey, l_partkey, qty, n_lines,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY qty DESC, l_partkey) AS rnk
      FROM vol
    )
    SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
           CAST(rnk AS INT) AS part_rank,
           CAST(l_partkey AS BIGINT) AS partkey,
           CAST(qty AS DOUBLE) AS qty_mass,
           n_lines
    FROM ranked WHERE rnk <= 2 ORDER BY suppkey, part_rank
    """,
    tags=["analytics", "window", "topk-per-group", "rollup"],
)
def q_supplier_top2_parts_by_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-2 parts per supplier by exact shipped-quantity mass, with
    the full (qty DESC, partkey) tie-break so rank 1/2 is deterministic
    on both engines. Aggregate-THEN-rank: the window runs over the
    (supplier, part) rollup, never the raw fact.

    Scale: the rollup shuffles once on (suppkey, partkey); the window
    re-shuffles the collapsed grain on suppkey — both exchanges carry
    rollup rows, not fact rows."""
    li = T(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("qty").desc(), F.col("l_partkey")
    )
    return (
        vol.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 2")
        .select(
            F.col("l_suppkey").cast("bigint").alias("suppkey"),
            F.col("rnk").cast("int").alias("part_rank"),
            F.col("l_partkey").cast("bigint").alias("partkey"),
            F.col("qty").cast("double").alias("qty_mass"),
            "n_lines",
        )
        .orderBy("suppkey", "part_rank")
    )


@register(
    "parts_brand_price_rank_matrix",
    """
    WITH mass AS (
      SELECT CAST(p_size // 10 AS INT) AS size_band, p_brand,
             CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT))
                  AS BIGINT) AS price_mass_c,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT size_band, p_brand,
           CAST(DENSE_RANK() OVER (PARTITION BY size_band
                                   ORDER BY price_mass_c DESC, p_brand)
                AS INT) AS brand_rank,
           price_mass_c, n_parts
    FROM mass ORDER BY size_band, brand_rank, p_brand
    """,
    tags=["analytics", "dense-rank", "matrix", "rollup"],
)
def q_parts_brand_price_rank_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brand rank matrix: within each part-size band, brands
    dense-ranked by exact retail-price-cent mass (tie-break brand).
    Integer cents end to end.

    Scale: rollup first (size_band x brand is tiny), window second —
    the rank never sees row-level data."""
    p = T(spark, sf_dir, "part")
    mass = p.groupBy(
        F.expr("p_size div 10").cast("int").alias("size_band"), "p_brand"
    ).agg(
        F.sum(F.round(F.col("p_retailprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("price_mass_c"),
        F.count("*").cast("bigint").alias("n_parts"),
    )
    w = Window.partitionBy("size_band").orderBy(
        F.col("price_mass_c").desc(), F.col("p_brand")
    )
    return (
        mass.withColumn("brand_rank", F.dense_rank().over(w).cast("int"))
        .select("size_band", "p_brand", "brand_rank", "price_mass_c", "n_parts")
        .orderBy("size_band", "brand_rank", "p_brand")
    )


@register(
    "customer_order_gap_bands",
    """
    WITH gaps AS (
      SELECT date_diff('day',
                       CAST(LAG(o_orderdate) OVER w AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT CASE WHEN gap_days <= 7 THEN '00-07'
                WHEN gap_days <= 30 THEN '08-30'
                WHEN gap_days <= 90 THEN '31-90'
                WHEN gap_days <= 365 THEN '91-365'
                ELSE '365+' END AS gap_band,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap,
           CAST(SUM(gap_days) AS BIGINT) AS gap_mass_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    tags=["analytics", "window", "lag", "histogram", "repurchase"],
)
def q_customer_order_gap_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase-gap histogram: whole-day gaps between each customer's
    consecutive orders (lag over the per-customer order timeline),
    banded into the standard retention buckets. Dates are truncated to
    DAY on both engines before differencing so the gap is an exact
    BIGINT.

    Scale: one shuffle on o_custkey for the lag window; the band
    rollup is 5 groups, map-side combinable."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        )
        .cast("bigint")
        .alias("gap_days")
    ).filter("gap_days IS NOT NULL")
    band = (
        F.when(F.col("gap_days") <= 7, "00-07")
        .when(F.col("gap_days") <= 30, "08-30")
        .when(F.col("gap_days") <= 90, "31-90")
        .when(F.col("gap_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return (
        gaps.groupBy(band.alias("gap_band"))
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.min("gap_days").cast("bigint").alias("min_gap"),
            F.max("gap_days").cast("bigint").alias("max_gap"),
            F.sum("gap_days").cast("bigint").alias("gap_mass_days"),
        )
        .orderBy("gap_band")
    )


@register(
    "docs_length_ecdf_points",
    """
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN n_chars END)
                AS BIGINT) AS p25_chars,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END)
                AS BIGINT) AS p50_chars,
           CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN n_chars END)
                AS BIGINT) AS p75_chars,
           CAST(MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN n_chars END)
                AS BIGINT) AS p95_chars
    FROM ranked GROUP BY lang ORDER BY lang
    """,
    tags=["LLM-text", "ecdf", "percentile-disc", "length"],
)
def q_docs_length_ecdf_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length ECDF points (exact discrete
    p25/p50/p75/p95 via the positional ceil(p*n) rule) — the length
    profile a corpus-curation pass reads before setting truncation and
    min-length gates per language.

    Scale: shuffle on lang for the window; conditional-MAX pick after
    — same shape as segment_balance_median_disc."""
    d = T(spark, sf_dir, "documents").select("lang", "n_chars", "doc_id")
    wl = Window.partitionBy("lang")
    ranked = d.select(
        "lang",
        "n_chars",
        F.row_number().over(wl.orderBy("n_chars", "doc_id")).alias("rn"),
        F.count("*").over(wl).alias("n"),
    )

    def pick(expr: str, alias: str) -> F.Column:
        return (
            F.max(F.when(F.col("rn") == F.expr(expr), F.col("n_chars")))
            .cast("bigint")
            .alias(alias)
        )

    return (
        ranked.groupBy("lang")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            pick("(n + 3) div 4", "p25_chars"),
            pick("(n + 1) div 2", "p50_chars"),
            pick("(3 * n + 3) div 4", "p75_chars"),
            pick("(19 * n + 19) div 20", "p95_chars"),
        )
        .orderBy("lang")
    )


@register(
    "orders_priority_value_ntile_grid",
    """
    WITH cells AS (
      SELECT o_orderpriority AS priority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
             CAST(NTILE(5) OVER (PARTITION BY o_orderpriority
                                 ORDER BY CAST(ROUND(o_totalprice * 100)
                                               AS BIGINT),
                                          o_orderkey) AS INT) AS value_band
      FROM orders
    )
    SELECT priority, value_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(price_c) AS BIGINT) AS min_price_c,
           CAST(MAX(price_c) AS BIGINT) AS max_price_c,
           CAST(SUM(price_c) AS BIGINT) AS price_mass_c
    FROM cells GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["analytics", "ntile", "grid", "window"],
)
def q_orders_priority_value_ntile_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Priority x value-quintile grid: orders NTILE(5)-banded by exact
    price cents within each priority (orderkey tie-break), each cell
    reporting count, range, and mass — the skew-visibility matrix for
    order routing.

    Scale: one shuffle on priority for the window (5 partitions is the
    worst case — at real scale this would salt or pre-aggregate; the
    row pins the exact banding semantics)."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
        "o_orderkey",
    )
    w = Window.partitionBy("priority").orderBy("price_c", "o_orderkey")
    cells = o.select(
        "priority",
        "price_c",
        F.ntile(5).over(w).cast("int").alias("value_band"),
    )
    return (
        cells.groupBy("priority", "value_band")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.min("price_c").cast("bigint").alias("min_price_c"),
            F.max("price_c").cast("bigint").alias("max_price_c"),
            F.sum("price_c").cast("bigint").alias("price_mass_c"),
        )
        .orderBy("priority", "value_band")
    )


# ---------------------------------------------------------------------------
# multimodal: arithmetic-coded JPEG (round-11, VERDICT r10 next-step #4)
# ---------------------------------------------------------------------------


@register(
    "media_jpeg_arith_roundtrip",
    """
    SELECT CAST(doc_id % 4 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(COUNT(*) AS BIGINT) AS n_byte_equal,
           CAST(COUNT(*) AS BIGINT) AS n_dims_ok,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gray,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_color,
           CAST(SUM((16 + (doc_id % 3) * 8) * (16 + (doc_id % 2) * 8)
                    * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END))
                AS BIGINT) AS px_mass
    FROM documents
    WHERE doc_id < 200
    GROUP BY 1 ORDER BY 1
    """,
    tags=["LLM-multimodal", "jpeg", "arithmetic", "codec", "roundtrip"],
)
def q_media_jpeg_arith_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARITHMETIC-coded JPEG (operators/jpeg_arith.py: T.81 Annex-D
    QM-coder + Annex-F conditioning, SOF9/DAC marker syntax): per
    document synthesize a deterministic ramp — grayscale for even
    doc_ids (rotating non-default DAC conditioning L/U/Kx), YCbCr color
    for odd (rotating 4:4:4 / 4:2:0 / 4:2:2) — encode it with BOTH
    entropy layers, decode both, and pin the decodes BYTE-EQUAL
    (n_byte_equal == n_images): the encoder shares the Huffman
    baseline's forward DCT/quantization, so the arithmetic layer is
    correct iff the pixels match exactly — an exact-equality oracle for
    a lossy codec family, the same trick the progressive codec pinned
    in round 10.

    Scale: encode+decode are per-row numpy kernels inside Arrow
    batches (mapInPandas) — no shuffle, no driver bytes; the entropy
    walk is the sequential part the format forces."""
    import numpy as np
    import pandas as pd

    from .operators.multimodal import _decode_payload

    # round 15 (guide §2.2): the single-row-group scan plans as ONE
    # task, serializing the heavy per-row numpy codec — fan the tiny
    # doc_id frame out so the kernel runs on all cores (no-op on split
    # inputs; measured 2.28s single-task stage -> parallel)
    docs = fan_out(
        T(spark, sf_dir, "documents")
        .filter("doc_id < 200")
        .select(F.col("doc_id").cast("long"))
    )

    out_schema = (
        "doc_id long, dec_width int, dec_height int, is_gray boolean, "
        "byte_equal boolean, dims_ok boolean, n_px long"
    )

    def roundtrip(batches):
        from .operators.jpeg import (
            jpeg_color_decode,
            jpeg_color_encode,
            jpeg_gray_decode,
            jpeg_gray_encode,
        )
        from .operators.jpeg_arith import (
            jpeg_arith_decode,
            jpeg_color_encode_arith,
            jpeg_gray_encode_arith,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 16 + (d % 3) * 8
                h = 16 + (d % 2) * 8
                if d % 2 == 0:
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = (40 + 2 * xx + 3 * yy + d % 40).astype(np.uint8)
                    dc_l, dc_u, kx = [(0, 1, 5), (1, 3, 20), (0, 2, 1)][
                        d % 3
                    ]
                    huff = jpeg_gray_encode(img)
                    arith = jpeg_gray_encode_arith(
                        img, dc_l=dc_l, dc_u=dc_u, kx=kx
                    )
                    dw, dh, dec_h = jpeg_gray_decode(huff)
                    aw, ah, dec_a = jpeg_arith_decode(arith)
                else:
                    img = np.zeros((h, w, 3), np.uint8)
                    img[..., 0] = (
                        40 + 2 * np.arange(w)[None, :]
                        + 3 * np.arange(h)[:, None] + d % 40
                    )
                    img[..., 1] = (
                        90 + np.arange(w)[None, :]
                        + np.arange(h)[:, None] + d % 40
                    )
                    img[..., 2] = 10 + 2 * np.arange(w)[None, :] + d % 40
                    sub = ["444", "420", "422"][d % 3]
                    huff = jpeg_color_encode(img, sub)
                    arith = jpeg_color_encode_arith(img, sub)
                    dw, dh, dec_h = jpeg_color_decode(huff)
                    aw, ah, dec_a = jpeg_arith_decode(arith)
                rows.append(
                    (
                        d, aw, ah, d % 2 == 0,
                        bool(np.array_equal(dec_h, dec_a)),
                        (dw, dh) == (aw, ah) == (w, h),
                        int(dec_a.size),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "dec_width", "dec_height", "is_gray",
                    "byte_equal", "dims_ok", "n_px",
                ],
            )

    decoded = docs.mapInPandas(roundtrip, out_schema)

    # pin that the shared multimodal dispatch routes SOF9 payloads to
    # the REAL arithmetic kernel, not the stub
    from .operators.jpeg_arith import jpeg_gray_encode_arith as _enc_probe

    probe = _decode_payload(
        _enc_probe(np.full((8, 8), 128, dtype=np.uint8)), strict=True
    )
    if probe["decoder"] != "jpeg":
        raise RuntimeError(f"arith JPEG routed to {probe['decoder']!r}")

    return (
        decoded.groupBy((F.col("doc_id") % 4).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.sum(F.when(F.col("byte_equal"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_byte_equal"),
            F.sum(F.when(F.col("dims_ok"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dims_ok"),
            F.sum(F.when(F.col("is_gray"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_gray"),
            F.sum(F.when(~F.col("is_gray"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_color"),
            F.sum("n_px").cast("bigint").alias("px_mass"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Delta: VARIANT columns (round-11 extension; delta.io PROTOCOL.md
# variantType, the reader-writer feature Spark 4 supports natively)
# ---------------------------------------------------------------------------


@register(
    "delta_variant_roundtrip",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_mass,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    tags=["S6", "delta", "variantType", "semi-structured", "roundtrip"],
)
def q_delta_variant_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT columns in Delta (reader-writer feature variantType):
    the events table's JSON props parse into a real VARIANT column,
    land in a Delta table (protocol stamped minReader 3 / minWriter 7
    with variantType on BOTH feature lists), read back through the log
    engine's scan still typed variant, and variant_get() extraction
    reproduces DuckDB's json_extract over the original strings. An
    appended second batch proves post-create writes need no further
    protocol change; in-query guards pin the stamp and the type.

    Scale: VARIANT is the semi-structured column type a 100 TB event
    lake stores instead of JSON strings — shredded binary encoding,
    typed extraction without per-row parsing. The table build is one
    narrow projection + two commits; the rollup aggregates map-side.

    Known gap (documented): this container's pyarrow cannot open
    parquet footers carrying the VARIANT logical type, so the python
    datasource raises its protocol gate for these tables and per-file
    stats are absent (skipping degrades to scan-all, never to wrong
    results)."""
    from .sources.delta_log import read_delta, snapshot, write_delta

    root = scratch_dir(prefix="mm_vt_rt_") + "/events_variant"
    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.parse_json("props").alias("props"),
    )
    write_delta(e.filter("event_id % 2 = 0"), root, mode="overwrite")
    write_delta(e.filter("event_id % 2 = 1"), root, mode="append")

    snap = snapshot(spark, root)
    proto = snap.protocol
    if "variantType" not in (proto.get("readerFeatures") or []):
        raise RuntimeError("variantType missing from readerFeatures")
    if "variantType" not in (proto.get("writerFeatures") or []):
        raise RuntimeError("variantType missing from writerFeatures")
    if (proto["minReaderVersion"], proto["minWriterVersion"]) != (3, 7):
        raise RuntimeError(f"unexpected protocol versions: {proto}")

    back = read_delta(spark, root)
    if dict(back.dtypes)["props"] != "variant":
        raise RuntimeError("props did not read back as VARIANT")

    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.expr("variant_get(props, '$.k', 'bigint')"))
            .cast("bigint")
            .alias("k_mass"),
            F.min(F.expr("variant_get(props, '$.k', 'bigint')"))
            .cast("bigint")
            .alias("k_min"),
            F.max(F.expr("variant_get(props, '$.k', 'bigint')"))
            .cast("bigint")
            .alias("k_max"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Delta: catalog-owned commits (round-11 extension; delta.io PROTOCOL.md
# catalogOwned-preview — commit ownership at a coordinator)
# ---------------------------------------------------------------------------


@register(
    "delta_catalog_owned_roundtrip",
    """
    WITH src AS (
      SELECT o_orderkey AS k, o_orderpriority AS priority, o_totalprice
      FROM orders WHERE o_orderkey <= 6000
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_c
    FROM src GROUP BY priority ORDER BY priority
    """,
    tags=["S6", "delta", "catalogOwned", "coordinated-commits", "roundtrip"],
)
def q_delta_catalog_owned_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CATALOG-OWNED COMMITS (reader-writer feature catalogOwned-preview,
    sources/delta_coordinated.py): the table is created then handed to a
    commit coordinator; three batches land as STAGED commits
    (_delta_log/_staged_commits/<v>.<uuid>.json) ratified by the
    coordinator — no put-if-absent on the numbered log anywhere — with
    the last one left unbackfilled plus a forged never-ratified staged
    file, so the read exercises both invisibility rules: the
    coordinated read consults the catalog, backfills exactly the
    ratified history, and ignores the garbage; in-query guards pin that
    a FILESYSTEM-ONLY read raises the protocol gate (the spec's
    stale-listing hazard) and that the unbackfilled commit was indeed
    absent from the numbered log before the read.

    Scale: ratification is one conditional write at the catalog —
    commit latency stops depending on log LISTing and on the object
    store's atomic-create support (the S3 multi-writer problem);
    backfill is lazy O(unbackfilled) metadata work any client may do."""
    from .sources.delta_coordinated import (
        _stage_commit,
        append_coordinated,
        create_catalog_owned,
        FileCommitCoordinator,
        read_delta_coordinated,
    )
    from .sources.delta_log import DeltaProtocolError
    from .sources.delta_log import read_delta as _fs_read

    base = scratch_dir(prefix="mm_co_rt_")
    root = os.path.join(base, "orders_owned")
    cat = FileCommitCoordinator(os.path.join(base, "catalog"))
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
    ).filter("k <= 6000")

    create_catalog_owned(o.filter("k % 3 = 0"), root, cat)
    append_coordinated(o.filter("k % 3 = 1"), root, cat)
    v_last = append_coordinated(o.filter("k % 3 = 2"), root, cat)

    # the last ratified commit must still be staged-only...
    numbered = os.path.join(root, "_delta_log", f"{v_last:020d}.json")
    if os.path.exists(numbered):
        raise RuntimeError("last commit was backfilled prematurely")
    # ...a never-ratified staged file must be invisible...
    _stage_commit(root, 99, [{"commitInfo": {"timestamp": 1}}])
    # ...and a filesystem-only reader must refuse the table outright
    try:
        _fs_read(spark, root)
        raise RuntimeError("filesystem read of a catalog-owned table")
    except DeltaProtocolError:
        pass

    out = read_delta_coordinated(spark, root, cat)
    if not os.path.exists(numbered):
        raise RuntimeError("coordinated read did not backfill")
    return (
        out.groupBy("priority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("price_c"),
        )
        .orderBy("priority")
    )
