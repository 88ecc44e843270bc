"""Round-10 surface: COLOR JPEG (3-component YCbCr with 4:4:4/4:2:0
subsampling — operators/jpeg.py's round-10 extension), the Delta
writer increment TYPE WIDENING (reader-writer feature typeWidening:
per-field delta.typeChanges metadata, narrow physical files upcast at
scan) and MINOR LOG COMPACTION (``<s>.<e>.compacted.json`` replayed in
place of deleted commit JSONs by both readers), plus a new
exact-arithmetic analytics batch.

Determinism discipline (project-wide): every aggregate is exact BIGINT
or DECIMAL arithmetic with at most one trailing double division; ranks
and top-k carry full tie-breakers; float payloads quantize through
FLOOR(x*1000) or integer-cent recovery before any SUM.

Parity note: the reference's platform widens Delta schemas on
mergeSchema writes and compacts its logs automatically (delta.io
PROTOCOL.md typeWidening / log compaction); these rows prove the same
protocol features on this engine's own log (reference:
1_customer_data_processing.py writes Delta for every table).
"""

from __future__ import annotations

import glob
import os
import tempfile

from .scratch import scratch_dir
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .parallel import fan_out
from .registry import T, dsum, register, sql_dsum


def drop_first_add(commit_path: str) -> None:
    """Tamper helper shared with tests/test_version_checksum.py: rewrite
    a commit JSON without its first add action — the corruption the
    version-checksum verifier must catch."""
    import json as _json

    lines = [
        _json.loads(line)
        for line in open(commit_path, encoding="utf-8")
        if line.strip()
    ]
    kept, dropped = [], False
    for a in lines:
        if "add" in a and not dropped:
            dropped = True
            continue
        kept.append(a)
    if not dropped:
        raise ValueError(f"no add action in {commit_path}")
    with open(commit_path, "w", encoding="utf-8") as fh:
        for a in kept:
            fh.write(_json.dumps(a) + "\n")


# ---------------------------------------------------------------------------
# multimodal: color JPEG (round-10, VERDICT r9 next-step #1)
# ---------------------------------------------------------------------------


@register(
    "media_jpeg_color_roundtrip",
    """
    SELECT CAST(doc_id % 4 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(COUNT(*) AS BIGINT) AS n_dims_ok,
           CAST(COUNT(*) AS BIGINT) AS n_err_le_14,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_420,
           CAST(SUM((16 + (doc_id % 3) * 8) * (16 + (doc_id % 2) * 8) * 3)
                AS BIGINT) AS px_mass
    FROM documents
    WHERE doc_id < 240
    GROUP BY 1 ORDER BY 1
    """,
    tags=["LLM-multimodal", "jpeg", "color", "codec", "roundtrip"],
)
def q_media_jpeg_color_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR JPEG decode (operators/jpeg.py round-10: 3-component YCbCr,
    Annex-K chroma tables, interleaved MCUs, BT.601): synthesize a
    deterministic RGB ramp per document, ENCODE it — 4:2:0 for even
    doc_ids, 4:4:4 for odd — and DECODE the bytes back, executor-side
    in one Arrow-batched mapInPandas pass. Oracle-checkable facts:
    dimensions round-trip exactly, the max channel error on smooth
    ramps is bounded by 14 (deterministic — the codec is pure numpy
    float64; chroma quantization dominates the bound), and px_mass sums
    decoded width*height*channels.

    Scale: encode+decode are per-row numpy kernels inside Arrow
    batches — no shuffle, no driver bytes; at 100 TB the same pass
    rides mapInPandas partition-parallel."""
    import numpy as np
    import pandas as pd

    from .operators.multimodal import _decode_payload

    # round 15 (guide §2.2): the single-row-group scan plans as ONE
    # task, serializing the heavy per-row numpy codec — fan the tiny
    # doc_id frame out so the kernel runs on all cores (no-op on split
    # inputs; measured 2.28s single-task stage -> parallel)
    docs = fan_out(
        T(spark, sf_dir, "documents")
        .filter("doc_id < 240")
        .select(F.col("doc_id").cast("long"))
    )

    out_schema = (
        "doc_id long, dec_width int, dec_height int, n_channels int, "
        "dims_ok boolean, max_err int, used_420 boolean"
    )

    def roundtrip(batches):
        from .operators.jpeg import jpeg_color_decode, jpeg_color_encode

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 16 + (d % 3) * 8
                h = 16 + (d % 2) * 8
                # smooth ramps sized to stay inside uint8 WITHOUT
                # wrapping — a modulo wrap is a hard edge, and DCT
                # ringing on hard edges is bounded only by the quant
                # tables (~100), not the smooth-signal bound asserted
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
                sub = "420" if d % 2 == 0 else "444"
                payload = jpeg_color_encode(img, sub)
                dw, dh, dec = jpeg_color_decode(payload)
                err = int(np.abs(dec.astype(int) - img.astype(int)).max())
                rows.append(
                    (d, dw, dh, dec.shape[2], (dw, dh) == (w, h), err,
                     sub == "420")
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "dec_width", "dec_height", "n_channels",
                    "dims_ok", "max_err", "used_420",
                ],
            )

    decoded = docs.mapInPandas(roundtrip, out_schema)

    # pin that the shared multimodal dispatch routes 3-component FFD8
    # payloads to the REAL color kernel, not the stub
    from .operators.jpeg import jpeg_color_encode

    probe = _decode_payload(
        jpeg_color_encode(np.full((8, 8, 3), 128, dtype=np.uint8)),
        strict=True,
    )
    if probe["decoder"] != "jpeg":
        raise RuntimeError(f"color JPEG routed to {probe['decoder']!r}")

    return (
        decoded.groupBy((F.col("doc_id") % 4).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.sum(F.when(F.col("dims_ok"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dims_ok"),
            F.sum(F.when(F.col("max_err") <= 14, 1).otherwise(0))
            .cast("bigint")
            .alias("n_err_le_14"),
            F.sum(F.when(F.col("used_420"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_420"),
            F.sum(
                F.col("dec_width").cast("long")
                * F.col("dec_height").cast("long")
                * F.col("n_channels").cast("long")
            ).cast("bigint").alias("px_mass"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Delta: type widening (round-10, VERDICT r9 next-step #3a)
# ---------------------------------------------------------------------------


@register(
    "delta_type_widening_roundtrip",
    """
    WITH src AS (
      SELECT l_orderkey % 3 AS grp,
             CAST(l_quantity AS INTEGER) AS qty,
             CAST(l_discount AS REAL) AS disc_f
      FROM lineitem
      WHERE l_orderkey <= 2000 AND l_linenumber = 1
    )
    SELECT CASE grp WHEN 0 THEN 'b1' WHEN 1 THEN 'b2' ELSE 'b3' END AS src,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(qty AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(CAST(disc_f AS DOUBLE) * 100) AS BIGINT))
                AS BIGINT) AS sum_disc_c
    FROM src GROUP BY grp ORDER BY src
    """,
    tags=["S6", "delta", "typeWidening", "writer-v7", "roundtrip"],
)
def q_delta_type_widening_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TYPE WIDENING (reader-writer feature typeWidening, VERDICT r9
    next-step #3): create a table with INT/FLOAT columns under
    delta.enableTypeWidening, append a LONG/DOUBLE batch (the table
    widens, per-field delta.typeChanges metadata records the change),
    then append another narrow batch (upcast to the widened types).
    The scan reads PRE-WIDEN files — physically still int32/float — and
    upcasts them per the feature's read contract; the query asserts the
    protocol stamp, the metadata trail, AND the physical narrowness of
    the version-0 files before aggregating.

    Discount values survive the float32 round-trip exactly enough that
    ROUND(disc*100) recovers the integer cents on both engines — the
    aggregation is pure BIGINT arithmetic.

    Scale: widening is an O(1) metaData commit — zero data rewritten;
    old files upcast lazily at scan, exactly how a 100 TB table avoids
    a petabyte rewrite for an int->long migration."""
    import pyarrow.parquet as pq

    from .sources.delta_log import read_delta, snapshot, write_delta

    root = scratch_dir(prefix="mm_tw_rt_") + "/li_widen"
    li = (
        T(spark, sf_dir, "lineitem")
        .filter("l_orderkey <= 2000 AND l_linenumber = 1")
        .select(
            (F.col("l_orderkey") % 3).alias("grp"),
            F.col("l_quantity").cast("int").alias("qty"),
            F.col("l_discount").cast("float").alias("disc_f"),
        )
    )
    b1 = li.filter("grp = 0").select(
        F.lit("b1").alias("src"), "qty", "disc_f"
    )
    write_delta(
        b1, root, mode="overwrite",
        configuration={"delta.enableTypeWidening": "true"},
    )
    v0_files = set(snapshot(spark, root, 0).files)
    b2 = li.filter("grp = 1").select(
        F.lit("b2").alias("src"),
        F.col("qty").cast("long").alias("qty"),
        F.col("disc_f").cast("double").alias("disc_f"),
    )
    write_delta(b2, root, mode="append")  # widens int->long, float->double
    b3 = li.filter("grp = 2").select(
        F.lit("b3").alias("src"), "qty", "disc_f"
    )
    write_delta(b3, root, mode="append")  # narrow incoming: upcasts

    snap = snapshot(spark, root)
    by_name = {f.name: f for f in snap.schema.fields}
    if by_name["qty"].metadata.get("delta.typeChanges") != [
        {"fromType": "integer", "toType": "long"}
    ]:
        raise RuntimeError("qty widen not recorded in delta.typeChanges")
    if by_name["disc_f"].metadata.get("delta.typeChanges") != [
        {"fromType": "float", "toType": "double"}
    ]:
        raise RuntimeError("disc_f widen not recorded in delta.typeChanges")
    if "typeWidening" not in set(snap.protocol.get("readerFeatures") or []):
        raise RuntimeError("typeWidening reader feature not stamped")
    for rel in v0_files:
        sch = pq.read_schema(glob.glob(os.path.join(root, rel))[0])
        if str(sch.field("qty").type) != "int32":
            raise RuntimeError("pre-widen file was rewritten (not int32)")

    out = read_delta(spark, root)
    if dict(out.dtypes)["qty"] != "bigint":
        raise RuntimeError("scan did not upcast qty to bigint")
    return (
        out.groupBy("src")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("qty").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.sum(F.round(F.col("disc_f") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_disc_c"),
        )
        .orderBy("src")
    )


@register(
    "delta_type_widening_pysource",
    """
    SELECT CAST(l_returnflag AS VARCHAR) AS flag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST(l_quantity AS INTEGER) AS BIGINT)) AS BIGINT)
             AS sum_qty
    FROM lineitem
    WHERE l_orderkey <= 1500 AND l_linenumber <= 2 AND l_orderkey > 700
    GROUP BY 1 ORDER BY 1
    """,
    tags=["S6", "delta", "typeWidening", "pysource", "pruning"],
)
def q_delta_type_widening_pysource(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PYTHON DATASOURCE over a WIDENED table: plan-time schema from
    the widened metaData (qty is long), per-file pyarrow decode casts
    the narrow int32 payloads up, and pushed-filter stats pruning still
    plans strictly fewer files. The vanilla-gate lesson (r7-r9) says
    every pysource row must also hold on a default-conf session —
    register_delta_source pins its own conf."""
    from .sources.delta_log import write_delta
    from .sources.delta_pysource import (
        DeltaLogBatchReader,
        _table_schema,
        register_delta_source,
    )
    from pyspark.sql.datasource import GreaterThan

    root = scratch_dir(prefix="mm_tw_ps_") + "/li_widen_ps"
    li = (
        T(spark, sf_dir, "lineitem")
        .filter("l_orderkey <= 1500 AND l_linenumber <= 2")
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("int").alias("qty"),
        )
    )
    # several narrow files across the key range (stats prune on okey)
    write_delta(
        li.filter("okey <= 500").repartition(2), root, mode="overwrite",
        configuration={"delta.enableTypeWidening": "true"},
    )
    write_delta(li.filter("okey > 500 AND okey <= 1000").repartition(2),
                root, mode="append")
    # the widening append (long qty)
    write_delta(
        li.filter("okey > 1000")
        .withColumn("qty", F.col("qty").cast("long"))
        .repartition(2),
        root, mode="append",
    )

    schema, _pcols = _table_schema(root)
    if dict((f.name, f.dataType.simpleString()) for f in schema.fields)[
        "qty"
    ] != "bigint":
        raise RuntimeError("pysource plan schema did not widen qty")
    probe = DeltaLogBatchReader({"path": root}, schema)
    n_all = len(probe.partitions())
    probe.pushFilters([GreaterThan(("okey",), 700)])
    n_pruned = len(probe.partitions())
    if not (1 <= n_pruned < n_all):
        raise RuntimeError(
            f"expected pruned plan ({n_pruned}) strictly under {n_all} files"
        )
    register_delta_source(spark)
    return (
        spark.read.format("delta_pylog")
        .option("path", root)
        .load()
        .filter("okey > 700")
        .groupBy("flag")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("qty").cast("bigint")).cast("bigint").alias("sum_qty"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# Delta: minor log compaction (round-10, VERDICT r9 next-step #3b)
# ---------------------------------------------------------------------------


@register(
    "delta_log_compaction_roundtrip",
    """
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum}
    FROM orders
    WHERE o_orderkey <= 4000
      AND NOT (o_orderkey % 4 IN (0, 1) AND o_orderkey % 10 = 7)
    GROUP BY 1 ORDER BY 1
    """.format(dsum=sql_dsum("o_totalprice", "price_mass")),
    tags=["S6", "delta", "log-compaction", "roundtrip"],
)
def q_delta_log_compaction_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MINOR LOG COMPACTION (delta.io PROTOCOL.md, VERDICT r9 next-step
    #3): build a 4-commit history (overwrite, append, copy-on-write
    DELETE, append), author ``1.3.compacted.json`` via compact_log,
    DELETE the three individual commit JSONs, then append once more —
    the new commit's timestamp clamp must read its predecessor's
    commitInfo THROUGH the compaction file. The final scan replays
    v0 + the compaction + v4 and must match the orders-level oracle.

    Scale: compaction is O(actions) driver metadata work, no data
    movement; a 1000-commit tail between checkpoints becomes one
    sequential read for every later snapshot."""
    from .sources.delta_log import (
        compact_log,
        delete_rows,
        read_delta,
        snapshot,
        write_delta,
    )

    root = scratch_dir(prefix="mm_compact_rt_") + "/orders_compact"
    o = (
        T(spark, sf_dir, "orders")
        .filter("o_orderkey <= 4000")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    write_delta(o.filter("o_orderkey % 4 = 0"), root, mode="overwrite")
    write_delta(o.filter("o_orderkey % 4 = 1"), root, mode="append")
    delete_rows(spark, root, "o_orderkey % 10 = 7")  # v2
    write_delta(o.filter("o_orderkey % 4 = 2"), root, mode="append")  # v3

    cpath = compact_log(root, 1, 3)
    for v in (1, 2, 3):
        os.remove(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    if not os.path.exists(cpath):
        raise RuntimeError("compaction file missing")

    write_delta(o.filter("o_orderkey % 4 = 3"), root, mode="append")  # v4
    snap = snapshot(spark, root)
    if snap.version != 4:
        raise RuntimeError(f"expected version 4 after replay, got {snap.version}")

    return (
        read_delta(spark, root)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            dsum("o_totalprice", "price_mass"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# round-10 analytics batch: exact-arithmetic, oracle-backed
# ---------------------------------------------------------------------------


@register(
    "orders_quarter_momentum",
    f"""
    WITH per_q AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(quarter FROM o_orderdate) AS qtr,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             {sql_dsum("o_totalprice", "price_mass")}
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(yr AS BIGINT) AS yr, CAST(qtr AS BIGINT) AS qtr,
           n_orders, price_mass,
           CAST(n_orders - LAG(n_orders) OVER (ORDER BY yr, qtr)
                AS BIGINT) AS delta_n
    FROM per_q ORDER BY yr, qtr
    """,
    tags=["A1", "W1", "analytics", "window"],
)
def q_orders_quarter_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter order momentum: one shuffle to the quarter
    grain, then a LAG over the (tiny) quarter series — the window input
    is ~28 rows regardless of table size, so the single-partition
    window is O(quarters), not O(orders)."""
    o = T(spark, sf_dir, "orders")
    per_q = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
    ).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        dsum("o_totalprice", "price_mass"),
    )
    w = Window.orderBy("yr", "qtr")
    return (
        per_q.withColumn(
            "delta_n",
            (F.col("n_orders") - F.lag("n_orders").over(w)).cast("bigint"),
        )
        .orderBy("yr", "qtr")
    )


@register(
    "order_to_ship_latency_bands",
    """
    SELECT l.l_returnflag AS flag,
           CAST(LEAST(GREATEST(CAST(l.l_shipdate AS DATE)
                               - CAST(o.o_orderdate AS DATE), 0) // 30, 4)
                AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN CAST(l.l_shipdate AS DATE)
                              < CAST(o.o_orderdate AS DATE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_backdated,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["J2", "A1", "analytics"],
)
def q_order_to_ship_latency_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency histogram: equi-join on the order key
    (the natural shuffle key both tables already aggregate on), 30-day
    bands capped at band 4, backdated ship dates (the synthetic data
    has them) clamped into band 0 and counted separately — the clamp
    also sidesteps DuckDB's truncating vs Spark's flooring integer
    division on negatives."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    gap = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.least(F.floor(F.greatest(gap, F.lit(0)) / 30), F.lit(4))
            .cast("bigint")
            .alias("band"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.when(gap < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_backdated"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
        .orderBy("flag", "band")
    )


@register(
    "customer_balance_quartiles",
    """
    WITH tiled AS (
      SELECT c_mktsegment,
             NTILE(4) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
             ) AS quartile,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer
    )
    SELECT c_mktsegment AS segment, CAST(quartile AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(bal_c) AS BIGINT) AS sum_bal_c,
           CAST(MIN(bal_c) AS BIGINT) AS min_bal_c,
           CAST(MAX(bal_c) AS BIGINT) AS max_bal_c
    FROM tiled GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["W2", "A7", "analytics", "window"],
)
def q_customer_balance_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Account-balance quartiles per market segment: NTILE is fully
    deterministic here because the window order carries the custkey
    tie-breaker; balances aggregate as exact integer cents. One
    segment-partitioned window, one shuffle."""
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    tiled = c.select(
        "c_mktsegment",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
    )
    return (
        tiled.groupBy(F.col("c_mktsegment").alias("segment"), "quartile")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("bal_c").cast("bigint").alias("sum_bal_c"),
            F.min("bal_c").cast("bigint").alias("min_bal_c"),
            F.max("bal_c").cast("bigint").alias("max_bal_c"),
        )
        .orderBy("segment", "quartile")
    )


@register(
    "supplier_revenue_rank_topk",
    """
    WITH rev AS (
      SELECT n.n_name AS nation, s.s_suppkey,
             SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                      AS DECIMAL(18,4))) AS r
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT nation, s_suppkey, r,
             DENSE_RANK() OVER (
               PARTITION BY nation ORDER BY r DESC, s_suppkey
             ) AS rnk
      FROM rev
    )
    SELECT nation, CAST(rnk AS BIGINT) AS rnk,
           CAST(s_suppkey AS BIGINT) AS s_suppkey,
           CAST(r AS DOUBLE) AS revenue
    FROM ranked WHERE rnk <= 3 ORDER BY nation, rnk, s_suppkey
    """,
    tags=["J2", "W2", "analytics", "window"],
)
def q_supplier_revenue_rank_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-3 revenue suppliers per nation: lineitem aggregates to the
    (nation, supplier) grain FIRST (one big shuffle), the window then
    runs over suppliers-per-nation (small); supplier and nation dims
    broadcast. Revenue is exact DECIMAL, the rank carries a suppkey
    tie-breaker."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "s_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                .cast("decimal(18,4)")
            ).alias("r")
        )
    )
    w = Window.partitionBy("nation").orderBy(F.desc("r"), F.asc("s_suppkey"))
    return (
        rev.withColumn("rnk", F.dense_rank().over(w).cast("bigint"))
        .filter("rnk <= 3")
        .select(
            "nation",
            "rnk",
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            F.col("r").cast("double").alias("revenue"),
        )
        .orderBy("nation", "rnk", "s_suppkey")
    )


@register(
    "part_brand_size_grid",
    """
    SELECT p_brand AS brand,
           CAST(p_size // 10 AS BIGINT) AS size_band,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
           CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
             AS retail_c
    FROM part GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["A1", "A7", "analytics"],
)
def q_part_brand_size_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand x size-band part grid with distinct-type counts and exact
    retail cents — one hash aggregate, map-side partials do the heavy
    lifting at scale."""
    p = T(spark, sf_dir, "part")
    return (
        p.groupBy(
            F.col("p_brand").alias("brand"),
            F.floor(F.col("p_size") / 10).cast("bigint").alias("size_band"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.countDistinct("p_type").cast("bigint").alias("n_types"),
            F.sum(F.round(F.col("p_retailprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("retail_c"),
        )
        .orderBy("brand", "size_band")
    )


@register(
    "events_weekday_type_mix",
    """
    SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT)
             AS weekday,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 1000) AS BIGINT))
                AS BIGINT) AS value_q
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["A1", "analytics", "events"],
)
def q_events_weekday_type_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday x event-type mix. The weekday is epoch-day mod 7 (day 0
    = Thursday) — pure integer arithmetic that both engines compute
    identically, sidestepping their different DAYOFWEEK conventions;
    values quantize through FLOOR(x*1000) before the exact BIGINT
    sum."""
    from .registry import events_table

    e = events_table(spark, sf_dir)
    return (
        e.groupBy(
            (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7)
            .cast("bigint")
            .alias("weekday"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(
                F.floor(F.col("value").cast("double") * 1000).cast("bigint")
            ).cast("bigint").alias("value_q"),
        )
        .orderBy("weekday", "event_type")
    )


@register(
    "docs_lang_source_matrix",
    """
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
           CAST(MAX(CAST(n_chars AS BIGINT)) AS BIGINT) AS max_chars,
           CAST(SUM(CASE WHEN substr(text, 1, 1) BETWEEN 'A' AND 'Z'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_upper_start
    FROM documents GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["LLM-text", "A1", "analytics"],
)
def q_docs_lang_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language x source corpus matrix with an uppercase-start probe —
    byte-wise ASCII range compare, identical on both engines; one hash
    aggregate over the documents table."""
    d = T(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint"))
            .cast("bigint")
            .alias("sum_chars"),
            F.max(F.col("n_chars").cast("bigint"))
            .cast("bigint")
            .alias("max_chars"),
            F.sum(
                F.when(
                    F.substring("text", 1, 1).between("A", "Z"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_upper_start"),
        )
        .orderBy("lang", "source")
    )


@register(
    "customer_top_spender_share_by_nation",
    """
    WITH spend AS (
      SELECT n.n_name AS nation, c.c_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS s
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), top1 AS (
      SELECT nation, c_custkey, s,
             ROW_NUMBER() OVER (
               PARTITION BY nation ORDER BY s DESC, c_custkey
             ) AS rn
      FROM spend
    ), totals AS (
      SELECT nation, SUM(s) AS nation_s FROM spend GROUP BY 1
    )
    SELECT t.nation,
           CAST(t.c_custkey AS BIGINT) AS top_custkey,
           CAST(t.s AS DOUBLE) AS top_spend,
           CAST(x.nation_s AS DOUBLE) AS nation_spend,
           CAST(t.s AS DOUBLE) / CAST(x.nation_s AS DOUBLE) * 100.0
             AS share_pct
    FROM top1 t JOIN totals x ON t.nation = x.nation
    WHERE t.rn = 1 ORDER BY t.nation
    """,
    tags=["J2", "W1", "A7", "analytics"],
)
def q_customer_top_spender_share_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top spender per nation and their share of the nation's spend:
    orders aggregate to the (nation, customer) grain first, the window
    and the totals both run over that reduced frame, dims broadcast.
    The share is the one trailing double division."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
    )
    w = Window.partitionBy("nation").orderBy(F.desc("s"), F.asc("c_custkey"))
    top1 = spend.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    totals = spend.groupBy("nation").agg(F.sum("s").alias("nation_s"))
    return (
        top1.join(F.broadcast(totals), "nation")
        .select(
            "nation",
            F.col("c_custkey").cast("bigint").alias("top_custkey"),
            F.col("s").cast("double").alias("top_spend"),
            F.col("nation_s").cast("double").alias("nation_spend"),
            (
                F.col("s").cast("double") / F.col("nation_s").cast("double")
                * 100.0
            ).alias("share_pct"),
        )
        .orderBy("nation")
    )


@register(
    "customer_acctbal_sign_by_region",
    """
    SELECT r.r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative,
           CAST(SUM(CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS sum_bal_c
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=["J2", "A7", "analytics"],
)
def q_customer_acctbal_sign_by_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Region-level balance-sign census: two broadcast dim hops
    (nation, region), exact integer cents, one aggregate."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = T(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
            F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_positive"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_bal_c"),
        )
        .orderBy("region")
    )


@register(
    "events_user_burst_histogram",
    """
    WITH per_hour AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             EXTRACT(hour FROM ts) AS h, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3
    ), per_user AS (
      SELECT user_id, MAX(cnt) AS burst FROM per_hour GROUP BY 1
    )
    SELECT CAST(burst AS BIGINT) AS burst_n,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY 1 ORDER BY 1
    """,
    tags=["A1", "analytics", "events"],
)
def q_events_user_burst_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user peak events-in-one-hour, histogrammed: two shuffles on
    shrinking grains ((user, date, hour) then user), both partial-agg
    friendly — the classic burst-detection rollup."""
    from .registry import events_table

    e = events_table(spark, sf_dir)
    per_hour = e.groupBy(
        "user_id", F.to_date("ts").alias("d"), F.hour("ts").alias("h")
    ).agg(F.count("*").alias("cnt"))
    per_user = per_hour.groupBy("user_id").agg(F.max("cnt").alias("burst"))
    return (
        per_user.groupBy(F.col("burst").cast("bigint").alias("burst_n"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("burst_n")
    )


@register(
    "lineitem_tax_discount_grid",
    """
    SELECT CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_c,
           CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["A1", "analytics"],
)
def q_lineitem_tax_discount_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tax x discount rate grid in exact integer cents — a bounded
    (~100-cell) cube from one map-side-combining aggregate over the
    fact table."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.round(F.col("l_tax") * 100).cast("bigint").alias("tax_c"),
            F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_c"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
        .orderBy("tax_c", "disc_c")
    )


@register(
    "orders_priority_weekday_heat",
    f"""
    SELECT o_orderpriority AS priority,
           CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7
                AS BIGINT) AS weekday,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum("o_totalprice", "price_mass")}
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["A1", "analytics"],
)
def q_orders_priority_weekday_heat(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Priority x weekday heatmap (epoch-day mod 7 weekday — see
    events_weekday_type_mix): one exact-decimal aggregate."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            (F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) % 7)
            .cast("bigint")
            .alias("weekday"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            dsum("o_totalprice", "price_mass"),
        )
        .orderBy("priority", "weekday")
    )


@register(
    "emb_dim_sign_profile",
    """
    SELECT gs AS dim,
           CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                AS BIGINT) AS q_sum
    FROM (
      SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS gs,
             unnest(embedding) AS x
      FROM embeddings
    ) GROUP BY gs ORDER BY gs
    """,
    tags=["LLM-similarity", "analytics"],
)
def q_emb_dim_sign_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension sign balance and quantized mass of the embedding
    corpus: posexplode (1-based to match DuckDB generate_subscripts),
    FLOOR(x*1000) quantization on DOUBLE-cast components (the exact
    cross-engine float discipline), one aggregate at the dim grain."""
    e = T(spark, sf_dir, "embeddings")
    exploded = e.select(F.posexplode("embedding").alias("pos", "x")).select(
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    return (
        exploded.groupBy("dim")
        .agg(
            F.sum(F.when(F.col("x") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
            F.sum(F.when(F.col("x") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_neg"),
            F.sum(F.floor(F.col("x") * 1000).cast("bigint"))
            .cast("bigint")
            .alias("q_sum"),
        )
        .orderBy("dim")
    )


@register(
    "supplier_acctbal_extremes_by_nation",
    """
    WITH ranked AS (
      SELECT n.n_name AS nation, s.s_suppkey,
             CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS bal_c,
             ROW_NUMBER() OVER (
               PARTITION BY n.n_name
               ORDER BY s.s_acctbal DESC, s.s_suppkey
             ) AS rn_hi,
             ROW_NUMBER() OVER (
               PARTITION BY n.n_name
               ORDER BY s.s_acctbal ASC, s.s_suppkey
             ) AS rn_lo
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT h.nation,
           CAST(h.s_suppkey AS BIGINT) AS hi_suppkey,
           h.bal_c AS hi_bal_c,
           CAST(l.s_suppkey AS BIGINT) AS lo_suppkey,
           l.bal_c AS lo_bal_c
    FROM ranked h JOIN ranked l
      ON h.nation = l.nation AND h.rn_hi = 1 AND l.rn_lo = 1
    ORDER BY h.nation
    """,
    tags=["W1", "J2", "analytics", "window"],
)
def q_supplier_acctbal_extremes_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Richest and poorest supplier per nation in one window pass: two
    ROW_NUMBERs over the same nation partition (one shuffle, shared
    exchange), filtered and self-joined on the tiny per-nation frame.
    Tie-breakers make both picks unique."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"),
        "s_suppkey",
        "s_acctbal",
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("bal_c"),
    )
    w_hi = Window.partitionBy("nation").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    w_lo = Window.partitionBy("nation").orderBy(
        F.asc("s_acctbal"), F.asc("s_suppkey")
    )
    ranked = j.select(
        "nation",
        "s_suppkey",
        "bal_c",
        F.row_number().over(w_hi).alias("rn_hi"),
        F.row_number().over(w_lo).alias("rn_lo"),
    )
    hi = ranked.filter("rn_hi = 1").select(
        "nation",
        F.col("s_suppkey").cast("bigint").alias("hi_suppkey"),
        F.col("bal_c").alias("hi_bal_c"),
    )
    lo = ranked.filter("rn_lo = 1").select(
        "nation",
        F.col("s_suppkey").cast("bigint").alias("lo_suppkey"),
        F.col("bal_c").alias("lo_bal_c"),
    )
    return hi.join(lo, "nation").orderBy("nation")


@register(
    "delta_vacuum_protocol_roundtrip",
    f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum("o_totalprice", "price_mass")}
    FROM orders
    WHERE o_orderkey <= 3000 AND o_orderkey % 3 = 0
    GROUP BY 1 ORDER BY 1
    """,
    tags=["S6", "delta", "vacuumProtocolCheck", "vacuum", "roundtrip"],
)
def q_delta_vacuum_protocol_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VACUUM under the vacuumProtocolCheck reader-writer feature
    (delta.io PROTOCOL.md — the last writer-feature gap after round
    10's typeWidening/log-compaction): upgrade the protocol to list the
    feature, overwrite so the old snapshot's files become unreferenced,
    VACUUM, and scan the survivor. The in-query guards pin the
    feature's CONTRACT: the protocol stamp is present, vacuum reclaimed
    the overwritten files, and a table whose head protocol this reader
    cannot honor aborts the vacuum BEFORE deleting anything (the
    data-destruction mode the feature exists to prevent).

    Scale: vacuum is O(files x retained versions) driver metadata with
    no Spark job; the protocol gate adds one snapshot read."""
    from .sources.delta_log import (
        read_delta,
        snapshot,
        upgrade_protocol_vacuum_check,
        vacuum_delta,
        write_delta,
    )

    root = scratch_dir(prefix="mm_vac_rt_") + "/orders_vac"
    o = (
        T(spark, sf_dir, "orders")
        .filter("o_orderkey <= 3000")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    write_delta(o, root, mode="overwrite")
    upgrade_protocol_vacuum_check(spark, root)
    write_delta(o.filter("o_orderkey % 3 = 0"), root, mode="overwrite")

    snap = snapshot(spark, root)
    if "vacuumProtocolCheck" not in set(
        snap.protocol.get("readerFeatures") or []
    ):
        raise RuntimeError("vacuumProtocolCheck not stamped")
    removed = vacuum_delta(spark, root)
    if not removed:
        raise RuntimeError("vacuum reclaimed nothing (v0 files expected)")
    live = set(snapshot(spark, root).files)
    if set(removed) & live:
        raise RuntimeError("vacuum deleted a live file")

    return (
        read_delta(spark, root)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            dsum("o_totalprice", "price_mass"),
        )
        .orderBy("status")
    )


@register(
    "media_jpeg_progressive_roundtrip",
    """
    SELECT CAST(doc_id % 3 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(COUNT(*) AS BIGINT) AS n_exact_vs_baseline,
           CAST(COUNT(*) AS BIGINT) AS n_sof2,
           CAST(SUM((16 + (doc_id % 4) * 8) * (16 + (doc_id % 2) * 8)
                    * CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END)
                AS BIGINT) AS px_mass
    FROM documents
    WHERE doc_id < 180
    GROUP BY 1 ORDER BY 1
    """,
    tags=["LLM-multimodal", "jpeg", "progressive", "codec", "roundtrip"],
)
def q_media_jpeg_progressive_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROGRESSIVE JPEG (operators/jpeg_progressive.py — T.81 Annex G,
    spectral selection + successive approximation, encode AND decode):
    per document, synthesize a deterministic image (grayscale every 5th
    doc, RGB otherwise; 4:2:0/4:4:4 alternating), encode it with the
    libjpeg-style multi-scan script and decode the SOF2 stream back —
    all executor-side in one Arrow-batched mapInPandas pass. The
    decisive oracle-checkable fact: successive approximation transmits
    the FULL quantized coefficients, so the progressive decode must
    equal the sequential baseline codec's decode BYTE-FOR-BYTE
    (n_exact_vs_baseline = n_images — an exact count, not a bound).

    Scale: per-row numpy kernels inside Arrow batches — no shuffle, no
    driver bytes; partition-parallel at 100 TB."""
    import numpy as np
    import pandas as pd

    from .operators.jpeg import jpeg_frame_marker
    from .operators.jpeg_progressive import jpeg_progressive_encode

    # round 15 (guide §2.2): the single-row-group scan plans as ONE
    # task, serializing the heavy per-row numpy codec — fan the tiny
    # doc_id frame out so the kernel runs on all cores (no-op on split
    # inputs; measured 2.28s single-task stage -> parallel)
    docs = fan_out(
        T(spark, sf_dir, "documents")
        .filter("doc_id < 180")
        .select(F.col("doc_id").cast("long"))
    )

    out_schema = (
        "doc_id long, dec_width int, dec_height int, n_px long, "
        "exact boolean, sof2 boolean"
    )

    def roundtrip(batches):
        from .operators.jpeg import (
            jpeg_color_decode,
            jpeg_color_encode,
            jpeg_gray_decode,
            jpeg_gray_encode,
        )
        from .operators.jpeg_progressive import (
            jpeg_progressive_decode,
            jpeg_progressive_encode,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 16 + (d % 4) * 8
                h = 16 + (d % 2) * 8
                rng = np.random.default_rng(d)
                if d % 5 == 0:
                    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
                    prog = jpeg_progressive_encode(img)
                    base = jpeg_gray_decode(jpeg_gray_encode(img))[2]
                else:
                    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    sub = "420" if d % 2 == 0 else "444"
                    prog = jpeg_progressive_encode(img, sub)
                    base = jpeg_color_decode(jpeg_color_encode(img, sub))[2]
                dw, dh, dec = jpeg_progressive_decode(prog)
                rows.append(
                    (
                        d, dw, dh, int(dec.size),
                        bool(
                            (dw, dh) == (w, h) and np.array_equal(dec, base)
                        ),
                        jpeg_frame_marker(prog) == 0xC2,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "dec_width", "dec_height", "n_px",
                    "exact", "sof2",
                ],
            )

    decoded = docs.mapInPandas(roundtrip, out_schema)

    # pin that the shared multimodal dispatch routes SOF2 to the REAL
    # progressive kernel, not the stub
    from .operators.multimodal import _decode_payload

    probe = _decode_payload(
        jpeg_progressive_encode(np.full((8, 8, 3), 128, dtype=np.uint8)),
        strict=True,
    )
    if probe["decoder"] != "jpeg":
        raise RuntimeError(f"progressive JPEG routed to {probe['decoder']!r}")

    return (
        decoded.groupBy((F.col("doc_id") % 3).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.sum(F.when(F.col("exact"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_vs_baseline"),
            F.sum(F.when(F.col("sof2"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sof2"),
            F.sum("n_px").cast("bigint").alias("px_mass"),
        )
        .orderBy("bucket")
    )


@register(
    "delta_version_checksum_roundtrip",
    """
    WITH live AS (
      SELECT c_mktsegment, c_acctbal FROM customer
      WHERE c_custkey <= 2400 AND NOT (c_custkey % 7 = 0)
    )
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_c
    FROM live GROUP BY 1 ORDER BY 1
    """,
    tags=["S6", "delta", "versionChecksum", "roundtrip"],
)
def q_delta_version_checksum_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VERSION CHECKSUM files (the ``<v>.crc`` state summary delta-spark
    writes beside each commit): build a 3-commit history, write the
    checksum, VERIFY the replayed state against it field by field, and
    prove the validation has teeth — tampering an add action out of the
    log makes verification raise BEFORE any query would silently read
    partial state. The returned frame scans the intact table; the
    in-query guards pin verified-ok, tamper-detected, and
    checksum-invisible-to-log-listing.

    Scale: the checksum is O(files) driver metadata (one replay +
    one JSON); verification is the same replay a read needs anyway."""
    import shutil

    from .sources.delta_log import (
        DeltaProtocolError,
        delete_rows,
        read_delta,
        verify_version_checksum,
        write_delta,
        write_version_checksum,
    )

    root = scratch_dir(prefix="mm_crc_rt_") + "/cust_crc"
    c = (
        T(spark, sf_dir, "customer")
        .filter("c_custkey <= 2400")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    write_delta(c.filter("c_custkey % 2 = 0"), root, mode="overwrite")
    write_delta(
        c.filter("c_custkey % 2 = 1"), root, mode="append",
        txn=("crc-app", 3),
    )
    delete_rows(spark, root, "c_custkey % 7 = 0")
    write_version_checksum(spark, root)
    got = verify_version_checksum(spark, root)
    if got["setTransactions"] != [{"appId": "crc-app", "version": 3}]:
        raise RuntimeError("txn watermark missing from verified checksum")

    # tampering must be LOUD: clone the LOG ONLY (verification replays
    # the log, never the data files), drop one LIVE add action
    # (commit 2 — the copy-on-write DELETE's rewrite; commit 0's adds
    # are already superseded there, so dropping one of those would
    # legitimately leave the head state unchanged)
    tampered = root + "_tampered"
    os.makedirs(tampered)
    shutil.copytree(
        os.path.join(root, "_delta_log"),
        os.path.join(tampered, "_delta_log"),
    )
    drop_first_add(os.path.join(tampered, "_delta_log", f"{2:020d}.json"))
    try:
        verify_version_checksum(spark, tampered)
        raise RuntimeError("tampered log verified clean")
    except DeltaProtocolError:
        pass

    return (
        read_delta(spark, root)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
            .cast("bigint")
            .alias("bal_c"),
        )
        .orderBy("segment")
    )
