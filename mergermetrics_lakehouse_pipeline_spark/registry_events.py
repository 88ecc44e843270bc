"""Registry entries for event-time analytics over the ``events`` table:
tumbling/hopping windows, gap sessionization, JSON property extraction.

These are the batch twins of the Structured Streaming jobs in
``streaming/jobs.py`` — both call the same ``operators/events.py``
transformations, so the DuckDB oracle checks here also pin the streaming
semantics (stream-batch parity is asserted in tests/test_streaming.py).

Oracle notes: Spark ``F.window`` windows are epoch-aligned, so tumbling
starts equal ``time_bucket`` in DuckDB; a 1h/30min hopping window
assigns each event to exactly the buckets ``b`` and ``b - 30min`` where
``b = time_bucket(30min, ts)``, expressed as a 2-offset cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import events as ev
from .parallel import fan_out
from .registry import T, events_table, register

_TS_FMT = "%Y-%m-%d %H:%M:%S"


@register(
    "events_tumbling_window",
    f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT}') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=["events", "window-agg", "streaming-twin"],
)
def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time aggregation (the batch twin of
    streaming_tumbling_counts)."""
    return ev.tumbling_counts(events_table(spark, sf_dir), "1 hour")


@register(
    "events_hopping_window",
    f"""
    SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                      - off.n * INTERVAL '30 minutes', '{_TS_FMT}') AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS n) off
    GROUP BY 1, 2
    """,
    tags=["events", "window-agg"],
)
def q_events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 1h window sliding every 30min — each event lands in two
    windows."""
    return ev.hopping_counts(events_table(spark, sf_dir), "1 hour", "30 minutes")


@register(
    "events_sessionization",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '{_TS_FMT}') AS session_start,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS duration_s,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sessions GROUP BY 1, 2
    """,
    tags=["events", "sessionization"],
)
def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (idle > 30 min starts a new session) — the
    lag/cumsum two-window formulation."""
    return ev.sessionize(events_table(spark, sf_dir), gap_minutes=30)


@register(
    "events_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events GROUP BY 1
    """,
    tags=["events", "json"],
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON payload extraction (get_json_object) + per-type rollup."""
    return ev.props_rollup(events_table(spark, sf_dir), "k")


@register(
    "events_window_topk_types",
    f"""
    WITH agg AS (
      SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '{_TS_FMT}') AS window_start,
             event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, total_value, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                     ORDER BY total_value DESC, event_type) AS INT) AS rnk
      FROM agg)
    WHERE rnk <= 2
    """,
    tags=["events", "window-agg", "W2"],
)
def q_events_window_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 event types by value per 6h event-time window: windowed
    aggregation composed with a ranking window (deterministic tie-break
    on event_type)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    agg = (
        events_table(spark, sf_dir)
        .groupBy(F.window(ev.TS, "6 hours"), "event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "total_value",
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("total_value").desc(), F.col("event_type")
    )
    return agg.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 2)


@register(
    "events_incident_range_join",
    """
    WITH spikes AS (
      SELECT event_id AS incident_id, ts AS spike_ts
      FROM events ORDER BY value DESC, event_id LIMIT 20
    ), win AS (
      SELECT incident_id,
             spike_ts - INTERVAL '2 minutes' AS w_start,
             spike_ts + INTERVAL '2 minutes' AS w_end
      FROM spikes
    )
    SELECT w.incident_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM win w JOIN events e ON e.ts BETWEEN w.w_start AND w.w_end
    GROUP BY 1
    """,
    tags=["events", "range-join", "custom-op"],
)
def q_events_incident_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join without a nested loop: the 20 highest-value events
    define +/-2min incident windows; every event falling inside a window
    is attributed to it via the binned range join
    (operators/rangejoin.py — equi hash join on quantized time, exact
    range confirm). The oracle states the same semantics as a plain
    non-equi BETWEEN join, which DuckDB runs as an IEJoin."""
    from pyspark.sql import functions as F

    from .operators.rangejoin import bin_interval_join
    from .registry import dsum

    e = events_table(spark, sf_dir)
    spikes = (
        e.orderBy(F.col("value").desc(), "event_id")
        .limit(20)
        .select(F.col("event_id").alias("incident_id"), F.col("ts").alias("spike_ts"))
    )
    win = spikes.select(
        "incident_id",
        (F.col("spike_ts") - F.expr("INTERVAL 2 MINUTES")).alias("w_start"),
        (F.col("spike_ts") + F.expr("INTERVAL 2 MINUTES")).alias("w_end"),
    )
    pts = e.select("ts", "value")
    joined = bin_interval_join(
        pts, win, point_ts="ts", start_ts="w_start", end_ts="w_end", bin_seconds=240
    )
    return joined.groupBy("incident_id").agg(
        F.count("*").alias("n_events"), dsum("value", "total_value")
    )


@register(
    "events_cascading_rollup",
    f"""
    SELECT 'minute' AS resolution,
           strftime(date_trunc('minute', ts), '{_TS_FMT}') AS bucket_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'hour', strftime(date_trunc('hour', ts), '{_TS_FMT}'),
           event_type, COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'day', strftime(date_trunc('day', ts), '{_TS_FMT}'),
           event_type, COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
    FROM events GROUP BY 2, 3
    """,
    tags=["events", "window-agg", "custom-op", "hypertable"],
)
def q_events_cascading_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute/hour/day continuous aggregate from ONE shuffle
    (operators/events.py cascading_rollup): coarser grains re-aggregate
    the finer rollup (exact BIGINT counts + DECIMAL sums), and Spark's
    ReuseExchange shares the minute-level shuffle across the union. The
    oracle recomputes each grain independently from the raw table, so
    any cascade error (double-count, lost bucket) flips the hash."""
    return ev.cascading_rollup(events_table(spark, sf_dir))


@register(
    "events_attribution_join",
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
    tags=["events", "J-range", "streaming-twin"],
)
def q_events_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase attribution within a 1h horizon per user
    (operators/events.py attribution_join): equi join on user_id with an
    event-time range predicate — the batch twin of the stream-stream
    watermarked join (streaming/jobs.py streaming_attribution_join,
    parity-tested)."""
    return ev.attribution_join(
        events_table(spark, sf_dir),
        from_type="click",
        to_type="purchase",
        horizon_minutes=60,
    )


@register(
    "events_sliding_user_rate",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS val_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=["events", "W-frame", "range-frame"],
)
def q_events_sliding_user_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1h activity per user via a time-RANGE window
    frame (value-based bounds over epoch-micros — peers with equal
    timestamps share a frame, so the result is deterministic without a
    tie-break). The sliding-rate shape behind rate limiting and burst
    detection; one shuffle on user_id, frame evaluation is a single
    sort + running aggregate per partition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("val_1h"),
    )


@register(
    "events_funnel_stages",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts >= s.signup_ts GROUP BY 1
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts GROUP BY 1
    )
    SELECT 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s
    UNION ALL SELECT 'click_after_signup', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL SELECT 'purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
    """,
    tags=["events", "funnel"],
)
def q_events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup -> later click -> later
    purchase): each stage is a keyed aggregation joined to the previous
    stage's per-user anchor timestamp — per-user state never exceeds one
    timestamp per stage, and every join is user-keyed (shuffle or
    broadcast as the stage survivor count shrinks). The classic product
    funnel without any per-user event-list collection."""
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(s, "signup")
        .unionByName(stage(c, "click_after_signup"))
        .unionByName(stage(p, "purchase_after_click"))
    )


@register(
    "events_session_window_native",
    f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30*60*1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT}') AS session_start,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
    tags=["events", "session-window", "streaming-twin"],
)
def q_events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (merging gap windows
    inside the aggregation operator — usable identically under
    Structured Streaming, where it keeps per-session state instead of
    per-user history). Boundary semantics: an event exactly ``gap``
    after its predecessor starts a NEW session (session windows are
    half-open [start, last+gap)), hence the >= in the oracle's lag
    formulation — one semantic notch different from the custom
    sessionize operator's strict >."""
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


@register(
    "events_cohort_retention",
    """
    WITH cohort AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week FROM events
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cohort_week, a.activity_week) // 7 AS BIGINT)
             AS weeks_since,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM cohort c JOIN activity a
      ON c.user_id = a.user_id AND a.activity_week >= c.cohort_week
    GROUP BY 1, 2
    """,
    tags=["events", "cohort"],
)
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by signup week, counted
    in each subsequent week they were active. Two aggregations (per-user
    cohort anchor; distinct user-weeks) + one user-keyed join — the
    distinct collapses activity to |users| x |weeks| before the join, so
    the join input is bounded by engagement breadth, not event volume."""
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    cohort = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("activity_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .filter(F.col("activity_week") >= F.col("cohort_week"))
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("weeks_since"),
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )


@register(
    "events_user_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), anchored AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT)
               AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, anchor, COUNT(*) AS len FROM anchored GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY 1
    """,
    tags=["events", "gaps-and-islands", "window"],
)
def q_events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of consecutive active
    days. The date-minus-row_number anchor turns each run into a
    constant key, so runs become a plain aggregation — the classic
    rewrite that avoids any self-join or iterative pass.

    Scale: the distinct collapses event volume to |user, day| before the
    window, one user-keyed shuffle serves the distinct, the window, and
    both follow-up aggregations (same partitioning throughout)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    anchored = days.withColumn("anchor", F.date_sub(F.col("d"), rn))
    streaks = anchored.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


@register(
    "events_value_outlier_fences",
    """
    WITH stats AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY 1
    ), fenced AS (
      SELECT event_type, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
      FROM stats
    )
    SELECT e.event_type,
           ROUND(f.q1, 4) AS q1, ROUND(f.q3, 4) AS q3,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM events e JOIN fenced f ON e.event_type = f.event_type
    GROUP BY 1, 2, 3
    """,
    tags=["events", "robust-stats", "two-pass"],
)
def q_events_value_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: exact per-type quartiles, Tukey fences
    at 1.5 IQR, and the outlier count per event type — the two-pass
    (stats, then flag) pattern a training-data value filter uses.

    Scale: pass one is an exact-percentile aggregation per type (group
    cardinality is tiny — the percentile sort happens per group inside
    the agg); the 5-row fence table broadcasts back onto the raw events
    for the counting pass. Both engines interpolate quantiles linearly
    on identical doubles, and the fence compare is strict inequality, so
    cross-engine bit-parity holds."""
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    stats = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    fenced = stats.select(
        F.col("event_type").alias("f_type"),
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    out = F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1).otherwise(0)
    return (
        e.join(F.broadcast(fenced), e.event_type == F.col("f_type"))
        .groupBy("event_type", F.round("q1", 4).alias("q1"), F.round("q3", 4).alias("q3"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(out).cast("bigint").alias("n_outliers"),
        )
    )


@register(
    "asof_forward_next_purchase",
    """
    WITH l AS (
      SELECT event_id AS click_id, user_id, ts
      FROM events WHERE event_type = 'click'
    ), p0 AS (
      SELECT user_id, ts AS pts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, pts, event_id AS purchase_id,
             CAST(value AS DOUBLE) AS purchase_value
      FROM p0 WHERE rn = 1
    )
    SELECT l.click_id, l.user_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           r.purchase_id,
           strftime(r.pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           r.purchase_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.pts
    """,
    tags=["asof-join", "forward", "custom-operator"],
)
def q_asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/asof.py, direction='forward'): each
    click enriched with the user's next purchase at or after it — the
    attribution question as a single windowed pass instead of a range
    join. Right side pre-reduced to unique (user, ts) so the match is
    deterministic; oracle is DuckDB's native forward ASOF LEFT JOIN.

    Scale: identical profile to the backward as-of — one shuffle on
    user_id, running-state of one struct per key; direction only flips
    the in-partition sort."""
    from pyspark.sql import functions as F

    from .operators.asof import asof_join

    e = events_table(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.min(F.struct("event_id", "value")).alias("m"))
        .select(
            "user_id",
            "pts",
            F.col("m.event_id").alias("purchase_id"),
            F.col("m.value").cast("double").alias("purchase_value"),
            F.col("pts").alias("purchase_ts_raw"),
        )
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="pts",
        right_cols=["purchase_id", "purchase_value", "purchase_ts_raw"],
        direction="forward",
    )
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_id",
        F.date_format("purchase_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
    )


@register(
    "events_hourly_ohlc",
    """
    WITH h AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
             ts, event_id, value
      FROM events
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, hour
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY event_type, hour
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM h
    )
    SELECT event_type,
           strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(MAX(CASE WHEN rn_first = 1 THEN value END) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(MAX(CASE WHEN rn_last = 1 THEN value END) AS DOUBLE) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM ranked
    GROUP BY 1, 2
    """,
    tags=["events", "ohlc", "argmin-argmax"],
)
def q_events_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — open/close as argmin/argmax by
    (ts, event_id) via struct MIN/MAX, ONE aggregation pass (no window,
    no join-back, deterministic tie-breaks). Shares operators/events.py
    hourly_ohlc with the streaming twin (tests/test_streaming.py parity).

    Scale: one shuffle with full map-side partial aggregation — struct
    MIN/MAX combines associatively, unlike the row_number formulation
    the oracle uses, which would need a per-group sort."""
    return ev.hourly_ohlc(events_table(spark, sf_dir))


@register(
    "events_variant_props",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           json_structure(props) IS NOT NULL AS is_valid
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) >= 90
    """,
    tags=["events", "variant", "semi-structured"],
)
def q_events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark 4's VARIANT type:
    parse_json once, typed path extraction with variant_get — the
    engine-native (binary-encoded, predicate-friendly) alternative to
    repeated get_json_object string parsing. Oracle uses DuckDB's JSON
    path extraction over the same payloads.

    Scale: VARIANT parses each payload ONCE into a binary form however
    many paths are later extracted; at 100 TB that replaces per-path
    string re-parsing with cheap binary navigation."""
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    v = e.select("event_id", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "int")
    return (
        v.select(
            "event_id",
            k.alias("k_int"),
            F.is_variant_null(F.col("v")).__invert__().alias("is_valid"),
        )
        .filter(F.col("k_int") >= 90)
    )


@register(
    "events_sketch_rollup",
    None,  # rows-only: DuckDB's HLL is a different implementation; the
    # 5% accuracy bound + cross-partitioning determinism are pytest-
    # asserted (tests/test_quality_cdc.py::test_sketch_rollup_accuracy)
    tags=["events", "sketch-table", "mergeable"],
)
def q_events_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable sketch-table pattern: per-(day, type) HLL sketches
    of distinct users built ONCE, then rolled up to per-type totals by
    UNIONING SKETCHES — raw events are never rescanned at query time.
    At 100 TB this is how distinct-count dashboards stay interactive:
    the daily sketch table is O(days × types × 1.5 KB), and any grain
    (weekly, monthly, all-time) merges from it in milliseconds. Exact
    counts ride along here so the estimate's error is visible in-row.

    Determinism: HLL register updates and merges are max-operations —
    insertion-order- and partitioning-independent, so this query hashes
    identically at any shuffle setting (the determinism gate covers it).
    """
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    daily = e.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("hll_users"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        merged.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            "hll_users",
            F.round(
                F.abs(F.col("hll_users") - F.col("exact_users"))
                / F.col("exact_users"),
                4,
            ).alias("rel_err"),
        )
    )


@register(
    "events_daily_gap_fill",
    """
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
    ), days AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), users AS (
      SELECT DISTINCT user_id FROM events
    ), spine AS (
      SELECT u.user_id, d.day FROM users u CROSS JOIN days d
    ), reduced AS (
      SELECT user_id, ts, value
      FROM (SELECT user_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           CAST(r.value AS DOUBLE) AS last_value
    FROM spine s
    ASOF LEFT JOIN reduced r
      ON s.user_id = r.user_id AND CAST(s.day AS TIMESTAMP) + INTERVAL 1 DAY
         - INTERVAL 1 MICROSECOND >= r.ts
    """,
    tags=["events", "gap-fill", "spine", "asof-join"],
)
def q_events_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a complete (user × day) calendar spine
    forward-filled with each user's last observed value at or before
    end-of-day — NULL before a user's first event. The standard
    regularization step before feeding irregular event data to anything
    expecting a dense panel.

    Scale: the spine is |users| × |days| — dimensional, built from a
    1-row bounds broadcast (sequence + explode) crossed with the
    distinct-user projection, never from the fact; the fill is ONE
    as-of shuffle on user_id (operators/asof.py). Day boundaries use
    end-of-day-inclusive semantics (23:59:59.999999)."""
    from pyspark.sql import functions as F

    from .operators.asof import asof_join

    e = events_table(spark, sf_dir)
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    users = e.select("user_id").distinct()
    spine = users.join(F.broadcast(days), F.lit(True)).select(
        "user_id",
        # end-of-day probe instant: inclusive of everything that day
        (F.col("day").cast("timestamp") + F.expr("interval 1 day")
         - F.expr("interval 1 microsecond")).alias("probe_ts"),
        F.date_format("day", "yyyy-MM-dd").alias("day_str"),
    )
    reduced = (
        e.groupBy("user_id", F.col("ts").alias("rts"))
        .agg(F.max(F.struct("event_id", "value")).alias("m"))
        .select("user_id", "rts", F.col("m.value").cast("double").alias("last_value"))
    )
    filled = asof_join(
        spine,
        reduced,
        on="user_id",
        left_ts="probe_ts",
        right_ts="rts",
        right_cols=["last_value"],
    )
    return filled.select(
        "user_id", F.col("day_str").alias("day"), "last_value"
    )


@register(
    "events_bitmap_rollup",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
    FROM events GROUP BY 1
    """,
    tags=["events", "bitmap-table", "mergeable-exact"],
)
def q_events_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via bitmap aggregates: per-(day,
    type) user bitmaps (bitmap_construct_agg over bitmap_bucket_number)
    OR-merged to per-type totals — the exact twin of the HLL sketch
    table (events_sketch_rollup): same never-rescan-the-raw-events
    economics, zero error, state = one bitmap per 32k-id bucket.

    Because bitmap distinct counting is exact, this entry gets a hard
    DuckDB oracle (plain COUNT DISTINCT) — the sketch twin can't.

    Scale: the daily bitmap table is O(days × types × buckets × 4 KB);
    any coarser grain ORs bitmaps instead of touching raw data. OR is
    associative and commutative, so results are partition-order-proof.
    """
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    daily = e.select(
        F.col("ts").cast("date").alias("d"),
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    ).groupBy("d", "event_type", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    users = merged.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("exact_users")
    )
    # day count re-aggregates the (tiny) daily bitmap table, not raw events
    days = daily.groupBy("event_type").agg(
        F.countDistinct("d").cast("bigint").alias("n_days")
    )
    return days.join(F.broadcast(users), "event_type").select(
        "event_type", "n_days", "exact_users"
    )


@register(
    "events_cumulative_unique_users",
    """
    WITH flagged AS (
      SELECT event_type, ts, event_id,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    ), daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(first_seen) AS new_users, COUNT(*) AS n_events
      FROM flagged GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS cumulative_unique_users
    FROM daily
    """,
    tags=["events", "window", "cumulative-distinct"],
)
def q_events_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per type over time — COUNT(DISTINCT)
    OVER a running window, which engines don't support natively, via the
    first-occurrence-flag rewrite: mark each user's first event
    (row_number = 1), then a running SUM of flags. Exact, and the state
    is one integer per output row instead of a distinct-set per frame.

    Scale: the flag window shuffles on (type, user) — the same key the
    dedup family uses; the daily collapse then shrinks the running-sum
    window input to |types × days| rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = events_table(spark, sf_dir)
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    daily = flagged.groupBy(
        "event_type", F.col("ts").cast("date").alias("day_d")
    ).agg(
        F.sum("first_seen").alias("new_users"),
        F.count("*").alias("n_events"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day_d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "event_type",
        F.date_format("day_d", "yyyy-MM-dd").alias("day"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w_run).cast("bigint").alias(
            "cumulative_unique_users"
        ),
    )


@register(
    "events_window_overlap_join",
    """
    WITH err AS (
      SELECT event_id AS a_id,
             ts - INTERVAL '10 minutes' AS a_start,
             ts + INTERVAL '10 minutes' AS a_end
      FROM events
      WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-04'
    ), pur AS (
      SELECT event_id AS b_id,
             ts - INTERVAL '5 minutes' AS b_start,
             ts + INTERVAL '5 minutes' AS b_end
      FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-04'
    )
    SELECT a_id, b_id,
           CAST((epoch_us(LEAST(a_end, b_end))
                 - epoch_us(GREATEST(a_start, b_start))) // 1000000
                AS BIGINT) AS overlap_seconds
    FROM err JOIN pur ON a_start <= b_end AND b_start <= a_end
    """,
    tags=["events", "range-join", "interval-overlap"],
)
def q_events_window_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (both sides intervals): ±10min windows
    around the first days' error events against ±5min windows around
    the same period's purchases — which error windows coincide with
    purchase windows, and for how long. Runs as the binned equi join
    (operators/rangejoin.py bin_interval_overlap_join) with
    first-overlap-bin dedup (a pair meeting in several bins survives
    exactly once); the oracle states plain non-equi overlap semantics,
    which DuckDB runs as an IEJoin."""
    from pyspark.sql import functions as F

    from .functions.dates import epoch_us
    from .operators.rangejoin import bin_interval_overlap_join

    e = events_table(spark, sf_dir).filter(
        F.col("ts") < F.lit("2024-01-04").cast("timestamp")
    )

    def windows(etype, minutes, id_alias, s_alias, e_alias):
        return e.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(id_alias),
            (F.col("ts") - F.expr(f"INTERVAL {minutes} MINUTES")).alias(s_alias),
            (F.col("ts") + F.expr(f"INTERVAL {minutes} MINUTES")).alias(e_alias),
        )

    a = windows("error", 10, "a_id", "a_start", "a_end")
    b = windows("purchase", 5, "b_id", "b_start", "b_end")
    joined = bin_interval_overlap_join(
        a, b, a_start="a_start", a_end="a_end", b_start="b_start", b_end="b_end"
    )
    overlap_s = (
        (
            epoch_us(F.least("a_end", "b_end"))
            - epoch_us(F.greatest("a_start", "b_start"))
        )
        / 1_000_000
    ).cast("bigint")
    return joined.select("a_id", "b_id", overlap_s.alias("overlap_seconds"))


@register(
    "orders_daily_anomalies",
    """
    WITH daily AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2
    ), stats AS (
      SELECT month_start,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(revenue AS DECIMAL(19,2)) * CAST(revenue AS DECIMAL(19,2))) AS DOUBLE) AS sx2
      FROM daily GROUP BY 1
    )
    SELECT d.day, d.month_start, d.revenue,
           ROUND((d.revenue - s.sx / s.n_days)
                 / sqrt(GREATEST((s.n_days * s.sx2 - s.sx * s.sx)
                                 / (CAST(s.n_days AS DOUBLE) * s.n_days), 1e-12)), 6)
             AS zscore,
           CAST(CASE WHEN ABS(ROUND((d.revenue - s.sx / s.n_days)
                 / sqrt(GREATEST((s.n_days * s.sx2 - s.sx * s.sx)
                                 / (CAST(s.n_days AS DOUBLE) * s.n_days), 1e-12)), 6)) >= 2.0
                THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
    FROM daily d JOIN stats s ON s.month_start = d.month_start
    """,
    tags=["anomaly", "quality", "window-free"],
)
def q_orders_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month z-score anomaly flag on daily revenue — the standard
    BI outlier monitor, computed cross-engine-exactly: daily sums
    accumulate as DECIMAL (associative), per-month moments (n, Σx, Σx²)
    come from ONE aggregation of the day table, the population variance
    is the fixed-order double expression (n·Σx² − (Σx)²)/n² clamped at
    1e-12, and the only irrational op is IEEE sqrt (correctly rounded —
    portable, unlike stddev built-ins whose accumulation order varies).

    Scale: two hash aggregations (day grain, then month grain — each a
    partial-agg shuffle) and a broadcast join of the month stats back
    onto days. No windows, so no skew-prone single-partition sorts."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    stats = daily.groupBy("month_start").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(F.col("revenue").cast("decimal(18,2)")).cast("double").alias("sx"),
        # (19,2) x (19,2) -> DECIMAL(38,4) in BOTH engines: 18-digit
        # operands overflow DuckDB's width-capped multiply at sf0.1
        F.sum(
            F.col("revenue").cast("decimal(19,2)")
            * F.col("revenue").cast("decimal(19,2)")
        )
        .cast("double")
        .alias("sx2"),
    )
    var = F.greatest(
        (F.col("n_days") * F.col("sx2") - F.col("sx") * F.col("sx"))
        / (F.col("n_days").cast("double") * F.col("n_days")),
        F.lit(1e-12),
    )
    z = F.round((F.col("revenue") - F.col("sx") / F.col("n_days")) / F.sqrt(var), 6)
    return daily.join(F.broadcast(stats), "month_start").select(
        "day",
        "month_start",
        "revenue",
        z.alias("zscore"),
        (F.abs(z) >= 2.0).cast("int").alias("is_anomaly"),
    )


@register(
    "events_linear_interpolation",
    """
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE user_id % 7 = 0
    ), daily AS (
      -- full-precision mean: rounding BEFORE interpolation would seed
      -- engine-divergent ties that propagate into the interpolated values
      SELECT user_id, day,
             CAST(SUM(v) AS DOUBLE) / COUNT(*) AS val
      FROM e GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ), j AS (
      SELECT g.user_id, g.day, d.val,
             CASE WHEN d.val IS NULL THEN 0 ELSE 1 END AS observed
      FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    ), w AS (
      SELECT *,
             last_value(val IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN val IS NOT NULL THEN day END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(val IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN val IS NOT NULL THEN day END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, observed,
           CASE WHEN observed = 1 THEN ROUND(val, 6)
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                ELSE ROUND(pv + (nv - pv) * (day - pd) / (nd - pd), 6) END
             AS value_filled
    FROM w
    """,
    tags=["events", "time-series", "interpolation"],
)
def q_events_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a per-user daily grid — the resample +
    interpolate step that turns irregular event values into a dense
    panel (the upgrade over events_daily_gap_fill's step-function
    forward fill): observed days keep their (decimal-exact) daily mean,
    interior gaps take pv + (nv-pv)·Δt/ΔT between the bracketing
    observations, edges stay NULL. All doubles flow through the same
    fixed-order expression in both engines; day arithmetic is integer.

    Scale: the grid is built from per-user min/max spans (sequence +
    explode — dimensional, bounded per user), and the four
    bracketing-observation columns are ignore-nulls frame windows over
    the user partition — one shuffle on user_id, no self-joins, no
    as-of probes."""
    from pyspark.sql import Window

    e = events_table(spark, sf_dir).filter(F.col("user_id") % 7 == 0)
    daily = (
        e.select("user_id", F.col("ts").cast("date").alias("day"),
                 F.col("value").cast("decimal(18,6)").alias("v"))
        .groupBy("user_id", "day")
        .agg((F.sum("v").cast("double") / F.count("*")).alias("val"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    j = grid.join(daily, ["user_id", "day"], "left").withColumn(
        "observed", F.when(F.col("val").isNull(), 0).otherwise(1)
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("val").isNotNull(), F.col("day"))
    w = (
        j.withColumn("pv", F.last("val", ignorenulls=True).over(back))
        .withColumn("pd", F.last(obs_day, ignorenulls=True).over(back))
        .withColumn("nv", F.first("val", ignorenulls=True).over(fwd))
        .withColumn("nd", F.first(obs_day, ignorenulls=True).over(fwd))
    )
    interp = F.round(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * F.datediff("day", "pd")
        / F.datediff("nd", "pd"),
        6,
    )
    return w.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "observed",
        F.when(F.col("observed") == 1, F.round("val", 6))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(interp)
        .alias("value_filled"),
    )


@register(
    "events_variant_extract",
    """
    WITH payloads AS (
      SELECT to_json(struct_pack(
               user_id := user_id,
               event_type := event_type,
               value := CAST(value AS DOUBLE),
               day := strftime(CAST(ts AS DATE), '%Y-%m-%d')
             )) AS payload
      FROM events
    ), extracted AS (
      SELECT CAST(json_extract(payload, '$.user_id') AS BIGINT) AS user_id,
             json_extract_string(payload, '$.event_type') AS event_type,
             CAST(json_extract(payload, '$.value') AS DOUBLE) AS value,
             json_extract_string(payload, '$.day') AS day
      FROM payloads
    )
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM extracted
    GROUP BY 1, 2
    """,
    tags=["semi-structured", "variant", "json"],
)
def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOLERANT + AGGREGATING half of the VARIANT surface
    (events_variant_props covers per-row variant_get extraction): here
    typed fields come out with ``try_variant_get`` — malformed or
    missing paths yield NULLs instead of task failures, the ingest-side
    contract — and the extracted columns immediately feed a grouped
    aggregation (count/count-distinct/decimal sum), proving the
    variant columns compose with the relational operators downstream.
    Each engine extracts from its OWN serialization, so the check pins
    extraction semantics, not JSON text formatting.

    Scale: map-side parse + one partial-agg shuffle on
    (event_type, day); count_distinct(user_id) rides the same shuffle."""
    e = fan_out(
        events_table(spark, sf_dir).select(
            "user_id", "event_type", "value", "ts"
        )
    )
    payloads = e.select(
        F.to_json(
            F.struct(
                "user_id",
                "event_type",
                F.col("value").cast("double").alias("value"),
                F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            )
        ).alias("payload")
    )
    v = payloads.select(F.parse_json("payload").alias("var"))
    extracted = v.select(
        F.try_variant_get("var", "$.user_id", "bigint").alias("user_id"),
        F.try_variant_get("var", "$.event_type", "string").alias("event_type"),
        F.try_variant_get("var", "$.value", "double").alias("value"),
        F.try_variant_get("var", "$.day", "string").alias("day"),
    )
    return extracted.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


@register(
    "customer_table_profile",
    """
    WITH base AS (
      SELECT c_mktsegment, c_nationkey, c_acctbal FROM customer
    ), scalar AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM base
    ), colstats AS (
      SELECT 'c_mktsegment' AS "column",
             CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_distinct,
             CAST(MIN(c_mktsegment) AS VARCHAR) AS min_value,
             CAST(MAX(c_mktsegment) AS VARCHAR) AS max_value
      FROM base
      UNION ALL
      SELECT 'c_nationkey',
             CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
             CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
      FROM base
      UNION ALL
      SELECT 'c_acctbal',
             CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT c_acctbal) AS BIGINT),
             CAST(MIN(c_acctbal) AS VARCHAR), CAST(MAX(c_acctbal) AS VARCHAR)
      FROM base
    ), stacked AS (
      SELECT 'c_mktsegment' AS "column", CAST(c_mktsegment AS VARCHAR) AS value FROM base
      UNION ALL
      SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM base
      UNION ALL
      SELECT 'c_acctbal', CAST(c_acctbal AS VARCHAR) FROM base
    ), counts AS (
      SELECT "column", value, CAST(COUNT(*) AS BIGINT) AS value_count
      FROM stacked WHERE value IS NOT NULL GROUP BY 1, 2
    ), topk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY "column"
                 ORDER BY value_count DESC, value ASC) AS INTEGER) AS value_rank
      FROM counts
    )
    SELECT c."column", s.n_rows, c.n_nulls, c.n_distinct,
           c.min_value, c.max_value,
           t.value AS top_value, t.value_count, t.value_rank
    FROM colstats c
    LEFT JOIN topk t ON t."column" = c."column" AND t.value_rank <= 3
    CROSS JOIN scalar s
    """,
    tags=["profiling", "quality", "analyze"],
)
def q_customer_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile (operators/profiling.py): per-column
    nulls, exact distinct, typed min/max and top-3 frequent values for
    three customer columns in TWO passes total — one 1-row aggregate
    holding every per-column scalar (adding a column adds expressions,
    not scans) and one map-side unpivot into (column, value) rows with
    a single count shuffle + per-column window over the collapsed
    counts. The reference does this workflow by hand across notebook
    cells (distinct().show(), null filters —
    1_customer_data_processing.py:62-90)."""
    from .operators.profiling import profile_table

    c = T(spark, sf_dir, "customer")
    return profile_table(c, ["c_mktsegment", "c_nationkey", "c_acctbal"], top_k=3)
