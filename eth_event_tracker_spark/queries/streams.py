"""Event-stream analytics in batch form over the `events` fixture —
time windows (tumbling/sliding/session), deterministic dedup, JSON
extraction, and the depth-based finality split that is the chain engine's
watermark analogue (tracker.go:33-35: only the last MaxBlockBacklog=10
blocks are reorg-mutable).

These are the batch twins of the Structured Streaming operators in
``eth_event_tracker_spark.streaming`` — same expressions, so the streaming
path (readStream → window/watermark → sink) computes identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scalars import with_scalars
from ..tables import LOGS_CTE_DUCKDB, derived_logs, load_table
from . import register


# ---------------------------------------------------------------------------
# Time windows — tumbling 10m and sliding 10m/5m folded into one driver slot
# (union by name, tagged by kind; each event lands in exactly 2 sliding
# windows).  Streaming twins: groupBy(window(ts, ...)) in analytics.py.
# ---------------------------------------------------------------------------
@register(
    "events_time_windows",
    """
SELECT 'tumbling' AS kind,
       time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 2, 3
UNION ALL
SELECT 'sliding' AS kind, ws AS window_start,
       CAST(NULL AS VARCHAR) AS event_type,
       COUNT(*) AS n_events,
       CAST(NULL AS DOUBLE) AS sum_value
FROM (
  SELECT time_bucket(INTERVAL '5 minutes', ts) - (o * INTERVAL '5 minutes') AS ws
  FROM events, (VALUES (0), (1)) AS offs(o)
)
GROUP BY ws
""",
    doc="tumbling 10-min agg + sliding 10m/5m counts (streaming twin: groupBy(window(ts,...)))",
)
def events_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sliding = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.lit("sliding").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.lit(None).cast("string").alias("event_type"),
            "n_events",
            F.lit(None).cast("double").alias("sum_value"),
        )
    )
    return tumbling.unionByName(sliding)


# ---------------------------------------------------------------------------
# Session window — 30-min gap per user (streaming twin: session_window)
# ---------------------------------------------------------------------------
@register(
    "events_session_window",
    """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sid
""",
    doc="session windows, 30-min inactivity gap (gaps-and-islands oracle)",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


# ---------------------------------------------------------------------------
# Deterministic dedup: first event per (user, type) — keyed, order-defined
# (dropDuplicates keeps an arbitrary row; production dedup must be
# deterministic, so we define it via the window. Streaming twin:
# dropDuplicates on key after watermark.)
# ---------------------------------------------------------------------------
@register(
    "events_dedup_first",
    """
SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
FROM (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
""",
    doc="keyed dedup keeping the earliest row (deterministic dropDuplicates)",
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("ts").alias("first_ts"), F.col("event_id").alias("first_event_id"))
    )


# ---------------------------------------------------------------------------
# JSON property extraction (from_json / get_json_object territory)
# ---------------------------------------------------------------------------
@register(
    "events_json_props",
    """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    doc="semi-structured JSON column → typed aggregation",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Hourly activity pivot by event type
# ---------------------------------------------------------------------------
@register(
    "events_hourly_pivot",
    """
SELECT date_trunc('hour', ts) AS hour,
       COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
       COUNT(*) FILTER (WHERE event_type = 'view') AS views,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signups,
       COUNT(*) FILTER (WHERE event_type = 'error') AS errors
FROM events
GROUP BY 1
""",
    doc="date_trunc + pivot with explicit values",
)
def events_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "hour",
        F.coalesce("click", F.lit(0)).alias("clicks"),
        F.coalesce("view", F.lit(0)).alias("views"),
        F.coalesce("purchase", F.lit(0)).alias("purchases"),
        F.coalesce("signup", F.lit(0)).alias("signups"),
        F.coalesce("error", F.lit(0)).alias("errors"),
    )


# ---------------------------------------------------------------------------
# Depth-based finality split — the chain engine's watermark analogue (O-5):
# blocks at depth > MaxBlockBacklog(10) are immutable/finalized
# (tracker.go:33-35,313); only the head window can be rewritten by reorgs.
# ---------------------------------------------------------------------------
@register(
    "logs_finality_split",
    f"""
WITH logs AS ({LOGS_CTE_DUCKDB}),
m AS (SELECT MAX(block_num) AS head FROM logs)
SELECT CASE WHEN block_num <= m.head - 10 THEN 'final' ELSE 'mutable' END AS finality,
       COUNT(*) AS n_logs,
       MIN(block_num) AS first_block,
       MAX(block_num) AS last_block
FROM logs, m
GROUP BY 1
""",
    doc="O-5 depth-based finality: head-10 boundary splits immutable vs reorg-mutable",
)
def logs_finality_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = derived_logs(spark, sf_dir)
    logs = with_scalars(logs, _head=F.max("block_num"))
    return (
        logs.withColumn(
            "finality",
            F.when(F.col("block_num") <= F.col("_head") - 10, F.lit("final")).otherwise(F.lit("mutable")),
        )
        .groupBy("finality")
        .agg(
            F.count("*").alias("n_logs"),
            F.min("block_num").alias("first_block"),
            F.max("block_num").alias("last_block"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join: each purchase enriched with the user's most recent prior (or
# simultaneous) click — the point-in-time enrichment pattern (log ↔ state
# at block height in chain terms). Spark impl: scalable union-window asof
# (operators/asof.py); oracle: DuckDB's native ASOF JOIN.
# ---------------------------------------------------------------------------
@register(
    "events_asof_join",
    """
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, c.click_id AS click_id_asof, c.ts AS ts_asof
FROM purchases p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    doc="as-of join via union-window (one shuffle, no range cross join)",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["click_id"]
    ).select("event_id", "user_id", "ts", "click_id_asof", "ts_asof")


# ---------------------------------------------------------------------------
# Range-frame window: trailing 1-hour aggregates per user — the
# VALUE-defined frame (RANGE BETWEEN), complementing the row-defined
# frames of window_running_sum.  The ORDER value is exact integer
# MICROSECONDS (unix_micros / epoch_us): the fixtures carry sub-second
# timestamps, and the round-5 form (Spark unix_timestamp vs DuckDB
# epoch()) compared TRUNCATED seconds against FRACTIONAL seconds —
# frames agreed at sf0.01's sparsity but diverged at sf0.1 density
# (caught by the sf0.1 driver sim).  Integer micros are bit-exact on
# both engines and lose no precision.
# ---------------------------------------------------------------------------
@register(
    "window_range_frame_1h",
    """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
""",
    doc="trailing 1-hour per-user window (RANGE frame over epoch "
    "seconds): one shuffle on user_id, value-defined frame",
)
def window_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("sum_1h"),
    )


# ---------------------------------------------------------------------------
# Batch sessionization (gaps-and-islands): lag + cumulative boundary sum —
# the window-function twin of the session_window streaming operator (same
# 30-minute gap rule as events_session_window).  100 TB shape: ONE shuffle
# on user_id shared by the lag window, the running sum, and the final
# per-session aggregate (all partition on user_id first).
# ---------------------------------------------------------------------------
@register(
    "sessionize_events_batch",
    """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_id
""",
    doc="gaps-and-islands sessionization: lag + running boundary sum, one user_id shuffle",
)
def sessionize_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "is_start",
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800
        ).cast("int"),
    ).withColumn("is_start", F.coalesce(F.col("is_start"), F.lit(1)))
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    numbered = marked.withColumn("session_id", F.sum("is_start").over(wsum))
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Time-series similarity via SAX: per-user hourly value series →
# z-normalize → PAA (8 equal time segments, mean per segment — integer
# position arithmetic, so segmentation is engine-identical) → discretize
# against the fixed gaussian breakpoints (alphabet 4) → the series
# becomes an 8-char WORD, and similar series meet through an equality
# join on the word — the same candidates-by-equality discipline as every
# dedup/ANN tier (a pairwise correlation join would be quadratic in
# users).  Scale: two user-keyed shuffles, then a vocab-sized word table.
# ---------------------------------------------------------------------------
_SAX_SEGS = 8


@register(
    "ts_sax_motifs",
    f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
  FROM events GROUP BY user_id, date_trunc('hour', ts)
),
znorm AS (
  SELECT user_id, hr,
         CASE WHEN stddev_pop(v) OVER w = 0 THEN 0.0
              ELSE (v - avg(v) OVER w) / stddev_pop(v) OVER w END AS z,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hr) AS rn,
         COUNT(*) OVER w AS cnt
  FROM hourly
  WINDOW w AS (PARTITION BY user_id)
),
paa AS (
  SELECT user_id, (rn - 1) * {_SAX_SEGS} // cnt AS seg, AVG(z) AS pz
  FROM znorm GROUP BY user_id, (rn - 1) * {_SAX_SEGS} // cnt
),
sym AS (
  SELECT user_id, seg,
         CASE WHEN pz < -0.6745 THEN 'a' WHEN pz < 0 THEN 'b'
              WHEN pz < 0.6745 THEN 'c' ELSE 'd' END AS s
  FROM paa
),
words AS (
  SELECT user_id, string_agg(s, '' ORDER BY seg) AS sax_word
  FROM sym GROUP BY user_id
)
SELECT sax_word, COUNT(*) AS n_users
FROM words GROUP BY sax_word
""",
    doc="SAX time-series words: z-normalize + 8-segment PAA + gaussian-breakpoint symbols; motifs meet by word equality",
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    w = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("hr")
    z = F.when(F.stddev_pop("v").over(w) == 0, F.lit(0.0)).otherwise(
        (F.col("v") - F.avg("v").over(w)) / F.stddev_pop("v").over(w)
    )
    znorm = hourly.select(
        "user_id",
        z.alias("z"),
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(w).alias("cnt"),
    )
    paa = znorm.groupBy(
        "user_id", F.expr(f"(rn - 1) * {_SAX_SEGS} DIV cnt").alias("seg")
    ).agg(F.avg("z").alias("pz"))
    pz = F.col("pz")
    sym = paa.withColumn(
        "s",
        F.when(pz < -0.6745, "a").when(pz < 0, "b").when(pz < 0.6745, "c").otherwise("d"),
    )
    words = (
        sym.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("seg", "s"))).alias("seq"))
        .select(
            "user_id",
            F.concat_ws("", F.expr("transform(seq, x -> x.s)")).alias("sax_word"),
        )
    )
    return words.groupBy("sax_word").agg(F.count("*").alias("n_users"))


# ---------------------------------------------------------------------------
# Funnel conversion: ordered step matching (view → click → purchase) per
# user via conditional MIN timestamps — the decorrelated form of "did
# step N happen AFTER step N-1".  One user-keyed aggregate; no
# self-joins (the naive per-step join chain is k-1 shuffles of the fact
# table — this is one).
# ---------------------------------------------------------------------------
@register(
    "funnel_conversion",
    """
WITH steps AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM events GROUP BY user_id
),
flags AS (
  SELECT user_id,
         CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
         CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS s2,
         CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click THEN 1 ELSE 0 END AS s3
  FROM steps
)
SELECT CAST(SUM(s1) AS BIGINT) AS n_view,
       CAST(SUM(s2) AS BIGINT) AS n_view_click,
       CAST(SUM(s3) AS BIGINT) AS n_view_click_buy,
       COUNT(*) AS n_users
FROM flags
""",
    doc="funnel: ordered view→click→purchase via conditional MINs, one user-keyed aggregate",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_buy") > F.col("t_click"))
    return steps.agg(
        F.sum(s1.cast("long")).alias("n_view"),
        F.sum(s2.cast("long")).alias("n_view_click"),
        F.sum(s3.cast("long")).alias("n_view_click_buy"),
        F.count("*").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Cohort retention: users bucketed by first-activity week × weeks-since
# activity matrix — first activity via one user-keyed MIN (broadcast
# back), then a (cohort, age) count.  The standard product-analytics
# rollup, two shuffles total.
# ---------------------------------------------------------------------------
@register(
    "cohort_retention",
    """
WITH firsts AS (
  SELECT user_id, CAST(MIN(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT) AS week_age
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week, week_age, COUNT(*) AS n_active_users
FROM activity GROUP BY cohort_week, week_age
""",
    doc="cohort retention matrix: first-week cohorts x weeks-since-first activity",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", "ts"))
                        - F.unix_timestamp("cohort_week")
                    )
                    / (7 * 86400)
                )
            ).alias("week_age"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_age").agg(
        F.count("*").alias("n_active_users")
    )


# ---------------------------------------------------------------------------
# Interval-OVERLAP join (both sides intervals, no equality key): which
# users' sessions overlapped an "incident" user's sessions.  Spark side
# runs operators/rangejoin.interval_overlap_join — bin-exploded equality
# join, pair kept only in the bin of greatest(starts), never a cross
# product (plan-linted).  DuckDB verifies with its native IEJoin
# inequality join.  Sessions are padded 60 s so single-event sessions
# are non-empty intervals; comparisons at second granularity both sides.
# ---------------------------------------------------------------------------
@register(
    "sessions_overlap_incidents",
    """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
sessions AS (
  SELECT user_id, session_id,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) AS s,
         CAST(floor(epoch(MAX(ts))) AS BIGINT) + 60 AS e
  FROM numbered GROUP BY user_id, session_id
),
inc AS (SELECT * FROM sessions WHERE user_id % 100 = 0),
oth AS (SELECT * FROM sessions WHERE user_id % 100 <> 0),
pairs AS (
  SELECT inc.user_id AS inc_user, oth.user_id AS other_user
  FROM inc JOIN oth ON inc.s < oth.e AND oth.s < inc.e
)
SELECT inc_user, COUNT(*) AS n_overlap_sessions, COUNT(DISTINCT other_user) AS n_users
FROM pairs GROUP BY inc_user
""",
    doc="interval-overlap join (both sides intervals) via binned equality; oracle = DuckDB IEJoin",
)
def sessions_overlap_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import interval_overlap_join

    sessions = sessionize_events_batch(spark, sf_dir).select(
        "user_id",
        "session_id",
        "session_start",
        (F.col("session_end") + F.expr("INTERVAL 60 SECONDS")).alias("session_close"),
    )
    inc = sessions.where(F.col("user_id") % 100 == 0).select(
        F.col("user_id").alias("inc_user"),
        F.col("session_start").alias("is_"),
        F.col("session_close").alias("ie"),
    )
    oth = sessions.where(F.col("user_id") % 100 != 0).select(
        F.col("user_id").alias("other_user"),
        F.col("session_start").alias("os"),
        F.col("session_close").alias("oe"),
    )
    pairs = interval_overlap_join(inc, oth, "is_", "ie", "os", "oe", bin_width=600)
    return pairs.groupBy("inc_user").agg(
        F.count("*").alias("n_overlap_sessions"),
        F.countDistinct("other_user").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Attribution join — the BATCH TWIN of the streaming stream-stream join
# (streaming/analytics.stream_stream_attribution): identical expressions
# over static frames, so the oracle hash-check here verifies the exact
# semantics the watermarked streaming form executes incrementally
# (pytest pins streaming == this twin on shared data).
# ---------------------------------------------------------------------------
@register(
    "events_attribution_join",
    """
SELECT v.user_id,
       v.event_id AS view_id,
       v.ts AS view_ts,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND v.event_type = 'view'
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
""",
    doc="purchase-to-view attribution join (equality + time-range) — batch twin of the watermarked stream-stream join",
)
def events_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.analytics import stream_stream_attribution

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view")
    purchases = ev.where(F.col("event_type") == "purchase")
    return stream_stream_attribution(views, purchases, join_type="inner")


# ---------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4's open JSON-binary type): ingest
# arbitrary JSON once with parse_json, then extract typed fields lazily
# with variant_get.  At 100 TB this is the schema-on-read answer for
# payloads whose shape drifts over time: the VARIANT encoding is a
# shredded binary (no per-row re-parse per extracted field), Parquet
# writes it natively, and extraction stays inside whole-stage codegen —
# where get_json_object re-parses the string for every path.  The JSON
# here is built row-side from events columns (nested object + array) so
# the round-trip parse→typed-extract is exercised end-to-end while the
# DuckDB oracle computes the same facts from the base columns.
# ---------------------------------------------------------------------------
@register(
    "events_variant_extract",
    """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
""",
    doc="VARIANT ingest: parse_json → typed variant_get over nested object "
    "+ array paths → aggregation (schema-on-read for drifting payloads)",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.col("value").alias("v"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            F.array("user_id", "event_id").alias("ids"),
        )
    )
    flat = ev.select(F.parse_json(payload).alias("var")).select(
        F.variant_get("var", "$.t", "string").alias("event_type"),
        F.variant_get("var", "$.v", "double").alias("v"),
        F.variant_get("var", "$.k", "long").alias("k"),
        F.variant_get("var", "$.ids[0]", "long").alias("user_id"),
    )
    return flat.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("sum_v"),
        F.sum("k").alias("sum_k"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Parse quarantine (operators/scalars.py json_quarantine): the dead-letter
# pattern for semi-structured ingestion — every 7th event's props is
# mangled (last char dropped: valid JSON → malformed) and the router
# splits ok/malformed WITH their typed aggregates in one pass.  The
# engines agree bit-for-bit because both sides see the same mangling and
# DuckDB's json_valid matches from_json's null-on-malformed here.
# ---------------------------------------------------------------------------
@register(
    "events_parse_quarantine",
    """
WITH m AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN substr(props, 1, length(props) - 1)
              ELSE props END AS p
  FROM events)
SELECT event_type,
       CASE WHEN json_valid(p) THEN 'ok' ELSE 'malformed_json' END AS reason,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN json_valid(p)
                     THEN CAST(json_extract_string(p, '$.k') AS BIGINT) END)
            AS BIGINT) AS sum_k
FROM m GROUP BY 1, 2
""",
    doc="dead-letter parse routing: malformed JSON rows quarantine with a "
    "reason while good rows aggregate typed — one scan, no second parse, "
    "per (event_type, reason) audit counts",
)
def events_parse_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scalars import json_quarantine

    ev = load_table(spark, sf_dir, "events").withColumn(
        "props",
        F.when(
            F.col("event_id") % 7 == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        ).otherwise(F.col("props")),
    )
    routed = json_quarantine(ev, "props", keep=["event_type"])
    k = F.try_variant_get(F.col("parsed"), "$.k", "long")
    return routed.groupBy("event_type", "reason").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# Per-type OLS trend (operators/profile.py ols_trend): slope of event
# value over time — the drift-TREND profile beside PSI's distribution
# shift.  Exact decimal moments (the corr_matrix recipe; DuckDB widens
# one product factor to DECIMAL(19,4) for the int128 multiply), double
# formula from identical inputs, 1e-9 rounding; x is seconds since the
# fixture epoch (2024-01-01) so the double cancellation stays benign on
# both engines equally.
# ---------------------------------------------------------------------------
_TREND_X0 = 1704067200  # 2024-01-01 00:00:00 UTC


@register(
    "trend_value_by_type",
    f"""
WITH m AS (
  SELECT event_type,
    COUNT(*) FILTER (WHERE ts IS NOT NULL AND value IS NOT NULL) AS n,
    CAST(SUM(CASE WHEN ts IS NOT NULL AND value IS NOT NULL
      THEN CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_X0} AS DECIMAL(18,4)) END) AS DOUBLE) AS sx,
    CAST(SUM(CASE WHEN ts IS NOT NULL AND value IS NOT NULL
      THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS sy,
    CAST(SUM(CASE WHEN ts IS NOT NULL AND value IS NOT NULL
      THEN CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_X0} AS DECIMAL(18,4))
           * CAST(value AS DECIMAL(19,4)) END) AS DOUBLE) AS sxy,
    CAST(SUM(CASE WHEN ts IS NOT NULL AND value IS NOT NULL
      THEN CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_X0} AS DECIMAL(18,4))
           * CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_TREND_X0} AS DECIMAL(19,4)) END) AS DOUBLE) AS sxx
  FROM events GROUP BY event_type)
SELECT event_type, n,
  CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0 THEN
    CAST(round((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx) * 1e9) AS BIGINT) / 1e9
  END AS slope,
  CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0 THEN
    CAST(round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
               / CAST(n AS DOUBLE) * 1e9) AS BIGINT) / 1e9
  END AS intercept
FROM m
""",
    doc="per-event-type OLS trend of value over time (exact decimal "
    "moments → double slope/intercept → 1e-9 rounding): the drift-trend "
    "profile — one aggregate, map-side partials, |types| rows",
)
def trend_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import ols_trend

    ev = load_table(spark, sf_dir, "events")
    x = F.unix_timestamp("ts") - F.lit(_TREND_X0)
    return ols_trend(ev, "event_type", x, "value")


# ---------------------------------------------------------------------------
# Tukey-fence winsorization (operators/profile.py winsorize_tukey):
# per-type robust clipping at [Q1 - 1.5·IQR, Q3 + 1.5·IQR].  Dyadic
# quartile positions + integer quantization make every fence and
# clipped value a binary-exact fraction on both engines (see the
# operator docstring — arbitrary p like 0.01 would NOT be portable).
# One window exchange; the winsorized sum uses the decimal convention.
# ---------------------------------------------------------------------------
@register(
    "winsorize_tukey_events",
    """
WITH q AS (
  SELECT event_type AS g,
         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq
  FROM events),
w AS (
  SELECT g, xq,
         quantile_cont(xq, 0.25) OVER (PARTITION BY g) AS q1,
         quantile_cont(xq, 0.75) OVER (PARTITION BY g) AS q3
  FROM q),
c AS (
  SELECT g, xq,
         q1 - 1.5 * (q3 - q1) AS lo_fence,
         q3 + 1.5 * (q3 - q1) AS hi_fence,
         CASE WHEN xq IS NULL THEN NULL
              ELSE least(greatest(CAST(xq AS DOUBLE), q1 - 1.5 * (q3 - q1)),
                         q3 + 1.5 * (q3 - q1))
         END AS clipped
  FROM w)
SELECT g AS event_type,
       COUNT(xq) AS n,
       MIN(lo_fence) AS lo_fence,
       MIN(hi_fence) AS hi_fence,
       COUNT(CASE WHEN CAST(xq AS DOUBLE) < lo_fence THEN 1 END) AS n_lo,
       COUNT(CASE WHEN CAST(xq AS DOUBLE) > hi_fence THEN 1 END) AS n_hi,
       CAST(SUM(CAST(clipped AS DECIMAL(18,4))) AS DOUBLE) AS win_sum
FROM c GROUP BY g
""",
    doc="per-type Tukey-fence winsorization (boxplot clip, engine-exact "
    "dyadic quartiles): fences, clip counts, and the winsorized sum — "
    "one window exchange + one aggregate",
)
def winsorize_tukey_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import winsorize_tukey

    ev = load_table(spark, sf_dir, "events")
    wz = winsorize_tukey(ev, "event_type", "value", k=1.5)
    xqd = F.col("xq").cast("double")
    return wz.groupBy(F.col("event_type")).agg(
        F.count("xq").alias("n"),
        F.min("lo_fence").alias("lo_fence"),
        F.min("hi_fence").alias("hi_fence"),
        F.count(F.when(xqd < F.col("lo_fence"), 1)).alias("n_lo"),
        F.count(F.when(xqd > F.col("hi_fence"), 1)).alias("n_hi"),
        F.sum(F.col("clipped").cast("decimal(18,4)")).cast("double").alias("win_sum"),
    )


# ---------------------------------------------------------------------------
# Rolling distinct users via windowed HLL union (operators/sketches.py
# rolling_distinct): per (event_type, hour) register banks, trailing-3h
# estimate through hll_union_agg over a RANGE frame on epoch seconds.
# Rows-only: DuckDB has no register-compatible DataSketches HLL; the
# error bound vs the exact trailing distinct and the gap-hour aging are
# pinned in tests/test_sketches.py.
# ---------------------------------------------------------------------------
@register(
    "rolling_distinct_users",
    None,
    doc="trailing-3h distinct users per event type from mergeable HLL "
    "sketches (hll_union_agg over a RANGE frame — an exact sliding "
    "COUNT(DISTINCT) would re-shuffle the whole window every slide; "
    "register banks union in O(2^lgk)); rows-only, error + gap-aging "
    "pinned in pytest",
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import rolling_distinct

    ev = load_table(spark, sf_dir, "events")
    return rolling_distinct(ev, ["event_type"], "ts", "user_id", window_hours=3)


# ---------------------------------------------------------------------------
# EXACT trailing-3h distinct users — the oracle-graded calibration twin
# of rolling_distinct_users (round-8 verdict item 6: promote the exact
# arm).  Shape: dedup to (type, hour, user) triples FIRST, explode each
# triple into the ≤3 windows it serves, one (type, win) shuffle with a
# final per-window dedup — the explode multiplies the DISTINCT table by
# window_hours, never the raw event stream (at 100 TB the triple table
# is the small one).  A naive sliding COUNT(DISTINCT) re-shuffles the
# whole trailing window every slide; this is the batch-exact form, and
# the HLL tier above is what replaces it when even the triple table is
# too hot — with THIS query as its accuracy reference.
# ---------------------------------------------------------------------------
@register(
    "rolling_distinct_exact_users",
    """
WITH triples AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour, user_id FROM events
),
contrib AS (
  SELECT event_type,
         CAST(epoch(hour) AS BIGINT) + h.range * 3600 AS win_sec,
         user_id
  FROM triples CROSS JOIN range(0, 3) h
),
anchors AS (
  SELECT DISTINCT event_type, CAST(epoch(hour) AS BIGINT) AS win_sec FROM triples
)
SELECT c.event_type, c.win_sec,
       COUNT(DISTINCT c.user_id) AS n_rolling_exact
FROM contrib c JOIN anchors a USING (event_type, win_sec)
GROUP BY c.event_type, c.win_sec
""",
    doc="exact trailing-3h distinct users per event type: distinct "
    "(type, hour, user) triples exploded into the windows they serve "
    "(x3, on the deduped table, not the stream), semi-joined to the "
    "anchor hours, one (type, window) dedup-count — the accuracy "
    "reference the HLL rolling tier is pinned against",
)
def rolling_distinct_exact_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    triples = ev.select(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h_sec"),
        "user_id",
    ).distinct()
    contrib = triples.select(
        "event_type",
        "h_sec",
        "user_id",
        F.explode(F.array(F.lit(0), F.lit(3600), F.lit(7200))).alias("_shift"),
    ).select(
        "event_type", (F.col("h_sec") + F.col("_shift")).alias("win_sec"), "user_id"
    )
    anchors = triples.select("event_type", F.col("h_sec").alias("win_sec")).distinct()
    return (
        contrib.join(anchors, ["event_type", "win_sec"], "left_semi")
        .groupBy("event_type", "win_sec")
        .agg(F.countDistinct("user_id").alias("n_rolling_exact"))
    )


# ---------------------------------------------------------------------------
# Journey / clickstream path mining: each user's first-3-event-type path
# rendered as a string, then the corpus-wide path frequency table — the
# "what do users do first" report feeding funnel design, and the ordered
# sequence-assembly primitive SFT-style data preparation uses (group →
# total-order sort → deterministic render).
#
# Scale shape: ONE exchange on user_id serves both the ranking window and
# the per-user aggregate (the groupBy reuses the window's partitioning);
# collect_list only ever sees the ≤3 surviving rows per user (the rank
# filter runs BEFORE aggregation, so a power-user's event history never
# materializes in one task); the path rollup is the second, path-keyed
# shuffle; top-k is a TakeOrdered.  Determinism: (ts, event_id) is a
# total order (event_id unique), array_sort on the (rn, type) struct
# fixes collect_list's arrival order.
# ---------------------------------------------------------------------------
@register(
    "journey_paths_top",
    """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
j AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS journey
  FROM r WHERE rn <= 3 GROUP BY user_id
)
SELECT journey, COUNT(*) AS n_users
FROM j GROUP BY journey
ORDER BY n_users DESC, journey LIMIT 20
""",
    doc="top-20 first-3-event journeys: rank window + per-user ordered "
    "render on one user_id exchange, path-keyed rollup, TakeOrdered",
)
def journey_paths_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return journey_paths(ev, k=3, top=20)


def journey_paths(ev: DataFrame, k: int = 3, top: int = 20) -> DataFrame:
    """Top-`top` first-`k`-event journeys: (journey, n_users).  Total
    per-user event order is (ts, event_id) — event_id is unique, so
    same-timestamp events break ties deterministically; equal-count
    journeys order by journey string asc (pinned in
    tests/test_text_forensics.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pref = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    per_user = pref.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("journey")
    )
    return (
        per_user.groupBy("journey")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), "journey")
        .limit(top)
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences:
# P(next event_type | event_type).  The sequence model a product-analytics
# pipeline fits to detect broken flows (a transition whose probability
# collapses release-over-release) and the generator behind journey
# simulation.  Scale shape: ONE user_id exchange for the lead() window,
# then the (from, to) count table is |types|^2 rows — the per-row
# normalization window runs on a table that fits in one task regardless
# of corpus size.  Determinism: counts are exact BIGINTs; p is one double
# division of identical integers on both engines, rounded to 1e-9.
# ---------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    """
WITH nxt AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 9) AS p
FROM c
""",
    doc="first-order Markov transition matrix over per-user (ts, event_id)-"
    "ordered event sequences: one lead() window on the user_id exchange, "
    "|types|^2 count table, per-from-row normalization — exact counts, "
    "1e-9-rounded probabilities",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return transition_matrix(ev)


def transition_matrix(ev: DataFrame) -> DataFrame:
    """(from_type, to_type, n, p): first-order Markov transitions over
    per-user (ts, event_id)-ordered sequences; p normalizes within
    from_type, rounded 1e-9."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .where(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wrow), 9).alias("p"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection on the per-type hourly event rate:
# each hour scored against the trailing 24 OBSERVED hourly buckets
# (rows-frame, current excluded, >= 12 history buckets required).  The
# rate monitor an ingest pipeline alarms on — a traffic spike or outage
# is a |z| >= 3 hour.  Scale shape: the events scan collapses to a
# (type, hour) count table at the first aggregate (map-side combined);
# everything after runs on |types| * |hours| rows.  Determinism: the
# window sums s / ss / cnt are exact BIGINTs, mean/var/z are the same
# IEEE double formula from identical integers on both engines (sample
# variance, computed as (ss - s*s/cnt) / (cnt-1)), z rounded to 1e-9.
# ---------------------------------------------------------------------------
@register(
    "event_rate_anomalies",
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
stats AS (
  SELECT event_type, hr, n,
         SUM(n) OVER w AS s,
         SUM(n * n) OVER w AS ss,
         COUNT(n) OVER w AS cnt
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hr ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_type, hr, n,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / (cnt - 1) AS v,
         CAST(s AS DOUBLE) / cnt AS mean_n,
         cnt
  FROM stats WHERE cnt >= 12
)
SELECT event_type, hr, n,
       round(mean_n, 9) AS trailing_mean,
       round((n - mean_n) / sqrt(v), 9) AS z_score,
       CAST(abs((n - mean_n) / sqrt(v)) >= 3.0 AS BOOLEAN) AS is_anomaly
FROM scored WHERE v > 0
""",
    doc="trailing-24-bucket z-score on the per-type hourly event rate: "
    "map-side-combined (type, hour) counts, one rows-frame window pass, "
    "exact integer moment sums -> identical IEEE doubles on both engines",
)
def event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return rate_anomalies(ev)


def rate_anomalies(ev: DataFrame, trailing: int = 24, min_hist: int = 12) -> DataFrame:
    """(event_type, hr, n, trailing_mean, z_score, is_anomaly): each hourly
    bucket scored against the trailing `trailing` observed buckets
    (current excluded, >= `min_hist` history required, zero-variance
    windows dropped)."""
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    return score_rate_anomalies(hourly, trailing=trailing, min_hist=min_hist)


def score_rate_anomalies(
    hourly: DataFrame, trailing: int = 24, min_hist: int = 12
) -> DataFrame:
    """The z-scoring tail over an (event_type, hr, n) count table —
    shared by the batch query (one aggregate away from raw events) and
    the streaming path (streaming/analytics.py hourly_counts maintains
    the SAME count table incrementally; scoring runs over the sink).
    The count table is the scale cut: everything here touches
    |types| × |hours| rows."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-trailing, -1)
    )
    stats = hourly.select(
        "event_type",
        "hr",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("ss"),
        F.count("n").over(w).alias("cnt"),
    ).where(F.col("cnt") >= min_hist)
    mean_n = F.col("s").cast("double") / F.col("cnt")
    v = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("cnt")
    ) / (F.col("cnt") - 1)
    z = (F.col("n") - mean_n) / F.sqrt(v)
    return (
        stats.withColumn("v", v)
        .where(F.col("v") > 0)
        .select(
            "event_type",
            "hr",
            "n",
            F.round(mean_n, 9).alias("trailing_mean"),
            F.round(z, 9).alias("z_score"),
            (F.abs(z) >= 3.0).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# Exact inter-arrival-time statistics per event type: gaps in exact epoch
# microseconds (BIGINT), median as the mean of the two middle order
# statistics, p90 as the value at rank ceil(0.9 * n) — both defined by
# integer rank arithmetic so the selection is engine-identical (no
# interpolation semantics to disagree on).  The arrival-process profile
# behind rate-limit tuning and synthetic-load generation.  Scale shape:
# one event_type exchange; the per-type total order is inherent to EXACT
# quantiles — at 100 TB use the CDF sketch tier (cdf_quantiles_chars)
# and keep this for per-key drill-downs.  Determinism: every output is
# exact integer arithmetic (the mean is an integer floor-division —
# round(double, 9) cannot even represent 9 decimals at 1e10 magnitude,
# so the engines' last-ulp rounding would diverge); median's .5 halves
# are the only doubles and they come from identical integer sums.
# ---------------------------------------------------------------------------
@register(
    "interarrival_stats",
    """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
),
gaps AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
r AS (
  SELECT event_type, gap,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM gaps
)
SELECT event_type,
       MAX(n) AS n_gaps,
       CAST(SUM(gap) // MAX(n) AS BIGINT) AS mean_us,
       CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN gap END) AS DOUBLE)
         / COUNT(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN gap END) AS median_us,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END) AS p90_us,
       MIN(gap) AS min_us,
       MAX(gap) AS max_us
FROM r GROUP BY event_type
""",
    doc="exact per-type inter-arrival stats in epoch microseconds: lag "
    "gaps on one event_type exchange, median/p90 by integer order-"
    "statistic ranks (engine-identical, no interpolation), exact BIGINT "
    "min/max/sum",
)
def interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return interarrival(ev)


def interarrival(ev: DataFrame) -> DataFrame:
    """(event_type, n_gaps, mean_us, median_us, p90_us, min_us, max_us):
    exact integer inter-arrival statistics; median = mean of the two
    middle order statistics, p90 = value at rank ceil(0.9·n)."""
    wseq = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select("event_type", "ts", "event_id")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn("gap", F.col("us") - F.lag("us").over(wseq))
        .where(F.col("gap").isNotNull())
        .select("event_type", "gap")
    )
    wrank = Window.partitionBy("event_type").orderBy("gap")
    wall = Window.partitionBy("event_type")
    r = gaps.select(
        "event_type",
        "gap",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    med_sel = F.when(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2)),
        F.col("gap"),
    )
    p90_sel = F.when(F.col("rn") == F.floor((9 * F.col("n") + 9) / 10), F.col("gap"))
    return r.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        F.expr("sum(gap) div max(n)").alias("mean_us"),
        (F.sum(med_sel).cast("double") / F.count(med_sel)).alias("median_us"),
        F.max(p90_sel).alias("p90_us"),
        F.min("gap").alias("min_us"),
        F.max("gap").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection on the per-type hourly rate: the classic
# cumulative-sum statistic C_t = Σ_{i<=t}(x_i − μ) peaks in magnitude at
# the hour where the level shifts — the complement of the rolling z-score
# (event_rate_anomalies finds SPIKES; CUSUM finds sustained SHIFTS).
# Output: per type, the argmax-|C| hour with the before/after means.
# Scale shape: the corpus collapses to (type, hour) counts at the first
# map-side-combined aggregate; the prefix-sum window and argmax run on
# |types| * |hours| rows.  Determinism: prefix sums / totals are exact
# BIGINTs; C_t = P_t − t·(S/T) is the same IEEE expression from
# identical integers; argmax orders by (|C| desc, hr) — a total order.
# The last bucket is excluded from candidates (an after-segment of zero
# buckets has no mean).
# ---------------------------------------------------------------------------
@register(
    "rate_changepoint_cusum",
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
seq AS (
  SELECT event_type, hr, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS t,
         SUM(n) OVER (PARTITION BY event_type ORDER BY hr ROWS UNBOUNDED PRECEDING) AS p,
         SUM(n) OVER (PARTITION BY event_type) AS s,
         COUNT(*) OVER (PARTITION BY event_type) AS tt
  FROM hourly
),
c AS (
  SELECT event_type, hr, t, p, s, tt,
         CAST(p AS DOUBLE) - t * (CAST(s AS DOUBLE) / tt) AS cusum
  FROM seq WHERE t < tt
),
ranked AS (
  SELECT event_type, hr, t, p, s, tt, cusum,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, hr) AS rk
  FROM c
)
SELECT event_type, tt AS n_buckets, hr AS change_hour,
       round(cusum, 9) AS cusum,
       round(CAST(p AS DOUBLE) / t, 9) AS mean_before,
       round(CAST(s - p AS DOUBLE) / (tt - t), 9) AS mean_after
FROM ranked WHERE rk = 1
""",
    doc="CUSUM changepoint per event type: argmax-|Σ(x−μ)| hour over the "
    "(type, hour) count table with before/after means — finds sustained "
    "level shifts the rolling z-score's spike window cannot; exact "
    "integer prefix sums, engine-identical float statistic",
)
def rate_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return changepoint_cusum(ev)


def changepoint_cusum(ev: DataFrame) -> DataFrame:
    """(event_type, n_buckets, change_hour, cusum, mean_before,
    mean_after): the max-|CUSUM| hour per type; last bucket excluded
    (no after-segment)."""
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    wseq = Window.partitionBy("event_type").orderBy("hr")
    wpre = wseq.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("event_type")
    seq = hourly.select(
        "event_type",
        "hr",
        F.row_number().over(wseq).alias("t"),
        F.sum("n").over(wpre).alias("p"),
        F.sum("n").over(wall).alias("s"),
        F.count("*").over(wall).alias("tt"),
    ).where(F.col("t") < F.col("tt"))
    cusum = F.col("p").cast("double") - F.col("t") * (
        F.col("s").cast("double") / F.col("tt")
    )
    c = seq.withColumn("cusum", cusum)
    wrk = Window.partitionBy("event_type").orderBy(F.desc(F.abs(F.col("cusum"))), "hr")
    return (
        c.withColumn("rk", F.row_number().over(wrk))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("tt").alias("n_buckets"),
            F.col("hr").alias("change_hour"),
            F.round("cusum", 9).alias("cusum"),
            F.round(F.col("p").cast("double") / F.col("t"), 9).alias("mean_before"),
            F.round(
                (F.col("s") - F.col("p")).cast("double") / (F.col("tt") - F.col("t")), 9
            ).alias("mean_after"),
        )
    )


# ---------------------------------------------------------------------------
# RFM user segmentation: recency / frequency / monetary quintiles (the
# classic behavioral segmentation grid), reported per segment cell.
# NTILE ties break by (metric, user_id) — the equidepth_histogram
# determinism recipe — so bucket assignment is engine-identical.  Scale
# shape: one user_id aggregate (map-side combined) collapses the corpus
# to |users| rows; the three NTILE windows are a single global sort over
# that table — the exact tier (at 100 TB score against CDF-sketch
# quantile brackets instead); the segment rollup is ≤125 rows.
# Determinism: recency is exact integer day arithmetic from epoch-µs;
# monetary sums ride DECIMAL(18,4); averages are double divisions of
# identical exact sums, rounded 1e-9.
# ---------------------------------------------------------------------------
@register(
    "rfm_segments_users",
    """
WITH ref AS (SELECT MAX(ts) AS ref_ts FROM events),
per_user AS (
  SELECT user_id,
         CAST((epoch_us(ref.ref_ts) - epoch_us(MAX(ts))) // 86400000000 AS BIGINT) AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(value AS DECIMAL(18,4))) AS monetary
  FROM events CROSS JOIN ref
  GROUP BY user_id, ref.ref_ts
),
scored AS (
  SELECT user_id, recency_days, frequency, monetary,
         NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
         NTILE(5) OVER (ORDER BY frequency, user_id) AS f_score,
         NTILE(5) OVER (ORDER BY monetary, user_id) AS m_score
  FROM per_user
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_users,
       round(CAST(SUM(recency_days) AS DOUBLE) / COUNT(*), 9) AS avg_recency_days,
       round(CAST(SUM(frequency) AS DOUBLE) / COUNT(*), 9) AS avg_frequency,
       CAST(SUM(monetary) AS DOUBLE) AS total_monetary
FROM scored GROUP BY r_score, f_score, m_score
""",
    doc="RFM quintile segmentation: one user_id aggregate, three "
    "NTILE windows with (metric, user_id) tie order, <=125-cell rollup — "
    "exact integer recency, decimal monetary",
)
def rfm_segments_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return rfm_segments(ev)


def rfm_segments(ev: DataFrame, n_tiles: int = 5) -> DataFrame:
    """(r_score, f_score, m_score, n_users, avg_recency_days,
    avg_frequency, total_monetary): quintile grid; score n_tiles = best
    (most recent / most frequent / highest spend)."""
    ref = ev.agg(F.max("ts").alias("ref_ts"))
    per_user = (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id", "ref_ts")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("monetary"),
        )
        .select(
            "user_id",
            F.expr("(unix_micros(ref_ts) - unix_micros(last_ts)) div 86400000000").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    scored = per_user.select(
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(Window.orderBy(F.desc("recency_days"), "user_id")).alias("r_score"),
        F.ntile(n_tiles).over(Window.orderBy("frequency", "user_id")).alias("f_score"),
        F.ntile(n_tiles).over(Window.orderBy("monetary", "user_id")).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_users"),
        F.round(F.sum("recency_days").cast("double") / F.count("*"), 9).alias(
            "avg_recency_days"
        ),
        F.round(F.sum("frequency").cast("double") / F.count("*"), 9).alias("avg_frequency"),
        F.sum("monetary").cast("double").alias("total_monetary"),
    )


# ---------------------------------------------------------------------------
# Conversion latency: first 'view' → first subsequent 'purchase' per
# user, profiled with the exact order-statistic recipe (median = mean of
# the two middle latencies, p90 = value at rank ceil(0.9·n) — integer
# rank arithmetic, engine-identical).  The time-to-convert distribution
# product analytics reads next to the funnel's conversion RATE.  Scale
# shape: one user_id aggregate for first-view, a purchase-side semi
# filter + aggregate for first-qualifying-purchase, then order stats
# over |converting users| latencies (the exact tier — at 100 TB feed
# the latencies to the CDF sketch instead).  All integers; the only
# doubles are the median's half-sum and the mean division.
# ---------------------------------------------------------------------------
@register(
    "conversion_latency_stats",
    """
WITH fv AS (
  SELECT user_id, MIN(ts) AS first_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
fp AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase
  FROM events e JOIN fv ON fv.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
  GROUP BY e.user_id
),
lat AS (
  SELECT fv.user_id, epoch_us(fp.first_purchase) - epoch_us(fv.first_view) AS l
  FROM fv JOIN fp ON fp.user_id = fv.user_id
),
r AS (
  SELECT l, ROW_NUMBER() OVER (ORDER BY l) AS rn, COUNT(*) OVER () AS n FROM lat
)
SELECT MAX(n) AS n_converted,
       CAST(SUM(l) // MAX(n) AS BIGINT) AS mean_us,
       CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN l END) AS DOUBLE)
         / COUNT(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN l END) AS median_us,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN l END) AS p90_us,
       MIN(l) AS min_us,
       MAX(l) AS max_us
FROM r
""",
    doc="first-view -> first-subsequent-purchase latency distribution: "
    "two keyed aggregates + exact integer order statistics over the "
    "converting-user set — the time-to-convert twin of the funnel rate",
)
def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return conversion_latency(ev, from_type="view", to_type="purchase")


def conversion_latency(ev: DataFrame, from_type: str, to_type: str) -> DataFrame:
    """(n_converted, mean_us, median_us, p90_us, min_us, max_us) for the
    first `from_type` → first subsequent `to_type` latency per user."""
    fv = (
        ev.where(F.col("event_type") == from_type)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_from"))
    )
    fp = (
        ev.where(F.col("event_type") == to_type)
        .join(fv, "user_id")
        .where(F.col("ts") >= F.col("first_from"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_to"), F.min("first_from").alias("first_from"))
    )
    lat = fp.select(
        (F.unix_micros("first_to") - F.unix_micros("first_from")).alias("l")
    )
    r = lat.select(
        "l",
        F.row_number().over(Window.orderBy("l")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    med_sel = F.when(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2)),
        F.col("l"),
    )
    p90_sel = F.when(F.col("rn") == F.floor((9 * F.col("n") + 9) / 10), F.col("l"))
    return r.agg(
        F.max("n").alias("n_converted"),
        F.expr("sum(l) div max(n)").alias("mean_us"),
        (F.sum(med_sel).cast("double") / F.count(med_sel)).alias("median_us"),
        F.max(p90_sel).alias("p90_us"),
        F.min("l").alias("min_us"),
        F.max("l").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# Seasonality-adjusted rate anomalies: each (type, hour) bucket scored
# against the OTHER buckets sharing its hour-of-day (leave-one-out) —
# the detector that doesn't page you for the 9am spike that happens
# every 9am.  Complements event_rate_anomalies (trailing window = level
# changes) and rate_changepoint_cusum (sustained shifts).  Scale shape:
# the same (type, hour) count-table cut; the group moments are one
# window over |types| × 24 partitions.  Determinism: leave-one-out
# mean/var are the same IEEE expression from exact integer group sums
# on both engines; z rounds to 1e-9.
# ---------------------------------------------------------------------------
@register(
    "seasonal_rate_anomalies",
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
g AS (
  SELECT event_type, hr, n, CAST(hour(hr) AS INT) AS hod,
         COUNT(*) OVER w AS c_g,
         SUM(n) OVER w AS s_g,
         SUM(n * n) OVER w AS ss_g
  FROM hourly
  WINDOW w AS (PARTITION BY event_type, hour(hr))
),
loo AS (
  SELECT event_type, hr, hod, n,
         c_g - 1 AS cnt, s_g - n AS s, ss_g - n * n AS ss
  FROM g WHERE c_g >= 9
),
scored AS (
  SELECT event_type, hr, hod, n,
         CAST(s AS DOUBLE) / cnt AS mean_n,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / (cnt - 1) AS v
  FROM loo
)
SELECT event_type, hr, hod, n,
       round(mean_n, 9) AS seasonal_mean,
       round((n - mean_n) / sqrt(v), 9) AS z_score,
       CAST(abs((n - mean_n) / sqrt(v)) >= 3.0 AS BOOLEAN) AS is_anomaly
FROM scored WHERE v > 0
""",
    doc="leave-one-out z-score vs same-hour-of-day history: the "
    "seasonality-adjusted rate detector on the (type, hour) count-table "
    "cut — exact integer group moments, engine-identical floats",
)
def seasonal_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return seasonal_anomalies(ev)


def seasonal_anomalies(ev: DataFrame, min_group: int = 9) -> DataFrame:
    """(event_type, hr, hod, n, seasonal_mean, z_score, is_anomaly):
    leave-one-out scoring within each (type, hour-of-day) group;
    groups smaller than `min_group` buckets emit nothing."""
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    wg = Window.partitionBy("event_type", F.hour("hr"))
    g = hourly.select(
        "event_type",
        "hr",
        "n",
        F.hour("hr").cast("int").alias("hod"),
        F.count("*").over(wg).alias("c_g"),
        F.sum("n").over(wg).alias("s_g"),
        F.sum(F.col("n") * F.col("n")).over(wg).alias("ss_g"),
    ).where(F.col("c_g") >= min_group)
    cnt = F.col("c_g") - 1
    s = F.col("s_g") - F.col("n")
    ss = F.col("ss_g") - F.col("n") * F.col("n")
    mean_n = s.cast("double") / cnt
    v = (ss.cast("double") - s.cast("double") * s.cast("double") / cnt) / (cnt - 1)
    z = (F.col("n") - mean_n) / F.sqrt(v)
    return (
        g.withColumn("v", v)
        .where(F.col("v") > 0)
        .select(
            "event_type",
            "hr",
            "hod",
            "n",
            F.round(mean_n, 9).alias("seasonal_mean"),
            F.round(z, 9).alias("z_score"),
            (F.abs(z) >= 3.0).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user journey likelihood under the corpus's own first-order Markov
# model: users whose event sequences the model finds improbable — bot /
# broken-client / fraud triage ordered by sequence surprise, the event-
# stream sibling of the bigram-LM text quality score.  Scale shape: one
# user_id exchange for lead(), a broadcast join against the |types|²
# transition counts, one per-user aggregate.  Determinism: each ln(count)
# quantizes to integer 1e-9 units BEFORE the per-user sum (the bigram-LM
# recipe), so the sum is order-free; the mean is one double division.
# ---------------------------------------------------------------------------
@register(
    "journey_surprise_users",
    """
WITH nxt AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
t AS (SELECT user_id, from_type, to_type FROM nxt WHERE to_type IS NOT NULL),
c AS (SELECT from_type, to_type, COUNT(*) AS n_ft FROM t GROUP BY from_type, to_type),
m AS (SELECT from_type, SUM(n_ft) AS n_f FROM c GROUP BY from_type),
lp AS (
  SELECT t.user_id,
         CAST(round(ln(c.n_ft) * 1e9) AS BIGINT) - CAST(round(ln(m.n_f) * 1e9) AS BIGINT) AS lp_e9
  FROM t JOIN c ON c.from_type = t.from_type AND c.to_type = t.to_type
  JOIN m ON m.from_type = t.from_type
),
per_user AS (
  SELECT user_id, COUNT(*) AS n_transitions,
         round(CAST(SUM(lp_e9) AS DOUBLE) / COUNT(*) / 1e9, 9) AS mean_lp
  FROM lp GROUP BY user_id HAVING COUNT(*) >= 3
)
SELECT user_id, n_transitions, mean_lp
FROM per_user ORDER BY mean_lp, user_id LIMIT 20
""",
    doc="top-20 most surprising user journeys under the corpus's own "
    "Markov transition model: e9-quantized ln-counts (order-free sums), "
    "broadcast |types|^2 model join, TakeOrdered — the event-stream "
    "sibling of the bigram-LM quality score",
)
def journey_surprise_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return journey_surprise(ev, min_transitions=3, top=20)


def journey_surprise(ev: DataFrame, min_transitions: int = 3, top: int = 20) -> DataFrame:
    """(user_id, n_transitions, mean_lp): lowest-mean-log-probability
    journeys under the corpus transition model; ties order by user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select("user_id", "ts", "event_id", F.col("event_type").alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
        .select("user_id", "from_type", "to_type")
    )
    c = t.groupBy("from_type", "to_type").agg(F.count("*").alias("n_ft"))
    m = c.groupBy("from_type").agg(F.sum("n_ft").alias("n_f"))
    lp_e9 = (
        F.round(F.log("n_ft") * 1e9).cast("long")
        - F.round(F.log("n_f") * 1e9).cast("long")
    )
    lp = (
        t.join(F.broadcast(c), ["from_type", "to_type"])
        .join(F.broadcast(m), "from_type")
        .select("user_id", lp_e9.alias("lp_e9"))
    )
    return (
        lp.groupBy("user_id")
        .agg(
            F.count("*").alias("n_transitions"),
            F.round(F.sum("lp_e9").cast("double") / F.count("*") / 1e9, 9).alias("mean_lp"),
        )
        .where(F.col("n_transitions") >= min_transitions)
        .orderBy("mean_lp", "user_id")
        .limit(top)
    )


# ---------------------------------------------------------------------------
# Lag-24h autocorrelation of the hourly rate — HOW seasonal is each
# event type, as one number: Pearson r between n(t) and n(t − 24h),
# joined on exact timestamps (a rows-frame lag would mis-align across
# gap hours).  acf24 ≈ 1 says the seasonal detector's same-hour-of-day
# grouping is the right model; ≈ 0 says use the trailing-window
# detector.  Scale: the count-table cut again — the self-join and the
# moment sums touch |types| × |hours| rows.  Determinism: the five
# moment sums are exact BIGINTs; r is the textbook formula in IEEE
# doubles from identical integers, rounded 1e-9, NULL on zero variance
# or < 8 aligned pairs.
# ---------------------------------------------------------------------------
@register(
    "seasonality_acf24",
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
pairs AS (
  SELECT a.event_type, a.n AS x, b.n AS y
  FROM hourly a JOIN hourly b
    ON b.event_type = a.event_type AND b.hr = a.hr - INTERVAL 24 HOUR
),
m AS (
  SELECT event_type, COUNT(*) AS np,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY event_type
)
SELECT event_type, np AS n_pairs,
       CASE WHEN np >= 8
             AND np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0 THEN
         round((np * sxy - sx * sy)
               / sqrt(CAST(np * sxx - sx * sx AS DOUBLE) * CAST(np * syy - sy * sy AS DOUBLE)), 9)
       END AS acf24
FROM m
""",
    doc="lag-24h Pearson autocorrelation of hourly rates per type, "
    "timestamp-aligned (gap-safe): the seasonality-strength scalar that "
    "says which anomaly lens fits; exact integer moments, NULL on zero "
    "variance or < 8 pairs",
)
def seasonality_acf24(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return seasonality_acf(ev, lag_hours=24)


def seasonality_acf(ev: DataFrame, lag_hours: int = 24, min_pairs: int = 8) -> DataFrame:
    """(event_type, n_pairs, acf24): timestamp-aligned lag autocorrelation
    of the hourly count series."""
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    a = hourly.select("event_type", "hr", F.col("n").alias("x"))
    b = hourly.select(
        "event_type",
        (F.col("hr") + F.expr(f"INTERVAL {lag_hours} HOURS")).alias("hr"),
        F.col("n").alias("y"),
    )
    pairs = a.join(b, ["event_type", "hr"])
    m = pairs.groupBy("event_type").agg(
        F.count("*").alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    r = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        vx.cast("double") * vy.cast("double")
    )
    return m.select(
        "event_type",
        F.col("np").alias("n_pairs"),
        F.when((F.col("np") >= min_pairs) & (vx > 0) & (vy > 0), F.round(r, 9)).alias(
            "acf24"
        ),
    )


# ---------------------------------------------------------------------------
# Hour-of-day operating envelope: per (type, hour-of-day), the
# min/p10/median/p90/max band of hourly counts — the capacity-planning
# and alert-threshold table (the anomaly detectors flag points; the
# envelope IS the baseline they flag against, made visible).  Exact
# integer order statistics by rank arithmetic, the interarrival recipe
# applied per (type, hod) group.
# ---------------------------------------------------------------------------
@register(
    "hourly_envelope_profile",
    """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
r AS (
  SELECT event_type, CAST(hour(hr) AS INT) AS hod, n,
         ROW_NUMBER() OVER (PARTITION BY event_type, hour(hr) ORDER BY n) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, hour(hr)) AS g
  FROM hourly
)
SELECT event_type, hod,
       MAX(g) AS n_buckets,
       MIN(n) AS min_n,
       MAX(CASE WHEN rn = (g + 9) // 10 THEN n END) AS p10_n,
       CAST(SUM(CASE WHEN rn IN ((g + 1) // 2, (g + 2) // 2) THEN n END) AS DOUBLE)
         / COUNT(CASE WHEN rn IN ((g + 1) // 2, (g + 2) // 2) THEN n END) AS median_n,
       MAX(CASE WHEN rn = (9 * g + 9) // 10 THEN n END) AS p90_n,
       MAX(n) AS max_n
FROM r GROUP BY event_type, hod
""",
    doc="per-(type, hour-of-day) min/p10/median/p90/max envelope of "
    "hourly counts — the operating-baseline table behind the anomaly "
    "lenses; exact integer order statistics on the count-table cut",
)
def hourly_envelope_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    wrank = Window.partitionBy("event_type", F.hour("hr")).orderBy("n")
    wall = Window.partitionBy("event_type", F.hour("hr"))
    r = hourly.select(
        "event_type",
        F.hour("hr").cast("int").alias("hod"),
        "n",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(wall).alias("g"),
    )
    med_sel = F.when(
        (F.col("rn") == F.floor((F.col("g") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("g") + 2) / 2)),
        F.col("n"),
    )
    p10_sel = F.when(F.col("rn") == F.floor((F.col("g") + 9) / 10), F.col("n"))
    p90_sel = F.when(F.col("rn") == F.floor((9 * F.col("g") + 9) / 10), F.col("n"))
    return r.groupBy("event_type", "hod").agg(
        F.max("g").alias("n_buckets"),
        F.min("n").alias("min_n"),
        F.max(p10_sel).alias("p10_n"),
        (F.sum(med_sel).cast("double") / F.count(med_sel)).alias("median_n"),
        F.max(p90_sel).alias("p90_n"),
        F.max("n").alias("max_n"),
    )
