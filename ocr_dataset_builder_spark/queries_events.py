"""Driver-contract queries over the events stream table.

The reference has no event-time semantics (SURVEY.md §2.10 D3 — its only
"windows" are count-based 60-frame batches), but a training-data engine
at scale needs the streaming-adjacent relational shapes too. These run
as batch here and are the exact transformations the Structured Streaming
daemon (streaming/daemon.py) would apply with a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_SESSION_GAP_MIN = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (hour emitted as a string so the
    value hash is timezone-representation-proof across engines)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per user (30-min inactivity gap): the
    classic lag + cumulative-sum session-id assignment — one shuffle on
    user_id, window-local otherwise. This is what
    ``applyInPandasWithState`` would maintain incrementally in streaming
    mode; the batch form is fully relational."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
    marked = e.withColumn(
        "_new",
        F.when(
            gap.isNull() | (gap > _SESSION_GAP_MIN * 60), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "session_seq",
        F.sum("_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).cast("int"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        ((F.max(F.col("ts").cast("timestamp").cast("long")) - F.min(F.col("ts").cast("timestamp").cast("long")))).alias(
            "duration_sec"
        ),
    )


SQL_EVENTS_SESSIONS = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > {_SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, value,
         CAST(sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS session_seq
  FROM marked
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_sec
FROM sess
GROUP BY 1, 2
"""





def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — the classic operator Spark's DataFrame API lacks:
    attach to every non-error event the most recent error event at or
    before it for the same user (feature staleness / last-known-state
    semantics).

    Implemented as a merge-scan, NOT a range join: ONE scan flags
    marker rows in-row, one window over (user_id, ts-order) carries the
    last seen marker forward (``last(..., ignorenulls)``), then keep
    the event rows. ONE shuffle on user_id, zero range explosion — at
    10^12 events a range-predicate join would enumerate event x marker
    pairs; this enumerates each row once. Markers sort before events at
    an equal timestamp (tag order), matching ASOF's inclusive `>=`.
    Staleness is emitted in exact integer microseconds (no float drift
    between engines). DuckDB's native ASOF JOIN is the oracle."""
    e = _events(spark, sf_dir)
    is_marker = F.col("event_type") == "error"
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        # _tag 0 = marker: sorts FIRST at an equal timestamp so the
        # inclusive `>=` semantics hold without a second stream
        F.when(is_marker, F.lit(0)).otherwise(F.lit(1)).alias("_tag"),
        F.when(is_marker, F.col("event_id")).alias("_m_id"),
        F.when(is_marker, F.col("ts")).alias("_m_ts_raw"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = tagged.select(
        "*",
        F.last("_m_id", ignorenulls=True).over(w).alias("last_error_id"),
        F.last("_m_ts_raw", ignorenulls=True).over(w).alias("_m_ts"),
    )
    return merged.where(F.col("_tag") == 1).select(
        "event_id",
        "user_id",
        "last_error_id",
        # ts is TIMESTAMP_NTZ; cast both sides identically — the
        # difference is invariant to the (constant) session offset
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("_m_ts").cast("timestamp"))
        ).alias("staleness_us"),
    )


# markers pre-aggregated to ONE row per (user_id, ts): DuckDB's ASOF
# tie-breaking among equal m.ts is unspecified, while the Spark side's
# last-in-(ts, event_id)-order == max(event_id) per timestamp — the
# pre-agg makes both engines deterministic and identical even if the
# generator ever emits duplicate marker timestamps for a user
SQL_EVENTS_ASOF_JOIN = """
SELECT e.event_id, e.user_id,
       m.event_id AS last_error_id,
       date_diff('microsecond', m.ts, e.ts) AS staleness_us
FROM (SELECT * FROM events WHERE event_type <> 'error') e
ASOF LEFT JOIN (
  SELECT user_id, ts, max(event_id) AS event_id
  FROM events WHERE event_type = 'error'
  GROUP BY user_id, ts
) m
  ON e.user_id = m.user_id AND e.ts >= m.ts
"""





_RJ_PERIOD_S = 21600  # a maintenance window every 6 hours...
_RJ_OFFSET_S = 19800  # ...starting 5h30m into the period (so it CROSSES
_RJ_LEN_S = 2700      # the 6h bucket boundary: 5h30m + 45min = 6h15m)
_RJ_N_WINDOWS = 120   # 30 days of them


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join via bucket expansion — the
    standard trick for the other join Spark's optimizer turns into a
    nested loop: which maintenance window (if any) was each event
    inside?

    Each window explodes to the 6h bucket(s) it overlaps (here exactly
    two, because the window straddles the bucket boundary by
    construction); events compute their bucket in-row; an EQUI-join on
    the bucket + a residual containment filter replaces the
    range-predicate join. The window side stays tiny (windows x <=2
    buckets) and broadcasts; at 10^12 events a BroadcastNestedLoopJoin
    over a range predicate would evaluate every (event, window) pair.
    The oracle states the naive range predicate directly — same rows.
    Times are compared in wall-clock seconds since 2024-01-01, derived
    identically in both engines (epoch offsets cancel)."""
    e = _events(spark, sf_dir)
    epoch0 = F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast("long")
    es = F.col("ts").cast("timestamp").cast("long") - epoch0
    ev = e.select("event_id", es.alias("es")).withColumn(
        "bucket", F.floor(F.col("es") / _RJ_PERIOD_S)
    )
    w = (
        spark.range(_RJ_N_WINDOWS)
        .select(
            F.col("id").cast("int").alias("w_id"),
            (F.col("id") * _RJ_PERIOD_S + _RJ_OFFSET_S).alias("start_s"),
        )
        .withColumn("end_s", F.col("start_s") + _RJ_LEN_S)
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("start_s") / _RJ_PERIOD_S),
                    F.floor((F.col("end_s") - 1) / _RJ_PERIOD_S),
                )
            ),
        )
    )
    return (
        ev.join(F.broadcast(w), "bucket")
        .where((F.col("es") >= F.col("start_s")) & (F.col("es") < F.col("end_s")))
        .select(
            "event_id",
            "w_id",
            (F.col("es") - F.col("start_s")).alias("offset_s"),
        )
    )


SQL_EVENTS_RANGE_JOIN = f"""WITH w AS (
  SELECT CAST(i AS INT) AS w_id,
         CAST(i * {_RJ_PERIOD_S} + {_RJ_OFFSET_S} AS BIGINT) AS start_s,
         CAST(i * {_RJ_PERIOD_S} + {_RJ_OFFSET_S} + {_RJ_LEN_S} AS BIGINT) AS end_s
  FROM range(0, {_RJ_N_WINDOWS}) AS r(i)
),
ev AS (
  SELECT event_id,
         CAST(floor(epoch(ts)) - floor(epoch(TIMESTAMP '2024-01-01 00:00:00'))
              AS BIGINT) AS es
  FROM events
)
SELECT e.event_id, w.w_id, e.es - w.start_s AS offset_s
FROM ev e JOIN w ON e.es >= w.start_s AND e.es < w.end_s
"""




def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: ONE pass emits the
    hour, day, and grand-total granularities via ROLLUP grouping sets
    (Catalyst expands the sets inside a single aggregation — no
    re-scan per granularity, which is what a naive UNION of three
    GROUP BYs would pay). level: 2=hour, 1=day, 0=total."""
    e = _events(spark, sf_dir)
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        e.select(day.alias("day"), hour.alias("hour"), "value")
        .rollup("day", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            (
                F.when(F.col("hour").isNotNull(), 2)
                .when(F.col("day").isNotNull(), 1)
                .otherwise(0)
            ).cast("int").alias("level"),
            F.coalesce("day", F.lit("")).alias("day"),
            F.coalesce("hour", F.lit("")).alias("hour"),
            "n_events",
            "sum_value",
        )
    )


SQL_EVENTS_ROLLUP = """
SELECT CAST(CASE WHEN hour IS NOT NULL THEN 2
            WHEN day IS NOT NULL THEN 1 ELSE 0 END AS INT) AS level,
       coalesce(day, '') AS day,
       coalesce(hour, '') AS hour,
       n_events, sum_value
FROM (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         count(*) AS n_events,
         round(sum(value), 6) AS sum_value
  FROM events
  GROUP BY ROLLUP (day, hour)
)
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON kernel over the props column: typed extraction with
    get_json_object stays in whole-stage codegen (no UDF, no
    from_json schema inference pass), then a grouped stat over the
    extracted key. One scan, one shuffle on the derived key."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"), "value")
        .groupBy("event_type", (F.col("k") % 10).cast("int").alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


SQL_EVENTS_JSON_PROPS = """
SELECT event_type,
       CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS k_mod,
       count(*) AS n,
       min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to a wide per-user activity profile (one column per event
    type) — the feature-table shape ML training joins against. Uses
    Spark's native pivot WITH the value list supplied explicitly: an
    unlisted pivot costs an extra distinct-scan job to discover values
    and produces a nondeterministic column order at 10^12 rows."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count("event_id"))
        .select(
            "user_id",
            *[
                F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                for t in _PIVOT_TYPES
            ],
        )
    )


SQL_EVENTS_PIVOT = "SELECT user_id, " + ", ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _PIVOT_TYPES
) + " FROM events GROUP BY user_id"


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user (signup -> click -> purchase):
    each step counts only if it happens AFTER the previous step's first
    occurrence — the order predicate is what separates a funnel from
    three filtered counts. One conditional aggregation over one scan;
    epoch seconds keep the timestamps engine-portable."""
    e = _events(spark, sf_dir)
    es = F.col("ts").cast("timestamp").cast("long")
    base = e.select("user_id", "event_type", es.alias("es"))
    agg = base.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("es"))).alias("t_signup"),
        *[
            F.collect_list(
                F.when(F.col("event_type") == t, F.col("es"))
            ).alias(f"_ts_{t}")
            for t in ("click", "purchase")
        ],
    )
    # first click AFTER signup; first purchase AFTER that click
    t_click = F.array_min(
        F.filter("_ts_click", lambda x: x >= F.col("t_signup"))
    )
    agg = agg.withColumn("t_click", t_click)
    t_purchase = F.array_min(
        F.filter("_ts_purchase", lambda x: x >= F.col("t_click"))
    )
    agg = agg.withColumn("t_purchase", t_purchase)
    return agg.select(
        "user_id",
        "t_signup",
        "t_click",
        "t_purchase",
        F.col("t_signup").isNotNull().alias("reached_signup"),
        F.col("t_click").isNotNull().alias("reached_click"),
        F.col("t_purchase").isNotNull().alias("converted"),
    )


SQL_EVENTS_FUNNEL = """WITH base AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
agg AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN es END) AS t_signup,
         list(CASE WHEN event_type = 'click' THEN es END) AS ts_click,
         list(CASE WHEN event_type = 'purchase' THEN es END) AS ts_purchase
  FROM base GROUP BY 1
),
steps AS (
  SELECT user_id, t_signup,
         list_min(list_filter(ts_click, x -> x IS NOT NULL AND x >= t_signup)) AS t_click
  FROM agg
),
steps2 AS (
  SELECT s.user_id, s.t_signup, s.t_click,
         list_min(list_filter(a.ts_purchase, x -> x IS NOT NULL AND x >= s.t_click)) AS t_purchase
  FROM steps s JOIN agg a ON a.user_id = s.user_id
)
SELECT user_id, t_signup, t_click, t_purchase,
       t_signup IS NOT NULL AS reached_signup,
       t_click IS NOT NULL AS reached_click,
       t_purchase IS NOT NULL AS converted
FROM steps2
"""


QUERIES: dict[str, tuple] = {
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "events_sessions": (q_events_sessions, SQL_EVENTS_SESSIONS),
    "events_asof_join": (q_events_asof_join, SQL_EVENTS_ASOF_JOIN),
    "events_range_join": (q_events_range_join, SQL_EVENTS_RANGE_JOIN),
    "events_rollup": (q_events_rollup, SQL_EVENTS_ROLLUP),
    "events_json_props": (q_events_json_props, SQL_EVENTS_JSON_PROPS),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
}
