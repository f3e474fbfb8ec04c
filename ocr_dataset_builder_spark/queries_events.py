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


SQL_EVENTS_ASOF_JOIN = """
SELECT e.event_id, e.user_id,
       m.event_id AS last_error_id,
       date_diff('microsecond', m.ts, e.ts) AS staleness_us
FROM (SELECT * FROM events WHERE event_type <> 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') m
  ON e.user_id = m.user_id AND e.ts >= m.ts
"""


QUERIES: dict[str, tuple] = {
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "events_sessions": (q_events_sessions, SQL_EVENTS_SESSIONS),
    "events_asof_join": (q_events_asof_join, SQL_EVENTS_ASOF_JOIN),
}
