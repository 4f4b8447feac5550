"""Event-log / time-series analytics over the ``events`` table — the
batch expression of the streaming aggregations a telemetry pipeline runs
(tumbling-window rollups, inactivity-gap sessionization).

Both operators are pure DataFrame plans (no UDFs) and map 1:1 onto
Structured Streaming: the window rollup is ``groupBy(window(ts, ...))``
with a watermark, and gap sessionization is
``applyInPandasWithState``/``session_window`` — expressed here with
window functions so the DuckDB oracle can replay values exactly.

Scale posture: the rollup is one partial-aggregated shuffle keyed by
(hour, event_type) — low cardinality but skew-free because map-side
combine collapses each partition to one row per key first.
Sessionization is SALTED against hot users (round-3 VERDICT #2): the
event-level pass partitions by (user_id, time-bucket) so a single-user
firehose (bot traffic) spreads across tasks, then a second, session-
level pass merges sessions across bucket boundaries — its input is one
row per LOCAL SESSION (bounded by buckets + true sessions, never event
count), so partitioning that pass by user_id alone is safe at any skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_MIN = 30


def window_rollup(df: DataFrame) -> DataFrame:
    """(hour, event_type, n_events, sum_value): tumbling 1-hour rollup."""
    hour = F.date_format(F.date_trunc("hour", F.col("ts")),
                         "yyyy-MM-dd HH:mm:ss")
    return (
        df.groupBy(hour.alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .orderBy("hour", "event_type")
    )


WINDOW_ROLLUP_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def sessionize(df: DataFrame, gap_min: int = SESSION_GAP_MIN,
               bucket_hours: int = 24) -> DataFrame:
    """(user_id, session_start, n_events, sum_value): split each user's
    event stream at inactivity gaps > ``gap_min`` minutes.

    Hot-user-safe two-phase plan: phase 1 sessionsizes WITHIN
    (user_id, time-bucket) partitions — the salt that spreads a
    single-user firehose across tasks — via the standard lag + running
    sum of gap flags; phase 2 re-runs the same recursion over the LOCAL
    SESSIONS (one row each, carrying first/last event micros), merging
    consecutive sessions whose boundary gap is within ``gap_min`` —
    including chains across empty buckets and sessions spanning many
    buckets (the running sum merges transitively). Identical output to
    the single-pass form for any ``bucket_hours`` > 0."""
    gap_us = int(gap_min) * 60 * 1_000_000
    bkt_us = int(bucket_hours) * 3600 * 1_000_000
    # events.ts arrives TIMESTAMP_NTZ; session tz is UTC, so the cast is
    # value-preserving and unix_micros gets the TIMESTAMP it requires
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    df2 = (df.withColumn("_us", us)
           .withColumn("_bkt", F.floor(F.col("_us") / F.lit(bkt_us))))
    w = Window.partitionBy("user_id", "_bkt").orderBy("ts", "event_id")
    gap = (F.col("_us") - F.lag("_us").over(w)) > gap_us
    local = (
        df2.withColumn("_new", F.when(gap, 1).otherwise(0))
        .withColumn("_sess", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "_bkt", "_sess")
        .agg(F.min("ts").alias("_start_ts"),
             F.min("_us").alias("_first_us"),
             F.max("_us").alias("_last_us"),
             F.count("*").alias("_n"),
             F.sum("value").alias("_v"))
    )
    # phase 2 input is sessions, not events: bounded by
    # (#buckets + #true sessions) per user, so user_id partitioning
    # cannot be skewed by event volume
    w2 = Window.partitionBy("user_id").orderBy("_first_us")
    gap2 = (F.col("_first_us") - F.lag("_last_us").over(w2)) > gap_us
    return (
        local.withColumn("_new2", F.when(gap2, 1).otherwise(0))
        .withColumn("_gs", F.sum("_new2").over(
            w2.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "_gs")
        .agg(
            F.date_format(F.min("_start_ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("session_start"),
            F.sum("_n").alias("n_events"),
            F.round(F.sum("_v"), 6).alias("sum_value"),
        )
        .drop("_gs")
        .orderBy("user_id", "session_start")
    )


def sessionize_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {gap_min}::BIGINT * 60 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM sess
GROUP BY user_id, sess_id
ORDER BY user_id, session_start
"""
