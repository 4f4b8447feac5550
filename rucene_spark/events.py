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
combine collapses each partition to one row per key first. Sessionization
shuffles once by user_id (the natural partition key of an event stream);
per-user event counts are human-scale, so no salting is needed — a
pathological single-user firehose would salt by (user_id, day).
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


def sessionize(df: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """(user_id, session_start, n_events, sum_value): split each user's
    event stream at inactivity gaps > ``gap_min`` minutes — lag + running
    sum of gap flags, the standard relational sessionization."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts arrives TIMESTAMP_NTZ; session tz is UTC, so the cast is
    # value-preserving and unix_micros gets the TIMESTAMP it requires
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = (us - F.lag(us).over(w)) > gap_min * 60 * 1_000_000
    with_sess = (
        df.withColumn("_new", F.when(gap, 1).otherwise(0))
        .withColumn("_sess", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        with_sess.groupBy("user_id", "_sess")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .drop("_sess")
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
