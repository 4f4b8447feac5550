"""Sessionization: hot-user salting (round-3 VERDICT #2).

The event-level pass partitions by (user_id, time-bucket); a session-
level pass merges across bucket boundaries. These tests pin (a) value
identity with the unsalted single-pass form under heavy skew — including
a bot session that spans every bucket and must merge transitively — and
(b) that the salt actually spreads the hot user across many partitions.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from rucene_spark.events import SESSION_GAP_MIN, sessionize


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
              " event_type string, value double, props string")


@pytest.fixture(scope="module")
def skewed(spark):
    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # bot user 0: one event every 20 min for 30 days -> gaps always under
    # the 30-min session gap, ONE giant session spanning every daily
    # bucket (transitive cross-bucket merge); owns ~50% of all events
    for k in range(2160):
        rows.append((eid, base + datetime.timedelta(minutes=20 * k),
                     0, "bot", 0.5, "{}"))
        eid += 1
    # 90 normal users: bursts of 3 events, 2h apart -> many short sessions
    for u in range(1, 91):
        for s in range(8):
            t0 = base + datetime.timedelta(hours=7 * s + u % 5, minutes=u)
            for j in range(3):
                rows.append((eid, t0 + datetime.timedelta(minutes=10 * j),
                             u, "click", 1.0, "{}"))
                eid += 1
    return _mk_events(spark, rows)


def test_salted_equals_unsalted(spark, skewed):
    got = sessionize(skewed, bucket_hours=24).collect()
    # bucket wider than the whole range == the unsalted single-pass plan
    want = sessionize(skewed, bucket_hours=24 * 3650).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_bot_session_merges_across_all_buckets(spark, skewed):
    out = sessionize(skewed, bucket_hours=24)
    bot = out.filter(F.col("user_id") == 0).collect()
    assert len(bot) == 1
    assert bot[0]["n_events"] == 2160
    assert bot[0]["session_start"] == "2024-03-01 00:00:00"


def test_salt_spreads_hot_user(spark, skewed):
    # the phase-1 partition key is (user_id, bucket): the bot's events
    # land in ~30 distinct groups instead of one monolithic partition
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bkt = F.floor(us / F.lit(24 * 3600 * 1_000_000))
    n_groups = (skewed.filter(F.col("user_id") == 0)
                .select(bkt.alias("b")).distinct().count())
    assert n_groups >= 30


def test_boundary_gap_split_and_merge(spark):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        # session A ends 10 min before midnight; session B starts 5 min
        # after -> 15-min boundary gap, MUST merge across the bucket edge
        (0, base + datetime.timedelta(hours=23, minutes=50), 1, "a", 1.0, "{}"),
        (1, base + datetime.timedelta(days=1, minutes=5), 1, "a", 1.0, "{}"),
        # user 2: 40-min boundary gap -> MUST split
        (2, base + datetime.timedelta(hours=23, minutes=50), 2, "a", 1.0, "{}"),
        (3, base + datetime.timedelta(days=1, minutes=30), 2, "a", 1.0, "{}"),
    ]
    out = sessionize(_mk_events(spark, rows), gap_min=SESSION_GAP_MIN,
                     bucket_hours=24)
    per_user = {r["user_id"]: r for r in
                out.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert per_user[1]["n"] == 1
    assert per_user[2]["n"] == 2
