"""TIMESTAMP_NTZ regression suite.

The driver testdata writes naive ``timestamp[us]`` parquet (no timezone),
which Spark's default ``inferTimestampNTZ.enabled=true`` reads as
TIMESTAMP_NTZ — a type that rejects ``cast(ts as double)`` and
``unix_micros(ts)``. Round 1 shipped with seven operators broken by exactly
this. This suite recreates the driver fixture shape (pyarrow, naive us
timestamps) and drives the whole temporal operator family through
``read_parquet`` so the class of bug can never ship silently again.
"""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from pywrangler_spark.functions.temporal import epoch_micros, epoch_seconds
from pywrangler_spark.sources import read_parquet


@pytest.fixture(scope="module")
def naive_us_parquet(tmp_path_factory):
    """Parquet file with a naive timestamp[us] column — the exact physical
    shape of the driver's events.parquet ts column."""
    path = str(tmp_path_factory.mktemp("ntz") / "events_naive.parquet")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = 200
    table = pa.table(
        {
            "event_id": pa.array(range(rows), pa.int64()),
            "user_id": pa.array([i % 7 for i in range(rows)], pa.int64()),
            # ~3 sessions per user under a 1h gap: bursts every 10 min,
            # then a 2-day jump every 20 events
            "ts": pa.array(
                [
                    base
                    + dt.timedelta(days=2 * (i // 20), minutes=10 * (i % 20))
                    for i in range(rows)
                ],
                pa.timestamp("us"),
            ),
            "value": pa.array([float(i % 13) for i in range(rows)]),
        }
    )
    pq.write_table(table, path)
    # sanity: the fixture really is naive us (would be ns or tz-aware if
    # the writer changed under us)
    assert pq.read_schema(path).field("ts").type == pa.timestamp("us")
    return path


def test_read_parquet_returns_plain_timestamp(spark, naive_us_parquet):
    df = read_parquet(spark, naive_us_parquet)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    # and the wall time round-trips under the UTC session
    first = df.orderBy("event_id").select("ts").first()[0]
    assert first.replace(tzinfo=None) == dt.datetime(2024, 1, 1)


def test_epoch_helpers_accept_ntz(spark, naive_us_parquet):
    # read WITH NTZ inference on — the raw, unnormalized path a
    # user-supplied DataFrame would take
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(naive_us_parquet)
        assert raw.schema["ts"].dataType.typeName() == "timestamp_ntz"
        row = (
            raw.select(
                epoch_micros("ts").alias("us"),
                epoch_seconds("ts").alias("s"),
            )
            .orderBy("us")
            .first()
        )
        assert row["us"] == 1704067200000000  # 2024-01-01 UTC
        assert row["s"] == 1704067200.0
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


@pytest.fixture(scope="module", params=["reader", "ntz"])
def events_df(request, spark, naive_us_parquet):
    """The temporal family must work on BOTH the normalized reader output
    and a raw NTZ DataFrame (user-supplied, no reader involved)."""
    if request.param == "reader":
        return read_parquet(spark, naive_us_parquet)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    df = spark.read.parquet(naive_us_parquet)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    return df


def test_sessionize_gap_on_any_timestamp(events_df):
    from pywrangler_spark.operators.sessionize import sessionize_gap

    out = events_df.transform(sessionize_gap("ts", 3600.0, "user_id"))
    per_user = (
        out.groupBy("user_id")
        .agg(F.max("session_id").alias("n"))
        .collect()
    )
    # every 20-event burst is one session; 200 rows / 7 users / 20 → each
    # user sees 10 bursts spread round-robin
    assert all(r["n"] >= 2 for r in per_user)


def test_trend_on_any_timestamp(events_df):
    from pywrangler_spark.operators.trend import group_trend

    out = events_df.transform(group_trend("ts", "value", "user_id"))
    assert out.count() == 7
    assert set(out.columns) == {"user_id", "slope", "intercept", "n"}


def test_range_join_on_any_timestamp(events_df):
    from pywrangler_spark.operators.rangejoin import range_join

    intervals = events_df.select(
        F.col("user_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
    ).limit(20)
    out = events_df.transform(
        range_join(intervals, "ts", "lo", "hi", on="user_id",
                   bucket_seconds=1800.0)
    )
    assert out.count() > 0


def test_asof_join_tolerance_on_any_timestamp(events_df):
    from pywrangler_spark.operators.asof import asof_join

    quotes = events_df.select(
        "user_id", "ts", F.col("value").alias("qv")
    )
    out = events_df.transform(
        asof_join(
            quotes,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            tolerance_seconds=3600.0,
        )
    )
    assert out.count() == events_df.count()
