"""trailing_window_agg vs the naive bounded RANGE frame.

The operator exists because the naive frame is quadratic in per-key
density (see operators/rolling.py); these tests pin that the linear
two-prefix plan computes the IDENTICAL answer, including timestamp
peers (RANGE frame peer semantics), events exactly at the t-T lower
bound (inclusive), NULL values (all-NULL frame -> NULL sum, count
still counts rows), and empty input.
"""

import datetime as dt
import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from pywrangler_spark.operators.rolling import trailing_window_agg

T0 = dt.datetime(2024, 1, 1)


def _naive(df, seconds):
    micros = (F.col("ts").cast("double") * 1_000_000).cast("long")
    w = (
        Window.partitionBy("k")
        .orderBy(micros)
        .rangeBetween(-seconds * 1_000_000, 0)
    )
    return df.select(
        "rid",
        F.sum(F.col("v").cast("decimal(27,4)"))
        .over(w)
        .cast("double")
        .alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
    )


def _rolled(df, seconds):
    out = df.transform(
        trailing_window_agg(
            "ts",
            seconds,
            "k",
            sums={"s": F.col("v").cast("decimal(27,4)")},
            count_alias="n",
        )
    )
    return out.select(
        "rid", F.col("s").cast("double").alias("s"), "n"
    )


def _assert_same(df, seconds):
    naive = {r.rid: (r.s, r.n) for r in _naive(df, seconds).collect()}
    fast = {r.rid: (r.s, r.n) for r in _rolled(df, seconds).collect()}
    assert fast == naive


def test_random_stream_matches_naive_frame(spark):
    rng = random.Random(7)
    rows = []
    for rid in range(400):
        rows.append(
            Row(
                rid=rid,
                k=rng.randrange(5),
                ts=T0 + dt.timedelta(seconds=rng.randrange(600)),
                v=round(rng.uniform(-50, 50), 4),
            )
        )
    df = spark.createDataFrame(rows)
    _assert_same(df, 60)


def test_peers_and_exact_lower_bound(spark):
    # rows 1/2 are peers at t=100; row 3 sits exactly 60s after row 0,
    # so row 0 is INSIDE row 3's trailing window (inclusive bound)
    rows = [
        Row(rid=0, k=1, ts=T0, v=1.0),
        Row(rid=1, k=1, ts=T0 + dt.timedelta(seconds=100), v=2.0),
        Row(rid=2, k=1, ts=T0 + dt.timedelta(seconds=100), v=4.0),
        Row(rid=3, k=1, ts=T0 + dt.timedelta(seconds=60), v=8.0),
    ]
    df = spark.createDataFrame(rows)
    _assert_same(df, 60)
    got = {r.rid: (r.s, r.n) for r in _rolled(df, 60).collect()}
    assert got[3] == (9.0, 2)  # includes row 0 at exactly -60s
    assert got[1] == got[2] == (14.0, 3)  # peers share the frame


def test_null_values_match_sql_semantics(spark):
    rows = [
        Row(rid=0, k=1, ts=T0, v=None),
        Row(rid=1, k=1, ts=T0 + dt.timedelta(seconds=10), v=None),
        Row(rid=2, k=1, ts=T0 + dt.timedelta(seconds=200), v=3.0),
        Row(rid=3, k=2, ts=T0, v=None),
    ]
    schema = "rid int, k int, ts timestamp, v double"
    df = spark.createDataFrame(rows, schema)
    _assert_same(df, 60)
    got = {r.rid: (r.s, r.n) for r in _rolled(df, 60).collect()}
    assert got[0] == (None, 1)  # all-NULL frame -> NULL sum, count 1
    assert got[2] == (3.0, 1)


def test_empty_input(spark):
    df = spark.createDataFrame(
        [], "rid int, k int, ts timestamp, v double"
    )
    assert _rolled(df, 60).count() == 0


def test_output_collision_raises(spark):
    df = spark.createDataFrame(
        [], "rid int, k int, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="already exists"):
        df.transform(
            trailing_window_agg(
                "ts", 60, "k", sums={"v": F.col("v")}
            )
        ).schema


def test_no_aggs_raises(spark):
    with pytest.raises(ValueError, match="at least one"):
        trailing_window_agg("ts", 60, "k")
