"""Bucketed range joins: golden boundary cases, randomized equivalence
against a naive cross-join reference (many bucket widths, so intervals
span 0..many buckets), pair uniqueness, and plan-shape assertions (the
whole point: an equi-join plan, never a nested loop)."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.rangejoin import interval_join, range_join
from pywrangler_spark.plans.inspect import explain_string


@pytest.fixture(scope="module")
def golden(spark):
    points = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a", "a", "b"], "x": [0.0, 5.0, 10.0, 5.0],
                      "pid": [1, 2, 3, 4]})
    )
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "lo": [0.0, 4.0, 90.0],
                "hi": [5.0, 7.0, 99.0],
                "iid": [10, 20, 30],
            }
        )
    )
    return points, intervals


class TestRangeJoinGolden:
    def test_inclusive_bounds_and_keys(self, golden):
        points, intervals = golden
        out = points.transform(
            range_join(intervals, point="x", lower="lo", upper="hi", on="k",
                       bucket_seconds=3.0, right_columns=["iid"])
        )
        got = sorted((r.pid, r.iid) for r in out.collect())
        # x=0 in [0,5]; x=5 in [0,5] (upper inclusive) and [4,7];
        # x=10 matches nothing; b's x=5 not in [90,99]
        assert got == [(1, 10), (2, 10), (2, 20)]

    def test_left_join_keeps_unmatched(self, golden):
        points, intervals = golden
        out = points.transform(
            range_join(intervals, point="x", lower="lo", upper="hi", on="k",
                       bucket_seconds=3.0, how="left", right_columns=["iid"])
        )
        got = {r.pid: r.iid for r in out.collect() if r.iid is None}
        assert set(got) == {3, 4}

    def test_no_keys(self, golden):
        points, intervals = golden
        out = points.transform(
            range_join(intervals, point="x", lower="lo", upper="hi",
                       bucket_seconds=3.0, right_columns=["iid"])
        )
        # without keys, b's x=5 also hits both 'a' intervals
        got = sorted((r.pid, r.iid) for r in out.collect())
        assert got == [(1, 10), (2, 10), (2, 20), (4, 10), (4, 20)]

    def test_suffix_on_clash(self, golden):
        points, intervals = golden
        out = points.transform(
            range_join(intervals.withColumnRenamed("iid", "pid"),
                       point="x", lower="lo", upper="hi", on="k",
                       bucket_seconds=3.0, right_columns=["pid"])
        )
        assert "pid_right" in out.columns


def _random_case(seed):
    rng = random.Random(seed)
    pts = pd.DataFrame(
        {
            "k": [rng.choice("uv") for _ in range(40)],
            "x": [round(rng.uniform(0, 50), 2) for _ in range(40)],
            "pid": range(40),
        }
    )
    los = [round(rng.uniform(0, 45), 2) for _ in range(25)]
    iv = pd.DataFrame(
        {
            "k": [rng.choice("uv") for _ in range(25)],
            "lo": los,
            "hi": [round(lo + rng.uniform(0, 12), 2) for lo in los],
            "iid": range(25),
        }
    )
    return pts, iv


class TestRangeJoinRandomized:
    @pytest.mark.parametrize("bucket", [0.5, 3.0, 20.0, 1000.0])
    def test_matches_naive_join(self, spark, bucket):
        pts, iv = _random_case(7)
        points, intervals = spark.createDataFrame(pts), spark.createDataFrame(iv)
        out = points.transform(
            range_join(intervals, point="x", lower="lo", upper="hi", on="k",
                       bucket_seconds=bucket, right_columns=["iid"])
        )
        got = sorted((r.pid, r.iid) for r in out.collect())
        naive = points.crossJoin(intervals.select(
            F.col("k").alias("k2"), "lo", "hi", "iid")
        ).where(
            (F.col("k") == F.col("k2"))
            & (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
        )
        exp = sorted((r.pid, r.iid) for r in naive.collect())
        assert got == exp

    @pytest.mark.parametrize("bucket", [0.5, 3.0, 20.0, 1000.0])
    def test_interval_join_matches_naive(self, spark, bucket):
        a_pd, b_pd = _random_case(13)[1], _random_case(29)[1]
        a = spark.createDataFrame(a_pd.rename(columns={"iid": "aid"}))
        b = spark.createDataFrame(b_pd.rename(columns={"iid": "bid"}))
        out = a.transform(
            interval_join(
                b, left_lower="lo", left_upper="hi",
                right_lower="lo", right_upper="hi", on="k",
                bucket_seconds=bucket, right_columns=["bid"],
            )
        )
        pairs = [(r.aid, r.bid) for r in out.collect()]
        assert len(pairs) == len(set(pairs)), "duplicate pairs emitted"
        naive = a.crossJoin(
            b.select(F.col("k").alias("k2"), F.col("lo").alias("lo2"),
                     F.col("hi").alias("hi2"), "bid")
        ).where(
            (F.col("k") == F.col("k2"))
            & (F.col("lo") <= F.col("hi2")) & (F.col("lo2") <= F.col("hi"))
        )
        exp = sorted((r.aid, r.bid) for r in naive.collect())
        assert sorted(pairs) == exp


class TestRangeJoinPlan:
    def test_equi_join_not_nested_loop(self, golden):
        points, intervals = golden
        out = points.transform(
            range_join(intervals, point="x", lower="lo", upper="hi", on="k",
                       bucket_seconds=3.0, right_columns=["iid"])
        )
        plan = explain_string(out)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_self_join_lineage(self, spark):
        # both sides carved from ONE scan: key equality must not collapse
        # to a trivially-true predicate (cross-key matches)
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a", "a", "b"], "x": [1.0, 2.0, 1.5],
                          "tag": ["p", "w", "w"]})
        )
        pts = df.where(F.col("tag") == "p").select("k", "x")
        iv = df.where(F.col("tag") == "w").select(
            "k", (F.col("x") - 1).alias("lo"), (F.col("x") + 1).alias("hi")
        )
        out = pts.transform(
            range_join(iv, point="x", lower="lo", upper="hi", on="k",
                       bucket_seconds=1.0)
        )
        rows = out.collect()
        # only the same-key window (a: [1,3]) may match a@1.0; b's
        # [0.5,2.5] window must NOT
        assert len(rows) == 1 and rows[0].k == "a"


class TestValidation:
    def test_bad_how(self, golden):
        points, intervals = golden
        with pytest.raises(ValueError, match="how"):
            range_join(intervals, point="x", lower="lo", upper="hi",
                       how="outer")(points)

    def test_bad_bucket(self, golden):
        points, intervals = golden
        with pytest.raises(ValueError, match="bucket_seconds"):
            range_join(intervals, point="x", lower="lo", upper="hi",
                       bucket_seconds=0)(points)

    def test_non_numeric_column(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"s": ["x"], "lo": [1.0],
                                                 "hi": [2.0]}))
        with pytest.raises(TypeError, match="timestamp or numeric"):
            range_join(df, point="s", lower="lo", upper="hi")(df)
