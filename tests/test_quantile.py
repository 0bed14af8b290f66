"""group_quantiles: the weighted-distribution exact-quantile operator.

Equivalence oracle is Spark's own exact percentile() on the same data —
the operator must reproduce its linear interpolation bit-for-bit (up to
round 6 dp) without ever materializing a group's raw values.
"""

import random

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.quantile import group_quantiles


def _rows(seed: int, n: int = 400):
    rng = random.Random(seed)
    # heavy ties (small value domain) exercise the covering-rank logic
    return [
        (rng.choice("ABC"), float(rng.randint(0, 40)), rng.randint(1, 9))
        for _ in range(n)
    ]


class TestGroupQuantiles:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_exact_percentile(self, spark, seed):
        df = spark.createDataFrame(_rows(seed), "g string, v double, w int")
        got = {
            r["g"]: (r["v_p50"], r["v_p90"])
            for r in df.transform(
                group_quantiles("v", [0.5, 0.9], "g")
            ).collect()
        }
        want = {
            r["g"]: (r["p50"], r["p90"])
            for r in df.groupBy("g")
            .agg(
                F.percentile("v", F.lit(0.5)).alias("p50"),
                F.percentile("v", F.lit(0.9)).alias("p90"),
            )
            .collect()
        }
        assert got.keys() == want.keys()
        for g in want:
            assert got[g][0] == pytest.approx(want[g][0], abs=1e-9)
            assert got[g][1] == pytest.approx(want[g][1], abs=1e-9)

    def test_multi_value_per_value_probs(self, spark):
        df = spark.createDataFrame(_rows(7), "g string, v double, w int")
        out = df.transform(
            group_quantiles(
                ["v", "w"],
                [[0.5, 0.9], [0.5]],
                "g",
                output_columns=[["p50_v", "p90_v"], ["p50_w"]],
            )
        )
        assert out.columns == ["g", "p50_v", "p90_v", "p50_w"]
        want = {
            r["g"]: r["pw"]
            for r in df.groupBy("g")
            .agg(F.percentile("w", F.lit(0.5)).alias("pw"))
            .collect()
        }
        for r in out.collect():
            assert r["p50_w"] == pytest.approx(want[r["g"]], abs=1e-9)

    def test_nulls_ignored(self, spark):
        df = spark.createDataFrame(
            [("A", 1.0), ("A", None), ("A", 3.0)], "g string, v double"
        )
        (row,) = df.transform(group_quantiles("v", [0.5], "g")).collect()
        assert row["v_p50"] == 2.0  # percentile() also skips NULLs

    def test_all_null_group_kept(self, spark):
        # percentile() keeps a group whose values are all NULL (quantile
        # NULL); the distinct-group spine must surface it the same way
        df = spark.createDataFrame(
            [("A", 1.0), ("A", 3.0), ("B", None), (None, 5.0)],
            "g string, v double",
        )
        got = {
            r["g"]: r["v_p50"]
            for r in df.transform(group_quantiles("v", [0.5], "g")).collect()
        }
        want = {
            r["g"]: r["p"]
            for r in df.groupBy("g")
            .agg(F.percentile("v", F.lit(0.5)).alias("p"))
            .collect()
        }
        assert got.keys() == want.keys()  # includes "B" and the NULL key
        assert got["B"] is None
        assert got[None] == 5.0
        assert got["A"] == want["A"]

    def test_multi_value_partial_null_group(self, spark):
        # group missing for ONE value column must not vanish from all
        df = spark.createDataFrame(
            [("A", 1.0, 10.0), ("B", None, 20.0)],
            "g string, v double, w double",
        )
        got = {
            r["g"]: (r["v_p50"], r["w_p50"])
            for r in df.transform(
                group_quantiles(["v", "w"], [0.5], "g")
            ).collect()
        }
        assert got == {"A": (1.0, 10.0), "B": (None, 20.0)}

    def test_extreme_probabilities(self, spark):
        df = spark.createDataFrame(
            [("A", float(v)) for v in (5, 1, 9, 3)], "g string, v double"
        )
        (row,) = df.transform(group_quantiles("v", [0.0, 1.0], "g")).collect()
        assert (row["v_p0"], row["v_p100"]) == (1.0, 9.0)

    def test_requires_groups_and_valid_probs(self, spark):
        with pytest.raises(ValueError):
            group_quantiles("v", [0.5], ())
        with pytest.raises(ValueError):
            group_quantiles("v", [1.5], "g")
        with pytest.raises(ValueError):
            group_quantiles("v", [], "g")
