"""Winsorize / impute wrangler tests."""

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.clean import (
    frequency_encode,
    impute,
    winsorize,
)
from pywrangler_spark.operators.clean import scale as scale_op


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
            ("b", 10.0), ("b", None), ("b", 30.0),
        ],
        "grp string, v double",
    )


class TestWinsorize:
    def test_clips_outlier_per_group(self, spark, frame):
        out = {
            (r["grp"], i): r["v"]
            for i, r in enumerate(
                frame.transform(
                    winsorize("v", 0.0, 0.9, group_by="grp")
                ).collect()
            )
        }
        vals_a = [v for (g, _), v in out.items() if g == "a"]
        # p90 of group a (1,2,3,4,100) interpolates to 61.6; the 100
        # outlier clips down, everything else unchanged
        assert max(vals_a) == pytest.approx(61.6)
        assert sorted(vals_a)[:4] == [1.0, 2.0, 3.0, 4.0]

    def test_nulls_pass_through(self, spark, frame):
        out = frame.transform(winsorize("v", 0.1, 0.9, group_by="grp"))
        assert out.filter(F.col("v").isNull()).count() == 1
        assert out.columns == frame.columns

    def test_validation(self):
        with pytest.raises(ValueError, match="lower"):
            winsorize("v", 0.9, 0.1)
        with pytest.raises(ValueError, match="column"):
            winsorize([])


class TestImpute:
    def test_group_median(self, spark, frame):
        out = frame.transform(impute("v", "median", group_by="grp"))
        filled = [
            r["v"]
            for r in out.filter(F.col("grp") == "b").collect()
        ]
        assert sorted(filled) == [10.0, 20.0, 30.0]  # median(10,30)=20

    def test_global_mean(self, spark, frame):
        out = frame.transform(impute("v", "mean"))
        assert out.filter(F.col("v").isNull()).count() == 0

    def test_group_mode_with_tiebreak(self, spark):
        df = spark.createDataFrame(
            [("a", 5.0), ("a", 5.0), ("a", 7.0), ("a", None),
             ("b", 1.0), ("b", 2.0), ("b", None)],
            "grp string, v double",
        )
        out = {
            r["grp"]: sorted(
                x["v"] for x in df.transform(
                    impute("v", "mode", group_by="grp")
                ).filter(F.col("grp") == r["grp"]).collect()
            )
            for r in df.select("grp").distinct().collect()
        }
        assert out["a"] == [5.0, 5.0, 5.0, 7.0]
        # tie (1.0 vs 2.0, both count 1) breaks to the smaller value
        assert out["b"] == [1.0, 1.0, 2.0]

    def test_validation(self):
        with pytest.raises(ValueError, match="strategy"):
            impute("v", "max")


class TestScale:
    def test_group_zscore(self, spark, frame):
        out = frame.transform(scale_op("v", "zscore", group_by="grp"))
        b = sorted(
            r["v"] for r in out.filter(
                (F.col("grp") == "b") & F.col("v").isNotNull()
            ).collect()
        )
        # group b values 10, 30: mean 20, stddev_samp ~14.142136
        assert b[0] == pytest.approx(-0.707107, abs=1e-6)
        assert b[1] == pytest.approx(0.707107, abs=1e-6)
        assert out.filter(F.col("v").isNull()).count() == 1

    def test_minmax_and_constant_column(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)],
            "grp string, v double",
        )
        out = {
            (r["grp"], r["v"])
            for r in df.transform(
                scale_op("v", "minmax", group_by="grp")
            ).collect()
        }
        assert ("a", 0.0) in out and ("a", 1.0) in out
        # constant group scales to 0.0, not NaN/NULL
        assert out == {("a", 0.0), ("a", 1.0), ("b", 0.0)}


class TestFrequencyEncode:
    def test_relative_and_null(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y"), (4, None)],
            "id long, cat string",
        )
        out = {
            r["id"]: r["cat_freq"]
            for r in df.transform(frequency_encode("cat")).collect()
        }
        assert out[1] == out[2] == 0.5
        assert out[3] == 0.25
        assert out[4] is None


class TestCleanGoldenWithMutants:
    def test_winsorize_golden_case_kills_mutants(self, spark):
        """Reference-style golden DataTestCase with mutation testing:
        the expected output must be sensitive to every planted input
        mutation (a silent pass on mutated input = a dead test)."""
        from pywrangler_spark.testing.datatestcase import DataTestCase

        class WinsorizeCase(DataTestCase):
            input = {
                "grp:s": ("a", "a", "a", "a"),
                "v:f": (1.0, 2.0, 3.0, 100.0),
            }
            # p[0, 0.75] band of (1,2,3,100): hi = 3 + 0.25*97 ... use
            # upper=0.5 → hi = 2.5; lower=0 → lo = 1.0
            output = {
                "grp:s": ("a", "a", "a", "a"),
                "v:f": (1.0, 2.0, 2.5, 2.5),
            }
            mutants = [
                {("v", 3): 2.0},   # outlier removed → band changes
                {("v", 0): -50.0},  # new low outlier → lo changes
            ]

        WinsorizeCase().test(
            lambda df: df.transform(
                winsorize("v", 0.0, 0.5, group_by="grp")
            ),
            engine="pyspark",
            spark=spark,
        )

    def test_impute_golden_case_kills_mutants(self, spark):
        from pywrangler_spark.testing.datatestcase import DataTestCase
        from pywrangler_spark.testing.plainframe import NULL

        class ImputeCase(DataTestCase):
            input = {
                "grp:s": ("a", "a", "a", "b", "b"),
                "v:f": (1.0, 3.0, NULL, 7.0, NULL),
            }
            output = {
                "grp:s": ("a", "a", "a", "b", "b"),
                "v:f": (1.0, 3.0, 2.0, 7.0, 7.0),
            }
            mutants = [
                {("v", 1): 5.0},  # group-a median moves
                {("v", 3): 9.0},  # group-b fill moves
            ]

        ImputeCase().test(
            lambda df: df.transform(
                impute("v", "median", group_by="grp")
            ),
            engine="pyspark",
            spark=spark,
        )


class TestPandasTwins:
    def test_winsorize_cross_engine(self, spark):
        from pywrangler_spark.pandas_engine import pandas_winsorize
        from pywrangler_spark.sources import read_parquet

        ev = read_parquet(
            spark, "/root/testdata/sf0.001/events.parquet"
        ).select("event_id", "event_type", "value")
        got_spark = {
            r["event_id"]: r["value"]
            for r in ev.transform(
                winsorize("value", 0.1, 0.9, group_by="event_type")
            ).collect()
        }
        pdf = ev.toPandas()
        got_pandas = pdf.pipe(
            pandas_winsorize("value", 0.1, 0.9, group_by="event_type")
        )
        twin = dict(zip(got_pandas["event_id"], got_pandas["value"]))
        assert set(got_spark) == set(twin)
        for k, v in got_spark.items():
            t = twin[k]
            if v is None:
                assert t != t  # NaN
            else:
                assert v == pytest.approx(t, rel=1e-9)

    def test_impute_cross_engine(self, spark):
        from pywrangler_spark.pandas_engine import pandas_impute
        from pywrangler_spark.sources import read_parquet

        ev = read_parquet(
            spark, "/root/testdata/sf0.001/events.parquet"
        ).select("event_id", "event_type", "value")
        got_spark = {
            r["event_id"]: r["value"]
            for r in ev.transform(
                impute("value", "median", group_by="event_type")
            ).collect()
        }
        pdf = ev.toPandas()
        got_pandas = pdf.pipe(
            pandas_impute("value", "median", group_by="event_type")
        )
        twin = dict(zip(got_pandas["event_id"], got_pandas["value"]))
        for k, v in got_spark.items():
            assert v == pytest.approx(twin[k], rel=1e-9)


class TestNullGroupKeys:
    """Rows whose group key is NULL must get the NULL group's own
    statistic (null-safe stats join), and both engines must agree —
    the round-3 advisory found name-list joins silently passing NULL
    groups through untransformed."""

    @pytest.fixture(scope="class")
    def nullgrp(self, spark):
        return spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 30.0),
             (None, None)],
            "grp string, v double",
        )

    def test_impute_null_group(self, spark, nullgrp):
        out = nullgrp.transform(impute("v", "median", group_by="grp"))
        filled = sorted(
            r["v"] for r in out.filter(F.col("grp").isNull()).collect()
        )
        assert filled == [10.0, 20.0, 30.0]  # median(10,30)=20 fills

    def test_winsorize_null_group(self, spark, nullgrp):
        out = nullgrp.transform(
            winsorize("v", 0.0, 0.5, group_by="grp")
        )
        vals = sorted(
            r["v"]
            for r in out.filter(
                F.col("grp").isNull() & F.col("v").isNotNull()
            ).collect()
        )
        assert vals == [10.0, 20.0]  # p50 of (10,30)=20 clips the 30

    def test_scale_null_group(self, spark, nullgrp):
        out = nullgrp.transform(
            scale_op("v", "minmax", group_by="grp")
        )
        vals = sorted(
            r["v"]
            for r in out.filter(
                F.col("grp").isNull() & F.col("v").isNotNull()
            ).collect()
        )
        assert vals == [0.0, 1.0]

    def test_impute_mode_multicol_null_group(self, spark):
        df = spark.createDataFrame(
            [(None, 5.0, None), (None, 5.0, 2.0), (None, None, 2.0),
             ("a", 1.0, 9.0)],
            "grp string, x double, y double",
        )
        out = df.transform(
            impute(["x", "y"], "mode", group_by="grp")
        ).filter(F.col("grp").isNull())
        # the NULL group must stay ONE group across the per-column
        # fills merge: x fills with 5.0, y with 2.0, and no row fanout
        assert out.count() == 3
        rows = out.collect()
        assert all(r["x"] == 5.0 for r in rows)
        assert all(r["y"] == 2.0 for r in rows)

    def test_cross_engine_null_group(self, spark, nullgrp):
        from pywrangler_spark.pandas_engine import (
            pandas_impute,
            pandas_winsorize,
        )

        pdf = nullgrp.toPandas()
        sp = sorted(
            (r["v"] if r["v"] is not None else None)
            for r in nullgrp.transform(
                impute("v", "median", group_by="grp")
            ).collect()
        )
        tw = sorted(
            pdf.pipe(pandas_impute("v", "median", group_by="grp"))["v"]
        )
        assert sp == pytest.approx(tw)
        spw = nullgrp.transform(
            winsorize("v", 0.0, 0.5, group_by="grp")
        ).collect()
        tww = pdf.pipe(pandas_winsorize("v", 0.0, 0.5, group_by="grp"))
        sp_vals = sorted(r["v"] for r in spw if r["v"] is not None)
        tw_vals = sorted(x for x in tww["v"] if x == x)
        assert sp_vals == pytest.approx(tw_vals)


class TestScaleGoldenWithMutants:
    def test_minmax_golden_case_kills_mutants(self, spark):
        from pywrangler_spark.testing.datatestcase import DataTestCase

        class MinMaxCase(DataTestCase):
            input = {
                "grp:s": ("a", "a", "a"),
                "v:f": (2.0, 4.0, 6.0),
            }
            output = {
                "grp:s": ("a", "a", "a"),
                "v:f": (0.0, 0.5, 1.0),
            }
            mutants = [
                {("v", 2): 10.0},  # range stretches → midpoint moves
                {("v", 0): 0.0},   # min moves
            ]

        MinMaxCase().test(
            lambda df: df.transform(
                scale_op("v", "minmax", group_by="grp")
            ),
            engine="pyspark",
            spark=spark,
        )
