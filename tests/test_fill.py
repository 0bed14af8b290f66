"""ffill/bfill: pandas-semantics golden cases, single-exchange plan."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.fill import bfill, ffill
from pywrangler_spark.plans.inspect import count_exchanges


@pytest.fixture(scope="module")
def gappy(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "g": ["a"] * 4 + ["b"] * 3,
                "t": [1, 2, 3, 4, 1, 2, 3],
                "x": [None, 10.0, None, 20.0, None, None, 5.0],
            }
        )
    )


class TestFill:
    def test_ffill_matches_pandas(self, gappy):
        out = gappy.transform(ffill("x", "g", "t"))
        got = {(r.g, r.t): r.x for r in out.collect()}
        exp = {("a", 1): None, ("a", 2): 10.0, ("a", 3): 10.0,
               ("a", 4): 20.0, ("b", 1): None, ("b", 2): None, ("b", 3): 5.0}
        assert got == exp

    def test_bfill_matches_pandas(self, gappy):
        out = gappy.transform(bfill("x", "g", "t"))
        got = {(r.g, r.t): r.x for r in out.collect()}
        exp = {("a", 1): 10.0, ("a", 2): 10.0, ("a", 3): 20.0,
               ("a", 4): 20.0, ("b", 1): 5.0, ("b", 2): 5.0, ("b", 3): 5.0}
        assert got == exp

    def test_multi_column_single_exchange(self, gappy):
        df = gappy.withColumn("y", F.col("x") * 2)
        out = df.transform(ffill(["x", "y"], "g", "t"))
        assert count_exchanges(out) == 1

    def test_column_order_preserved(self, gappy):
        out = gappy.transform(ffill("x", "g", "t"))
        assert out.columns == gappy.columns

    def test_validation(self, gappy):
        with pytest.raises(ValueError, match="orderby"):
            ffill("x", "g", [])(gappy)
        with pytest.raises(ValueError, match="at least one column"):
            bfill([], "g", "t")(gappy)


class TestPandasEngineFill:
    def test_cross_engine_agreement(self, spark, gappy):
        from pywrangler_spark.pandas_engine import pandas_bfill, pandas_ffill

        pdf = gappy.toPandas()
        for spark_op, pandas_op in ((ffill, pandas_ffill), (bfill, pandas_bfill)):
            got_spark = {
                (r.g, r.t): r.x
                for r in gappy.transform(spark_op("x", "g", "t")).collect()
            }
            out = pdf.pipe(pandas_op("x", "g", "t"))
            got_pandas = {
                (r.g, r.t): (None if pd.isna(r.x) else r.x)
                for r in out.itertuples()
            }
            assert got_spark == got_pandas

    def test_index_and_row_order_preserved(self):
        from pywrangler_spark.pandas_engine import pandas_ffill

        pdf = pd.DataFrame(
            {"g": ["a", "a", "a"], "t": [3, 1, 2], "x": [None, 5.0, None]},
            index=[10, 20, 30],
        )
        out = pdf.pipe(pandas_ffill("x", "g", "t"))
        assert list(out.index) == [10, 20, 30]
        # row at t=3 fills from t=2 which fills from t=1 -> all 5.0 except t=1
        assert out.loc[10, "x"] == 5.0 and out.loc[30, "x"] == 5.0
