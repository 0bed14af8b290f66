"""Per-group trend: JVM regr_* path vs applyInPandas path must agree;
degenerate groups (n<2, zero x-variance) yield NULL fits on both."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.trend import group_trend, group_trend_pandas


@pytest.fixture(scope="module")
def series(spark):
    rows = []
    # g=a: clean line y = 2x + 1; g=b: noisy-ish; g=c: single point;
    # g=d: zero x-variance
    for x in range(10):
        rows.append(("a", float(x), 2.0 * x + 1.0))
    for i, (x, y) in enumerate([(0, 3.0), (1, 4.5), (2, 7.5), (3, 8.0)]):
        rows.append(("b", float(x), y))
    rows.append(("c", 5.0, 9.0))
    rows += [("d", 2.0, 1.0), ("d", 2.0, 5.0)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "x", "y"])
    )


def _by_group(df):
    return {
        r.g: (r.slope, r.intercept, r.n) for r in df.collect()
    }


class TestGroupTrend:
    def test_known_line(self, series):
        got = _by_group(series.transform(group_trend("x", "y", "g")))
        assert got["a"] == (2.0, 1.0, 10)

    def test_degenerate_groups_null(self, series):
        got = _by_group(series.transform(group_trend("x", "y", "g")))
        assert got["c"][0] is None and got["c"][2] == 1
        assert got["d"][0] is None and got["d"][2] == 2

    def test_pandas_path_agrees(self, series):
        native = _by_group(series.transform(group_trend("x", "y", "g")))
        via_pandas = _by_group(
            series.transform(group_trend_pandas("x", "y", "g"))
        )
        assert native == via_pandas

    def test_timestamp_x(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "g": ["u"] * 3,
                    "t": [
                        dt.datetime(2024, 1, 1, 0, 0, 0),
                        dt.datetime(2024, 1, 1, 0, 0, 10),
                        dt.datetime(2024, 1, 1, 0, 0, 20),
                    ],
                    "y": [0.0, 10.0, 20.0],
                }
            )
        )
        got = _by_group(df.transform(group_trend("t", "y", "g")))
        assert got["u"][0] == 1.0  # 1 unit of y per second

    def test_validation(self, series):
        with pytest.raises(ValueError, match="groupby"):
            group_trend("x", "y", [])(series)
        with pytest.raises(ValueError, match="groupby"):
            group_trend_pandas("x", "y", [])(series)
