"""As-of join + time-bucket rollup: golden cases against pandas
``merge_asof`` semantics, plan-shape assertions (no join node, single
exchange), and tolerance/direction behavior."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.asof import asof_join, time_bucket_rollup


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        pd.DataFrame(
            {
                "sym": ["A", "A", "A", "B", "B", "C"],
                "t": [
                    _ts("2024-01-01 10:00:00"),
                    _ts("2024-01-01 10:00:05"),
                    _ts("2024-01-01 10:01:00"),
                    _ts("2024-01-01 10:00:03"),
                    _ts("2024-01-01 09:59:00"),
                    _ts("2024-01-01 10:00:00"),
                ],
                "qty": [1, 2, 3, 4, 5, 6],
            }
        )
    )
    quotes = spark.createDataFrame(
        pd.DataFrame(
            {
                "sym": ["A", "A", "A", "B", "B"],
                "t": [
                    _ts("2024-01-01 09:59:58"),
                    _ts("2024-01-01 10:00:00"),
                    _ts("2024-01-01 10:00:30"),
                    _ts("2024-01-01 10:00:00"),
                    _ts("2024-01-01 10:02:00"),
                ],
                "px": [10.0, 11.0, 12.0, 20.0, 21.0],
            }
        )
    )
    return trades, quotes


def _collect(df):
    rows = df.orderBy("sym", "t").collect()
    return [(r.sym, r.qty, r.px) for r in rows]


class TestAsofBackward:
    def test_matches_latest_at_or_before(self, trades_quotes):
        trades, quotes = trades_quotes
        out = trades.transform(
            asof_join(quotes, on="sym", left_ts="t", right_ts="t", suffix="_q")
        )
        got = [
            (r.sym, r.qty, r.px_q)
            for r in out.orderBy("sym", "t").collect()
        ]
        assert got == [
            ("A", 1, 11.0),   # tie at 10:00:00 -> inclusive
            ("A", 2, 11.0),
            ("A", 3, 12.0),
            ("B", 5, None),   # 09:59 before any quote
            ("B", 4, 20.0),
            ("C", 6, None),   # no quotes for C
        ]

    def test_matches_pandas_merge_asof(self, trades_quotes, spark):
        trades, quotes = trades_quotes
        out = trades.transform(
            asof_join(quotes, on="sym", left_ts="t", right_ts="t", suffix="_q")
        )
        got = (
            out.select("sym", "t", "qty", "px_q")
            .toPandas()
            .sort_values(["sym", "t"])
            .reset_index(drop=True)
        )
        exp = (
            pd.merge_asof(
                trades.toPandas().sort_values("t"),
                quotes.toPandas().sort_values("t"),
                on="t",
                by="sym",
                direction="backward",
            )
            .rename(columns={"px": "px_q"})
            .sort_values(["sym", "t"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp[got.columns])

    def test_tolerance(self, trades_quotes):
        trades, quotes = trades_quotes
        out = trades.transform(
            asof_join(
                quotes,
                on="sym",
                left_ts="t",
                right_ts="t",
                tolerance_seconds=10,
                suffix="_q",
            )
        )
        got = {
            (r.sym, r.qty): r.px_q for r in out.collect()
        }
        # A@10:01:00 is 30s after the 10:00:30 quote -> nulled
        assert got[("A", 3)] is None
        assert got[("A", 1)] == 11.0

    def test_plan_one_exchange_no_join(self, trades_quotes):
        trades, quotes = trades_quotes
        out = trades.transform(
            asof_join(quotes, on="sym", left_ts="t", right_ts="t", suffix="_q")
        )
        from pywrangler_spark.plans.inspect import (
            count_exchanges,
            explain_string,
        )

        assert "Join" not in explain_string(out)
        assert count_exchanges(out) == 1


class TestAsofForward:
    def test_matches_pandas_forward(self, trades_quotes):
        trades, quotes = trades_quotes
        out = trades.transform(
            asof_join(
                quotes,
                on="sym",
                left_ts="t",
                right_ts="t",
                direction="forward",
                suffix="_q",
            )
        )
        got = (
            out.select("sym", "t", "qty", "px_q")
            .toPandas()
            .sort_values(["sym", "t"])
            .reset_index(drop=True)
        )
        exp = (
            pd.merge_asof(
                trades.toPandas().sort_values("t"),
                quotes.toPandas().sort_values("t"),
                on="t",
                by="sym",
                direction="forward",
            )
            .rename(columns={"px": "px_q"})
            .sort_values(["sym", "t"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp[got.columns])


class TestValidation:
    def test_collision_raises(self, trades_quotes):
        trades, quotes = trades_quotes
        with pytest.raises(ValueError, match="collide"):
            trades.transform(
                asof_join(quotes, on="sym", left_ts="t", right_ts="t", suffix="")
            )

    def test_bad_direction(self, trades_quotes):
        trades, quotes = trades_quotes
        with pytest.raises(ValueError, match="direction"):
            asof_join(
                quotes, on="sym", left_ts="t", right_ts="t", direction="nearest"
            )(trades)

    def test_no_keys(self, trades_quotes):
        trades, quotes = trades_quotes
        with pytest.raises(ValueError, match="equality key"):
            asof_join(quotes, on=[], left_ts="t", right_ts="t")(trades)


class TestTimeBucket:
    def test_hourly_counts(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "t": [
                        _ts("2024-01-01 10:05:00"),
                        _ts("2024-01-01 10:55:00"),
                        _ts("2024-01-01 11:00:00"),
                    ],
                    "v": [1.0, 2.0, 4.0],
                }
            )
        )
        out = df.transform(
            time_bucket_rollup(
                "t", "1 hour", aggs=[F.sum("v").alias("s")]
            )
        )
        got = {
            (r.bucket_start.hour): r.s for r in out.collect()
        }
        assert got == {10: 3.0, 11: 4.0}


class TestHoppingBucket:
    def test_each_row_in_window_over_slide_buckets(self, spark):
        from datetime import datetime

        from pywrangler_spark.operators.asof import time_bucket_rollup

        df = spark.createDataFrame(
            [(datetime(2024, 1, 1, 0, 10), 1.0),
             (datetime(2024, 1, 1, 0, 40), 2.0)],
            ["ts", "value"],
        )
        out = df.transform(
            time_bucket_rollup(
                "ts", "1 hour",
                aggs=[F.sum("value").alias("s")],
                slide="30 minutes",
            )
        ).collect()
        got = {r.bucket_start.strftime("%H:%M"): r.s for r in out}
        # 00:10 -> windows starting 23:30, 00:00; 00:40 -> 00:00, 00:30
        assert got == {"23:30": 1.0, "00:00": 3.0, "00:30": 2.0}


class TestOhlcBars:
    def test_golden(self, spark):
        from datetime import datetime

        from pywrangler_spark.operators.asof import ohlc_bars

        rows = [
            (datetime(2024, 1, 1, 0, 5), 10.0, 1),
            (datetime(2024, 1, 1, 0, 20), 30.0, 2),
            (datetime(2024, 1, 1, 0, 40), 5.0, 3),
            (datetime(2024, 1, 1, 0, 55), 20.0, 4),
            (datetime(2024, 1, 1, 1, 10), 7.0, 5),
        ]
        df = spark.createDataFrame(rows, ["ts", "v", "id"])
        got = {
            r.bucket_start.hour: (r.open, r.high, r.low, r.close, r.n_ticks)
            for r in df.transform(
                ohlc_bars("ts", "v", "1 hour", tiebreak_columns="id")
            ).collect()
        }
        assert got == {0: (10.0, 30.0, 5.0, 20.0, 4), 1: (7.0, 7.0, 7.0, 7.0, 1)}

    def test_tie_determinism(self, spark):
        from datetime import datetime

        from pywrangler_spark.operators.asof import ohlc_bars

        t = datetime(2024, 1, 1, 0, 0)
        rows = [(t, float(i), i) for i in range(10)]
        df = spark.createDataFrame(rows, ["ts", "v", "id"])
        for _ in range(3):
            r = df.repartition(5).transform(
                ohlc_bars("ts", "v", "1 hour", tiebreak_columns="id")
            ).first()
            assert (r.open, r.close) == (0.0, 9.0)
