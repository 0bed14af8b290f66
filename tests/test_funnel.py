"""funnel: golden progression, out-of-order stages null out, strict vs
non-strict ties, plan shape (one exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.funnel import funnel
from pywrangler_spark.plans.inspect import count_exchanges

STAGES = lambda: {  # noqa: E731
    "view": F.col("t") == "v",
    "click": F.col("t") == "c",
    "buy": F.col("t") == "b",
}


class TestFunnel:
    def test_golden_progression(self, spark):
        df = spark.createDataFrame(
            [("u1", 1, "v"), ("u1", 2, "c"), ("u1", 3, "b"),
             ("u2", 1, "c"), ("u2", 2, "v"), ("u2", 3, "c"),
             ("u3", 1, "v")],
            ["user", "ts", "t"],
        )
        got = {
            r.user: (r.view_ts, r.click_ts, r.buy_ts)
            for r in df.transform(funnel("user", "ts", STAGES())).collect()
        }
        # u2's click at ts=1 precedes the first view -> click counts at 3
        assert got == {
            "u1": (1, 2, 3),
            "u2": (2, 3, None),
            "u3": (1, None, None),
        }

    def test_strict_ties(self, spark):
        df = spark.createDataFrame(
            [("u", 1, "v"), ("u", 1, "c")], ["user", "ts", "t"]
        )
        strict = df.transform(funnel("user", "ts", STAGES())).first()
        loose = df.transform(
            funnel("user", "ts", STAGES(), strict=False)
        ).first()
        assert strict.click_ts is None
        assert loose.click_ts == 1

    def test_single_exchange(self, spark):
        df = spark.createDataFrame([("u", 1, "v")], ["user", "ts", "t"])
        out = df.transform(funnel("user", "ts", STAGES()))
        assert count_exchanges(out) == 1

    def test_validation(self):
        with pytest.raises(ValueError, match="stage"):
            funnel("u", "ts", {})
