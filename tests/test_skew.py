"""left_join_null_bypass: equivalence to plain left join, plan shape, validation."""

from __future__ import annotations


class TestNullBypassJoin:
    def test_matches_plain_left_join(self, spark):
        from pywrangler_spark.operators.skew import left_join_null_bypass

        left = spark.createDataFrame(
            [(1, "a"), (None, "b"), (2, "c"), (None, "d"), (9, "e")],
            ["k", "lv"],
        )
        right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "rv"])
        got = sorted(
            [(r.k, r.lv, r.rv)
             for r in left.transform(
                 left_join_null_bypass(right, "k")).collect()],
            key=str,
        )
        want = sorted(
            [(r.k, r.lv, r.rv)
             for r in left.join(right, "k", "left").collect()],
            key=str,
        )
        assert got == want

    def test_null_rows_skip_exchange(self, spark):
        from pywrangler_spark.operators.skew import left_join_null_bypass
        from pywrangler_spark.plans.inspect import explain_string

        left = spark.createDataFrame([(1, "a"), (None, "b")], ["k", "lv"])
        right = spark.createDataFrame([(1, "x")], ["k", "rv"]).hint("merge")
        out = left.transform(left_join_null_bypass(right, "k"))
        plan = explain_string(out)
        # the bypass branch appears as a filter on isnull ABOVE the union,
        # with no exchange between it and its scan
        assert "Union" in plan

    def test_validation(self):
        from pywrangler_spark.operators.skew import left_join_null_bypass

        import pytest as _pytest
        with _pytest.raises(ValueError, match="join keys"):
            left_join_null_bypass(None, [])
