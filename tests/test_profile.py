"""column_profile: golden stats, null handling, approx tier plan shape
(no Expand), single-scan plan."""

from __future__ import annotations

import pytest

from pywrangler_spark.operators.profile import column_profile


class TestColumnProfile:
    def test_golden(self, spark):
        df = spark.createDataFrame(
            [(1.0, 10), (2.0, 10), (None, 20), (2.0, None)],
            ["a", "b"],
        )
        got = {
            r.column_name: (r.n_rows, r.n_nonnull, r.n_distinct,
                            r.min_value, r.max_value)
            for r in df.transform(column_profile(["a", "b"])).collect()
        }
        assert got == {
            "a": (4, 3, 2, 1.0, 2.0),
            "b": (4, 3, 2, 10.0, 20.0),
        }

    def test_approx_no_expand(self, spark):
        df = spark.createDataFrame([(1.0, 2.0)], ["a", "b"])
        exact = df.transform(column_profile(["a", "b"], exact=True))
        approx = df.transform(column_profile(["a", "b"], exact=False))

        def plan(d):
            return d._sc._jvm.PythonSQLUtils.explainString(
                d._jdf.queryExecution(), "formatted"
            )

        assert "Expand" in plan(exact)      # distinct rewrite
        assert "Expand" not in plan(approx)  # HLL keeps plain two-phase agg

    def test_approx_close(self, spark):
        df = spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS a")
        r = df.transform(column_profile("a", exact=False)).first()
        # rsd=0.05 is one standard deviation — allow 4 sigma
        assert abs(r.n_distinct - 1000) / 1000 < 0.2
        assert (r.min_value, r.max_value) == (0.0, 999.0)

    def test_validation(self):
        with pytest.raises(ValueError, match="at least one column"):
            column_profile([])


class TestHistogram:
    def test_golden_bins(self, spark):
        from pywrangler_spark.operators.profile import histogram

        df = spark.createDataFrame(
            [(0.0,), (4.9,), (5.0,), (9.9,), (10.0,), (-1.0,), (11.0,)],
            ["x"],
        )
        got = {
            r.bin: (r.bin_lo, r.bin_hi, r.n_rows)
            for r in df.transform(histogram("x", 0.0, 10.0, 2)).collect()
        }
        # -1 and 11 dropped; 10.0 (top edge) clamped into last bin
        assert got == {0: (0.0, 5.0, 2), 1: (5.0, 10.0, 3)}

    def test_validation(self):
        from pywrangler_spark.operators.profile import histogram

        import pytest as _pytest
        with _pytest.raises(ValueError, match="nbins"):
            histogram("x", 1.0, 1.0, 0)
