

class TestColumnCacher:
    def test_lazy_adds_only_final(self, spark):
        from pyspark.sql import functions as F

        from pywrangler_spark.util import ColumnCacher

        df = spark.range(3)
        cc = ColumnCacher(df, mode="lazy")
        a = cc.add("a", F.col("id") + 1)
        b = cc.add("b", a * 2)
        out = cc.finish("result", b)
        assert out.columns == ["id", "result"]
        assert [r.result for r in out.orderBy("id").collect()] == [2, 4, 6]

    def test_debug_materializes_intermediates(self, spark):
        from pyspark.sql import functions as F

        from pywrangler_spark.util import ColumnCacher

        df = spark.range(3)
        cc = ColumnCacher(df, mode="debug")
        a = cc.add("a", F.col("id") + 1)
        cc.add("b", a * 2)
        out = cc.finish("result", F.col("b"))
        assert out.columns == ["id", "a", "b", "result"]

    def test_bad_mode_rejected(self):
        import pytest as _pytest

        from pywrangler_spark.util import ColumnCacher

        with _pytest.raises(ValueError, match="mode"):
            ColumnCacher(None, mode="eager")
