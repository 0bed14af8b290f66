"""JSON extraction: field lift, prefix/drop, malformed-row NULLs,
single-parse plan shape, ad-hoc probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from pywrangler_spark.functions.json import extract_json, json_field


class TestExtractJson:
    def test_lifts_fields(self, spark):
        df = spark.createDataFrame(
            [(1, '{"k": 5, "tag": "a"}'), (2, '{"k": 7}')],
            ["id", "props"],
        )
        out = df.transform(extract_json("props", "k INT, tag STRING"))
        assert out.columns == ["id", "props", "k", "tag"]
        got = {r.id: (r.k, r.tag) for r in out.collect()}
        assert got == {1: (5, "a"), 2: (7, None)}

    def test_prefix_and_drop(self, spark):
        df = spark.createDataFrame([(1, '{"k": 5}')], ["id", "props"])
        out = df.transform(
            extract_json("props", "k INT", prefix="p_", drop=True)
        )
        assert out.columns == ["id", "p_k"]

    def test_malformed_rows_null(self, spark):
        df = spark.createDataFrame(
            [(1, "not json"), (2, None), (3, '{"k": 1}')], ["id", "props"]
        )
        got = {
            r.id: r.k
            for r in df.transform(extract_json("props", "k INT")).collect()
        }
        assert got == {1: None, 2: None, 3: 1}

    def test_single_parse_in_plan(self, spark):
        # from_json appears once even though two fields are lifted
        df = spark.createDataFrame([(1, '{"k": 1, "t": "x"}')], ["id", "props"])
        out = df.transform(extract_json("props", "k INT, t STRING"))
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert plan.count("from_json") <= 2  # project expr + alias reuse

    def test_json_field_probe(self, spark):
        df = spark.createDataFrame([(1, '{"k": 41}')], ["id", "props"])
        got = df.select(json_field("props", "$.k", "int").alias("k")).first()
        assert got.k == 41


class TestScrubText:
    def test_masks_in_order(self, spark):
        from pywrangler_spark.functions.text import scrub_text

        df = spark.createDataFrame(
            [(1, "see https://x.io/a?b=12 or mail bob2@ex.co, room 404")],
            ["id", "text"],
        )
        got = df.select(scrub_text(F.col("text")).alias("t")).first().t
        assert got == "see <URL> or mail <EMAIL>, room <NUM>"

    def test_noop_on_clean_text(self, spark):
        from pywrangler_spark.functions.text import scrub_text

        df = spark.createDataFrame([(1, "plain words only")], ["id", "text"])
        assert df.select(
            scrub_text(F.col("text")).alias("t")
        ).first().t == "plain words only"
