"""latest_by_key: golden cases, determinism under ties, plan shape,
chunking reassembly property."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.latest import latest_by_key
from pywrangler_spark.plans.inspect import count_exchanges


class TestLatestByKey:
    def test_latest_wins(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "old"), ("a", 3, "new"), ("a", 2, "mid"),
             ("b", 9, "only")],
            ["k", "ts", "val"],
        )
        got = {
            r.k: (r.ts, r.val)
            for r in df.transform(latest_by_key("k", "ts")).collect()
        }
        assert got == {"a": (3, "new"), "b": (9, "only")}

    def test_tie_determinism(self, spark):
        rows = [("a", 1, i, f"v{i}") for i in range(20)]
        df = spark.createDataFrame(rows, ["k", "ts", "seq", "val"])
        for _ in range(3):
            out = df.repartition(7).transform(
                latest_by_key("k", "ts", "seq")
            ).collect()
            assert [(r.k, r.seq) for r in out] == [("a", 19)]

    def test_single_exchange_no_window(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "x")], ["k", "ts", "val"]
        )
        out = df.transform(latest_by_key("k", "ts"))
        assert count_exchanges(out) == 1
        assert "Window" not in out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )

    def test_column_order_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 2.0)], ["ts", "k", "val"]
        )
        out = df.transform(latest_by_key("k", "ts"))
        assert out.columns == df.columns

    def test_validation(self):
        with pytest.raises(ValueError, match="key column"):
            latest_by_key([], "ts")


class TestChunkProperty:
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        text=st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            min_size=1,
            max_size=300,
        ),
        chunk_size=st.integers(min_value=1, max_value=64),
        data=st.data(),
    )
    def test_zero_overlap_reassembles(self, spark, text, chunk_size, data):
        # zero overlap: concatenating chunks in order restores the text
        from pywrangler_spark.operators.chunk import chunk_documents

        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = (
            df.transform(chunk_documents("doc_id", "text", chunk_size, 0))
            .orderBy("chunk_index")
            .collect()
        )
        assert "".join(r.chunk for r in out) == text
        assert all(len(r.chunk) <= chunk_size for r in out)


class TestScd2:
    def test_intervals(self, spark):
        from pywrangler_spark.operators.latest import scd2_from_changelog

        df = spark.createDataFrame(
            [("a", 1, "x"), ("a", 5, "y"), ("a", 9, "z"), ("b", 2, "p")],
            ["k", "ts", "val"],
        )
        got = {
            (r.k, r.ts): (r.valid_from, r.valid_to)
            for r in df.transform(scd2_from_changelog("k", "ts")).collect()
        }
        assert got == {
            ("a", 1): (1, 5),
            ("a", 5): (5, 9),
            ("a", 9): (9, None),
            ("b", 2): (2, None),
        }

    def test_validation(self):
        from pywrangler_spark.operators.latest import scd2_from_changelog

        with pytest.raises(ValueError, match="key column"):
            scd2_from_changelog([], "ts")


class TestDropUnchanged:
    def test_collapses_runs(self, spark):
        from pywrangler_spark.operators.latest import drop_unchanged

        rows = [
            ("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"),
            ("a", 4, "y"), ("a", 5, "x"), ("b", 1, "p"),
        ]
        df = spark.createDataFrame(rows, ["k", "ts", "val"])
        out = df.transform(drop_unchanged("k", "ts", "val"))
        got = sorted((r.k, r.ts, r.val) for r in out.collect())
        assert got == [("a", 1, "x"), ("a", 3, "y"), ("a", 5, "x"),
                       ("b", 1, "p")]

    def test_null_runs_collapse(self, spark):
        from pywrangler_spark.operators.latest import drop_unchanged

        rows = [("a", 1, None), ("a", 2, None), ("a", 3, "x"),
                ("a", 4, None)]
        df = spark.createDataFrame(rows, ["k", "ts", "val"])
        out = df.transform(drop_unchanged("k", "ts", "val"))
        assert sorted((r.ts, r.val) for r in out.collect()) == [
            (1, None), (3, "x"), (4, None)
        ]

    def test_single_exchange(self, spark):
        from pywrangler_spark.operators.latest import drop_unchanged

        df = spark.createDataFrame([("a", 1, "x")], ["k", "ts", "val"])
        out = df.transform(drop_unchanged("k", "ts", ["val"]))
        assert count_exchanges(out) == 1


class TestApplyChangelog:
    def test_upsert_insert_delete(self, spark):
        from pywrangler_spark.operators.latest import apply_changelog

        snap = spark.createDataFrame(
            [("a", 1, "A1", False), ("b", 1, "B1", False),
             ("c", 1, "C1", False)],
            ["k", "v", "val", "dead"],
        )
        batch = spark.createDataFrame(
            [("a", 2, "A2", False),   # update
             ("d", 1, "D1", False),   # insert
             ("b", 2, None, True),    # delete tombstone
             ("c", 0, "C0", False)],  # stale change: loses to snapshot
            ["k", "v", "val", "dead"],
        )
        out = snap.transform(
            apply_changelog(batch, "k", "v", delete_column="dead")
        )
        got = {r.k: (r.v, r.val) for r in out.collect()}
        assert got == {"a": (2, "A2"), "c": (1, "C1"), "d": (1, "D1")}

    def test_resurrection(self, spark):
        from pywrangler_spark.operators.latest import apply_changelog

        snap = spark.createDataFrame([("a", 1, True)], ["k", "v", "dead"])
        batch = spark.createDataFrame([("a", 2, False)], ["k", "v", "dead"])
        out = snap.transform(
            apply_changelog(batch, "k", "v", delete_column="dead")
        )
        assert [(r.k, r.v) for r in out.collect()] == [("a", 2)]
