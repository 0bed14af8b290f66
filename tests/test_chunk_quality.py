"""Document chunking + percentile quality gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.chunk import chunk_documents
from pywrangler_spark.operators.quality import percentile_gate


class TestChunking:
    def test_offsets_and_reassembly(self, spark):
        text = "abcdefghij" * 10  # 100 chars
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = (
            df.transform(chunk_documents("doc_id", "text", 30, 0))
            .orderBy("chunk_index")
            .collect()
        )
        assert [r.chunk_start for r in out] == [1, 31, 61, 91]
        assert "".join(r.chunk for r in out) == text
        assert [len(r.chunk) for r in out] == [30, 30, 30, 10]

    def test_overlap(self, spark):
        df = spark.createDataFrame([(1, "0123456789")], ["doc_id", "text"])
        out = (
            df.transform(chunk_documents("doc_id", "text", 6, 2))
            .orderBy("chunk_index")
            .collect()
        )
        # step 4: starts 1, 5, 9
        assert [(r.chunk_start, r.chunk) for r in out] == [
            (1, "012345"), (5, "456789"), (9, "89")]

    def test_empty_and_null_drop(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "x")], ["doc_id", "text"]
        )
        out = df.transform(chunk_documents("doc_id", "text", 5)).collect()
        assert [(r.doc_id, r.chunk) for r in out] == [(3, "x")]

    def test_validation(self):
        with pytest.raises(ValueError, match="chunk_size"):
            chunk_documents("id", "t", 0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents("id", "t", 5, 5)


class TestPercentileGate:
    def test_exact_band(self, spark):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 101)], ["id", "x"]
        )
        out = df.transform(
            percentile_gate({"x": (0.10, 0.90)}, exact=True)
        )
        kept = sorted(r.id for r in out.collect())
        # exact percentiles of 1..100 at .1/.9 = 10.9 / 90.1 -> keep 11..90
        assert kept == list(range(11, 91))

    def test_one_sided_and_multi_column(self, spark):
        df = spark.createDataFrame(
            [(i, float(i), float(100 - i)) for i in range(1, 101)],
            ["id", "x", "y"],
        )
        out = df.transform(
            percentile_gate({"x": (0.5, None), "y": (0.25, None)},
                            exact=True)
        )
        kept = sorted(r.id for r in out.collect())
        # x >= p50(x)=50.5 and y=100-i >= p25(y)=24.75 -> 51..75
        assert kept == list(range(51, 76))

    def test_approx_close_to_exact(self, spark):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 1001)], ["id", "x"]
        )
        n_exact = df.transform(
            percentile_gate({"x": (0.05, 0.95)}, exact=True)
        ).count()
        n_approx = df.transform(
            percentile_gate({"x": (0.05, 0.95)})
        ).count()
        assert abs(n_exact - n_approx) <= 20

    def test_validation(self):
        with pytest.raises(ValueError, match="at least one"):
            percentile_gate({})
        with pytest.raises(ValueError, match="out of"):
            percentile_gate({"x": (0.1, 1.5)})
