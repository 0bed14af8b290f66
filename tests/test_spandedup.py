"""Unit tests for cross-document duplicate-span masking."""

import pytest

from pywrangler_spark.operators.spandedup import mask_duplicate_spans


class TestMaskDuplicateSpans:
    def test_masks_shared_span_only(self, spark):
        # docs 1 and 2 share the 5-gram "a b c d e"; doc 3 is clean
        df = spark.createDataFrame(
            [
                (1, "a b c d e x y z w v"),
                (2, "q r a b c d e s t u"),
                (3, "n o p aa bb cc dd ee ff gg"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: (r["n_masked"], r["dup_ratio"])
            for r in df.transform(
                mask_duplicate_spans(n=5, min_docs=2)
            ).collect()
        }
        assert out[1] == (5, 0.5)
        assert out[2] == (5, 0.5)
        assert out[3] == (0, 0.0)

    def test_overlapping_windows_count_positions_once(self, spark):
        # "a b c d e f" shared in full: 2 overlapping 5-grams cover 6
        # positions — each masked position counts once
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f")],
            ["doc_id", "text"],
        )
        out = df.transform(mask_duplicate_spans(n=5, min_docs=2)).collect()
        assert all(r["n_masked"] == 6 and r["dup_ratio"] == 1.0 for r in out)

    def test_within_doc_repeats_not_masked(self, spark):
        # the repeated 5-gram occurs twice in ONE doc: distinct-doc
        # count is 1 -> no masking
        df = spark.createDataFrame(
            [(1, "a b c d e a b c d e"), (2, "z z2 z3 z4 z5")],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r["n_masked"]
            for r in df.transform(
                mask_duplicate_spans(n=5, min_docs=2)
            ).collect()
        }
        assert out == {1: 0, 2: 0}

    def test_short_docs_never_masked(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
        )
        out = df.transform(mask_duplicate_spans(n=5, min_docs=2)).collect()
        assert all(r["n_masked"] == 0 for r in out)

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            mask_duplicate_spans(n=0)
        with pytest.raises(ValueError):
            mask_duplicate_spans(min_docs=1)
