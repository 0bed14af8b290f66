"""BM25 search: hand-checked tiny corpus, ranking properties, top-k
contract."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pywrangler_spark.operators.search import bm25_formula, bm25_search


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "spark spark spark join",      # tf-heavy on 'spark'
                    "spark query join table",      # all three terms
                    "table scan filter sort",      # no match
                    "query",                       # short doc boost
                ],
            }
        )
    )


def _rows(df):
    return {r.doc_id: (r.score, r.n_terms) for r in df.collect()}


class TestBM25:
    def test_matches_hand_computation(self, corpus):
        out = _rows(
            corpus.transform(bm25_search(["spark", "query", "join"],
                                         "doc_id", "text"))
        )
        # corpus stats: N=4, dl = [4, 4, 4, 1], avgdl = 3.25
        n_docs, avgdl, k1, b = 4.0, 3.25, 1.2, 0.75

        def score(tf, dl, df_t):
            idf = math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
            return idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )

        exp0 = round(score(3, 4, 2) + score(1, 4, 2), 6)   # spark×3, join
        exp1 = round(score(1, 4, 2) + score(1, 4, 2) + score(1, 4, 2), 6)
        exp3 = round(score(1, 1, 2), 6)
        assert out[0][0] == pytest.approx(exp0, abs=1e-6)
        assert out[1][0] == pytest.approx(exp1, abs=1e-6)
        assert out[3][0] == pytest.approx(exp3, abs=1e-6)
        assert 2 not in out
        assert out[1][1] == 3 and out[0][1] == 2

    def test_top_k_limit_and_order(self, corpus):
        out = corpus.transform(
            bm25_search(["spark", "query", "join"], "doc_id", "text", k=2)
        ).collect()
        assert len(out) == 2
        assert out[0].score >= out[1].score

    def test_empty_query_rejected(self, corpus):
        with pytest.raises(ValueError, match="query term"):
            bm25_search([], "doc_id", "text")(corpus)

    def test_formula_string_stable(self):
        f = bm25_formula()
        assert "ln(" in f and "tf" in f and "avgdl" in f
