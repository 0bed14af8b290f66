"""Unit tests for the unigram LM quality scorer."""

import math

import pytest

from pywrangler_spark.operators.lmscore import (
    fit_unigram_model,
    unigram_logprob_score,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # 10 tokens total: a x4, b x3, c x2, d x1
    return spark.createDataFrame(
        [
            (0, "a a b c"),
            (1, "a b d"),
            (2, "a b c"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )


class TestFitUnigramModel:
    def test_counts_and_probabilities(self, corpus):
        model = {
            r["term"]: (r["n"], r["p"])
            for r in corpus.transform(fit_unigram_model("text")).collect()
        }
        assert model["a"] == (4, 0.4)
        assert model["b"] == (3, 0.3)
        assert model["c"] == (2, 0.2)
        assert model["d"] == (1, 0.1)

    def test_vocab_cap_keeps_most_frequent(self, corpus):
        kept = [
            r["term"]
            for r in corpus.transform(
                fit_unigram_model("text", vocab_size=2)
            ).collect()
        ]
        assert kept == ["a", "b"]
        # p stays the UNCAPPED share so capped/uncapped fits agree
        p = corpus.transform(fit_unigram_model("text", vocab_size=2))
        assert {r["p"] for r in p.collect()} == {0.4, 0.3}

    def test_validation(self, corpus):
        with pytest.raises(ValueError):
            fit_unigram_model("text", vocab_size=0)


class TestUnigramScore:
    def test_mean_negative_log_prob(self, spark, corpus):
        model = corpus.transform(fit_unigram_model("text"))
        got = {
            r["doc_id"]: r["lm_score"]
            for r in corpus.transform(
                unigram_logprob_score(model)
            ).collect()
        }
        expected0 = -(2 * math.log(0.4) + math.log(0.3) + math.log(0.2)) / 4
        assert got[0] == pytest.approx(expected0, rel=1e-12)
        assert got[3] is None  # empty doc

    def test_oov_floor(self, spark, corpus):
        model = corpus.transform(fit_unigram_model("text", vocab_size=1))
        scored = spark.createDataFrame(
            [(9, "zz zz")], ["doc_id", "text"]
        ).transform(unigram_logprob_score(model, oov_p=1e-6))
        assert scored.collect()[0]["lm_score"] == pytest.approx(
            -math.log(1e-6), rel=1e-12
        )

    def test_validation(self, corpus):
        with pytest.raises(ValueError):
            unigram_logprob_score(corpus, oov_p=0.0)
