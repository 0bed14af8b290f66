"""BPE tokenizer tests: classical merge behavior, deterministic ties,
encode invariants, and the Spark encode path."""

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.bpe import (
    _merge_loop,
    apply_bpe,
    bpe_encode,
    train_bpe,
)


class TestMergeLoop:
    def test_most_frequent_pair_merges_first(self):
        merges = _merge_loop({tuple("ab"): 3, tuple("ac"): 1}, 10)
        assert merges == [("a", "b")]  # (a,c) count 1 < 2 → stops

    def test_lexicographic_tiebreak(self):
        merges = _merge_loop({tuple("xy"): 2, tuple("yz"): 2}, 1)
        assert merges == [("y", "z")]

    def test_chained_merges_build_longer_symbols(self):
        merges = _merge_loop({tuple("lowlow"): 4}, 3)
        assert merges == [("o", "w"), ("l", "ow"), ("low", "low")]
        ranks = {p: i for i, p in enumerate(merges)}
        assert apply_bpe("lowlow", ranks) == ["lowlow"]
        assert apply_bpe("lower", ranks) == ["low", "e", "r"]


class TestSparkEncode:
    def test_train_and_encode_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(1, "low low low lower"), (2, "lowest low"), (3, None)],
            ["doc_id", "text"],
        )
        merges = train_bpe(df, "text", n_merges=5)
        assert ("l", "o") in merges or ("o", "w") in merges
        out = {
            r["doc_id"]: (r["bpe_tokens"], r["bpe_token_count"])
            for r in df.transform(bpe_encode(merges, "text")).collect()
        }
        # "low" trained to a single symbol; concatenation reconstructs
        toks, n = out[1]
        assert n == len(toks)
        assert "".join(toks) == "lowlowlowlower"
        assert toks.count("low") >= 3
        assert out[3] == (None, 0)

    def test_count_bounds_invariant(self, spark):
        from pywrangler_spark.functions.text import token_count
        from pywrangler_spark.sources import read_parquet

        docs = read_parquet(
            spark, "/root/testdata/sf0.001/documents.parquet"
        )
        merges = train_bpe(docs, "text", n_merges=50)
        enc = docs.transform(bpe_encode(merges, "text"))
        bad = enc.filter(
            ~(
                (token_count(F.col("text")) <= F.col("bpe_token_count"))
                & (
                    F.col("bpe_token_count")
                    <= F.length(
                        F.regexp_replace(
                            F.lower(F.col("text")), r"\s", ""
                        )
                    )
                )
            )
        ).count()
        assert bad == 0

    def test_validation(self):
        with pytest.raises(ValueError, match="n_merges"):
            train_bpe(None, n_merges=0)


class TestBPEProperties:
    def test_reconstruction_property(self):
        """For ANY corpus and merge budget: every encoded word
        concatenates back to itself, and encoding is deterministic."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        word = st.text(alphabet="abcd", min_size=1, max_size=8)

        @settings(max_examples=200, deadline=None)
        @given(
            corpus=st.lists(word, min_size=1, max_size=30),
            n_merges=st.integers(min_value=1, max_value=20),
        )
        def check(corpus, n_merges):
            counts = {}
            for w in corpus:
                k = tuple(w)
                counts[k] = counts.get(k, 0) + 1
            merges = _merge_loop(counts, n_merges)
            ranks = {p: i for i, p in enumerate(merges)}
            for w in corpus:
                toks = apply_bpe(w, ranks)
                assert "".join(toks) == w
                assert toks == apply_bpe(w, ranks)
                assert 1 <= len(toks) <= len(w)

        check()
