"""Unigram language-model quality scoring — the LM-filter slot of a
corpus pipeline (stand-in for the KenLM/CCNet-style perplexity filter;
public methodology, here with a unigram model so it stays
engine-exact and dependency-free).

Two-phase, fit-once/score-many (the same split the ANN operators use):

- **fit**: one aggregation over the corpus (term -> count), capped to
  the ``vocab_size`` most frequent terms (deterministic count-desc,
  term-asc order). The capped model is a tiny DataFrame — thousands of
  rows against a 100 TB corpus — so scoring broadcasts it.
- **score**: explode tokens, broadcast-join the model, aggregate
  ``mean(-ln p(token))`` per document. OOV tokens (outside the capped
  vocabulary) score at the constant floor probability ``oov_p``
  (caller-supplied, default 1e-9), so rare-junk documents rank
  measurably worse instead of crashing the join. The per-doc aggregation is the only exchange, and the combiner
  pre-reduces (doc_id, partial sum) map-side.

Lower score = more typical of the corpus; gate with
``operators.quality.percentile_gate`` downstream.
"""

from __future__ import annotations

from typing import Callable, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.functions.text import token_count, words


def fit_unigram_model(
    text_column: str,
    vocab_size: int = 50_000,
) -> Callable[[DataFrame], DataFrame]:
    """Fit ``(term, n, p)`` over the corpus, capped to the
    ``vocab_size`` most frequent terms. ``p`` is the term's share of
    ALL tokens (including tokens later treated as OOV), so capped and
    uncapped fits agree on the retained terms."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")

    def _transform(df: DataFrame) -> DataFrame:
        tokens = df.select(
            F.explode(words(F.col(text_column))).alias("term")
        ).filter(F.col("term") != "")
        counts = tokens.groupBy("term").agg(
            F.count(F.lit(1)).alias("n")
        )
        total = counts.agg(F.sum("n").alias("_total"))
        return (
            counts.crossJoin(F.broadcast(total))
            .select(
                "term",
                "n",
                (F.col("n") / F.col("_total")).alias("p"),
            )
            .orderBy(F.col("n").desc(), F.col("term").asc())
            .limit(vocab_size)
        )

    _transform.__name__ = "fit_unigram_model"
    return _transform


def unigram_logprob_score(
    model: DataFrame,
    id_column: str = "doc_id",
    text_column: str = "text",
    oov_p: float = 1e-9,
    score_column: str = "lm_score",
) -> Callable[[DataFrame], DataFrame]:
    """Append ``score_column`` = mean over tokens of ``-ln p(token)``
    (natural log). Empty documents score NULL. ``model`` is the output
    of :func:`fit_unigram_model` (or any ``(term, p)`` frame); it is
    broadcast into the token stream."""
    if not 0.0 < oov_p < 1.0:
        raise ValueError(f"oov_p must be in (0, 1), got {oov_p}")

    def _transform(df: DataFrame) -> DataFrame:
        tokens = df.select(
            F.col(id_column).alias("_id"),
            F.explode(words(F.col(text_column))).alias("term"),
        ).filter(F.col("term") != "")
        scored = tokens.join(
            F.broadcast(model.select("term", "p")), "term", "left"
        ).select(
            "_id",
            (-F.log(F.coalesce(F.col("p"), F.lit(float(oov_p))))).alias(
                "_nll"
            ),
        )
        per_doc = scored.groupBy("_id").agg(
            F.avg("_nll").alias(score_column)
        )
        return df.join(
            per_doc.withColumnRenamed("_id", id_column), id_column, "left"
        ).select(
            *df.columns,
            F.when(
                token_count(F.col(text_column)) > 0, F.col(score_column)
            ).alias(score_column),
        )

    _transform.__name__ = "unigram_logprob_score"
    return _transform


def fit_bigram_model(
    text_column: str,
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
) -> Callable[[DataFrame], Tuple[DataFrame, DataFrame]]:
    """Fit the interpolated-backoff bigram model: returns
    ``(unigrams, bigrams)`` — ``(term, n, p)`` capped to ``vocab_size``
    (identical to :func:`fit_unigram_model`) and
    ``(prev, term, n_bi, n_prev)`` capped to the ``bigram_size`` most
    frequent bigrams (count-desc, pair-asc order). Both models are tiny
    against the corpus and broadcast at scoring time.

    Bigram pairs are built scan-side (``zip_with`` of the token array
    with its own tail) — no per-doc window, no extra exchange beyond the
    two model aggregations.
    """
    if bigram_size < 1:
        raise ValueError(f"bigram_size must be >= 1, got {bigram_size}")

    def _fit(df: DataFrame) -> Tuple[DataFrame, DataFrame]:
        unigrams = df.transform(
            fit_unigram_model(text_column, vocab_size)
        )
        w = words(F.col(text_column))
        pairs = df.select(
            F.explode(
                F.zip_with(
                    w,
                    # length must be size(w), not INT_MAX: start 2 +
                    # 2^31-1 overflows int and slice returns EMPTY
                    F.slice(w, 2, F.size(w)),
                    lambda a, b: F.struct(
                        a.alias("prev"), b.alias("term")
                    ),
                )
            ).alias("p")
        ).select("p.prev", "p.term").filter(
            (F.col("prev") != "") & (F.col("term") != "")
        )
        bi = pairs.groupBy("prev", "term").agg(
            F.count(F.lit(1)).alias("n_bi")
        )
        prev_tot = pairs.groupBy("prev").agg(
            F.count(F.lit(1)).alias("n_prev")
        )
        bigrams = (
            bi.join(prev_tot, "prev")
            .orderBy(
                F.col("n_bi").desc(),
                F.col("prev").asc(),
                F.col("term").asc(),
            )
            .limit(bigram_size)
        )
        return unigrams, bigrams

    return _fit


def bigram_logprob_score(
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_column: str = "doc_id",
    text_column: str = "text",
    lam: float = 0.7,
    oov_p: float = 1e-9,
    score_column: str = "lm2_score",
) -> Callable[[DataFrame], DataFrame]:
    """Append ``score_column`` = mean over tokens 2..n of
    ``-ln(lam * p(term|prev) + (1-lam) * p_uni(term))`` — interpolated
    bigram/unigram backoff (Jelinek-Mercer smoothing, the classic
    CCNet-adjacent formulation). ``p(term|prev)`` is 0 for pairs outside
    the capped bigram table; ``p_uni`` falls to ``oov_p`` outside the
    vocabulary. Documents with fewer than 2 tokens score NULL.

    Both model tables broadcast; the bigram stream is scan-side
    (``zip_with`` pairs), so the per-doc aggregation is the only
    exchange — same shape as the unigram scorer.
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    if not 0.0 < oov_p < 1.0:
        raise ValueError(f"oov_p must be in (0, 1), got {oov_p}")

    def _transform(df: DataFrame) -> DataFrame:
        w = words(F.col(text_column))
        pairs = df.select(
            F.col(id_column).alias("_id"),
            F.explode(
                F.zip_with(
                    w,
                    # length must be size(w), not INT_MAX: start 2 +
                    # 2^31-1 overflows int and slice returns EMPTY
                    F.slice(w, 2, F.size(w)),
                    lambda a, b: F.struct(
                        a.alias("prev"), b.alias("term")
                    ),
                )
            ).alias("p"),
        ).select("_id", "p.prev", "p.term").filter(
            (F.col("prev") != "") & (F.col("term") != "")
        )
        scored = (
            pairs.join(
                F.broadcast(
                    bigrams.select("prev", "term", "n_bi", "n_prev")
                ),
                ["prev", "term"],
                "left",
            )
            .join(
                F.broadcast(
                    unigrams.select(
                        F.col("term"), F.col("p").alias("_p_uni")
                    )
                ),
                "term",
                "left",
            )
            .select(
                "_id",
                (
                    -F.log(
                        F.lit(lam)
                        * F.coalesce(
                            F.col("n_bi") / F.col("n_prev"), F.lit(0.0)
                        )
                        + F.lit(1.0 - lam)
                        * F.coalesce(
                            F.col("_p_uni"), F.lit(float(oov_p))
                        )
                    )
                ).alias("_nll"),
            )
        )
        per_doc = scored.groupBy("_id").agg(
            F.avg("_nll").alias(score_column)
        )
        return df.join(
            per_doc.withColumnRenamed("_id", id_column),
            id_column,
            "left",
        ).select(*df.columns, F.col(score_column))

    _transform.__name__ = "bigram_logprob_score"
    return _transform
