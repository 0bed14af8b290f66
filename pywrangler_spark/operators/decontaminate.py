"""Benchmark decontamination — flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step: any training document that
contains an n-gram (n around 8-13 for real corpora) from an evaluation
benchmark leaks test data into the model and must be dropped or masked.

Plan shape (the one that survives 100 TB):

1. The eval set is tiny relative to the corpus, so its distinct n-gram
   hashes become a **broadcast** build side — no shuffle of corpus text.
2. The corpus side is a scan-side explode of n-gram *hashes* (56-bit
   md5-derived longs, never the n-gram strings) followed by the
   broadcast hash join. Only MATCHED (doc_id, gram_hash) pairs — a tiny
   fraction of the corpus — reach the aggregation exchange.
3. The per-doc overlap count joins back to the input on doc id; the
   matched side is small, so AQE converts that join to a broadcast at
   runtime.

Reference parity: the reference (a single-operator wrangler library)
has no corpus operators; this fills the decontamination slot of a
training-data pipeline (cf. the n-gram-overlap procedure in the GPT-3 /
PaLM appendix descriptions — public methodology).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.functions.hashing import hash56
from pywrangler_spark.functions.text import shingles_from_words, words


def gram_hash_stream(
    df: DataFrame, text_column: str, n: int, id_column: str = None
) -> DataFrame:
    """Exploded stream of distinct word n-gram hashes: ``(_gh)`` or
    ``(_id, _gh)`` when ``id_column`` is given.

    Staged in three projections so the token array materializes ONCE
    before the shingle lambda references it n+1 times — inlining the
    tokenization there re-evaluates normalize+split per reference
    (Catalyst does not CSE across array lambdas; see
    ``functions.text.shingles_from_words``), a measured ~10x slowdown.
    The hash is applied AFTER the explode, on a plain string column.

    DuckDB twin (see ``queries.corpus``): explode ``range`` over the
    token list and hash ``w[i] || ' ' || ... || w[i+n-1]`` with the
    shared md5/56-bit scheme — engine-identical by construction.
    """
    ids = [F.col(id_column).alias("_id")] if id_column else []
    id_names = ["_id"] if id_column else []
    tokenized = df.select(*ids, words(F.col(text_column)).alias("_w"))
    exploded = tokenized.filter(F.size("_w") >= n).select(
        *id_names,
        F.explode(shingles_from_words(F.col("_w"), n)).alias("_g"),
    )
    # at n=1 a zero-word document tokenizes to [''] and would emit one
    # spurious empty gram; grams with n>=2 always contain a space
    return (
        exploded.filter(F.col("_g") != "")
        .select(*id_names, hash56(F.col("_g")).alias("_gh"))
    )


def contamination_overlap(
    eval_df: DataFrame,
    id_column: str = "doc_id",
    text_column: str = "text",
    n: int = 5,
    min_overlap: int = 1,
) -> Callable[[DataFrame], DataFrame]:
    """Annotate each corpus row with its n-gram overlap vs ``eval_df``.

    Appends two columns:

    - ``n_overlap`` — number of DISTINCT eval n-grams the document
      contains (long, 0 when clean);
    - ``contaminated`` — ``n_overlap >= min_overlap``.

    ``eval_df`` only needs ``text_column``. Documents shorter than ``n``
    words have no n-grams and are always clean.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")

    def _transform(df: DataFrame) -> DataFrame:
        eval_grams = gram_hash_stream(eval_df, text_column, n).distinct()
        corpus_grams = gram_hash_stream(df, text_column, n, id_column)
        # broadcast the eval-gram set: the corpus never shuffles here,
        # and only matched grams continue to the aggregation
        # plain count: corpus grams are per-doc distinct (array_distinct
        # in the shingle helper) and the eval side is .distinct(), so the
        # matched (_id, _gh) pairs are already unique — a distinct
        # aggregate would force two-phase aggregation for no gain
        matched = (
            corpus_grams.join(F.broadcast(eval_grams), "_gh")
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
        )
        out = df.join(
            matched.withColumnRenamed("_id", id_column), id_column, "left"
        )
        n_ov = F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
        return out.select(
            *df.columns,
            n_ov.alias("n_overlap"),
            (n_ov >= min_overlap).alias("contaminated"),
        )

    _transform.__name__ = "contamination_overlap"
    return _transform
