"""Byte-pair-encoding tokenizer — trained merges + distributed encode
(Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units"; the within-word character-pair formulation).

``functions.text.bpe_token_count`` is a regex approximation for quick
stats; this module is the real thing: a merge table trained on corpus
word frequencies and a deterministic encoder, the pair every training
pipeline needs for exact token budgeting and sequence packing.

Scale shape (fit-once / encode-many, like the LM and ANN models):

- **fit**: word frequencies come from ONE distributed aggregation
  capped to the most frequent ``max_vocab_words`` (thousands of rows
  against a 100 TB corpus); the greedy merge loop then runs driver-side
  over that capped vocabulary — the standard practice, since merge
  selection is inherently sequential and the vocab is tiny;
- **encode**: the merge table broadcasts (a list of string pairs);
  encoding is an Arrow-batched pandas UDF applying merges by rank per
  word — scan-side, no shuffle, no model state on executors beyond the
  broadcast.

Determinism: merge ties (equal pair frequency) break lexicographically,
so the same corpus always yields the same merge table in any engine.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.functions.text import words


def _merge_loop(
    word_counts: Dict[Tuple[str, ...], int], n_merges: int
) -> List[Tuple[str, str]]:
    """Greedy BPE training over symbol-tuple word counts."""
    vocab = dict(word_counts)
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Dict[Tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        # max by (count, lexicographic) — deterministic tie-break
        best = max(pair_counts, key=lambda p: (pair_counts[p], (p[0], p[1])))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Dict[Tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: List[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def apply_bpe(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Encode one word with a merge-rank table (lowest rank first) —
    the exact algorithm of the reference BPE implementations."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe(
    df: DataFrame,
    text_column: str = "text",
    n_merges: int = 200,
    max_vocab_words: int = 5000,
) -> List[Tuple[str, str]]:
    """Train a BPE merge table on the corpus word frequencies (one
    distributed agg capped to ``max_vocab_words`` most-frequent words,
    count-desc word-asc order) and return the ordered merge list."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    counts = (
        df.select(F.explode(words(F.col(text_column))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_vocab_words)
        .collect()
    )
    word_counts = {tuple(r["w"]): int(r["n"]) for r in counts}
    return _merge_loop(word_counts, n_merges)


def bpe_encode(
    merges: Sequence[Tuple[str, str]],
    text_column: str = "text",
    tokens_column: str = "bpe_tokens",
    count_column: str = "bpe_token_count",
) -> Callable[[DataFrame], DataFrame]:
    """Append the BPE token array and its length. NULL text yields NULL
    tokens and count 0; whitespace tokenization matches the shared
    ``words`` semantics, so ``bpe_token_count >= token_count`` always
    (merges never cross word boundaries)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _transform(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        bc = sc.broadcast(ranks)

        from pyspark.sql.pandas.functions import pandas_udf

        from pywrangler_spark.pandas_engine import _normalize_py

        @pandas_udf("array<string>")
        def encode(texts: pd.Series) -> pd.Series:
            table = bc.value

            def one(t):
                if t is None or (
                    isinstance(t, float) and pd.isna(t)
                ):
                    return None
                out: List[str] = []
                for w in _normalize_py(t).split(" "):
                    if w:
                        out.extend(apply_bpe(w, table))
                return out

            return pd.Series([one(t) for t in texts])

        out = df.withColumn(tokens_column, encode(F.col(text_column)))
        return out.withColumn(
            count_column,
            F.coalesce(F.size(tokens_column), F.lit(0)).cast("long"),
        )

    _transform.__name__ = "bpe_encode"
    return _transform
