"""BM25 keyword search — inverted-index scoring as DataFrame aggregation.

The classic retrieval scorer, Spark-first: postings are just
``explode(words) → filter(term ∈ query) → groupBy(doc, term).count()``.
The term filter lands BEFORE the aggregation, so only postings for the
query's terms are ever built — the moral equivalent of reading the
query's posting lists from an inverted index, and the reason this scales:
shuffle volume is |matching postings|, not |corpus tokens|.

Corpus statistics (N, avgdl) ride as a broadcast 1-row aggregate (no
driver collect); per-term document frequencies are a broadcast dim (at
most |query terms| rows). Final top-k is ORDER BY + LIMIT —
``TakeOrderedAndProject``, no global sort.

The score formula is rendered ONCE as a SQL string (`_BM25_FORMULA`) and
evaluated via ``F.expr`` on the Spark side and verbatim inside the DuckDB
oracle, so the f64 op order — and hence the rounded score — is pinned
cross-engine by construction.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pywrangler_spark.functions.text import words

# okapi BM25 with standard k1/b; tf/dl/df/n_docs/avgdl are column names in
# scope where this is rendered. ln() on both engines is natural log.
_BM25_FORMULA = (
    "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * "
    "(tf * ({k1} + 1.0)) / "
    "(tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
)


def bm25_formula(k1: float = 1.2, b: float = 0.75) -> str:
    """The per-(doc, term) score expression — shared by Spark and oracle."""
    return _BM25_FORMULA.format(k1=float(k1), b=float(b))


def bm25_search(
    query_terms: Sequence[str],
    id_column: str,
    text_column: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> Callable[[DataFrame], DataFrame]:
    """Top-``k`` documents for a bag-of-words query by BM25.

    Output: (doc_id, score, n_terms) — score rounded to 6 dp, ties broken
    by doc id ascending.
    """
    terms = [t.lower() for t in query_terms]
    if not terms:
        raise ValueError("bm25_search requires at least one query term")

    def _transform(df: DataFrame) -> DataFrame:
        # document length rides the explode projection — size(words())
        # is scan-side arithmetic, so per-posting dl costs one extra
        # column on the QUERY-BOUND shuffle (the term filter lands
        # before the aggregation), and the corpus-sized doclen join of
        # the first two versions disappears entirely. Nothing unbounded
        # is ever broadcast: the round-6 version broadcast the tf side,
        # whose size is bounded only by the query terms' document
        # frequency — a stopword query term made it corpus-sized and
        # the hint forced an un-spillable broadcast. Now tf stays a
        # spillable shuffle aggregation and the only broadcasts are
        # dfreq (≤ |query terms| rows) and stats (1 row).
        base = df.filter(F.col(text_column).isNotNull()).select(
            F.col(id_column).alias("doc_id"),
            words(F.col(text_column)).alias("_ws"),
        )
        stats = base.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg(F.size("_ws").cast("double")).alias("avgdl"),
        )
        toks = base.select(
            "doc_id",
            F.size("_ws").cast("double").alias("dl"),
            F.explode("_ws").alias("term"),
        )
        tf = (
            toks.filter(F.col("term").isin(terms))
            .groupBy("doc_id", "term")
            .agg(
                F.count(F.lit(1)).cast("double").alias("tf"),
                F.max("dl").alias("dl"),
            )
        )
        dfreq = tf.groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias("df")
        )
        scored = (
            tf.join(F.broadcast(dfreq), "term")
            .join(F.broadcast(stats))
            .select(
                "doc_id",
                F.expr(bm25_formula(k1, b)).alias("_s"),
            )
        )
        # per-term scores are doubles; summing doubles is order-dependent
        # and the engines aggregate in different orders — accumulate in
        # DECIMAL(27,18) (order-independent, 18 dp swallows f64 noise)
        return (
            scored.groupBy("doc_id")
            .agg(
                F.round(
                    F.sum(F.col("_s").cast("decimal(27,18)")).cast("double"),
                    6,
                ).alias("score"),
                F.count(F.lit(1)).alias("n_terms"),
            )
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )

    _transform.__name__ = "bm25_search"
    return _transform
