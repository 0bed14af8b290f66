"""Corpus mix execution — materialize a per-source token budget.

``queries.source_mix_weights`` computes the PLAN (per-source token
shares and temperature weights); this operator EXECUTES one: for each
source, keep documents in deterministic md5-hash order until the
source's token budget is reached (the document that crosses the
boundary is kept, standard take-until-exceeded semantics), so the
output corpus matches the target mixture while staying a uniform
pseudo-random, engine-reproducible sample of each source.

Scale shape: the budget scan shuffles ``(id, source, n_tokens, hash)``
— a fixed-width metadata projection, never the text — into one window
per source (cumulative sum in hash order); kept ids then semi-join back
to the corpus. Two exchanges total, both carrying bounded-width rows.

``temperature_budgets`` derives the classic temperature-sampling
budgets (weight ∝ share^alpha; alpha < 1 upweights small sources —
the multilingual/LM-mix recipe) from one aggregation pass.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pywrangler_spark.functions.text import token_count


def temperature_budgets(
    df: DataFrame,
    total_tokens: int,
    alpha: float = 0.5,
    text_column: str = "text",
    source_column: str = "source",
) -> Dict[str, int]:
    """Per-source token budgets from temperature-weighted shares:
    ``budget_s = total_tokens * share_s^alpha / sum(share^alpha)``.
    One aggregation pass; the result is a tiny dict (one entry per
    source) — model-artifact-sized, like the ANN centroids."""
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be > 0, got {total_tokens}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    rows = (
        df.groupBy(source_column)
        .agg(
            # a source whose documents are all NULL text sums to NULL;
            # coalesce so it budgets to 0 instead of crashing the dict
            F.coalesce(
                F.sum(token_count(F.col(text_column))), F.lit(0)
            ).alias("n")
        )
        .collect()
    )
    total = sum(r["n"] for r in rows) or 1
    weights = {r[source_column]: (r["n"] / total) ** alpha for r in rows}
    wsum = sum(weights.values()) or 1.0
    return {
        s: int(total_tokens * w / wsum) for s, w in weights.items()
    }


def apply_token_budget_mix(
    budgets: Dict[str, int],
    id_column: str = "doc_id",
    text_column: str = "text",
    source_column: str = "source",
    seed: str = "mix",
) -> Callable[[DataFrame], DataFrame]:
    """Keep, per source, the hash-ordered prefix of documents whose
    cumulative token count stays under the source's budget (the
    crossing document is kept; sources absent from ``budgets`` are
    dropped entirely). Output schema = input schema."""
    if not budgets:
        raise ValueError("budgets must not be empty")
    if any(b < 0 for b in budgets.values()):
        raise ValueError("budgets must be >= 0")

    from pywrangler_spark.operators.sampling import _bucket

    budget_map = F.create_map(
        *[
            x
            for s, b in sorted(budgets.items())
            for x in (F.lit(s), F.lit(int(b)))
        ]
    )

    def _transform(df: DataFrame) -> DataFrame:
        h = _bucket(id_column, seed)
        meta = df.select(
            F.col(id_column).alias("_mid"),
            F.col(source_column).alias("_msrc"),
            token_count(F.col(text_column)).alias("_mtok"),
            h.alias("_mh"),
        )
        w = (
            Window.partitionBy("_msrc")
            .orderBy(F.col("_mh").asc(), F.col("_mid").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        kept = (
            meta.withColumn(
                "_before", F.coalesce(F.sum("_mtok").over(w), F.lit(0))
            )
            .withColumn("_budget", budget_map[F.col("_msrc")])
            .filter(
                F.col("_budget").isNotNull()
                & (F.col("_before") < F.col("_budget"))
            )
            .select("_mid")
        )
        return df.join(
            kept.withColumnRenamed("_mid", id_column),
            id_column,
            "left_semi",
        )

    _transform.__name__ = "apply_token_budget_mix"
    return _transform
