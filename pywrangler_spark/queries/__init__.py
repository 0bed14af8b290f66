"""Named query registry — the driver-facing catalog.

Every implemented operator/query from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle SQL string over the same parquet tables. ``__spark_entry__``
re-exports this registry.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator: add a query (and optional oracle SQL) to the registry."""

    def _wrap(func: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = func
        if oracle is not None:
            ORACLES[name] = oracle
        return func

    return _wrap


# importing the modules populates the registry
from pywrangler_spark.queries import corpus as _corpus  # noqa: E402,F401
from pywrangler_spark.queries import dedup as _dedup  # noqa: E402,F401
from pywrangler_spark.queries import intervals as _intervals  # noqa: E402,F401
from pywrangler_spark.queries import multimodal as _multimodal  # noqa: E402,F401
from pywrangler_spark.queries import relational as _relational  # noqa: E402,F401
from pywrangler_spark.queries import similarity as _similarity  # noqa: E402,F401
from pywrangler_spark.queries import temporal as _temporal  # noqa: E402,F401
from pywrangler_spark.queries import text as _text  # noqa: E402,F401

# Registration (= iteration) order is the driver's evaluation order, and
# the driver's correctness gate covers a bounded prefix of it. Order the
# registry so every operator FAMILY gets a hard driver signal early:
# least-recently-verified and recently-changed queries first, then one
# representative per verified family, then the redundant TPC-H variants
# (mutually similar star-join/agg shapes) last.
_PRIORITY = [
    # new in round 4 — need a first driver row
    "redact_pii_docs", "dedup_incremental_bloom_docs",
    # stalest: last driver-green in round 1 (CORRECTNESS_r01), two
    # rounds of code churn ago — the driver must re-own the signal
    "q10_returned_items", "q12_late_shipments", "q13_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_diversity",
    "q17_small_quantity_revenue", "q18_large_orders",
    "q19_discounted_revenue", "q21_waiting_supplier",
    "q22_dormant_balances", "distinct_counts", "rollup_pricing",
    "cube_quantities", "pivot_status_revenue", "groupingsets_order_revenue",
    "quantiles_prices", "setops_building_big_spenders",
    "argmax_order_per_priority", "unpivot_lineitem_measures",
    "topk_expensive_orders", "top3_orders_per_customer",
    "multimodal_blob_stats",
    # round-2 rows (CORRECTNESS_r02), complex multi-exchange shapes
    # first — fill the remainder of the driver's 50-query window
    "dedup_minhash_lsh", "dedup_span_mask", "decontaminate_docs",
    "corpus_clean_pipeline", "lm_score_docs", "user_value_trend",
    "asof_click_attribution", "rangejoin_click_windows",
    "scd2_user_history", "cdc_upsert_events", "twa_user_value",
    "rolling_7d_user_value", "ffill_user_values", "window_rank_suite",
    "sessionize_gap_1d", "resample_hourly_locf", "ohlc_hourly_by_type",
    "hopping_hourly_30m", "funnel_view_click_purchase",
    "cohort_weekly_retention", "journey_prefix_counts",
    "zscore_anomaly_events", "ann_topk_bruteforce", "ann_topk_lsh",
    "ann_topk_ivf", "ann_topk_int8", "bm25_search_docs",
    "embedding_neardup_pairs", "embedding_label_centroids",
    "stratified_sample_docs", "hash_split_docs", "cap_docs_per_source",
    "quality_gate_docs", "vocab_top_terms", "repetition_quality_docs",
    "lang_id", "text_stats", "chunk_docs_by_tokens",
    # round-3-verified names follow in module order — freshest rows,
    # so they sit past the window by design
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    for n, fn in QUERIES.items():
        ordered.setdefault(n, fn)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES", "register"]
