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
from pywrangler_spark.queries import web as _web  # noqa: E402,F401

# Registration (= iteration) order is the driver's evaluation order, and
# the driver's correctness gate covers a bounded prefix of it. Order the
# registry so every operator FAMILY gets a hard driver signal early:
# least-recently-verified and recently-changed queries first, then one
# representative per verified family, then the redundant TPC-H variants
# (mutually similar star-join/agg shapes) last.
_PRIORITY = [
    # new in round 6 — need a first driver row
    "webclean_docs", "url_canonical_domains", "pack_render_512",
    "dedup_cdc_chunks",
    # rewritten in round 6 AFTER their last driver row (CDC chunker
    # explode+window+agg; rolling two-prefix; grouped_rank; weighted
    # median; BM25 broadcast direction) — the driver must re-own these
    "chunk_docs_cdc", "rolling_7d_user_value", "window_rank_suite",
    "approx_quantiles_prices", "bm25_search_docs",
    # round-5 post-row rewrites the round-5 verdict names explicitly
    "dedup_span_mask", "dedup_span_excise", "salted_priority_revenue",
    "redact_pii_docs", "dedup_incremental_bloom_docs",
    # every remaining round-3-rowed query (their rows are 3 rounds old)
    "bpe_token_stats", "lm_bigram_score_docs", "dedup_exact_groups",
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q4_order_priority", "q7_nation_volume", "approx_distinct_parts",
    "q8_market_share", "q9_product_profit", "q2_min_cost_supplier",
    "q11_important_parts", "q20_recent_part_suppliers",
    "profile_lineitem_columns", "histogram_extendedprice",
    "nullsafe_join_segments", "profile_drift_orders",
    "correlation_lineitem", "zorder_code_events",
    "winsorize_event_values", "impute_event_values",
    "scale_event_values", "frequency_encode_sources",
    # oldest round-4 rows, distinct code families first — the rest of
    # the round-4 cohort rides round 7's window
    "decontaminate_docs", "corpus_clean_pipeline", "lm_score_docs",
    "dedup_minhash_lsh", "sessionize_gap_1d", "multimodal_blob_stats",
    "asof_click_attribution", "rangejoin_click_windows",
    "user_value_trend", "ffill_user_values", "scd2_user_history",
    # round-4/round-5-verified names follow in module order — freshest
    # rows, so they sit past the window by design
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
