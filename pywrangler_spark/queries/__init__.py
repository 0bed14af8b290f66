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
    # new in round 2 — never driver-verified
    "decontaminate_docs", "shard_docs", "heavy_hitter_terms",
    "corpus_clean_pipeline", "lm_score_docs", "dedup_span_mask",
    "resample_hourly_locf", "zscore_anomaly_events", "cap_docs_per_source",
    "repetition_quality_docs", "window_rank_suite", "approx_quantiles_prices",
    "variant_props_by_type", "source_mix_weights", "chunk_docs_by_tokens",
    # temporal joins / windows / event ops — no driver row in round 1
    "asof_click_attribution", "timebucket_hourly", "rangejoin_click_windows",
    "intervaljoin_error_shadow", "rolling_7d_user_value", "user_value_trend",
    "ffill_user_values", "latest_event_per_user", "scd2_user_history",
    "changelog_compress_events", "json_props_by_type", "hopping_hourly_30m",
    "funnel_view_click_purchase", "cohort_weekly_retention",
    "cdc_upsert_events", "ohlc_hourly_by_type", "twa_user_value",
    "journey_prefix_counts",
    # text / search / sampling / chunking / packing — no driver row
    "text_stats", "lang_id", "bm25_search_docs", "hash_split_docs",
    "stratified_sample_docs", "chunk_documents_200", "quality_gate_docs",
    "vocab_top_terms", "pack_docs_512",
    # ANN + embeddings — no driver row / new recall oracles
    "ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf",
    "embedding_neardup_pairs", "ann_topk_int8", "embedding_label_centroids",
    # changed or newly-oracled this round
    "sessionize_gap_1d", "dedup_minhash_lsh", "multimodal_features",
    "approx_distinct_parts",
    # relational shapes without a round-1 driver row
    "q11_important_parts", "q20_recent_part_suppliers",
    "profile_lineitem_columns", "histogram_extendedprice",
    "nullsafe_join_segments",
    # one representative per already-verified family
    "dedup_exact_groups", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_clusters_jaccard", "interval_last_first",
    "interval_global_timeline", "multimodal_blob_stats",
    "salted_priority_revenue",
    # everything else (TPC-H variants, remaining interval configs) keeps
    # its module order after the prioritized block
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
