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
    # new in round 5 — need a first driver row
    "ann_topk_pq_rerank", "chunk_docs_cdc",
    # round-4 rewrites whose plans changed (81dd4c3, e6cd13b) AFTER
    # their last driver row — the driver must re-own the signal first
    "interval_last_first", "interval_first_first", "interval_first_last",
    "interval_last_last", "interval_identical_markers", "interval_raw_ids",
    "interval_valid_ids", "interval_global_timeline",
    "ann_topk_pq", "ann_topk_ivfpq", "dedup_simhash_near",
    "semantic_dedup_embeddings", "embedding_neardup_pairs",
    "docvec_ann_lsh", "docvec_neardup_pairs",
    # stalest remaining: last driver-green in round 2
    # (CORRECTNESS_r02) — after round 5 those rows would be three
    # rounds old, so all of them ride this round's window
    "ann_topk_int8", "bm25_search_docs", "embedding_label_centroids",
    "stratified_sample_docs", "hash_split_docs", "cap_docs_per_source",
    "quality_gate_docs", "vocab_top_terms", "repetition_quality_docs",
    "lang_id", "text_stats", "chunk_docs_by_tokens", "shard_docs",
    "heavy_hitter_terms", "approx_quantiles_prices", "timebucket_hourly",
    "intervaljoin_error_shadow", "latest_event_per_user",
    "changelog_compress_events", "json_props_by_type",
    "variant_props_by_type", "chunk_documents_200", "pack_docs_512",
    "source_mix_weights",
    # backfill: oldest round-3 rows, shared-code families first
    "dedup_simhash", "dedup_clusters_jaccard", "dedup_exact_rows",
    "dedup_ngram_jaccard", "dedup_incremental_docs",
    "classifier_quality_gate", "mix_docs_to_budget",
    "session_features_events", "multimodal_features", "bpe_token_stats",
    "dedup_span_excise",
    # round-3/round-4-verified names follow in module order — freshest
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
