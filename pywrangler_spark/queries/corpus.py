"""Corpus-pipeline queries: decontamination, shard shuffle, heavy
hitters — each with a DuckDB oracle that mirrors the operator's
documented cross-engine (md5-hash) semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pywrangler_spark.functions.hashing import hash56
from pywrangler_spark.queries import register
from pywrangler_spark.sources import read_parquet

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


def _bucket_sql(seed: str) -> str:
    return (
        f"('0x' || substr(md5('{seed}' || ':' || CAST(doc_id AS VARCHAR)),"
        " 1, 14))::BIGINT % 10000"
    )


def _bucket_col(seed: str) -> Column:
    return F.pmod(
        hash56(
            F.concat_ws(":", F.lit(seed), F.col("doc_id").cast("string"))
        ),
        F.lit(10_000),
    )


# ---- benchmark decontamination --------------------------------------------
# Eval set = 5% of documents by hash bucket (stands in for a benchmark
# table); every corpus doc is annotated with its distinct 5-gram overlap
# against that set. Plan: broadcast eval-gram build side, scan-side
# corpus explode, matched-grams-only aggregation (see
# operators/decontaminate.py for the 100 TB rationale).

_GRAM5_SQL = (
    "('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||"
    " w[i+3] || ' ' || w[i+4]), 1, 14))::BIGINT"
)

_DECONTAM_ORACLE = f"""
WITH norm AS (
    SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
), grams AS (
    SELECT DISTINCT doc_id, {_GRAM5_SQL} AS gh
    FROM norm, UNNEST(range(1, len(w) - 3)) AS t(i)
    WHERE len(w) >= 5
), eval_grams AS (
    SELECT DISTINCT gh FROM grams
    WHERE {_bucket_sql("evalset")} < 500
), overlap AS (
    SELECT g.doc_id, COUNT(DISTINCT g.gh) AS n_overlap
    FROM grams g JOIN eval_grams e USING (gh)
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       COALESCE(o.n_overlap, 0) >= 1 AS contaminated,
       {_bucket_sql("evalset").replace("doc_id", "d.doc_id")} < 500 AS is_eval
FROM documents d LEFT JOIN overlap o USING (doc_id)
"""


@register("decontaminate_docs", oracle=_DECONTAM_ORACLE)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pywrangler_spark.operators.decontaminate import contamination_overlap

    docs = _docs(spark, sf_dir)
    is_eval = _bucket_col("evalset") < 500
    eval_df = docs.filter(is_eval)
    return (
        docs.transform(contamination_overlap(eval_df, n=5))
        .select("doc_id", "n_overlap", "contaminated", is_eval.alias("is_eval"))
    )


# ---- deterministic shard shuffle ------------------------------------------
# 8 shards here; at 100 TB the shard count scales with volume so the one
# per-shard window exchange stays bounded (operators/shard.py).

_SHARD_ORACLE = f"""
SELECT doc_id,
       {_bucket_sql("shards").replace("% 10000", "% 8")} AS shard,
       CAST(row_number() OVER (
           PARTITION BY {_bucket_sql("shards").replace("% 10000", "% 8")}
           ORDER BY ('0x' || substr(md5('shards' || ':' ||
               CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT, doc_id
       ) - 1 AS BIGINT) AS pos
FROM documents
"""


@register("shard_docs", oracle=_SHARD_ORACLE)
def shard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pywrangler_spark.operators.shard import shuffle_to_shards

    return (
        _docs(spark, sf_dir)
        .transform(shuffle_to_shards("doc_id", 8, seed="shards"))
        .select(
            "doc_id",
            F.col("shard").cast("long").alias("shard"),
            F.col("pos").cast("long").alias("pos"),
        )
    )


# ---- heavy hitters: sample-candidates + exact-verify ----------------------
# The oracle is the EXACT global top-10 — the query hash-matches only if
# the sampled candidate tier recovered every true heavy hitter, making
# the approximation's membership risk a hard driver signal.

_HH_ORACLE = f"""
SELECT term, CAST(COUNT(*) AS BIGINT) AS n_exact
FROM (
    SELECT unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
)
WHERE term <> ''
GROUP BY term
ORDER BY n_exact DESC, term ASC
LIMIT 10
"""


@register("heavy_hitter_terms", oracle=_HH_ORACLE)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pywrangler_spark.operators.heavyhitters import top_terms_sampled

    return _docs(spark, sf_dir).transform(
        top_terms_sampled(
            "text", "doc_id", k=10, sample_fraction=0.2, seed="hh"
        )
    )
