"""Text-analysis queries over ``documents`` + DuckDB oracles.

The oracle SQL mirrors each column function's documented DuckDB
equivalent (see ``functions.text``), pinning semantics cross-engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pywrangler_spark.functions.text import (
    BPE_PATTERN,
    LANG_PROFILES,
    bpe_token_count,
    fingerprint,
    lang_id,
    normalize_text,
    quality_alpha_ratio,
    token_count,
)
from pywrangler_spark.queries import register
from pywrangler_spark.sources import read_parquet

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


_TEXT_STATS_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {_NORM_SQL} = '' THEN 0
            ELSE len(string_split({_NORM_SQL}, ' ')) END AS n_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_tokens_bpe,
       len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
           / nullif(len(text), 0) AS alpha_ratio,
       md5({_NORM_SQL}) AS fingerprint
FROM documents
"""


@register("text_stats", oracle=_TEXT_STATS_ORACLE)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_tokens_bpe"),
        quality_alpha_ratio(t).alias("alpha_ratio"),
        fingerprint(t).alias("fingerprint"),
    )


def _lang_oracle() -> str:
    scores = {
        lang: f"len(regexp_extract_all({_NORM_SQL}, '{pat}'))"
        for lang, pat in LANG_PROFILES.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = "\n            ".join(
        f"WHEN {scores[lang]} = best THEN '{lang}'"
        for lang in LANG_PROFILES
    )
    return f"""
WITH scored AS (SELECT doc_id, lang, text, {best} AS best FROM documents)
SELECT doc_id, lang,
       CASE WHEN best = 0 THEN 'und'
            {whens}
       END AS lang_pred
FROM scored
"""


@register("lang_id", oracle=_lang_oracle())
def lang_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", "lang", lang_id(F.col("text")).alias("lang_pred")
    )
