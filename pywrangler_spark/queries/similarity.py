"""Similarity-search queries over ``embeddings`` + DuckDB oracles.

Cosine is computed as an index-ordered f64 fold on both engines and
rounded to 6 dp before ranking/filtering, so fp summation noise cannot
flip a rank or a threshold decision.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pywrangler_spark.operators.similarity import (
    topk_cosine_ivf,
    cosine_neardup_pairs,
    topk_cosine,
    topk_cosine_lsh,
)
from pywrangler_spark.queries import register
from pywrangler_spark.sources import read_parquet

# norm-product form, mirroring the Spark plan (norm computed once per
# row, pair score = dot / (na*nb)) so the f64 op sequence — and hence
# every bit — matches
_NORM_E = """
    SELECT vec_id,
           embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[],
                                 embedding::DOUBLE[])) AS n
    FROM embeddings
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))


_TOPK_ORACLE = f"""
WITH e AS ({_NORM_E}
), q AS (
    SELECT vec_id AS qid, v AS qv, n AS qn FROM e WHERE vec_id % 40 = 0
), scored AS (
    SELECT qid AS query_id, e.vec_id AS neighbor_id,
           round(list_dot_product(qv, e.v) / nullif(qn * e.n, 0.0), 6)
               AS cosine
    FROM q JOIN e ON e.vec_id != q.qid
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 10
"""


@register("ann_topk_bruteforce", oracle=_TOPK_ORACLE)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).transform(
        topk_cosine(
            "vec_id",
            "embedding",
            k=10,
            query_filter=F.col("vec_id") % 40 == 0,
        )
    )


# LSH path: validated against brute force by recall tests (non-SQL oracle —
# the deterministic hyperplane matrix is a python-side artifact). The driver
# records a rows-only check for it.
@register("ann_topk_lsh")
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).transform(
        topk_cosine_lsh(
            "vec_id",
            "embedding",
            k=10,
            n_planes=8,
            query_filter=F.col("vec_id") % 40 == 0,
        )
    )


# IVF path: k-means cells + probe join (FAISS-style). Centroids are a
# fitted model artifact, so like the LSH table this is recall-validated
# against ann_topk_bruteforce in tests; the driver records rows-only.
@register("ann_topk_ivf")
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).transform(
        topk_cosine_ivf(
            "vec_id",
            "embedding",
            k=10,
            n_centroids=16,
            n_probe=4,
            query_filter=F.col("vec_id") % 40 == 0,
        )
    )


_NEARDUP_ORACLE = f"""
WITH e AS ({_NORM_E}
), p AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) / nullif(a.n * b.n, 0.0), 6)
               AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.3
"""


@register("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).transform(
        cosine_neardup_pairs("vec_id", "embedding", threshold=0.3)
    )


# ---- int8-quantized brute force -------------------------------------------
# Same query shape as ann_topk_bruteforce but over int8-quantized
# vectors: integer dot products, scales cancel in cosine, so both
# engines compute EXACT integer numerators/norms — the score is
# bit-identical by construction (integer sums are exact in f64 far
# below 2^53). Ranking therefore hash-matches with no fp caveats.

_INT8_ORACLE = """
WITH e AS (
    SELECT vec_id,
           embedding::DOUBLE[] AS v,
           nullif(list_max(list_transform(embedding::DOUBLE[],
                                          x -> abs(x))) / 127.0,
                  0.0) AS s
    FROM embeddings
), q8 AS (
    SELECT vec_id,
           list_transform(v, x -> coalesce(round(x / s), 0.0)) AS q
    FROM e
), n8 AS (
    SELECT vec_id, q, list_dot_product(q, q) AS nsq FROM q8
), qs AS (
    SELECT vec_id AS qid, q AS qq, nsq AS qn FROM n8 WHERE vec_id % 40 = 0
), scored AS (
    SELECT qid AS query_id, n8.vec_id AS neighbor_id,
           round(list_dot_product(qq, n8.q)
                 / nullif(sqrt(qn * n8.nsq), 0.0), 6) AS cosine_q
    FROM qs JOIN n8 ON n8.vec_id != qs.qid
)
SELECT query_id, neighbor_id, cosine_q, CAST(rn AS INT) AS rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_q DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= 10
"""


@register("ann_topk_int8", oracle=_INT8_ORACLE)
def ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pywrangler_spark.operators.similarity import topk_cosine_int8

    return _emb(spark, sf_dir).transform(
        topk_cosine_int8(
            "vec_id",
            "embedding",
            k=10,
            query_filter=F.col("vec_id") % 40 == 0,
        )
    )


# ---- per-label embedding centroids (long format) --------------------------
# posexplode multiplies rows by d=64, but each exploded row is just
# (label, pos, val) and partial aggregation collapses them to
# labels x d map-side — the shuffle carries centroids, not vectors.
# Long output (label, pos, centroid) avoids array-reassembly ordering
# hazards cross-engine; pos is 1-based to match generate_subscripts.

_CENTROID_ORACLE = """
SELECT label,
       pos,
       ROUND(AVG(CAST(v AS DOUBLE)), 6) AS centroid
FROM (
    SELECT label,
           unnest(embedding) AS v,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
)
GROUP BY label, pos
"""


@register("embedding_label_centroids", oracle=_CENTROID_ORACLE)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean embedding per label, long format — the class-centroid build
    step for IVF seeding / classifier prototypes."""
    emb = _emb(spark, sf_dir).select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    )
    return emb.groupBy(
        "label", (F.col("pos0") + 1).alias("pos")
    ).agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"))
