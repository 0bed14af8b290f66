"""Temporal queries over ``events``: as-of join attribution and
hypertable-style time-bucket rollups, each hash-checked against a DuckDB
formulation (DuckDB has native ``ASOF JOIN`` / ``time_bucket`` — an
independent implementation of the same semantics, ideal oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pywrangler_spark.operators.asof import asof_join, time_bucket_rollup
from pywrangler_spark.queries import register
from pywrangler_spark.sources import read_parquet


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/events.parquet")


# ---- as-of join: purchase -> most recent preceding click ------------------

_ASOF_ORACLE = """
SELECT p.event_id,
       p.user_id,
       CAST(p.ts AS TIMESTAMP) AS ts,
       c.event_id               AS click_id,
       CAST(c.ts AS TIMESTAMP)  AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("asof_click_attribution", oracle=_ASOF_ORACLE)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach to every purchase the latest click (same user, at-or-before)
    — classic attribution as-of join. Plan: one Exchange on user_id, one
    Sort, zero join nodes (see ``operators.asof``)."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = purchases.transform(
        asof_join(
            clicks,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            right_columns=["click_id"],
            suffix="_click",
        )
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("click_id_click").alias("click_id"),
        F.col("ts_click").alias("click_ts"),
    )


# ---- time-bucket rollup: hourly per event_type ----------------------------

_BUCKET_ORACLE = """
SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS bucket_start,
       event_type,
       COUNT(*)                  AS n_events,
       ROUND(SUM("value"), 4)    AS value_sum
FROM events
GROUP BY 1, 2
"""


@register("timebucket_hourly", oracle=_BUCKET_ORACLE)
def timebucket_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup of event counts and value sums per type —
    the batch form of the streaming windowed aggregation (map-side
    partial agg; the shuffle carries one row per bucket x type)."""
    out = _events(spark, sf_dir).transform(
        time_bucket_rollup(
            "ts",
            "1 hour",
            groupby_columns="event_type",
            aggs=[
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("value_sum"),
            ],
        )
    )
    return out
