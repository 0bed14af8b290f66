"""grouped_rank vs the one-window-per-key plan it replaces.

The operator exists because window ranking over a low-cardinality
partition key caps parallelism at the key count (see operators/rank.py);
these tests pin that the range-partition + offset-table plan produces
the IDENTICAL ranks, across multiple physical partitions, single-row
groups, and that ntile_from_rank matches F.ntile for ragged bucket
sizes.
"""

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from pywrangler_spark.operators.rank import grouped_rank, ntile_from_rank


def _data(spark, n_rows, n_keys, seed=11):
    rng = random.Random(seed)
    rows = [
        Row(
            rid=i,
            k=rng.randrange(n_keys),
            v=round(rng.uniform(0, 1000), 2),
        )
        for i in range(n_rows)
    ]
    return spark.createDataFrame(rows)


def _expected(df):
    w = Window.partitionBy("k").orderBy("v", "rid")
    return {
        r.rid: (r.rk, r.n)
        for r in df.select(
            "rid",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("k"))
            .alias("n"),
        ).collect()
    }


def test_matches_window_rank_across_partitions(spark):
    # 4 shuffle partitions, 3 keys, 500 rows: every key straddles
    # several range partitions, exercising the offset arithmetic
    df = _data(spark, 500, 3)
    got = {
        r.rid: (r.rank, r.group_size)
        for r in df.transform(grouped_rank("k", ["v", "rid"])).collect()
    }
    assert got == _expected(df)


def test_single_row_groups_and_many_keys(spark):
    df = _data(spark, 60, 50, seed=3)
    got = {
        r.rid: (r.rank, r.group_size)
        for r in df.transform(grouped_rank("k", ["v", "rid"])).collect()
    }
    assert got == _expected(df)


def test_ntile_matches_builtin(spark):
    df = _data(spark, 237, 4, seed=5)
    w = Window.partitionBy("k").orderBy("v", "rid")
    expected = {
        r.rid: r.t
        for r in df.select(
            "rid", F.ntile(7).over(w).alias("t")
        ).collect()
    }
    ranked = df.transform(grouped_rank("k", ["v", "rid"]))
    got = {
        r.rid: r.t
        for r in ranked.select(
            "rid",
            ntile_from_rank(
                F.col("rank"), F.col("group_size"), 7
            ).alias("t"),
        ).collect()
    }
    assert got == expected


def test_output_collision_raises(spark):
    df = _data(spark, 5, 2)
    with pytest.raises(ValueError, match="already exists"):
        df.transform(
            grouped_rank("k", ["v"], rank_column="rid")
        ).schema


def test_empty_args_raise(spark):
    with pytest.raises(ValueError, match="non-empty"):
        grouped_rank([], ["v"])
