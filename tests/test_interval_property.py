"""Property-style cross-check: the Spark window implementation must agree
with the independent sequential spec (`naive_interval_ids`) on randomized
marker streams, for every config x result_type.

All random sequences are packed into ONE DataFrame as separate groups so a
single Spark job checks hundreds of cases.
"""

import random

import pytest
from pyspark.sql import Row

from pywrangler_spark import IntervalIdentifier
from pywrangler_spark.testing.spec import (
    naive_interval_ids,
    naive_sessionize_gap,
)
from pywrangler_spark.operators.sessionize import sessionize_gap

START, END = 1, 2


def _random_streams(seed, n_groups=120, max_len=25):
    rng = random.Random(seed)
    streams = {}
    for g in range(n_groups):
        length = rng.randint(1, max_len)
        # weight noise/start/end; include NULLs as noise
        streams[g] = [
            rng.choice([0, 0, 1, 1, 2, 2, 3, None]) for _ in range(length)
        ]
    return streams


@pytest.mark.parametrize("use_first_start", [True, False])
@pytest.mark.parametrize("use_first_end", [True, False])
@pytest.mark.parametrize("result_type", ["enumerated", "valid", "raw"])
def test_matches_sequential_spec(
    spark, use_first_start, use_first_end, result_type
):
    streams = _random_streams(
        seed=hash((use_first_start, use_first_end, result_type)) % 10_000
    )
    rows = [
        Row(groupby=g, order=i, marker=m)
        for g, ms in streams.items()
        for i, m in enumerate(ms)
    ]
    df = spark.createDataFrame(rows, "groupby int, order int, marker int")
    result = IntervalIdentifier(
        marker_column="marker",
        marker_start=START,
        marker_end=END,
        marker_start_use_first=use_first_start,
        marker_end_use_first=use_first_end,
        orderby_columns="order",
        groupby_columns="groupby",
        result_type=result_type,
    ).fit_transform(df)

    got = {}
    for r in result.collect():
        got.setdefault(r.groupby, {})[r.order] = r.iids

    for g, markers in streams.items():
        spec = naive_interval_ids(
            markers,
            START,
            END,
            marker_start_use_first=use_first_start,
            marker_end_use_first=use_first_end,
            result_type=result_type,
        )
        mine = [got[g][i] for i in range(len(markers))]
        if result_type == "enumerated":
            assert mine == spec, f"group {g}: {markers}"
        elif result_type == "valid":
            assert [v == 0 for v in mine] == [v == 0 for v in spec], (
                f"group {g}: {markers}"
            )
        else:  # raw: monotone + identical boundary structure
            assert all(b >= a for a, b in zip(mine, mine[1:]))
            assert [b != a for a, b in zip(mine, mine[1:])] == [
                b != a for a, b in zip(spec, spec[1:])
            ], f"group {g}: {markers}"


def test_identical_markers_match_spec(spark):
    streams = _random_streams(seed=7)
    rows = [
        Row(groupby=g, order=i, marker=m)
        for g, ms in streams.items()
        for i, m in enumerate(ms)
    ]
    df = spark.createDataFrame(rows, "groupby int, order int, marker int")
    result = IntervalIdentifier(
        marker_column="marker",
        marker_start=START,
        marker_end=START,
        orderby_columns="order",
        groupby_columns="groupby",
    ).fit_transform(df)
    got = {}
    for r in result.collect():
        got.setdefault(r.groupby, {})[r.order] = r.iids
    for g, markers in streams.items():
        spec = naive_interval_ids(markers, START, START)
        assert [got[g][i] for i in range(len(markers))] == spec


def test_sessionize_gap_matches_spec(spark):
    rng = random.Random(13)
    rows, specs = [], {}
    for g in range(50):
        ts, t = [], 0.0
        for _ in range(rng.randint(1, 30)):
            t += rng.choice([1.0, 5.0, 100.0, 4000.0])
            ts.append(t)
        specs[g] = naive_sessionize_gap(ts, gap_seconds=1800.0)
        rows += [Row(user_id=g, ts=float(v)) for v in ts]
    df = spark.createDataFrame(rows, "user_id int, ts double")
    got_df = df.transform(
        sessionize_gap("ts", 1800.0, "user_id")
    )
    got = {}
    for r in got_df.collect():
        got.setdefault(r.user_id, []).append((r.ts, r.session_id))
    for g, spec in specs.items():
        mine = [sid for _, sid in sorted(got[g])]
        assert mine == spec, f"group {g}"
