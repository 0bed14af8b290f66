"""Tests: time-grid resampling (LOCF), per-key caps, repetition signals."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from pywrangler_spark.operators.resample import resample_locf
from pywrangler_spark.operators.sampling import cap_per_key
from pywrangler_spark.functions.text import repetition_signals


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


class TestResampleLocf:
    @pytest.fixture(scope="class")
    def events(self, spark):
        rows = [
            # user 1: events at hours 0, 0, 3 → grid 0..3, gaps 1-2 filled
            Row(user_id=1, ts=_ts(0, 10), value=10.0),
            Row(user_id=1, ts=_ts(0, 40), value=20.0),
            Row(user_id=1, ts=_ts(3, 5), value=30.0),
            # user 2: single event → single-bucket grid
            Row(user_id=2, ts=_ts(5), value=99.0),
        ]
        return spark.createDataFrame(rows)

    def test_grid_covers_span_and_fills(self, events):
        out = events.transform(
            resample_locf("ts", 3600, "user_id", "value")
        )
        got = {
            (r.user_id, r.bucket_start.hour): (r.value, r.n_events)
            for r in out.collect()
        }
        assert len(got) == 5  # user1 hours 0..3, user2 hour 5
        # in-bucket ties collapse to the LAST event by timestamp
        assert got[(1, 0)] == (20.0, 2)
        # gap hours exist with carried-forward value and 0 events
        assert got[(1, 1)] == (20.0, 0)
        assert got[(1, 2)] == (20.0, 0)
        assert got[(1, 3)] == (30.0, 1)
        assert got[(2, 5)] == (99.0, 1)

    def test_agg_modes(self, events):
        out = events.transform(
            resample_locf("ts", 3600, "user_id", "value", agg="sum")
        )
        got = {
            (r.user_id, r.bucket_start.hour): r.value for r in out.collect()
        }
        assert got[(1, 0)] == 30.0

    def test_runs_mode_known_values(self, events):
        from pywrangler_spark.operators.resample import runs_to_dense

        runs = events.transform(
            resample_locf("ts", 3600, "user_id", "value", output="runs")
        )
        got = {
            (r.user_id, r.valid_from.hour): (
                r.valid_to.hour, r.value, r.n_events
            )
            for r in runs.collect()
        }
        # user 1: run [0,2] value 20 (2 events in opening bucket),
        # run [3,3] value 30; user 2: run [5,5]
        assert got == {
            (1, 0): (2, 20.0, 2),
            (1, 3): (3, 30.0, 1),
            (2, 5): (5, 99.0, 1),
        }

    def test_runs_expand_to_dense_equivalence(self, spark):
        """Property: runs_to_dense(runs) == dense, row for row — on a
        randomized multi-key event set with gaps, ties, NULL values and
        sub-bucket jitter."""
        import random

        from pywrangler_spark.operators.resample import runs_to_dense

        rng = random.Random(7)
        rows = []
        for uid in range(8):
            t = dt.datetime(2024, 1, 1, rng.randrange(6))
            for _ in range(rng.randrange(1, 25)):
                t += dt.timedelta(minutes=rng.randrange(1, 700))
                rows.append(
                    Row(
                        user_id=uid,
                        ts=t,
                        value=(
                            None
                            if rng.random() < 0.15
                            else float(rng.randrange(100))
                        ),
                    )
                )
        df = spark.createDataFrame(rows)
        for agg in ("last", "sum"):
            dense = df.transform(
                resample_locf("ts", 3600, "user_id", "value", agg=agg)
            )
            expanded = df.transform(
                resample_locf(
                    "ts", 3600, "user_id", "value", agg=agg, output="runs"
                )
            ).transform(runs_to_dense(3600, "user_id", "value"))
            key = lambda r: (r.user_id, r.bucket_start)
            a = sorted(dense.collect(), key=key)
            b = sorted(expanded.collect(), key=key)
            assert a == b, (agg, a[:3], b[:3])

    def test_validation(self):
        with pytest.raises(ValueError):
            resample_locf("ts", 0, "user_id", "value")
        with pytest.raises(ValueError):
            resample_locf("ts", 3600, [], "value")
        with pytest.raises(ValueError):
            resample_locf("ts", 3600, "u", "v", agg="median")
        with pytest.raises(ValueError):
            resample_locf("ts", 3600, "u", "v", output="sparse")


class TestCapPerKey:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # key 'hot' has 100 rows, 'cold' has 3
        rows = [Row(k="hot", i=i) for i in range(100)] + [
            Row(k="cold", i=1000 + i) for i in range(3)
        ]
        return spark.createDataFrame(rows)

    def test_caps_hot_key_keeps_cold(self, skewed):
        out = skewed.transform(cap_per_key("k", 10, "i"))
        counts = {
            r.k: r.n
            for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"hot": 10, "cold": 3}

    def test_deterministic_and_seed_sensitive(self, skewed):
        pick = lambda seed: sorted(  # noqa: E731
            r.i
            for r in skewed.transform(
                cap_per_key("k", 10, "i", seed=seed)
            ).collect()
        )
        assert pick(42) == pick(42)
        assert pick(42) != pick(7)  # different seed re-rolls the sample

    def test_columns_unchanged(self, skewed):
        out = skewed.transform(cap_per_key("k", 10, "i"))
        assert out.columns == skewed.columns

    def test_plan_uses_window_group_limit(self, skewed):
        from pywrangler_spark.plans.inspect import explain_string

        plan = explain_string(skewed.transform(cap_per_key("k", 5, "i")))
        # the constant rank predicate must push a partial top-N below the
        # exchange — the property that caps hot keys map-side
        assert "WindowGroupLimit" in plan, plan


class TestRepetitionSignals:
    def test_known_values(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="a a a a"),  # one word repeated 4x
                Row(doc_id=2, text="a b c d"),  # all distinct
                Row(doc_id=3, text="x y x y x y"),  # bigram 'x y' dominates
            ]
        )
        sig = repetition_signals(F.col("text"))
        out = {
            r.doc_id: r
            for r in df.select(
                "doc_id",
                sig["dup_word_ratio"].alias("dup"),
                sig["top_word_ratio"].alias("top1"),
                sig["top_bigram_ratio"].alias("top2"),
            ).collect()
        }
        assert out[1].dup == 0.75 and out[1].top1 == 1.0 and out[1].top2 == 1.0
        assert out[2].dup == 0.0 and out[2].top1 == 0.25
        # "x y x y x y": bigrams [xy, yx, xy, yx, xy] → top share 3/5
        assert out[3].top2 == 0.6


class TestResampleProperty:
    """Hypothesis: resample_locf must agree with a direct sequential
    reference (pandas) on arbitrary event streams — bucket boundaries,
    single-event keys, exact-boundary timestamps, duplicate timestamps."""

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),  # key
                st.integers(min_value=0, max_value=400_000),  # offset sec
                st.integers(min_value=-50, max_value=50),  # value
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_matches_sequential_reference(self, spark, events):
        import datetime as dt

        step = 3600
        base = dt.datetime(2024, 1, 1)
        rows = [
            {
                "k": k,
                "ts": base + dt.timedelta(seconds=off),
                "v": float(v),
                "i": i,
            }
            for i, (k, off, v) in enumerate(events)
        ]
        pdf = pd.DataFrame(rows)
        sdf = spark.createDataFrame(pdf)
        got = {
            (r.k, r.bucket_start.replace(tzinfo=None)): (r.v, r.n_events)
            for r in sdf.transform(
                resample_locf("ts", step, "k", "v")
            ).collect()
        }

        # sequential reference
        expected = {}
        for k in sorted({r["k"] for r in rows}):
            ev = sorted(
                (r for r in rows if r["k"] == k),
                key=lambda r: (r["ts"], r["v"]),
            )
            bucket = lambda t: t.replace(minute=0, second=0)  # noqa: E731
            lo, hi = bucket(ev[0]["ts"]), bucket(ev[-1]["ts"])
            last_val = None
            t = lo
            while t <= hi:
                in_bucket = [r for r in ev if bucket(r["ts"]) == t]
                if in_bucket:
                    last_val = in_bucket[-1]["v"]  # (ts, v)-max = last
                expected[(k, t)] = (last_val, len(in_bucket))
                t += dt.timedelta(seconds=step)
        assert got == expected


class TestCapProperty:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),
                st.integers(min_value=0, max_value=10_000),
            ),
            min_size=1,
            max_size=80,
            unique_by=lambda t: t[1],
        ),
        st.integers(min_value=1, max_value=6),
    )
    def test_cap_invariants(self, spark, rows, cap):
        pdf = pd.DataFrame(rows, columns=["k", "i"])
        sdf = spark.createDataFrame(pdf)
        out = sdf.transform(cap_per_key("k", cap, "i")).toPandas()
        # never exceeds the cap; keys with <= cap rows keep everything
        sizes = pdf.groupby("k").size()
        got_sizes = out.groupby("k").size()
        for k, n in sizes.items():
            assert got_sizes.get(k, 0) == min(n, cap)
        # kept rows are a subset of the input
        assert set(map(tuple, out.to_numpy())) <= set(
            map(tuple, pdf.to_numpy())
        )


class TestRepetitionCountKernel:
    """The mapInPandas integer-count kernel behind the
    repetition_quality_docs query must agree with the exploded
    aggregation form it replaced — including the NULL/empty/one-token
    edge docs whose stats the old form produced via left-join misses."""

    def test_matches_exploded_aggregation(self, spark):
        from pywrangler_spark.functions.text import words
        from pywrangler_spark.queries.text import (
            _repetition_count_batches,
        )

        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="a a a a"),
                Row(doc_id=2, text="a b c d"),
                Row(doc_id=3, text="x y x y x y"),
                Row(doc_id=4, text=None),          # NULL text
                Row(doc_id=5, text="   "),         # whitespace-only
                Row(doc_id=6, text="solo"),        # one token, no bigram
                Row(doc_id=7, text="A a  B b a"),  # case+space normalize
            ]
        )
        base = df.select("doc_id", words(F.col("text")).alias("ws"))
        got = {
            r.doc_id: r
            for r in base.mapInPandas(
                _repetition_count_batches,
                "doc_id long, n long, n_distinct long, top_c long, "
                "bn long, btop_c long",
            ).collect()
        }
        # reference: the explode + two-level hash aggregation form
        tok = base.select("doc_id", F.explode("ws").alias("w"))
        ref_w = (
            tok.groupBy("doc_id", "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(
                F.sum("c").alias("n"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.max("c").alias("top_c"),
            )
        )
        ref = {r.doc_id: r for r in ref_w.collect()}
        for doc_id, r in got.items():
            if doc_id in ref:
                assert (r.n, r.n_distinct, r.top_c) == (
                    ref[doc_id].n,
                    ref[doc_id].n_distinct,
                    ref[doc_id].top_c,
                ), doc_id
            else:  # NULL text: no exploded rows — kernel emits zeros
                assert (r.n, r.n_distinct, r.top_c) == (0, 0, 0), doc_id
        # bigram spot checks (old form: explode of the constructed
        # bigram array)
        assert (got[3].bn, got[3].btop_c) == (5, 3)   # x-y 3, y-x 2
        assert (got[6].bn, got[6].btop_c) == (0, 0)   # no bigrams
        assert (got[1].bn, got[1].btop_c) == (3, 3)   # a-a 3x
        assert got[7].n == 5 and got[7].n_distinct == 2  # lowercased
