"""Deterministic splits/sampling: reproducibility, exact per-stratum
counts, fraction sanity, partition invariance."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.sampling import (
    hash_split,
    stratified_exact_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": range(1000),
                "grp": [f"g{i % 3}" for i in range(1000)],
            }
        )
    )


class TestHashSplit:
    def test_fractions_roughly_hold(self, docs):
        out = docs.transform(
            hash_split("id", {"train": 0.8, "val": 0.1, "test": 0.1})
        )
        counts = {r.split: r.n for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert abs(counts["train"] - 800) < 60
        assert abs(counts["val"] - 100) < 40
        assert set(counts) == {"train", "val", "test"}

    def test_deterministic_and_partition_invariant(self, docs):
        t = hash_split("id", {"a": 0.5, "b": 0.5}, seed=7)
        one = {(r.id, r.split) for r in docs.transform(t).collect()}
        two = {(r.id, r.split)
               for r in docs.repartition(13).transform(t).collect()}
        assert one == two

    def test_seed_changes_assignment(self, docs):
        a = {(r.id, r.split) for r in docs.transform(
            hash_split("id", {"x": 0.5, "y": 0.5}, seed=1)).collect()}
        b = {(r.id, r.split) for r in docs.transform(
            hash_split("id", {"x": 0.5, "y": 0.5}, seed=2)).collect()}
        assert a != b

    def test_validation(self, docs):
        with pytest.raises(ValueError, match="sum to 1"):
            hash_split("id", {"a": 0.5, "b": 0.2})(docs)
        with pytest.raises(ValueError, match="at least one"):
            hash_split("id", {})(docs)


class TestStratifiedSample:
    def test_exact_per_stratum_counts(self, docs):
        out = docs.transform(stratified_exact_sample("grp", 0.1, "id"))
        counts = {r.grp: r.n for r in
                  out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        # strata sizes: g0=334, g1=333, g2=333 → ceil(0.1*n) = 34, 34, 34
        assert counts == {"g0": 34, "g1": 34, "g2": 34}

    def test_sample_is_subset_and_stable(self, docs):
        t = stratified_exact_sample("grp", 0.25, "id", seed=9)
        one = {r.id for r in docs.transform(t).collect()}
        two = {r.id for r in docs.repartition(17).transform(t).collect()}
        assert one == two
        assert one <= set(range(1000))

    def test_validation(self, docs):
        with pytest.raises(ValueError, match="fraction"):
            stratified_exact_sample("grp", 0.0, "id")(docs)
        with pytest.raises(ValueError, match="strata"):
            stratified_exact_sample([], 0.5, "id")(docs)
