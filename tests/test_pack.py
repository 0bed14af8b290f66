"""pack_sequences: golden packing, straddle rule, per-shard isolation,
overflow bound property, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.pack import pack_sequences


class TestPackSequences:
    def test_golden(self, spark):
        df = spark.createDataFrame(
            [(1, 50), (2, 40), (3, 30), (4, 100), (5, 10)],
            ["doc_id", "n"],
        )
        out = df.transform(
            pack_sequences("n", 100, "doc_id", allow_single_partition=True)
        )
        got = {r.doc_id: (r.pack_id, r.pack_offset) for r in out.collect()}
        # cum_before: 0, 50, 90, 120, 220
        assert got == {
            1: (0, 0), 2: (0, 50), 3: (0, 90), 4: (1, 20), 5: (2, 20)
        }

    def test_shards_pack_independently(self, spark):
        rows = [("a", i, 60) for i in range(4)] + [("b", i, 60) for i in range(4)]
        df = spark.createDataFrame(rows, ["shard", "doc_id", "n"])
        out = df.transform(pack_sequences("n", 100, "doc_id", "shard"))
        for shard in ("a", "b"):
            got = [
                (r.doc_id, r.pack_id)
                for r in sorted(
                    out.where(F.col("shard") == shard).collect(),
                    key=lambda r: r.doc_id,
                )
            ]
            assert got == [(0, 0), (1, 0), (2, 1), (3, 1)]

    def test_overflow_bound(self, spark):
        # each pack's total <= budget + (max doc size - 1)
        import random

        rng = random.Random(7)
        rows = [(i, rng.randint(1, 300)) for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "n"])
        out = df.transform(
            pack_sequences("n", 512, "doc_id", allow_single_partition=True)
        )
        totals = {
            r.pack_id: r.s
            for r in out.groupBy("pack_id").agg(F.sum("n").alias("s")).collect()
        }
        assert all(s <= 512 + 300 - 1 for s in totals.values())
        # a straddling doc steals at most (max_doc - 1) tokens from the
        # next pack, so every pack but the last holds >= budget - that
        last = max(totals)
        assert all(s >= 512 - (300 - 1) or p == last
                   for p, s in totals.items())

    def test_validation(self):
        with pytest.raises(ValueError, match="partition_columns"):
            pack_sequences("n", 100, "doc_id")
        with pytest.raises(ValueError, match="budget"):
            pack_sequences("n", 0, "doc_id", "s")


class TestRenderPacks:
    def _packed(self, spark):
        from pyspark.sql import Row

        from pywrangler_spark.operators.pack import (
            pack_sequences,
            render_packs,
        )

        rows = [
            Row(doc_id=i, shard=i % 2, text=f"d{i}", n_tokens=n)
            for i, n in enumerate([3, 4, 2, 5, 1, 6])
        ]
        df = spark.createDataFrame(rows)
        return df.transform(
            pack_sequences("n_tokens", 6, "doc_id", "shard")
        ).transform(render_packs("text", "n_tokens", "doc_id", "shard"))

    def test_members_concatenate_in_order(self, spark):
        got = {
            (r.shard, r.pack_id): (
                r.n_docs,
                r.n_tokens,
                list(r.boundaries),
                r.packed_text,
            )
            for r in self._packed(spark).collect()
        }
        # shard 0: docs 0(3),2(2),4(1) -> cum_before 0,3,5 -> all pack 0
        assert got[(0, 0)] == (3, 6, [0, 3, 5], "d0 d2 d4")
        # shard 1: docs 1(4),3(5),5(6) -> cum_before 0,4,9
        assert got[(1, 0)] == (2, 9, [0, 4], "d1 d3")
        assert got[(1, 1)] == (1, 6, [3], "d5")

    def test_validation(self):
        from pywrangler_spark.operators.pack import render_packs

        with pytest.raises(ValueError, match="order columns"):
            render_packs("text", "n", (), "shard")
        with pytest.raises(ValueError, match="shard key"):
            render_packs("text", "n", "doc_id", ())
