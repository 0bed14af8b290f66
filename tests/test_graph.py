"""Connected components: known graphs, random graphs vs union-find,
dedup resolution."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.graph import connected_components, dedup_resolve


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min vertex id in component
    labels = {}
    for v in list(parent):
        root = find(v)
        labels.setdefault(root, root)
        labels[v] = min(labels.get(v, v), root)
    # second pass: min id per root
    by_root = {}
    for v in parent:
        by_root.setdefault(find(v), []).append(v)
    return {
        v: min(members) for root, members in by_root.items() for v in members
    }


class TestConnectedComponents:
    def test_two_chains_and_isolated_pair(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (11, 12), (20, 21)], ["src", "dst"]
        )
        got = {
            r.id: r.component
            for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20,
                       21: 20}

    def test_random_graphs_match_union_find(self, spark):
        rng = random.Random(7)
        for _ in range(3):
            n = 200
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(150)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            df = spark.createDataFrame(edges, ["src", "dst"])
            got = {
                r.id: r.component for r in connected_components(df).collect()
            }
            assert got == _union_find(edges)

    def test_nonconvergence_raises(self, spark):
        edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        with pytest.raises(RuntimeError, match="converge"):
            connected_components(edges, max_iterations=1)

    def test_long_chain_multi_round_and_iteration_telemetry(self, spark):
        # hash-min propagates the min label one hop per round: a chain
        # of 8 edges forces the r12 folded-init loop through several
        # label-carrying rounds (the convergence check now rides the
        # label aggregation itself instead of a second join per round)
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], ["src", "dst"]
        )
        stats: dict = {}
        got = {
            r.id: r.component
            for r in connected_components(edges, stats=stats).collect()
        }
        assert got == {i: 0 for i in range(9)}
        # 8-hop chain: min reaches the far end after 8 rounds; one more
        # round observes no change. The folded init counts as round 1.
        assert 3 <= stats["iterations"] <= 9


class TestDedupResolve:
    def test_keeps_one_per_cluster_and_passthrough(self, spark):
        df = spark.createDataFrame(
            [(i, f"doc{i}") for i in range(8)], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 5), (6, 7)], ["id_a", "id_b"]
        )
        kept = sorted(
            r.doc_id for r in dedup_resolve(df, pairs, "doc_id").collect()
        )
        # cluster {1,2,5} -> keep 1; cluster {6,7} -> keep 6; 0,3,4 untouched
        assert kept == [0, 1, 3, 4, 6]
