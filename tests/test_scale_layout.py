"""Scale-layout operators: salted joins (skew) and bucketed tables
(co-located shuffle-free joins). The assertions here are about PLANS and
EQUIVALENCE — salting must not change results, bucketing must remove the
Exchange."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pywrangler_spark.operators.skew import hot_keys, salted_join
from pywrangler_spark.plans.inspect import count_exchanges, explain_string
from pywrangler_spark.sources import read_table, write_bucketed_table


@pytest.fixture(scope="module")
def skewed(spark):
    # 900 rows on one hot key, a sprinkle elsewhere
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["hot"] * 900 + ["a", "b", "c", "miss"] * 5,
                "v": range(920),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["hot", "a", "b", "c", "d"], "w": range(5)})
    )
    return left, right


class TestSaltedJoin:
    def test_inner_equivalent(self, skewed):
        left, right = skewed
        plain = left.join(right, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
            F.sum("w").alias("sw"),
        )
        salted = left.transform(
            salted_join(right, "k", n_salts=8, seed=7)
        ).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
            F.sum("w").alias("sw"),
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_left_keeps_unmatched(self, skewed):
        left, right = skewed
        out = left.transform(
            salted_join(right, "k", n_salts=4, how="left", seed=1)
        )
        assert out.count() == left.count()
        assert out.filter(F.col("w").isNull()).count() == 5  # the "miss" rows

    def test_salt_column_dropped(self, skewed):
        left, right = skewed
        out = left.transform(salted_join(right, "k", n_salts=4))
        assert set(out.columns) == {"k", "v", "w"}

    def test_spreads_hot_key(self, skewed):
        left, right = skewed
        # salted: the join key set becomes (k, salt); the hot key's rows
        # split across n_salts distinct composite keys
        l = left.withColumn("__salt", F.floor(F.rand(3) * 8).cast("int"))
        n_composite = (
            l.filter(F.col("k") == "hot").select("k", "__salt").distinct().count()
        )
        assert n_composite > 1

    def test_validation(self, skewed):
        left, right = skewed
        with pytest.raises(ValueError, match="n_salts"):
            salted_join(right, "k", n_salts=1)(left)
        with pytest.raises(ValueError, match="how"):
            salted_join(right, "k", how="outer")(left)
        with pytest.raises(ValueError, match="join keys"):
            salted_join(right, [])(left)


class TestHotKeys:
    def test_finds_hot_key(self, spark, skewed):
        left, _ = skewed
        keys = hot_keys(left, "k", top=3, min_share=0.1)
        assert keys[0] == "hot"
        assert all(k != "a" or False for k in keys[1:2])  # share cut applies

    def test_empty_frame(self, spark):
        df = spark.createDataFrame([], "k string")
        assert hot_keys(df, "k") == []

    def test_multi_key_tuples(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"a": ["x"] * 9 + ["y"], "b": [1] * 9 + [2]})
        )
        keys = hot_keys(df, ["a", "b"], top=1, min_share=0.5)
        assert keys == [("x", 1)]


class TestBucketedTables:
    def test_bucketed_join_no_exchange(self, spark):
        n = 500
        facts = spark.range(n).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
        dims = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        try:
            write_bucketed_table(facts, "t_facts", "k", 4, sort_columns="k")
            write_bucketed_table(dims, "t_dims", "k", 4, sort_columns="k")
            f, d = read_table(spark, "t_facts"), read_table(spark, "t_dims")
            # force the sort-merge path (broadcast would hide the layout win)
            joined = f.hint("merge").join(d, "k")
            assert joined.count() == n
            assert count_exchanges(joined) == 0, explain_string(joined)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_facts")
            spark.sql("DROP TABLE IF EXISTS t_dims")

    def test_unbucketed_join_has_exchange(self, spark):
        facts = spark.range(500).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
        dims = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        joined = facts.hint("merge").join(dims, "k")
        assert count_exchanges(joined) >= 1

    def test_validation(self, spark):
        df = spark.range(5)
        with pytest.raises(ValueError, match="bucket columns"):
            write_bucketed_table(df, "t_x", [], 4)
        with pytest.raises(ValueError, match="num_buckets"):
            write_bucketed_table(df, "t_x", "id", 0)


class TestTopKPlan:
    def test_order_limit_is_take_ordered(self, spark):
        # global ORDER BY + LIMIT must plan as TakeOrderedAndProject
        # (per-partition top-k + k-row driver merge), not a rangepartition
        # global sort
        df = (
            spark.range(10_000)
            .select(F.col("id"), (F.col("id") % 97).alias("p"))
            .orderBy(F.col("p").desc(), F.col("id"))
            .limit(100)
        )
        plan = explain_string(df)
        assert "TakeOrderedAndProject" in plan
        assert "rangepartitioning" not in plan.lower()


class TestAdaptiveSaltedJoin:
    def test_skewed_equivalent_and_salts_hot(self, spark, skewed):
        from pywrangler_spark.operators.skew import adaptive_salted_join

        left, right = skewed
        plain = left.join(right, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
            F.sum("w").alias("sw"),
        )
        adaptive = left.transform(
            adaptive_salted_join(right, "k", n_salts=4, seed=7)
        ).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
            F.sum("w").alias("sw"),
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, adaptive.collect())
        )

    def test_uniform_degrades_to_plain_join(self, spark):
        """No hot keys -> exactly the plain join plan: no Generate
        (salt explode) node, zero replication tax."""
        from pywrangler_spark.operators.skew import adaptive_salted_join
        from pywrangler_spark.plans.inspect import explain_string

        left = spark.createDataFrame(
            pd.DataFrame({"k": [f"k{i}" for i in range(2000)],
                          "v": range(2000)})
        )
        right = spark.createDataFrame(
            pd.DataFrame({"k": [f"k{i}" for i in range(0, 2000, 2)],
                          "w": range(1000)})
        )
        out = left.transform(
            adaptive_salted_join(right, "k", min_share=0.01)
        )
        assert "Generate" not in explain_string(out)
        assert out.count() == 1000

    def test_left_join_keeps_null_and_miss_rows(self, spark, skewed):
        from pywrangler_spark.operators.skew import adaptive_salted_join

        left, right = skewed
        with_null = left.unionByName(
            spark.createDataFrame(pd.DataFrame({"k": [None] * 3,
                                                "v": [-1, -2, -3]}))
        )
        out = with_null.transform(
            adaptive_salted_join(right, "k", how="left", seed=1)
        )
        plain = with_null.join(right, "k", "left")
        assert out.count() == plain.count()
        assert out.filter(F.col("k").isNull()).count() == 3

    def test_validation(self, skewed):
        from pywrangler_spark.operators.skew import adaptive_salted_join

        left, right = skewed
        with pytest.raises(ValueError, match="join keys"):
            adaptive_salted_join(right, [])(left)
        with pytest.raises(ValueError, match="how"):
            adaptive_salted_join(right, "k", how="outer")(left)


class TestBucketedWriterSessionGotchas:
    def test_overwrite_clears_orphaned_location(self, spark):
        """A managed table's files can outlive its catalog entry (the
        default catalog is session-scoped, the warehouse dir is not) —
        an overwrite write must clear the orphaned directory instead of
        failing with LOCATION_ALREADY_EXISTS."""
        import os
        from urllib.parse import urlparse

        warehouse = urlparse(
            spark.conf.get("spark.sql.warehouse.dir")
        ).path
        loc = os.path.join(warehouse, "t_orphan")
        spark.sql("DROP TABLE IF EXISTS t_orphan")
        os.makedirs(loc, exist_ok=True)
        with open(os.path.join(loc, "stale.parquet"), "w") as fh:
            fh.write("not parquet")
        try:
            df = spark.range(20).selectExpr("id AS k", "id * 2 AS v")
            write_bucketed_table(df, "t_orphan", "k", 2)
            assert read_table(spark, "t_orphan").count() == 20
        finally:
            spark.sql("DROP TABLE IF EXISTS t_orphan")

    def test_failed_overwrite_restores_orphaned_location(self, spark):
        """The orphan clear must be move-aside-then-commit: if the new
        write FAILS, the old files come back instead of being gone."""
        import os
        from urllib.parse import urlparse

        warehouse = urlparse(
            spark.conf.get("spark.sql.warehouse.dir")
        ).path
        loc = os.path.join(warehouse, "t_orphan_fail")
        spark.sql("DROP TABLE IF EXISTS t_orphan_fail")
        os.makedirs(loc, exist_ok=True)
        marker = os.path.join(loc, "old-data.parquet")
        with open(marker, "w") as fh:
            fh.write("precious")
        try:
            bad = spark.range(5).selectExpr(
                "id AS k", "assert_true(id < 0) AS v"
            )
            with pytest.raises(Exception):
                write_bucketed_table(bad, "t_orphan_fail", "k", 2)
            assert os.path.exists(marker), "old data must be restored"
        finally:
            spark.sql("DROP TABLE IF EXISTS t_orphan_fail")
            import shutil

            shutil.rmtree(loc, ignore_errors=True)

    def test_orphan_location_db_qualified_and_remote(self, spark):
        """Path derivation: db.tbl lives under the database location
        (db.db/tbl), not warehouse/db.tbl; non-local warehouses are
        skipped (None) rather than silently mis-derived."""
        import os

        from pywrangler_spark.sources.bucketed import _orphan_location

        spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
        try:
            loc = _orphan_location(spark, "bktdb.some_tbl")
            assert loc is not None
            assert loc.endswith(os.path.join("bktdb.db", "some_tbl")), loc
            plain = _orphan_location(spark, "some_tbl")
            assert plain is not None and plain.endswith("some_tbl")
            assert "bktdb" not in plain
            assert _orphan_location(spark, "nosuchdb.tbl") is None
        finally:
            spark.sql("DROP DATABASE IF EXISTS bktdb")

    def test_one_file_per_bucket_elides_join_sort(self, spark):
        """The writer's default pre-repartition gives one file per
        bucket, which (with the session's bucketedTableScan ordering
        conf) removes BOTH the Exchange and the Sort under a bucketed
        sort-merge join."""
        import os

        try:
            a = spark.range(400).selectExpr("id % 40 AS k", "id AS v")
            b = spark.range(40).selectExpr("id AS k", "id * 3 AS w")
            write_bucketed_table(a, "t_sf_a", "k", 4, sort_columns="k")
            write_bucketed_table(b, "t_sf_b", "k", 4, sort_columns="k")
            # one file per bucket on disk
            from urllib.parse import urlparse

            warehouse = urlparse(
                spark.conf.get("spark.sql.warehouse.dir")
            ).path
            files = [
                f
                for f in os.listdir(os.path.join(warehouse, "t_sf_a"))
                if f.endswith(".parquet")
            ]
            assert len(files) == 4, files
            j = read_table(spark, "t_sf_a").hint("merge").join(
                read_table(spark, "t_sf_b"), "k"
            )
            assert j.count() == 400
            plan = explain_string(j)
            tree = plan.split("== Initial Plan ==")[0].split("\n\n")[0]
            assert count_exchanges(j) == 0, tree
            assert "Sort (" not in tree, tree
        finally:
            spark.sql("DROP TABLE IF EXISTS t_sf_a")
            spark.sql("DROP TABLE IF EXISTS t_sf_b")


class TestValidateSfDir:
    """A probe-scoped partial scale dir (make_scale.py --tables) stamps
    its subset in _scale_meta.json; the loaders must refuse it as a
    full sf directory instead of failing on missing files — or worse,
    silently succeeding for queries touching only the replicated
    tables."""

    def _write_meta(self, tmp_path, tables):
        import json

        (tmp_path / "_scale_meta.json").write_text(
            json.dumps({"total_mult": 10, "tables": tables})
        )

    def test_partial_dir_rejected(self, tmp_path):
        from pywrangler_spark.sources import validate_sf_dir

        self._write_meta(tmp_path, ["events"])
        with pytest.raises(ValueError, match="partial scale directory"):
            validate_sf_dir(str(tmp_path))

    def test_partial_dir_allowed_explicitly(self, tmp_path):
        from pywrangler_spark.sources import validate_sf_dir

        self._write_meta(tmp_path, ["events"])
        validate_sf_dir(str(tmp_path), allow_partial=True)
        # an explicit request covered by the stamp is also fine
        validate_sf_dir(str(tmp_path), names=["events"])
        with pytest.raises(ValueError, match="lineitem"):
            validate_sf_dir(str(tmp_path), names=["events", "lineitem"])

    def test_full_dir_and_unstamped_dir_accepted(self, tmp_path):
        from pywrangler_spark.sources import validate_sf_dir

        validate_sf_dir(str(tmp_path))  # no stamp: driver testdata
        self._write_meta(tmp_path, None)  # full replication stamp
        validate_sf_dir(str(tmp_path))

    def test_load_tables_refuses_partial(self, spark, tmp_path):
        from pywrangler_spark.sources import load_tables

        self._write_meta(tmp_path, ["events"])
        with pytest.raises(ValueError, match="partial scale directory"):
            load_tables(spark, str(tmp_path))
