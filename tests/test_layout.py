"""Z-order layout tests: Morton code correctness and the actual scan-
pruning benefit (fewer files whose min/max stats intersect a 2-D box
predicate than a random linear layout)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from pywrangler_spark.sources import read_parquet
from pywrangler_spark.sources.layout import (
    fit_zorder_boundaries,
    zorder_code,
    zorder_layout,
)

SF = "/root/testdata/sf0.001"


class TestZorderCode:
    def test_interleave_known_values(self, spark):
        # 2 columns, 2 bits, explicit boundaries -> buckets 0..3 each;
        # z = interleave(bits of a at even positions, b at odd)
        df = spark.createDataFrame(
            [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)],
            ["a", "b"],
        )
        bnds = {"a": [3.0, 6.0, 9.0], "b": [3.0, 6.0, 9.0]}
        out = {
            (r["a"], r["b"]): r["_z"]
            for r in df.transform(
                zorder_code(["a", "b"], bits=2, boundaries=bnds)
            ).collect()
        }
        # value 0.0 -> bucket 0 (binary 00); 10.0 -> bucket 3 (11)
        # z(a=0,b=0) = 0; z(a=3,b=0) interleaves 1s at even bit slots
        assert out[(0.0, 0.0)] == 0
        assert out[(10.0, 0.0)] == 0b0101  # a bits at positions 0 and 2
        assert out[(0.0, 10.0)] == 0b1010  # b bits at positions 1 and 3
        assert out[(10.0, 10.0)] == 0b1111

    def test_fit_boundaries_are_monotone(self, spark):
        ev = read_parquet(spark, f"{SF}/events.parquet")
        bnds = fit_zorder_boundaries(ev, ["user_id", "value"], bits=4)
        for col, bs in bnds.items():
            assert len(bs) == 15
            assert bs == sorted(bs)

    def test_validation(self):
        with pytest.raises(ValueError, match="column"):
            zorder_code([])
        with pytest.raises(ValueError, match="bits"):
            zorder_code("a", bits=0)
        with pytest.raises(ValueError, match="63-bit"):
            zorder_code(list("abcdefgh"), bits=8)


def _files_intersecting_box(path, lo_u, hi_u, lo_v, hi_v):
    """Count parquet files whose (user_id, value) min/max stats envelope
    intersects the box — exactly the skip-or-scan decision a parquet
    reader makes from footer stats."""
    import pyarrow.parquet as pq

    n = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {"user_id": None, "value": None}
        maxs = {"user_id": None, "value": None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    s = col.statistics
                    mins[name] = (
                        s.min if mins[name] is None
                        else min(mins[name], s.min)
                    )
                    maxs[name] = (
                        s.max if maxs[name] is None
                        else max(maxs[name], s.max)
                    )
        if (
            mins["user_id"] is not None
            and mins["user_id"] <= hi_u
            and maxs["user_id"] >= lo_u
            and mins["value"] <= hi_v
            and maxs["value"] >= lo_v
        ):
            n += 1
    return n


class TestZorderLayout:
    def test_prunes_more_files_than_linear(self, spark, tmp_path):
        ev = read_parquet(spark, f"{SF}/events.parquet").select(
            "event_id", "user_id", F.col("value").cast("double").alias("value")
        ).filter(F.col("value").isNotNull())
        linear_dir = str(tmp_path / "linear")
        z_dir = str(tmp_path / "zorder")
        ev.repartition(16).write.parquet(linear_dir)
        ev.transform(
            zorder_layout(["user_id", "value"], bits=6, num_files=16)
        ).write.parquet(z_dir)

        # a narrow 2-D box: middle user band x middle value band
        u_lo, u_hi = ev.approxQuantile("user_id", [0.45, 0.55], 0.01)
        v_lo, v_hi = ev.approxQuantile("value", [0.45, 0.55], 0.01)
        n_linear = _files_intersecting_box(
            linear_dir, u_lo, u_hi, v_lo, v_hi
        )
        n_z = _files_intersecting_box(z_dir, u_lo, u_hi, v_lo, v_hi)
        # random partitioning spreads both ranges over every file; the
        # space-filling curve confines the box to a few
        assert n_linear >= 12, n_linear
        assert n_z <= n_linear // 2, (n_z, n_linear)

    def test_layout_preserves_rows(self, spark, tmp_path):
        ev = read_parquet(spark, f"{SF}/events.parquet")
        out = ev.transform(zorder_layout(["user_id", "value"], bits=4))
        assert out.columns == ev.columns
        assert out.count() == ev.count()
