"""Tests for the golden-data test kit itself: PlainFrame round-trips
(NULL vs NaN fidelity), equality assertion, mutants, DataTestCase."""

import datetime as dt

import pytest

from pywrangler_spark.testing import (
    NULL,
    DataTestCase,
    MutantCollection,
    Mutation,
    PlainFrame,
    RandomMutant,
    TestCollection,
    ValueMutant,
)

# the canonical 5-dtype fixture with missings (FIXTURES.md §3)
FIXTURE = {
    "b:bool": [True, False, NULL],
    "i:int": [1, -3, NULL],
    "f:float": [1.5, float("nan"), NULL],
    "s:str": ["a", "", NULL],
    "d:datetime": [
        dt.datetime(2019, 1, 1, 10),
        dt.datetime(2019, 2, 1),
        NULL,
    ],
}


def make_frame():
    return PlainFrame.from_dict(FIXTURE)


class TestPlainFrameBasics:
    def test_construction_and_accessors(self):
        pf = make_frame()
        assert pf.columns == ["b", "i", "f", "s", "d"]
        assert pf.dtypes == ["bool", "int", "float", "str", "datetime"]
        assert pf.n_rows == 3 and pf.n_cols == 5

    def test_typed_annotations_and_abbreviations(self):
        pf = PlainFrame.from_plain(
            [[1, "x"], [2, "y"]], columns=["a:int", "t:s"]
        )
        assert pf.dtypes == ["int", "str"]

    def test_dtype_validation_rejects_mismatch(self):
        with pytest.raises(TypeError, match="not a valid int"):
            PlainFrame.from_dict({"a:int": [1, "oops"]})

    def test_missing_dtype_annotation_raises(self):
        with pytest.raises(ValueError, match="lack dtype annotations"):
            PlainFrame.from_plain([[1]], columns=["a"])

    def test_column_subsetting(self):
        pf = make_frame()
        assert pf["i"].columns == ["i"]
        assert pf[["s", "b"]].columns == ["s", "b"]
        assert pf[1:3].columns == ["i", "f"]

    def test_null_vs_nan_are_distinct(self):
        col = make_frame().get_column("f")
        assert col.values[1] != col.values[2]  # NaN != NULL
        assert col.values[2] is NULL

    def test_modify_cells(self):
        pf = make_frame()
        out = pf.modify({"i": {0: 99}, "s": {2: "filled"}})
        assert out.get_column("i").values[0] == 99
        assert out.get_column("s").values[2] == "filled"
        # original is untouched (immutability)
        assert pf.get_column("i").values[0] == 1

    def test_repr_renders(self):
        assert "b (bool)" in repr(make_frame())


class TestRoundTrips:
    def test_dict_round_trip(self):
        pf = make_frame()
        assert PlainFrame.from_dict(pf.to_dict()) == pf

    def test_plain_round_trip(self):
        pf = make_frame()
        data, cols, dtypes = pf.to_plain()
        back = PlainFrame.from_plain(
            data, cols, dtypes, row_wise=False
        )
        assert back == pf

    def test_pyspark_round_trip_preserves_null_vs_nan(self, spark):
        pf = make_frame()
        back = PlainFrame.from_pyspark(pf.to_pyspark(spark))
        pf.assert_equal(back)
        f = back.get_column("f")
        assert f.values[1] != f.values[1] or f.values[1] != NULL  # NaN
        assert f.values[2] is NULL

    def test_pandas_round_trip_with_upcast(self):
        pf = make_frame()
        pdf = pf.to_pandas()
        # int/bool with missings upcast to float in pandas
        assert str(pdf["i"].dtype) == "float64"
        back = PlainFrame.from_pandas(
            pdf, dtypes=["bool", "int", "float", "str", "datetime"]
        )
        assert back.get_column("i").values == (1, -3, NULL)
        assert back.get_column("b").values == (True, False, NULL)

    def test_from_any_dispatch(self, spark):
        pf = make_frame()
        assert PlainFrame.from_any(pf) is pf
        assert PlainFrame.from_any(FIXTURE) == pf
        assert PlainFrame.from_any(pf.to_pyspark(spark)) == pf


class TestAssertEqual:
    def test_row_order_insensitive_by_default(self):
        a = PlainFrame.from_dict({"x:i": [1, 2, 3]})
        b = PlainFrame.from_dict({"x:i": [3, 1, 2]})
        a.assert_equal(b)
        with pytest.raises(AssertionError, match="row 0 differs"):
            a.assert_equal(b, check_row_order=True)

    def test_column_order(self):
        a = PlainFrame.from_dict({"x:i": [1], "y:i": [2]})
        b = PlainFrame.from_dict({"y:i": [2], "x:i": [1]})
        with pytest.raises(AssertionError, match="column order"):
            a.assert_equal(b)
        a.assert_equal(b, check_column_order=False)

    def test_dtype_mismatch(self):
        a = PlainFrame.from_dict({"x:i": [1]})
        b = PlainFrame.from_dict({"x:f": [1.0]})
        with pytest.raises(AssertionError, match="dtypes differ"):
            a.assert_equal(b)

    def test_null_rows_sortable(self):
        a = PlainFrame.from_dict({"x:i": [NULL, 2, 1]})
        b = PlainFrame.from_dict({"x:i": [1, NULL, 2]})
        a.assert_equal(b)


class TestMutants:
    def test_value_mutant(self):
        pf = make_frame()
        out = ValueMutant("i", 0, 42).mutate(pf)
        assert out.get_column("i").values[0] == 42

    def test_mutation_must_change_value(self):
        pf = make_frame()
        with pytest.raises(ValueError, match="does not change"):
            ValueMutant("i", 0, 1).mutate(pf)

    def test_random_mutant_seeded_and_dtype_aware(self):
        pf = make_frame()
        a = RandomMutant(count=3, seed=7).mutate(pf)
        b = RandomMutant(count=3, seed=7).mutate(pf)
        assert a == b  # deterministic under a fixed seed
        assert a != pf

    def test_collection_and_from_any(self):
        pf = make_frame()
        collection = MutantCollection(
            [ValueMutant("i", 0, 5), {("s", 0): "zzz"}]
        )
        out = collection.mutate(pf)
        assert out.get_column("i").values[0] == 5
        assert out.get_column("s").values[0] == "zzz"

    def test_function_mutant(self):
        pf = make_frame()
        from pywrangler_spark.testing import FunctionMutant

        fm = FunctionMutant(lambda parent: [Mutation("b", 0, False)])
        assert fm.mutate(pf).get_column("b").values[0] is False


class _IntervalCase(DataTestCase):
    """Golden case driving the real operator through the test kit."""

    def input(self):
        return {
            "order:i": [1, 2, 3, 4, 5],
            "groupby:i": [1, 1, 1, 1, 1],
            "marker:i": [0, 1, 0, 2, 0],
        }

    def output(self):
        return {
            "order:i": [1, 2, 3, 4, 5],
            "groupby:i": [1, 1, 1, 1, 1],
            "marker:i": [0, 1, 0, 2, 0],
            "iids:i": [0, 1, 1, 1, 0],
        }

    def mutants(self):
        return [
            ValueMutant("marker", 1, 0),  # remove the start
            ValueMutant("marker", 3, 0),  # remove the end
        ]


class TestDataTestCaseEndToEnd:
    def test_pyspark_engine_with_mutants(self, spark):
        from pywrangler_spark import identify_intervals

        _IntervalCase().test(
            lambda df: df.transform(
                identify_intervals(
                    marker_column="marker",
                    marker_start=1,
                    marker_end=2,
                    orderby_columns="order",
                    groupby_columns="groupby",
                )
            ),
            engine="pyspark",
            spark=spark,
        )

    def test_pyspark_engine_repartition(self, spark):
        from pywrangler_spark import identify_intervals

        _IntervalCase().test(
            lambda df: df.transform(
                identify_intervals(
                    marker_column="marker",
                    marker_start=1,
                    marker_end=2,
                    orderby_columns="order",
                    groupby_columns="groupby",
                )
            ),
            engine="pyspark",
            spark=spark,
            repartition=3,
        )

    def test_surviving_mutant_fails(self):
        # a function that ignores its input cannot kill any mutant — the
        # harness must flag that the golden data pins nothing
        expected = _IntervalCase().expected_output().to_pandas()

        with pytest.raises(AssertionError, match="mutant survived"):
            _IntervalCase().test(
                lambda pdf: expected.copy(), engine="pandas"
            )

    def test_pandas_engine(self):
        # whole-frame pandas function through the pandas adapter
        def add_iids(pdf):
            out = pdf.copy()
            out["iids"] = [0, 1, 1, 1, 0]
            return out

        _IntervalCase().test(add_iids, engine="pandas")

    def test_collection_parametrization(self):
        coll = TestCollection([_IntervalCase], name="intervals")
        assert coll.names == ["_IntervalCase"]
        assert coll.pytest_parametrize is not None


class TestExtendedDtypes:
    """The one deliberate extension over the reference's 5-type system:
    floatarray (embeddings) and binary (multimodal blobs), with full
    conversion-matrix round-trips and NULL support."""

    def _frame(self):
        from pywrangler_spark.testing.plainframe import NULL, PlainFrame

        return PlainFrame.from_dict({
            "id:i": (1, 2, 3),
            "emb:fa": ((1.0, 2.0), (3.5, 4.5), NULL),
            "blob:y": (b"\x01\x02", NULL, b""),
        })

    def test_pyspark_roundtrip(self, spark):
        from pywrangler_spark.testing.plainframe import PlainFrame

        pf = self._frame()
        df = pf.to_pyspark(spark)
        types = dict(df.dtypes)
        assert types["emb"] == "array<double>"
        assert types["blob"] == "binary"
        PlainFrame.from_pyspark(df).assert_equal(pf)

    def test_pandas_roundtrip_with_inference(self, spark):
        from pywrangler_spark.testing.plainframe import PlainFrame

        pf = self._frame()
        again = PlainFrame.from_pandas(pf.to_pandas())
        assert again.dtypes == ["int", "floatarray", "binary"]
        again.assert_equal(pf)

    def test_value_validation(self):
        import pytest as _pytest

        from pywrangler_spark.testing.plainframe import PlainFrame

        with _pytest.raises(TypeError, match="floatarray"):
            PlainFrame.from_dict({"e:fa": (("x", "y"),)})
        with _pytest.raises(TypeError, match="binary"):
            PlainFrame.from_dict({"b:y": ("not-bytes",)})

    def test_float_tolerance_inside_arrays(self):
        from pywrangler_spark.testing.plainframe import PlainFrame

        a = PlainFrame.from_dict({"e:fa": ((0.1 + 0.2,),)})
        b = PlainFrame.from_dict({"e:fa": ((0.3,),)})
        a.assert_equal(b)


class TestExtendedDtypeDataTestCase:
    def test_golden_case_with_embeddings_and_blobs(self, spark):
        """DataTestCase drives an embedding+blob operator end-to-end with
        the extended dtypes — the golden-data workflow the reference
        pioneered, now covering the multimodal surface."""
        from pyspark.sql import functions as F

        from pywrangler_spark.testing.datatestcase import DataTestCase
        from pywrangler_spark.testing.plainframe import NULL

        class EmbNormAndBlobSize(DataTestCase):
            input = {
                "id:i": (1, 2, 3),
                "emb:fa": ((3.0, 4.0), (0.0, 0.0), NULL),
                "blob:y": (b"\x00\x01\x02", b"", NULL),
            }
            output = {
                "id:i": (1, 2, 3),
                "l2:f": (5.0, 0.0, NULL),
                "blob_bytes:i": (3, 0, NULL),
            }

        def func(df):
            return df.select(
                "id",
                F.sqrt(
                    F.aggregate(
                        "emb", F.lit(0.0), lambda a, x: a + x * x
                    )
                ).alias("l2"),
                F.length("blob").cast("long").alias("blob_bytes"),
            )

        EmbNormAndBlobSize().test(func, engine="pyspark", spark=spark)
