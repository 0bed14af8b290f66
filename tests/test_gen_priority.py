"""gen_priority's dependency resolution: the staleness signal is only
as good as the query→module mapping, so pin its load-bearing rules —
name-aware re-export resolution and registry-module exclusion."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "gen_priority", os.path.join(REPO, "scripts", "gen_priority.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestResolveSpec:
    def test_plain_module_resolves_to_itself(self):
        gp = _load()
        assert gp.resolve_spec("pywrangler_spark.operators.pack", None) == {
            "pywrangler_spark/operators/pack.py"
        }

    def test_reexport_init_follows_the_imported_name(self):
        gp = _load()
        # `from pywrangler_spark.sources import read_parquet` depends on
        # sources/parquet.py only — NOT every module the hub re-exports
        got = gp.resolve_spec(
            "pywrangler_spark.sources", frozenset({"read_parquet"})
        )
        assert got == {"pywrangler_spark/sources/parquet.py"}

    def test_whole_hub_import_expands_to_providers(self):
        gp = _load()
        got = gp.resolve_spec("pywrangler_spark.sources", None)
        assert "pywrangler_spark/sources/parquet.py" in got
        assert "pywrangler_spark/sources/blobs.py" in got
        # the pure re-export hub itself is substituted away
        assert "pywrangler_spark/sources/__init__.py" not in got

    def test_registry_module_is_never_a_dep(self):
        gp = _load()
        assert gp.resolve_spec("pywrangler_spark.queries", None) == set()
        assert (
            gp.resolve_spec(
                "pywrangler_spark.queries", frozenset({"register"})
            )
            == set()
        )

    def test_unknown_module_is_empty(self):
        gp = _load()
        assert gp.resolve_spec("pywrangler_spark.nonexistent", None) == set()
