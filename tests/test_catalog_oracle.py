"""Every catalog query must match its DuckDB oracle (the driver's t2 gate)."""

from __future__ import annotations

import pytest

from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded

from tests.oracle_harness import check_query

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_registration_integrity():
    """Every registered name IS its function's name with a (spark, sf_dir)
    signature — pins the round-8 regression where a refactor left
    @register on an extracted 3-arg helper (extension_queries.py:1051 at
    the time), shipping a catalog entry that raised TypeError and killed
    the driver bench. register() now also enforces this at import time;
    this test keeps the guard itself honest."""
    import inspect

    for name, spec in CATALOG.items():
        assert spec.fn.__name__ == name, (
            f"{name}: decorates {spec.fn.__name__}"
        )
        required = [
            p
            for p in inspect.signature(spec.fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
            )
        ]
        assert len(required) == 2, f"{name}: takes {required}"


def test_register_rejects_misplaced_decorator():
    from iheardai_data_pipeline_spark.plans.catalog import register

    with pytest.raises(TypeError, match="must match the def name"):
        @register("some_other_name")
        def helper(spark, sf_dir):  # pragma: no cover - never runs
            return None

    with pytest.raises(TypeError, match="exactly"):
        @register("three_arg")
        def three_arg(spark, sf_dir, extra):  # pragma: no cover
            return None

    assert "some_other_name" not in CATALOG
    assert "three_arg" not in CATALOG


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
