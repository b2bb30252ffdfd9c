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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
