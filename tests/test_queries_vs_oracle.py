"""Every registered query must match its DuckDB oracle at sf0.01 — the
local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from merl_etl_spark import registry
from tests.oracle_check import compare, duck_run

registry.load_all()

WITH_ORACLE = sorted(set(registry.QUERIES) & set(registry.ORACLES))
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spark_df = registry.QUERIES[name](spark, sf_dir)
    oracle_df = duck_run(sf_dir, registry.ORACLES[name])
    compare(spark_df, oracle_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
