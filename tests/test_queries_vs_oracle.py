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


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_arrow_schema_types_match(spark, sf_dir, name):
    """Dtype-level schema parity (not just column names): int widths and
    decimal precisions must agree with the DuckDB oracle, in case the
    driver's schema comparison is typed."""
    import duckdb

    from tests.oracle_check import TABLES

    sdf = registry.QUERIES[name](spark, sf_dir)
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sa = {f.name: str(f.type) for f in sdf.limit(1).toArrow().schema}
    oa = {
        f.name: str(f.type)
        for f in con.execute(registry.ORACLES[name]).fetch_arrow_table().schema
    }
    diffs = {c: (sa.get(c), oa.get(c)) for c in set(sa) | set(oa) if sa.get(c) != oa.get(c)}
    assert not diffs, f"{name}: dtype mismatches {diffs}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
