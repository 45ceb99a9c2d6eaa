"""Self-check harness replicating the driver's DuckDB-oracle comparison:
run the Spark query and the oracle SQL on the same parquet fixtures, then
compare row count, schema (column names), and order-insensitive values.

Strictness: values are compared after canonicalizing each cell to a string
(decimals via str(), floats via repr_bits) and sorting rows — a superset of
any reasonable hash the driver could use, so passing here predicts passing
there.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pandas as pd

from merl_etl_spark.sources.tables import TABLES


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # Arrow path: DECIMAL stays Decimal (fetchdf would downcast to float64)
    return con.execute(sql).fetch_arrow_table().to_pandas()


def _canon_cell(v: object) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        if v == 0.0:
            return "0"  # normalize -0.0 like the Decimal branch does
        return repr(v)
    if isinstance(v, Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s if s not in ("", "-0") else "0"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
    )
    assert len(sp) == len(oracle_df), f"{name}: rowcount spark={len(sp)} oracle={len(oracle_df)}"
    a, b = canon(sp), canon(oracle_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
