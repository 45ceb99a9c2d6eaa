"""Semantic tests for the round-12 wave-10 operator: the monthly
growth table."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def test_monthly_growth_matches_decimal_replay(spark, sf_dir):
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").isNotNull())
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_totalprice",
        )
        .collect()
    )
    agg = defaultdict(lambda: [0, Decimal(0)])
    for r in orders:
        a = agg[r.month]
        a[0] += 1
        a[1] += Decimal(f"{r.o_totalprice:.6f}")
    months = sorted(agg)
    rev = {m: float(agg[m][1]) for m in months}
    rows = {r.month: r for r in QUERIES["analytics-monthly-growth"](spark, sf_dir).collect()}
    assert set(rows) == set(months)
    for i, m in enumerate(months):
        r = rows[m]
        assert r.n_orders == agg[m][0]
        assert r.revenue == rev[m]
        if i >= 1:
            prev = rev[months[i - 1]]
            assert r.mom_ppm == math.floor((rev[m] - prev) * 1_000_000 / prev)
        else:
            assert r.mom_ppm is None
        if i >= 12:
            prev = rev[months[i - 12]]
            assert r.yoy_ppm == math.floor((rev[m] - prev) * 1_000_000 / prev)
        else:
            assert r.yoy_ppm is None


def test_monthly_growth_lag_semantics(spark, sf_dir):
    """Structural: months are contiguous in the fixture, deltas exist
    from the 2nd (MoM) and 13th (YoY) month on, and a +x% month is
    followed by a mechanical headwind (growth rates not all positive)."""
    rows = sorted(
        QUERIES["analytics-monthly-growth"](spark, sf_dir).collect(),
        key=lambda r: r.month,
    )
    assert rows[0].mom_ppm is None
    assert all(r.mom_ppm is not None for r in rows[1:])
    assert all(r.yoy_ppm is None for r in rows[:12])
    if len(rows) > 12:
        assert all(r.yoy_ppm is not None for r in rows[12:])
    assert any(r.mom_ppm is not None and r.mom_ppm < 0 for r in rows)
    assert any(r.mom_ppm is not None and r.mom_ppm > 0 for r in rows)
