"""Semantic tests for the round-13 wave-8 operator: the 80/20 crossing
point (smallest top-spender set covering 80% of a nation's spend)."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _pareto_replay(spark, sf_dir):
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    cust_nation = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    nation_name = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    spend: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in orders:
        key = (nation_name[cust_nation[r.o_custkey]], r.o_custkey)
        spend[key] += Decimal(f"{r.o_totalprice:.2f}")
    per_nation: dict[str, list[int]] = defaultdict(list)
    for (nation, _), v in spend.items():
        per_nation[nation].append(int(v * 100))
    exp = {}
    for nation, xs in per_nation.items():
        xs.sort(reverse=True)  # the naive top-down walk
        n, total = len(xs), sum(xs)
        cum = 0
        for k, x in enumerate(xs, start=1):
            cum += x
            if 10 * cum >= 8 * total:
                break
        exp[nation] = (
            n, k, k * 1_000_000 // n,
            math.floor(cum * 1_000_000 / total),
        )
    return exp


def test_pareto_8020_matches_naive_topdown_replay(spark, sf_dir):
    """The two-level band crossing must equal the literal sorted
    top-down walk — the equivalence proof for the in-band ceil
    arithmetic and the exclusive/inclusive crossing predicate."""
    exp = _pareto_replay(spark, sf_dir)
    got = {
        r.nation: (r.n_customers, r.n_top, r.top_ppm, r.covered_ppm)
        for r in QUERIES["analytics-pareto-8020"](spark, sf_dir).collect()
    }
    assert got == exp


def test_pareto_8020_analytic_pins(spark):
    """Constructed spends: equal spenders -> exactly 80% of heads needed
    (ceil); one dominant customer -> n_top = 1."""
    import tempfile

    from pyspark.sql import functions as F

    from merl_etl_spark.operators.analytics import analytics_pareto_8020

    # nation EQ: 10 customers x $100 -> 8 heads cover exactly 80%
    # nation DOM: 1 x $10000 + 9 x $1 -> top 1 covers >80%
    custs = [(i, 0) for i in range(1, 11)] + [(i, 1) for i in range(20, 30)]
    orders = [(100 + i, i, 100.00, "2024-01-05") for i in range(1, 11)]
    orders += [(200, 20, 10000.00, "2024-01-05")]
    orders += [(200 + i, 20 + i, 1.00, "2024-01-05") for i in range(1, 10)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_totalprice double,"
            " o_orderdate string",
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.parquet(
            f"{tmp}/orders.parquet"
        )
        spark.createDataFrame(
            custs, "c_custkey long, c_nationkey int"
        ).write.parquet(f"{tmp}/customer.parquet")
        spark.createDataFrame(
            [(0, "EQ", 0), (1, "DOM", 0)],
            "n_nationkey int, n_name string, n_regionkey int",
        ).write.parquet(f"{tmp}/nation.parquet")
        got = {r.nation: r for r in analytics_pareto_8020(spark, tmp).collect()}
    eq = got["EQ"]
    assert (eq.n_customers, eq.n_top, eq.top_ppm) == (10, 8, 800_000)
    assert eq.covered_ppm == 800_000  # exactly 80% covered
    dom = got["DOM"]
    assert (dom.n_customers, dom.n_top) == (10, 1)
    # the top head covers 10000 of 10009 dollars
    assert dom.covered_ppm == math.floor(10000_00 * 1_000_000 / 10009_00)
