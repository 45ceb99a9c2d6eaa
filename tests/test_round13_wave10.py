"""Semantic test for the round-13 wave-10 operator: Lorenz deciles."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _lorenz_replay(spark, sf_dir):
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
        xs.sort()
        n, total = len(xs), sum(xs)
        for decile in range(1, 11):
            m = (decile * n + 9) // 10
            cum = sum(xs[:m])
            exp[(nation, decile)] = (m, math.floor(cum * 1_000_000 / total))
    return exp


def test_lorenz_deciles_match_naive_sorted_replay(spark, sf_dir):
    exp = _lorenz_replay(spark, sf_dir)
    got = {
        (r.nation, r.decile): (r.m, r.cum_share_ppm)
        for r in QUERIES["analytics-lorenz-deciles"](spark, sf_dir).collect()
    }
    assert got == exp


def test_lorenz_curve_shape(spark, sf_dir):
    """Lorenz invariants: 10 points per nation, cumulative share is
    nondecreasing, below-or-at the diagonal (bottom k/10 carries at most
    k/10 of spend under any inequality), and the 10th decile covers
    everything (ppm 1e6 less only the floor())."""
    rows = QUERIES["analytics-lorenz-deciles"](spark, sf_dir).collect()
    by_nation = defaultdict(dict)
    for r in rows:
        by_nation[r.nation][r.decile] = r
    for nation, pts in by_nation.items():
        assert set(pts) == set(range(1, 11)), nation
        shares = [pts[d].cum_share_ppm for d in range(1, 11)]
        assert shares == sorted(shares), (nation, shares)
        for d in range(1, 10):
            # strictly-positive spends: bottom slice can't beat uniform
            assert pts[d].cum_share_ppm <= d * 100_000 + 1, (nation, d)
        assert shares[-1] >= 999_999, (nation, shares[-1])
