"""Semantic tests for the round-12 wave-7 operators: cluster NMI/purity
and the returned-revenue report.  Both compose pinned substrates, so the
tests pin composition consistency plus information-theoretic ground
truths."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# sim-cluster-nmi
# ---------------------------------------------------------------------------


def test_cluster_nmi_matches_confusion_replay(spark, sf_dir):
    """Recompute purity/H/MI/NMI in Python (with the same frozen-ln
    discipline) from sim-centroid-assign's OWN confusion matrix."""
    conf = defaultdict(int)
    for r in QUERIES["sim-centroid-assign"](spark, sf_dir).collect():
        conf[(r.true_label, r.assigned_label)] += r.n
    nn = sum(conf.values())
    na = defaultdict(int)
    nb = defaultdict(int)
    for (t, a), n in conf.items():
        na[t] += n
        nb[a] += n
    n_majority = sum(
        max(n for (t, a2), n in conf.items() if a2 == a) for a in nb
    )

    def ln6(x: int) -> Decimal:
        return Decimal(str(round(math.log(x), 6)))

    mi_sum = sum(
        (Decimal(n) * (ln6(nn * n) - ln6(na[t] * nb[a]))
         for (t, a), n in conf.items()),
        Decimal(0),
    )
    hx_sum = sum((Decimal(v) * (ln6(nn) - ln6(v)) for v in na.values()), Decimal(0))
    hy_sum = sum((Decimal(v) * (ln6(nn) - ln6(v)) for v in nb.values()), Decimal(0))
    rows = QUERIES["sim-cluster-nmi"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_vectors == nn
    assert r.n_cells == len(conf)
    assert r.purity_ppm == n_majority * 1_000_000 // nn
    assert r.h_true == round(float(hx_sum) / nn, 6)
    assert r.h_assigned == round(float(hy_sum) / nn, 6)
    assert r.mi == round(float(mi_sum) / nn, 6)
    if float(hx_sum) + float(hy_sum) > 0:
        assert r.nmi == round(2 * float(mi_sum) / (float(hx_sum) + float(hy_sum)), 6)


def test_nmi_bounds_and_known_cases():
    """Information-theoretic anchors on the exact formulas: a perfect
    partition has NMI 1 and purity 1; an independent one has MI 0."""
    # perfect: conf = diag(10, 20)
    nn = 30
    mi = 10 * (math.log(nn * 10) - math.log(10 * 10)) + 20 * (
        math.log(nn * 20) - math.log(20 * 20)
    )
    hx = 10 * (math.log(nn) - math.log(10)) + 20 * (math.log(nn) - math.log(20))
    assert math.isclose(2 * mi / (hx + hx), 1.0)
    # independent: uniform 2x2 with equal margins
    nn = 40
    mi_ind = sum(
        10 * (math.log(nn * 10) - math.log(20 * 20)) for _ in range(4)
    )
    assert abs(mi_ind) < 1e-9


def test_cluster_nmi_range(spark, sf_dir):
    r = QUERIES["sim-cluster-nmi"](spark, sf_dir).collect()[0]
    assert 0 <= r.purity_ppm <= 1_000_000
    assert r.h_true >= 0 and r.h_assigned >= 0
    # MI's 6-dp per-term freezing can wobble the total by ~#cells·1e-6
    # around an analytic bound; allow that slack and no more
    slack = r.n_cells * 2e-6
    assert r.mi >= -slack
    if r.nmi is not None:
        assert -slack <= r.nmi <= 1 + slack


# ---------------------------------------------------------------------------
# analytics-returned-revenue
# ---------------------------------------------------------------------------


def test_returned_revenue_matches_decimal_replay(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .collect()
    )
    cust_of_order = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    nation_of_cust = {}
    nation_name = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    for r in (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    ):
        nation_of_cust[r.c_custkey] = nation_name[r.c_nationkey]

    def d6(x):
        return Decimal(f"{x:.6f}")

    lost = defaultdict(Decimal)
    lines = defaultdict(int)
    for r in li:
        ck = cust_of_order[r.l_orderkey]
        lost[ck] += (d6(r.l_extendedprice) * (1 - d6(r.l_discount))).quantize(
            Decimal("1E-12")
        )
        lines[ck] += 1
    agg = defaultdict(lambda: [0, 0, Decimal(0), Decimal(0)])
    for ck, v in lost.items():
        nat = nation_of_cust[ck]
        a = agg[nat]
        a[0] += 1
        a[1] += lines[ck]
        a[2] += v
        a[3] = max(a[3], v)
    rows = {r.nation: r for r in QUERIES["analytics-returned-revenue"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    from decimal import ROUND_HALF_UP

    def r2(d):
        return float(
            Decimal(repr(float(d))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        )

    for nat, (n_cust, n_lines, tot, worst) in agg.items():
        r = rows[nat]
        assert r.n_customers == n_cust
        assert r.n_ret_lines == n_lines
        assert r.lost_revenue == r2(tot)
        assert r.worst_customer_loss == r2(worst)


def test_returned_revenue_conservation(spark, sf_dir):
    """The nation rollup must conserve the global R-line count."""
    rows = QUERIES["analytics-returned-revenue"](spark, sf_dir).collect()
    total_r = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .count()
    )
    assert sum(r.n_ret_lines for r in rows) == total_r
    for r in rows:
        assert r.worst_customer_loss <= r.lost_revenue + 1e-9
